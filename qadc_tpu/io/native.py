"""ctypes loader for the C++ IO library (native/qadc_io.cpp).

Builds on demand with the in-image toolchain (g++); falls back to None if the
build fails — callers then use the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _build() -> str | None:
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libqadc_io.so"))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "qadc_io.cpp"))
    if not os.path.exists(src):
        return None
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        return None
    return so if os.path.exists(so) else None


def get_lib():
    """Return the loaded CDLL or None."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        i64 = ctypes.c_int64
        lib.qadc_vecs_info.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(i64), ctypes.POINTER(i64),
        ]
        lib.qadc_vecs_info.restype = ctypes.c_int
        lib.qadc_vecs_read.argtypes = [
            ctypes.c_char_p, ctypes.c_int, i64, i64,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.qadc_vecs_read.restype = ctypes.c_int
        lib.qadc_vecs_write.argtypes = [
            ctypes.c_char_p, ctypes.c_int, i64, i64, ctypes.c_void_p,
        ]
        lib.qadc_vecs_write.restype = ctypes.c_int
        lib.qadc_vecs_split.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, i64, i64,
        ]
        lib.qadc_vecs_split.restype = ctypes.c_int
        _lib = lib
        return _lib
