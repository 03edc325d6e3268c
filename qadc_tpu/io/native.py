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


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "qadc_tpu")


def _build() -> str | None:
    """Compile the C++ IO library into the user cache dir (never load a
    pre-built binary from the source tree — unauditable and arch-specific)."""
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "qadc_io.cpp"))
    if not os.path.exists(src):
        return None
    out_dir = _cache_dir()
    so = os.path.join(out_dir, "libqadc_io.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        os.makedirs(out_dir, exist_ok=True)
        tmp = so + f".tmp.{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", tmp, src,
             "-lpthread"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so)  # atomic: concurrent builders can't race a loader
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
