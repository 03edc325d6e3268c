"""TexMex .fvecs/.ivecs/.bvecs vector file IO.

Format (reference: vector_io.hpp:70-76, README.md:153-157): each vector is an
int32 dimension prefix followed by dim elements (float32 / int32 / uint8);
count is inferred from file size. Extension selects the loader
(load_vectors_by_extension, vector_io.cpp:40-58).

Fast path: the C++ library (native/qadc_io.cpp — mmap + threads); numpy
fallback otherwise.
"""

from __future__ import annotations

import os

import numpy as np

from qadc_tpu.io.native import get_lib

_KINDS = {".fvecs": (0, np.float32), ".ivecs": (1, np.int32), ".bvecs": (2, np.uint8)}


def _kind_of(path: str):
    ext = os.path.splitext(path)[1]
    if ext not in _KINDS:
        raise ValueError(f"unsupported vecs extension: {path} (want .fvecs/.ivecs/.bvecs)")
    return _KINDS[ext]


def vecs_info(path: str):
    """Return (dim, count) of a vecs file."""
    kind, dtype = _kind_of(path)
    lib = get_lib()
    if lib is not None:
        import ctypes

        dim = ctypes.c_int64()
        count = ctypes.c_int64()
        rc = lib.qadc_vecs_info(path.encode(), kind, ctypes.byref(dim), ctypes.byref(count))
        if rc != 0:
            raise IOError(f"qadc_vecs_info({path}) failed: {rc}")
        return int(dim.value), int(count.value)
    size = os.path.getsize(path)
    if size == 0:
        return 0, 0
    with open(path, "rb") as f:
        d = int(np.fromfile(f, np.int32, 1)[0])
    stride = 4 + d * dtype().itemsize
    if size % stride != 0:
        raise IOError(f"{path}: size {size} not a multiple of vector stride {stride}")
    return d, size // stride


def load_vectors(path: str, offset: int = 0, count: int | None = None, to_float: bool = True):
    """Load vectors as a (count, dim) array.

    Args:
      path: .fvecs/.ivecs/.bvecs file.
      offset/count: vector range (count=None -> to end).
      to_float: convert to float32 (reference load_vectors_convert,
        vector_io.cpp:40-58); ivecs groundtruth should pass False.
    """
    kind, dtype = _kind_of(path)
    dim, total = vecs_info(path)
    if count is None:
        count = total - offset
    if offset < 0 or offset + count > total:
        raise ValueError(f"range [{offset}, {offset+count}) outside file with {total} vectors")
    out_dtype = np.float32 if to_float else dtype
    out = np.empty((count, dim), out_dtype)
    if count == 0:
        return out
    lib = get_lib()
    if lib is not None:
        rc = lib.qadc_vecs_read(
            path.encode(), kind, offset, count, 1 if to_float else 0, 0,
            out.ctypes.data_as(__import__("ctypes").c_void_p),
        )
        if rc != 0:
            raise IOError(f"qadc_vecs_read({path}) failed: {rc}")
        return out
    itemsize = dtype().itemsize
    stride = 4 + dim * itemsize
    with open(path, "rb") as f:
        f.seek(offset * stride)
        raw = np.fromfile(f, np.uint8, count * stride).reshape(count, stride)
    payload = raw[:, 4:].copy().view(dtype).reshape(count, dim)
    out[:] = payload.astype(out_dtype, copy=False)
    return out


def save_vectors(path: str, vectors: np.ndarray):
    """Save a (N, dim) array as a vecs file (dtype chosen by extension)."""
    kind, dtype = _kind_of(path)
    vectors = np.ascontiguousarray(vectors, dtype=dtype)
    n, dim = vectors.shape
    lib = get_lib()
    if lib is not None:
        rc = lib.qadc_vecs_write(
            path.encode(), kind, dim, n,
            vectors.ctypes.data_as(__import__("ctypes").c_void_p),
        )
        if rc != 0:
            raise IOError(f"qadc_vecs_write({path}) failed: {rc}")
        return
    with open(path, "wb") as f:
        prefix = np.full((n, 1), dim, np.int32)
        rows = np.concatenate([prefix.view(np.uint8).reshape(n, 4),
                               vectors.view(np.uint8).reshape(n, -1)], axis=1)
        rows.tofile(f)


def split_vecs(in_path: str, out_path: str, chunk_id: int, chunk_size: int):
    """Extract chunk [chunk_id*chunk_size, +chunk_size) into out_path.

    Reference: split_vecs.cpp:25-55 (sendfile zero-copy). Native path uses
    sendfile; fallback reads+writes through numpy.
    """
    kind, _ = _kind_of(in_path)
    lib = get_lib()
    if lib is not None:
        rc = lib.qadc_vecs_split(in_path.encode(), out_path.encode(), kind,
                                 chunk_id, chunk_size)
        if rc != 0:
            raise IOError(f"qadc_vecs_split({in_path}) failed: {rc}")
        return
    vecs = load_vectors(in_path, chunk_id * chunk_size,
                        min(chunk_size, vecs_info(in_path)[1] - chunk_id * chunk_size),
                        to_float=False)
    save_vectors(out_path, vecs)
