""".pq.data / .opq.data quantizer file import/export.

Binary format (reference README.md "Product quantizer file formats",
quantizers.cpp:27-33,89-103):

    int32 dim; int32 m; int32 b;
    float32 codebooks[m * 2^b * (dim/m)];
    float32 rotation[dim*dim];            // OPQ only

The type is chosen by the filename suffix (.pq.data vs .opq.data —
parse_data_filename, quantizers.cpp:54-87). This replaces both the reference's
loader and convert-quantizer.py (our training is in-framework, but the format
is kept for interop with quantizers trained elsewhere).
"""

from __future__ import annotations

import numpy as np

from qadc_tpu.quantizers.pq import ProductQuantizer
from qadc_tpu.quantizers.opq import OPQQuantizer


def _parse_kind(path: str) -> str:
    if path.endswith(".opq.data"):
        return "opq"
    if path.endswith(".pq.data"):
        return "pq"
    raise ValueError(f"{path}: expected .pq.data or .opq.data suffix")


def load_quantizer_file(path: str):
    """Load a ProductQuantizer/OPQQuantizer from a .pq.data/.opq.data file."""
    kind = _parse_kind(path)
    with open(path, "rb") as f:
        dim, m, b = np.fromfile(f, np.int32, 3)
        dim, m, b = int(dim), int(m), int(b)
        k = 1 << b
        dsq = dim // m
        centroids = np.fromfile(f, np.float32, m * k * dsq).reshape(m, k, dsq)
        if kind == "opq":
            rotation = np.fromfile(f, np.float32, dim * dim).reshape(dim, dim)
            return OPQQuantizer(centroids=centroids, sq_bits=b, rotation=rotation).validate()
    return ProductQuantizer(centroids=centroids, sq_bits=b).validate()


def save_quantizer_file(path: str, pq: ProductQuantizer):
    """Write a quantizer in the reference's binary format."""
    kind = _parse_kind(path)
    is_opq = isinstance(pq, OPQQuantizer)
    if kind == "opq" and not is_opq:
        raise ValueError("OPQ filename but plain PQ quantizer")
    if kind == "pq" and is_opq:
        raise ValueError("PQ filename but OPQ quantizer (use .opq.data)")
    with open(path, "wb") as f:
        np.array([pq.dim, pq.sq_count, pq.sq_bits], np.int32).tofile(f)
        np.asarray(pq.centroids, np.float32).tofile(f)
        if is_opq:
            np.asarray(pq.rotation, np.float32).tofile(f)
