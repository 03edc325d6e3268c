"""Generate the byte-level interop fixtures checked in next to this script.

The bytes are laid down with struct/tofile ONLY, straight from the
reference's documented formats — NOT via qadc_tpu's own writers — so the
test that reads them (tests/test_io.py::test_reference_format_interop_*)
is a true cross-implementation check, not a self-round-trip:

  - .pq.data / .opq.data: int32 dim, m, b; float32 codebooks[m*2^b*(dim/m)];
    float32 rotation[dim*dim] for OPQ (reference README.md:344-362,
    read by quantizers.cpp:27-33).
  - .fvecs: per-vector int32 dim prefix + float32 payload (TexMex;
    reference vector_io.hpp:70-76,96-149).

Deterministic contents (no RNG) so the committed binaries are
reproducible: centroid j of sub-quantizer i is the vector
[i*1000 + j*10 + d for d in range(dsq)] — every value exact in float32,
nearest-centroid assignments computable by inspection.

Run from the repo root:  python tests/fixtures/make_interop_fixtures.py
"""

import os
import struct

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

DIM, M, B = 8, 4, 4          # k=16 centroids, dsq=2 dims per sub-quantizer
K, DSQ = 1 << B, DIM // M


def centroids():
    c = np.zeros((M, K, DSQ), np.float32)
    for i in range(M):
        for j in range(K):
            for d in range(DSQ):
                c[i, j, d] = i * 1000 + j * 10 + d
    return c


def rotation():
    # A permutation matrix (orthonormal, exact in float32): output dim d
    # takes input dim (d+1) % DIM. Row-major [dim, dim] as the reference
    # stores it (quantizers.hpp opq cereal layout / README format).
    r = np.zeros((DIM, DIM), np.float32)
    for d in range(DIM):
        r[d, (d + 1) % DIM] = 1.0
    return r


def main():
    c = centroids()
    with open(os.path.join(HERE, "interop_tiny.pq.data"), "wb") as f:
        f.write(struct.pack("<iii", DIM, M, B))
        f.write(c.astype("<f4").tobytes())
    with open(os.path.join(HERE, "interop_tiny.opq.data"), "wb") as f:
        f.write(struct.pack("<iii", DIM, M, B))
        f.write(c.astype("<f4").tobytes())
        f.write(rotation().astype("<f4").tobytes())

    # fvecs: 3 vectors, each sitting exactly on a known centroid per
    # sub-space (vector v's sub-quantizer i lands on centroid (v*3+i) % 16).
    vecs = np.zeros((3, DIM), np.float32)
    for v in range(3):
        for i in range(M):
            j = (v * 3 + i) % K
            vecs[v, i * DSQ : (i + 1) * DSQ] = c[i, j]
    with open(os.path.join(HERE, "interop_tiny.fvecs"), "wb") as f:
        for row in vecs:
            f.write(struct.pack("<i", DIM))
            f.write(row.astype("<f4").tobytes())
    print("wrote interop_tiny.{pq.data,opq.data,fvecs} to", HERE)


if __name__ == "__main__":
    main()
