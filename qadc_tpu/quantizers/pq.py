"""Product Quantizer: codebooks, training, encode/decode.

Reference: base_pq (quantizers.hpp:96-246). Codebooks are (sq_count, 2^sq_bits,
dim/sq_count). Encoding assigns each sub-vector to its nearest centroid and
packs the indices at 4/8/16 bits (batch path: encode_multiple_vectors,
quantizers.hpp:222-245 — one sub-quantizer column at a time over a BLAS k-NN).
Here encoding is one jitted einsum+argmax over all sub-quantizers at once, and
training (external to the reference — the "Quantizations" project,
README.md:166-206) is in-framework: vmapped k-means per sub-space.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from qadc_tpu.core.packing import SUPPORTED_BITS, code_bytes, pack_codes, unpack_codes
from qadc_tpu.ops.kmeans import DEFAULT_ITERS, kmeans


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["centroids"],
    meta_fields=["sq_bits"],
)
@dataclasses.dataclass(frozen=True)
class ProductQuantizer:
    """PQ codebooks.

    Attributes:
      centroids: (M, K, dsq) float32, K = 2^sq_bits, dim = M * dsq.
      sq_bits: bits per sub-quantizer (4, 8 or 16) — static.
    """

    centroids: jax.Array
    sq_bits: int

    @property
    def sq_count(self) -> int:
        return self.centroids.shape[0]

    @property
    def sq_centroid_count(self) -> int:
        return self.centroids.shape[1]

    @property
    def sq_dim(self) -> int:
        return self.centroids.shape[2]

    @property
    def dim(self) -> int:
        return self.sq_count * self.sq_dim

    @property
    def code_size(self) -> int:
        return code_bytes(self.sq_count, self.sq_bits)

    def validate(self) -> "ProductQuantizer":
        """Config asserts (reference: quantizers.hpp:110-113)."""
        if self.sq_bits not in SUPPORTED_BITS:
            raise ValueError(f"sq_bits must be in {SUPPORTED_BITS}")
        if self.centroids.shape[1] != (1 << self.sq_bits):
            raise ValueError(
                f"centroid count {self.centroids.shape[1]} != 2^{self.sq_bits}"
            )
        code_bytes(self.sq_count, self.sq_bits)
        return self

    # Rotation hooks (identity for plain PQ; OPQ overrides).
    def rotate(self, vectors):
        return vectors

    def unrotate(self, vectors):
        return vectors


def train_pq(key, x, sq_count: int, sq_bits: int, iters: int = DEFAULT_ITERS):
    """Train a PQ on data by per-sub-space k-means.

    Args:
      key: PRNG key.
      x: (N, dim) float32 training vectors (residuals for an IVF index).
      sq_count: number of sub-quantizers M.
      sq_bits: bits per sub-quantizer.
      iters: Lloyd iterations per sub-space.

    Returns:
      ProductQuantizer.
    """
    x = jnp.asarray(x, jnp.float32)
    n, dim = x.shape
    if dim % sq_count != 0:
        raise ValueError(f"dim {dim} not divisible by sq_count {sq_count}")
    k = 1 << sq_bits
    dsq = dim // sq_count
    subspaces = x.reshape(n, sq_count, dsq).transpose(1, 0, 2)  # (M, N, dsq)
    keys = jax.random.split(key, sq_count)
    centroids, _ = jax.vmap(lambda kk, xs: kmeans(kk, xs, k, iters))(keys, subspaces)
    return ProductQuantizer(centroids=centroids, sq_bits=sq_bits).validate()


# K-chunk size for wide-codebook encodes. 4/8-bit codebooks (K <= 256) take
# the one-shot path; 16-bit (K = 65536) would materialize an (N, M, K) f32
# distance tensor — 3+ GB at N = 3000, an OOM at production N on a 16 GB
# chip — so the argmin runs as a scan over K chunks with a running
# (best distance, best index) carry. Transient is N*M*ENCODE_K_CHUNK*4 B.
ENCODE_K_CHUNK = 4096


def encode_indices(pq: ProductQuantizer, vectors):
    """Per-sub-space nearest-centroid indices, (N, M) int32. Applies rotation.

    Ties resolve to the LOWEST centroid index (argmin semantics), in the
    chunked path too: strict < keeps the earlier chunk's winner.
    """
    v = pq.rotate(jnp.asarray(vectors, jnp.float32))
    n = v.shape[0]
    sub = v.reshape(n, pq.sq_count, pq.sq_dim)
    c = pq.centroids
    k = c.shape[1]
    if k <= ENCODE_K_CHUNK:
        c2 = jnp.sum(c * c, axis=-1)  # (M, K)
        cross = jnp.einsum(
            "nmd,mkd->nmk", sub, c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.argmin(c2[None] - 2.0 * cross, axis=-1).astype(jnp.int32)
    kc = math.gcd(k, ENCODE_K_CHUNK)
    chunks = c.reshape(c.shape[0], k // kc, kc, pq.sq_dim).transpose(1, 0, 2, 3)

    def step(carry, cc):
        bd, bi, off = carry
        c2 = jnp.sum(cc * cc, axis=-1)                      # (M, kc)
        cross = jnp.einsum(
            "nmd,mkd->nmk", sub, cc,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = c2[None] - 2.0 * cross                          # (N, M, kc)
        i = jnp.argmin(d, axis=-1).astype(jnp.int32)        # (N, M)
        dm = jnp.min(d, axis=-1)
        upd = dm < bd
        return (
            jnp.where(upd, dm, bd),
            jnp.where(upd, i + off, bi),
            off + kc,
        ), None

    init = (
        jnp.full((n, c.shape[0]), jnp.inf, jnp.float32),
        jnp.zeros((n, c.shape[0]), jnp.int32),
        jnp.int32(0),
    )
    (bd, bi, _), _ = jax.lax.scan(step, init, chunks)
    return bi


def encode(pq: ProductQuantizer, vectors):
    """Encode vectors to packed codes (N, code_size) uint8."""
    return pack_codes(encode_indices(pq, vectors), pq.sq_bits)


def decode(pq: ProductQuantizer, codes):
    """Reconstruct vectors from packed codes: (N, dim) float32 (pre-rotation space
    is NOT restored; returns the quantized rotated vector, matching how tables
    are computed against rotated residuals)."""
    idx = unpack_codes(codes, pq.sq_count, pq.sq_bits)  # (N, M)
    m = pq.sq_count
    # out[n, m] = centroids[m, idx[n, m]] — advanced indexing broadcast.
    gathered = pq.centroids[jnp.arange(m)[None, :], idx]  # (N, M, dsq)
    return gathered.reshape(idx.shape[0], pq.dim)
