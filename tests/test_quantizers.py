import numpy as np
import jax
import pytest

from qadc_tpu.quantizers.pq import ProductQuantizer, decode, encode, encode_indices, train_pq
from qadc_tpu.quantizers.opq import OPQQuantizer, train_opq


def _data(rng, n=2000, dim=32):
    # Correlated gaussian so OPQ has something to gain.
    a = rng.normal(size=(dim, dim)).astype(np.float32)
    cov_half = a / np.sqrt(dim)
    return (rng.normal(size=(n, dim)).astype(np.float32) @ cov_half).astype(np.float32)


def test_train_pq_shapes_and_error(rng):
    x = _data(rng)
    pq = train_pq(jax.random.PRNGKey(0), x, sq_count=8, sq_bits=4, iters=15)
    assert pq.centroids.shape == (8, 16, 4)
    assert pq.code_size == 4
    codes = encode(pq, x)
    assert np.asarray(codes).shape == (2000, 4)
    recon = np.asarray(decode(pq, codes))
    err = np.mean((recon - x) ** 2)
    base = np.mean(x**2)
    assert err < 0.6 * base  # quantization actually helps


def test_encode_is_nearest_centroid(rng):
    x = _data(rng, n=100)
    pq = train_pq(jax.random.PRNGKey(1), x, sq_count=4, sq_bits=4, iters=5)
    idx = np.asarray(encode_indices(pq, x))
    cents = np.asarray(pq.centroids)
    sub = x.reshape(100, 4, 8)
    for n in range(0, 100, 17):
        for m in range(4):
            d = ((cents[m] - sub[n, m]) ** 2).sum(-1)
            assert d[idx[n, m]] == pytest.approx(d.min(), rel=1e-4, abs=1e-5)


def test_opq_rotation_orthonormal_and_better(rng):
    x = _data(rng)
    key = jax.random.PRNGKey(2)
    pq = train_pq(key, x, sq_count=8, sq_bits=4, iters=15)
    opq = train_opq(key, x, sq_count=8, sq_bits=4, opq_iters=5, kmeans_iters=10)
    r = np.asarray(opq.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(32), atol=1e-4)

    def recon_err(q):
        codes = encode(q, x)
        recon = np.asarray(decode(q, codes))  # rotated-space reconstruction
        xr = np.asarray(q.rotate(x))
        return np.mean((recon - xr) ** 2)

    assert recon_err(opq) <= recon_err(pq) * 1.02  # OPQ no worse (usually better)


def test_opq_is_pytree():
    opq = OPQQuantizer(
        centroids=np.zeros((4, 16, 2), np.float32),
        sq_bits=4,
        rotation=np.eye(8, dtype=np.float32),
    )
    leaves = jax.tree_util.tree_leaves(opq)
    assert len(leaves) == 2
    pq = ProductQuantizer(centroids=np.zeros((4, 16, 2), np.float32), sq_bits=4)
    assert len(jax.tree_util.tree_leaves(pq)) == 1
