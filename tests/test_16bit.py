"""16-bit sub-quantizer configs (reference: scan_standard<uint16>,
supported (2,16)(4,16)(8,16), query_common.hpp:120-143)."""

import numpy as np
import jax
import pytest

from qadc_tpu.index import flat
from qadc_tpu.quantizers.pq import train_pq, encode, decode
from qadc_tpu.ops.knn import exact_knn
from qadc_tpu.eval.recall import recall_at_r


@pytest.mark.parametrize("m", [2, 4])
def test_16bit_roundtrip_and_search(rng, m):
    dim = 16
    n = 800  # shapes sized for suite wall time; 3000 showed nothing more
    base = rng.normal(size=(n, dim)).astype(np.float32)
    queries = base[:10] + 0.01 * rng.normal(size=(10, dim)).astype(np.float32)
    # 16-bit: 65536 centroids is overkill for tests; train_pq with sq_bits=16
    # would need k=65536 — use a synthetic codebook instead: random centroids.
    k = 1 << 16
    # Too large to train; construct a small-but-valid PQ via random projection
    # of the data (validate() only checks shape consistency).
    from qadc_tpu.quantizers.pq import ProductQuantizer

    cent = rng.normal(size=(m, k, dim // m)).astype(np.float32) * 0.01
    # Plant the data's subvectors into the codebook so encoding is meaningful.
    cent[:, :n, :] = (
        base.reshape(n, m, dim // m).transpose(1, 0, 2)[:, :k, :]
    )
    pq = ProductQuantizer(centroids=cent, sq_bits=16).validate()
    codes = np.asarray(encode(pq, base))
    assert codes.shape == (n, m * 2)
    recon = np.asarray(decode(pq, codes))
    err = np.mean((recon - base) ** 2) / np.mean(base**2)
    assert err < 1e-6  # data vectors are in the codebook -> near-exact

    index = flat.add(flat.FlatIndex.create(pq), base)
    _, gt = exact_knn(queries, base, 1)
    _, labels = flat.search_adc(index, queries, r=10)
    rec = recall_at_r(np.asarray(labels), np.asarray(gt))
    assert rec > 0.9, rec


def _mini_pq16(rng, m, dim, k_real=512):
    """A 16-bit PQ whose codebook has k_real meaningful centroids (the other
    65536-k_real are tiny noise) — keeps tests fast while exercising the full
    uint16 index range via the layout."""
    from qadc_tpu.quantizers.pq import ProductQuantizer

    k = 1 << 16
    cent = (rng.normal(size=(m, k, dim // m)) * 1e-3).astype(np.float32)
    cent[:, :k_real] = rng.normal(size=(m, k_real, dim // m)).astype(np.float32)
    return ProductQuantizer(centroids=np.asarray(cent), sq_bits=16).validate()


def test_16bit_recon_matches_table_oracle(rng):
    """_search_adc_recon distances == sum of 65536-entry table lookups
    (scan_standard<uint16_t> semantics, query_common.hpp:92-118)."""
    import jax.numpy as jnp
    from qadc_tpu.quantizers.pq import ProductQuantizer

    m, dim, n, q = 2, 8, 700, 5
    pq = _mini_pq16(rng, m, dim)
    base = rng.normal(size=(n, dim)).astype(np.float32)
    queries = rng.normal(size=(q, dim)).astype(np.float32)
    index = flat.add(flat.FlatIndex.create(pq), base)
    d, l = flat.search_adc(index, queries, r=10)
    d, l = np.asarray(d), np.asarray(l)

    # Oracle: explicit table lookups.
    codes = np.asarray(encode(pq, base))
    idx = codes.reshape(n, m, 2)
    idx = (idx[..., 0].astype(np.int64) | (idx[..., 1].astype(np.int64) << 8))
    cent = np.asarray(pq.centroids)
    qs = queries.reshape(q, m, dim // m)
    # tables[q, mm, v] = ||qs[q,mm] - cent[mm,v]||^2 — evaluate at code indices.
    want = np.zeros((q, n), np.float32)
    for mm in range(m):
        diff = qs[:, None, mm, :] - cent[mm][idx[:, mm]][None, :, :]
        want += np.sum(diff * diff, axis=-1)
    order = np.argsort(want, axis=1)[:, :10]
    np.testing.assert_array_equal(l, order)
    np.testing.assert_allclose(
        d, np.take_along_axis(want, order, axis=1), rtol=1e-4, atol=1e-4
    )


def test_16bit_ivf_search(rng):
    import jax
    from qadc_tpu.index import ivf
    from qadc_tpu.ops.knn import assign_nearest

    m, dim, n = 2, 8, 1500
    base = rng.normal(size=(n, dim)).astype(np.float32)
    queries = base[:8] + 0.001 * rng.normal(size=(8, dim)).astype(np.float32)
    coarse = ivf.train_coarse(jax.random.PRNGKey(0), base[:1000], 8, iters=5)
    a = np.asarray(assign_nearest(base[:1000], coarse))
    pq = _mini_pq16(rng, m, dim)
    index = ivf.add(ivf.IVFIndex.create(pq, coarse), base)
    _, gt = exact_knn(queries, base, 1)
    _, labels = ivf.search_adc(index, queries, r=20, ma=4)
    rec = recall_at_r(np.asarray(labels), np.asarray(gt))
    assert rec > 0.7, rec


def test_16bit_small_chunk_r_exceeds_windows(rng):
    """r=100 with a small chunk (n_pad=3072 -> chunk=1024, g=64 windows):
    the window screen must be skipped (rk >= g) instead of top_k crashing,
    and results stay exact vs the decode oracle."""
    import jax.numpy as jnp
    from qadc_tpu.core.packing import unpack_codes
    from qadc_tpu.index.flat import decode_rows

    m, dim, n = 4, 16, 3000
    base = rng.normal(size=(n, dim)).astype(np.float32)
    queries = base[:6] + 0.01 * rng.normal(size=(6, dim)).astype(np.float32)
    pq = _mini_pq16(rng, m, dim)
    index = flat.add(flat.FlatIndex.create(pq), base)
    d, l = flat.search_adc(index, queries, r=100)
    # oracle: exact reconstruction distances
    idx = unpack_codes(
        np.asarray(index.codes).reshape(index.n_pad, pq.code_size)[:n], m, 16
    )
    dec = np.asarray(decode_rows(pq, jnp.asarray(idx)))
    rot = np.asarray(pq.rotate(jnp.asarray(queries)))
    dm = ((rot[:, None, :] - dec[None, :, :]) ** 2).sum(-1)
    order = np.argsort(dm, axis=1)[:, :100]
    assert (np.asarray(l) == order).mean() > 0.999


def test_16bit_ivf_grouped_matches_jnp(rng):
    """Grouped 16-bit IVF (decode each probed partition once) vs the jnp
    per-assignment oracle: top-1 exact, distances exact where labels agree,
    recall parity. Reference: scan_standard<uint16_t> (query_common.hpp:92-118)."""
    import jax.numpy as jnp
    from qadc_tpu.index import ivf
    from qadc_tpu.ops.knn import assign_nearest

    m, dim, n = 2, 8, 1500
    base = rng.normal(size=(n, dim)).astype(np.float32)
    queries = base[:8] + 0.001 * rng.normal(size=(8, dim)).astype(np.float32)
    coarse = ivf.train_coarse(jax.random.PRNGKey(0), base[:1000], 8, iters=5)
    pq = _mini_pq16(rng, m, dim)
    index = ivf.add(ivf.IVFIndex.create(pq, coarse), base)
    d0, l0 = ivf.search_adc(index, queries, r=20, ma=4, grouped=False)
    d1, l1 = ivf.search_adc(index, queries, r=20, ma=4)  # auto: grouped
    d0, l0, d1, l1 = map(np.asarray, (d0, l0, d1, l1))
    np.testing.assert_array_equal(l1[:, 0], l0[:, 0])
    same = l0 == l1
    assert same.mean() > 0.3
    np.testing.assert_allclose(d1[same], d0[same], rtol=1e-4, atol=1e-3)
    _, gt = exact_knn(queries, base, 1)
    assert recall_at_r(l1, np.asarray(gt)) >= recall_at_r(l0, np.asarray(gt)) - 0.01
