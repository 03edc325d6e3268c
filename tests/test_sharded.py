"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4e)."""

import numpy as np
import jax
import pytest

from qadc_tpu.dist.mesh import make_mesh
from qadc_tpu.dist.sharded import (
    search_adc_flat_sharded,
    search_qadc_flat_sharded,
    search_query_parallel,
    shard_flat_codes,
)
from qadc_tpu.index import flat, ivf
from qadc_tpu.quantizers.pq import train_pq
from qadc_tpu.ops.knn import exact_knn, assign_nearest
from qadc_tpu.eval.recall import recall_at_r


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    dim, n = 32, 20000
    centers = rng.normal(scale=3.0, size=(12, dim)).astype(np.float32)
    base = (centers[rng.integers(0, 12, n)] + rng.normal(size=(n, dim))).astype(np.float32)
    queries = (centers[rng.integers(0, 12, 24)] + rng.normal(size=(24, dim))).astype(np.float32)
    pq = train_pq(jax.random.PRNGKey(0), base, 16, 4, iters=10)
    index = flat.add(flat.FlatIndex.create(pq), base)
    return index, base, queries


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["shard"] == 8


def test_flat_sharded_adc_matches_single(setup):
    index, base, queries = setup
    mesh = make_mesh()
    sharded = shard_flat_codes(index, mesh)
    assert sharded.codes.shape[0] % 8 == 0
    d1, l1 = flat.search_adc(index, queries, r=50)
    d2, l2 = search_adc_flat_sharded(sharded, queries, r=50, mesh=mesh)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_flat_sharded_qadc_matches_single(setup):
    index, base, queries = setup
    mesh = make_mesh()
    sharded = shard_flat_codes(index, mesh)
    d1, l1 = flat.search_qadc(index, queries, r=50, keep=0.02)
    d2, l2 = search_qadc_flat_sharded(sharded, queries, r=50, keep=0.02, mesh=mesh)
    # Same bound/quantization; sharded screening keeps 2r per shard vs 2r
    # total, so candidate sets differ at the tie-heavy boundary — require
    # strong overlap, not equality.
    l1, l2 = np.asarray(l1), np.asarray(l2)
    for qi in range(l1.shape[0]):
        overlap = len(set(l1[qi]) & set(l2[qi]))
        assert overlap >= 38, (qi, overlap)
    np.testing.assert_allclose(np.asarray(d1)[:, 0], np.asarray(d2)[:, 0], rtol=1e-4)


def test_flat_sharded_qadc_kernel_path(setup):
    """Pallas kernel-per-shard path (interpret on the CPU mesh) vs jnp path."""
    index, base, queries = setup
    mesh = make_mesh()
    sharded = shard_flat_codes(index, mesh)
    d1, l1 = search_qadc_flat_sharded(
        sharded, queries, r=50, keep=0.02, mesh=mesh, use_kernel=False
    )
    d2, l2 = search_qadc_flat_sharded(
        sharded, queries, r=50, keep=0.02, mesh=mesh,
        use_kernel=True, interpret=True,
    )
    l1, l2 = np.asarray(l1), np.asarray(l2)
    for qi in range(l1.shape[0]):
        overlap = len(set(l1[qi]) & set(l2[qi]))
        assert overlap >= 38, (qi, overlap)
    np.testing.assert_allclose(np.asarray(d1)[:, 0], np.asarray(d2)[:, 0], rtol=1e-4)
    # Exact no-rerank semantics must agree exactly across paths.
    d3, _ = search_qadc_flat_sharded(
        sharded, queries, r=50, keep=0.02, mesh=mesh, use_kernel=False,
        rerank=False,
    )
    d4, _ = search_qadc_flat_sharded(
        sharded, queries, r=50, keep=0.02, mesh=mesh,
        use_kernel=True, interpret=True, rerank=False,
    )
    np.testing.assert_array_equal(np.asarray(d3), np.asarray(d4))


def test_query_parallel_flat(setup):
    index, base, queries = setup
    mesh = make_mesh()
    d1, l1 = flat.search_adc(index, queries, r=20)
    d2, l2 = search_query_parallel(flat.search_adc, index, queries, mesh=mesh, r=20)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # Non-multiple query count exercises padding.
    d3, l3 = search_query_parallel(flat.search_adc, index, queries[:13], mesh=mesh, r=20)
    np.testing.assert_array_equal(np.asarray(l1)[:13], np.asarray(l3))


def test_query_parallel_ivf(setup):
    _, base, queries = setup
    rng = np.random.default_rng(3)
    coarse = ivf.train_coarse(jax.random.PRNGKey(2), base[:4000], 16, iters=8)
    a = np.asarray(assign_nearest(base[:4000], coarse))
    pq = train_pq(jax.random.PRNGKey(1), base[:4000] - np.asarray(coarse)[a], 16, 4, iters=8)
    iv = ivf.add(ivf.IVFIndex.create(pq, coarse), base)
    d1, l1 = ivf.search_qadc(iv, queries, r=20, ma=4, keep=0.1)
    d2, l2 = search_query_parallel(
        ivf.search_qadc, iv, queries, r=20, ma=4, keep=0.1
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_sharded_recall(setup):
    index, base, queries = setup
    mesh = make_mesh()
    sharded = shard_flat_codes(index, mesh)
    _, gt = exact_knn(queries, base, 1)
    _, labels = search_qadc_flat_sharded(sharded, queries, r=100, keep=0.02, mesh=mesh)
    _, labels_single = flat.search_qadc(index, queries, r=100, keep=0.02)
    rec_sh = recall_at_r(np.asarray(labels), np.asarray(gt))
    rec_single = recall_at_r(np.asarray(labels_single), np.asarray(gt))
    assert rec_sh >= rec_single - 0.05, (rec_sh, rec_single)
