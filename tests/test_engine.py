import numpy as np
import jax
import pytest

from qadc_tpu.engine import QueryEngine
from qadc_tpu.index import flat, ivf
from qadc_tpu.quantizers.pq import train_pq
from qadc_tpu.ops.knn import exact_knn, assign_nearest
from qadc_tpu.eval.recall import recall_at_r


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(2)
    dim, n = 32, 6000
    centers = rng.normal(scale=3.0, size=(10, dim)).astype(np.float32)
    base = (centers[rng.integers(0, 10, n)] + rng.normal(size=(n, dim))).astype(np.float32)
    queries = (centers[rng.integers(0, 10, 21)] + rng.normal(size=(21, dim))).astype(np.float32)
    pq = train_pq(jax.random.PRNGKey(0), base, 16, 4, iters=10)
    index = flat.add(flat.FlatIndex.create(pq), base)
    _, gt = exact_knn(queries, base, 1)
    return index, base, queries, np.asarray(gt)


def test_engine_flat_qadc(built):
    index, base, queries, gt = built
    engine = QueryEngine(index, r=100, keep=0.05, adc_type="qadc", batch_size=8)
    d, l, metrics = engine.run(queries, with_metrics=True)
    assert d.shape == (21, 100) and l.shape == (21, 100)  # tail batch unpadded
    assert recall_at_r(l, gt) > 0.85
    avg = metrics.averaged()
    # Cumulative-difference attribution: scan strictly positive; front phases
    # can difference to 0 at this tiny scale (sub-noise on CPU), never below.
    assert avg.scan_us > 0 and avg.table_us >= 0 and avg.rotate_us >= 0
    row = metrics.csv_row()
    assert len(row.split(",")) == 4


def test_engine_ivf_adc(built):
    _, base, queries, gt = built
    coarse = ivf.train_coarse(jax.random.PRNGKey(1), base, 8, iters=5)
    a = np.asarray(assign_nearest(base, coarse))
    pq = train_pq(jax.random.PRNGKey(2), base - np.asarray(coarse)[a], 8, 8, iters=8)
    iv = ivf.add(ivf.IVFIndex.create(pq, coarse), base)
    engine = QueryEngine(iv, r=100, ma=4, adc_type="adc", batch_size=8)
    d, l, metrics = engine.run(queries, with_metrics=True)
    assert recall_at_r(l, gt) > 0.8
    assert metrics.averaged().index_us > 0


def test_engine_rejects_qadc_on_8bit(built):
    _, base, _, _ = built
    pq = train_pq(jax.random.PRNGKey(3), base, 8, 8, iters=3)
    index = flat.add(flat.FlatIndex.create(pq), base)
    with pytest.raises(ValueError, match="sq_bits"):
        QueryEngine(index, adc_type="qadc")
    with pytest.raises(ValueError, match="adc_type"):
        QueryEngine(index, adc_type="bogus")


def test_engine_no_metrics_mode(built):
    index, _, queries, _ = built
    engine = QueryEngine(index, r=10, keep=0.05, batch_size=32)
    d, l, metrics = engine.run(queries)  # default: no measurement overhead
    assert metrics.count == 0
    assert d.shape == (21, 10)
