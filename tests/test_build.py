"""Streaming builders (index/build.py): chunked ingest == one-shot add."""

import numpy as np
import jax
import pytest

from qadc_tpu.index import flat, ivf
from qadc_tpu.index.build import FlatBuilder, IVFBuilder
from qadc_tpu.quantizers.pq import train_pq
from qadc_tpu.ops.knn import assign_nearest


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    dim, n = 32, 12000
    base = rng.normal(size=(n, dim)).astype(np.float32)
    coarse = ivf.train_coarse(jax.random.PRNGKey(0), base[:4000], 12, iters=8)
    a = np.asarray(assign_nearest(base[:4000], coarse))
    pq = train_pq(
        jax.random.PRNGKey(1), base[:4000] - np.asarray(coarse)[a], 16, 4, iters=8
    )
    return base, coarse, pq


def test_ivf_builder_matches_oneshot(data):
    base, coarse, pq = data
    one = ivf.add(ivf.IVFIndex.create(pq, coarse), base)

    b = IVFBuilder(pq, coarse)
    for s in range(0, base.shape[0], 2500):  # uneven chunks
        b.add(base[s : s + 2500])
    streamed = b.finalize()

    assert streamed.n == one.n
    np.testing.assert_array_equal(
        np.asarray(streamed.part_sizes), np.asarray(one.part_sizes)
    )
    assert streamed.part_pad == one.part_pad
    np.testing.assert_array_equal(np.asarray(streamed.codes), np.asarray(one.codes))
    np.testing.assert_array_equal(np.asarray(streamed.labels), np.asarray(one.labels))


def test_ivf_builder_resume_from_index(data):
    base, coarse, pq = data
    first = ivf.add(ivf.IVFIndex.create(pq, coarse), base[:7000])
    b = IVFBuilder.from_index(first)
    b.add(base[7000:])
    resumed = b.finalize()
    full = ivf.add(ivf.IVFIndex.create(pq, coarse), base)
    np.testing.assert_array_equal(
        np.asarray(resumed.part_sizes), np.asarray(full.part_sizes)
    )
    np.testing.assert_array_equal(np.asarray(resumed.codes), np.asarray(full.codes))
    np.testing.assert_array_equal(np.asarray(resumed.labels), np.asarray(full.labels))


def test_ivf_builder_geometric_growth(data):
    """Capacity only doubles; appends never rewrite existing rows' content."""
    base, coarse, pq = data
    b = IVFBuilder(pq, coarse)
    caps = []
    for s in range(0, base.shape[0], 1000):
        b.add(base[s : s + 1000])
        caps.append(b.cap)
    assert all(c2 >= c1 for c1, c2 in zip(caps, caps[1:]))
    assert all((c & (c - 1)) == 0 for c in caps)  # powers of two


def test_flat_builder_matches_oneshot(data):
    base, _, pq = data
    one = flat.add(flat.FlatIndex.create(pq), base)
    b = FlatBuilder(pq)
    for s in range(0, base.shape[0], 3000):
        b.add(base[s : s + 3000])
    streamed = b.finalize()
    assert streamed.n == one.n
    np.testing.assert_array_equal(np.asarray(streamed.codes), np.asarray(one.codes))


def test_repad_rejects_lossy_target(data):
    """repad_partitions must refuse a part_pad that would drop real codes
    (or one not PART_ALIGN-aligned) instead of silently duplicating tails."""
    from qadc_tpu.index.build import repad_partitions
    from qadc_tpu.index.ivf import PART_ALIGN

    base, coarse, pq = data
    index = ivf.add(ivf.IVFIndex.create(pq, coarse), base)
    with pytest.raises(ValueError, match="multiple"):
        repad_partitions(index, PART_ALIGN + 1)
    small = (index.max_part_size - 1) // PART_ALIGN * PART_ALIGN
    if small >= PART_ALIGN:
        with pytest.raises(ValueError, match="drop"):
            repad_partitions(index, small)
