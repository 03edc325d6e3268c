import threading

import numpy as np
import jax
import pytest

from qadc_tpu.index import flat
from qadc_tpu.quantizers.pq import train_pq
from qadc_tpu.serve import SearchServer


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(4)
    dim, n = 32, 5000
    base = rng.normal(size=(n, dim)).astype(np.float32)
    pq = train_pq(jax.random.PRNGKey(0), base, 16, 4, iters=8)
    index = flat.add(flat.FlatIndex.create(pq), base)
    return index, base


def test_serve_matches_direct(built):
    index, base = built
    queries = base[:10] + 0.01
    with SearchServer(index, r=20, keep=0.05, batch_size=16, max_wait_ms=20) as srv:
        futs = [srv.submit(q) for q in queries]
        results = [f.result(timeout=60) for f in futs]
    d_direct, l_direct = flat.search_qadc(index, queries, r=20, keep=0.05)
    for i, (d, l) in enumerate(results):
        np.testing.assert_array_equal(l, np.asarray(l_direct)[i])


def test_serve_batches_requests(built):
    index, base = built
    with SearchServer(index, r=5, keep=0.05, batch_size=64, max_wait_ms=100) as srv:
        futs = [srv.submit(base[i]) for i in range(32)]
        for f in futs:
            f.result(timeout=60)
        assert srv._batches <= 3  # requests were actually batched


def test_serve_concurrent_callers(built):
    index, base = built
    results = {}
    with SearchServer(index, r=5, keep=0.05, batch_size=16, max_wait_ms=5) as srv:
        def caller(tid):
            futs = [srv.submit(base[tid * 10 + i]) for i in range(10)]
            results[tid] = [f.result(timeout=60)[1][0] for f in futs]

        threads = [threading.Thread(target=caller, args=(t,)) for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    for tid in range(4):
        # each query's own row is its nearest neighbor
        assert results[tid] == [tid * 10 + i for i in range(10)]


def test_serve_rejects_bad_dim(built):
    index, _ = built
    with SearchServer(index, r=5, keep=0.05) as srv:
        with pytest.raises(ValueError, match="dim"):
            srv.submit(np.zeros(7, np.float32))


def test_serve_sharded_search_fn(built):
    """SearchServer over a partition-sharded IVF index via search_fn — the
    multi-chip serving composition (sharded search under the batching
    worker)."""
    from functools import partial

    from qadc_tpu.dist.mesh import make_mesh
    from qadc_tpu.dist.sharded_ivf import (
        search_qadc_ivf_sharded,
        shard_ivf_partitions,
    )
    from qadc_tpu.index import ivf
    from qadc_tpu.ops.knn import assign_nearest

    rng = np.random.default_rng(5)
    dim, n = 32, 4000
    base = rng.normal(size=(n, dim)).astype(np.float32)
    coarse = ivf.train_coarse(jax.random.PRNGKey(1), base, part_count=16, iters=5)
    a = np.asarray(assign_nearest(base, coarse))
    pq = train_pq(jax.random.PRNGKey(2), base - np.asarray(coarse)[a], 16, 4, iters=5)
    index = ivf.add(ivf.IVFIndex.create(pq, coarse), base)

    mesh = make_mesh(8)
    sharded = shard_ivf_partitions(index, mesh)
    fn = partial(
        search_qadc_ivf_sharded, r=20, ma=4, keep=0.05, mesh=mesh, interpret=True
    )
    queries = base[:6] + 0.01
    with SearchServer(
        sharded, batch_size=8, max_wait_ms=20, search_fn=lambda idx, b: fn(idx, b)
    ) as srv:
        futs = [srv.submit(q) for q in queries]
        results = [f.result(timeout=120) for f in futs]
    d_ref, l_ref = fn(sharded, queries)
    for i, (d, l) in enumerate(results):
        np.testing.assert_array_equal(l, np.asarray(l_ref)[i])


def test_serve_survives_transient_failure(built):
    """One failed batch fails only its own futures; the server keeps serving
    (SURVEY §5.3 restartable serving). Only max_consecutive_failures in a
    row close it."""
    index, base = built
    calls = {"n": 0}

    def flaky(idx, batch):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient device error")
        return flat.search_qadc(idx, batch, r=5, keep=0.05)

    with SearchServer(
        index, batch_size=4, max_wait_ms=5, search_fn=flaky,
        max_consecutive_failures=3,
    ) as srv:
        f1 = srv.submit(base[0])
        with pytest.raises(RuntimeError, match="transient"):
            f1.result(timeout=60)
        # Server still alive: next submit succeeds end to end.
        f2 = srv.submit(base[1])
        d, l = f2.result(timeout=60)
        assert l[0] == 1


def test_serve_closes_after_consecutive_failures(built):
    index, base = built

    def always_fail(idx, batch):
        raise RuntimeError("poisoned")

    srv = SearchServer(
        index, batch_size=1, max_wait_ms=1, search_fn=always_fail,
        max_consecutive_failures=2,
    )
    try:
        for _ in range(2):
            f = srv.submit(base[0])
            with pytest.raises(RuntimeError, match="poisoned"):
                f.result(timeout=60)
        # After the streak the server is closed: submit fails fast.
        deadline = __import__("time").monotonic() + 10
        while not srv._closed and __import__("time").monotonic() < deadline:
            __import__("time").sleep(0.01)
        with pytest.raises(RuntimeError, match="closed"):
            srv.submit(base[0])
    finally:
        srv.close()


def test_serve_collects_next_batch_while_executing(built):
    """Double-buffering contract: while the executor is blocked in the device
    call for batch N, the collector stages batch N+1 (serve QPS bounded by
    max(collect, execute), not their sum)."""
    import time

    index, base = built
    in_search = threading.Event()
    release = threading.Event()

    def blocking(idx, batch):
        in_search.set()
        assert release.wait(timeout=30)
        return flat.search_qadc(idx, batch, r=5, keep=0.05)

    with SearchServer(
        index, batch_size=4, max_wait_ms=1, search_fn=blocking
    ) as srv:
        first = srv.submit(base[0])
        assert in_search.wait(timeout=30)
        # Executor is now blocked inside _search. Submit a second wave and
        # give the collector its window: it must stage the next batch.
        in_search.clear()
        later = [srv.submit(base[i]) for i in (1, 2, 3)]
        deadline = time.monotonic() + 10
        while srv._exec_q.empty() and time.monotonic() < deadline:
            time.sleep(0.005)
        assert not srv._exec_q.empty(), "collector did not overlap collection"
        release.set()
        assert first.result(timeout=60)[1][0] == 0
        for i, f in enumerate(later):
            assert f.result(timeout=60)[1][0] == i + 1


def test_serve_restart_from_sharded_checkpoint(built, tmp_path):
    """SURVEY §5.3 restartable serving: kill a server, restart a new one
    from the on-disk sharded checkpoint (per-shard loading), and get
    identical results — the elasticity story the reference lacks."""
    from functools import partial

    from qadc_tpu.dist.mesh import make_mesh
    from qadc_tpu.dist.sharded_ivf import (
        load_sharded_index,
        search_qadc_ivf_sharded,
        shard_ivf_partitions,
    )
    from qadc_tpu.index import ivf
    from qadc_tpu.io.checkpoint import save_index_sharded
    from qadc_tpu.ops.knn import assign_nearest
    from qadc_tpu.quantizers.pq import train_pq

    rng = np.random.default_rng(6)
    dim, n = 32, 4000
    base = rng.normal(size=(n, dim)).astype(np.float32)
    coarse = ivf.train_coarse(jax.random.PRNGKey(1), base, part_count=8, iters=5)
    a = np.asarray(assign_nearest(base, coarse))
    pq = train_pq(jax.random.PRNGKey(2), base - np.asarray(coarse)[a], 16, 4,
                  iters=5)
    index = ivf.add(ivf.IVFIndex.create(pq, coarse), base)

    mesh = make_mesh(4)
    fn = partial(search_qadc_ivf_sharded, r=10, ma=4, keep=0.05, mesh=mesh,
                 interpret=True)
    queries = base[:5] + 0.01

    sharded = shard_ivf_partitions(index, mesh)
    with SearchServer(sharded, batch_size=4, max_wait_ms=10,
                      search_fn=lambda idx, b: fn(idx, b)) as srv:
        before = [srv.submit(q).result(timeout=120) for q in queries]
        # Persist while serving; then the server dies (context exit).
        save_index_sharded(str(tmp_path / "ck"), index, num_shards=1)

    # Restart: a NEW server over the checkpoint, loaded shard-by-shard.
    restored = load_sharded_index(str(tmp_path / "ck"), mesh)
    with SearchServer(restored, batch_size=4, max_wait_ms=10,
                      search_fn=lambda idx, b: fn(idx, b)) as srv2:
        after = [srv2.submit(q).result(timeout=120) for q in queries]
    for (d0, l0), (d1, l1) in zip(before, after):
        np.testing.assert_array_equal(l0, l1)
        np.testing.assert_allclose(d0, d1, rtol=1e-6)
