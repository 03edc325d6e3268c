"""2-process jax.distributed integration test (CPU, localhost coordinator).

All other dist tests run ONE process over 8 virtual devices, which cannot
catch process-boundary bugs (host-local arrays fed to shard_map, per-process
shard loading, coordinator setup). Here two real OS processes each own 2 CPU
devices, initialize a jax.distributed group through the QADC_* env-var path
of dist.mesh.maybe_init_distributed, load only their own checkpoint shard,
and run the sharded search over the global 4-device mesh; results must equal
a single-process 4-device mesh run on the same data.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

from qadc_tpu.dist.mesh import make_mesh
from qadc_tpu.dist.sharded_ivf import search_qadc_ivf_sharded, shard_ivf_partitions
from qadc_tpu.index import ivf
from qadc_tpu.io.checkpoint import save_index_sharded
from qadc_tpu.ops.knn import assign_nearest
from qadc_tpu.quantizers.pq import train_pq

R, MA, KEEP = 20, 4, 0.05


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mp")
    rng = np.random.default_rng(21)
    dim, n = 16, 6000
    centers = rng.normal(scale=3.0, size=(8, dim)).astype(np.float32)
    base = (centers[rng.integers(0, 8, n)] + rng.normal(size=(n, dim))).astype(
        np.float32
    )
    queries = (centers[rng.integers(0, 8, 8)] + rng.normal(size=(8, dim))).astype(
        np.float32
    )
    coarse = ivf.train_coarse(jax.random.PRNGKey(0), base[:3000], 8, iters=8)
    a = np.asarray(assign_nearest(base[:3000], coarse))
    pq = train_pq(
        jax.random.PRNGKey(1), base[:3000] - np.asarray(coarse)[a], 16, 4, iters=8
    )
    index = ivf.add(ivf.IVFIndex.create(pq, coarse), base)
    ckpt = str(tmp / "ckpt")
    save_index_sharded(ckpt, index, num_shards=2)
    qfile = str(tmp / "queries.npz")
    np.savez(qfile, queries=queries, r=R, ma=MA, keep=KEEP)
    return index, queries, ckpt, qfile, tmp


def test_two_process_distributed_matches_single_process(built):
    index, queries, ckpt, qfile, tmp = built

    # Expected: single-process 4-device mesh on the same index.
    mesh = make_mesh(4)
    sharded = shard_ivf_partitions(index, mesh)
    d_exp, l_exp = search_qadc_ivf_sharded(
        sharded, queries, r=R, ma=MA, keep=KEEP, mesh=mesh, interpret=True
    )
    d_exp, l_exp = np.asarray(d_exp), np.asarray(l_exp)

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    procs, outs = [], []
    for i in range(2):
        out = str(tmp / f"out_{i}.npz")
        outs.append(out)
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # EXTEND PYTHONPATH (overriding would drop this image's .axon_site).
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env.update(
            QADC_COORDINATOR=f"127.0.0.1:{port}",
            QADC_NUM_PROCESSES="2",
            QADC_PROCESS_ID=str(i),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, ckpt, qfile, out],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    for out in outs:  # every process saw the same replicated global result
        got = np.load(out)
        np.testing.assert_array_equal(got["l"], l_exp)
        np.testing.assert_allclose(got["d"], d_exp, rtol=1e-5, atol=1e-5)


def test_load_sharded_index_single_process(built):
    """load_sharded_index's num_shards==process_count validation + the
    1-process path (shard checkpoint written for 2 shards must be rejected)."""
    from qadc_tpu.dist.sharded_ivf import load_sharded_index

    index, _, ckpt, _, tmp = built
    mesh = make_mesh(4)
    with pytest.raises(ValueError, match="shards"):
        load_sharded_index(ckpt, mesh)  # 2 shards, 1 process

    ckpt1 = str(tmp / "ckpt1")
    save_index_sharded(ckpt1, index, num_shards=1)
    loaded = load_sharded_index(ckpt1, mesh)
    assert loaded.n == index.n
    np.testing.assert_array_equal(
        np.asarray(loaded.part_sizes)[: index.part_count],
        np.asarray(index.part_sizes),
    )
