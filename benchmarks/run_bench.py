"""Benchmark suite: the BASELINE.md configs on synthetic SIFT-like data.

Produces the SURVEY §6 north-star metrics:
  - code-query pairs scanned /s/chip (flat 4-bit kernel)
  - QPS at recall@100 (flat + IVF, Quick ADC)
  - per-query latency at batch sizes 1..512
  - query-parallel scaling over available devices

Run: python benchmarks/run_bench.py [--small]
Timing is honest under the axon relay (dependency-chained, scalar readback).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def timed_chain(fn, args_fn, iters=5):
    """Honest amortized seconds/call: chain iterations via a scalar tap."""
    import jax

    out = fn(*args_fn(0.0))
    tap = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for i in range(iters):
        out = fn(*args_fn(tap * 1e-12))
        tap = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / iters


def make_data(rng, n, dim, nq, n_centers=256):
    centers = rng.normal(scale=2.0, size=(n_centers, dim)).astype(np.float32)
    base = (
        centers[rng.integers(0, n_centers, n)]
        + rng.normal(size=(n, dim)).astype(np.float32) * 0.7
    )
    queries = (
        centers[rng.integers(0, n_centers, nq)]
        + rng.normal(size=(nq, dim)).astype(np.float32) * 0.7
    )
    return base.astype(np.float32), queries.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from qadc_tpu.eval.recall import recall_at_r
    from qadc_tpu.index import flat, ivf
    from qadc_tpu.ops.knn import assign_nearest, exact_knn
    from qadc_tpu.quantizers.pq import train_pq

    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="small shapes (CI)")
    ap.add_argument("--json", action="store_true", help="JSON lines output")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n = 100_000 if args.small else 1_000_000
    dim = 64 if args.small else 128
    nq = 128
    results = {}

    base, queries = make_data(rng, n, dim, nq)
    _, gt = exact_knn(queries, base, 1)
    gt = np.asarray(gt)

    pq = train_pq(jax.random.PRNGKey(0), base[:100_000], 16, 4, iters=25)
    findex = flat.add(flat.FlatIndex.create(pq), base)

    # --- flat Quick ADC
    keep = max(2 * 100 / n, 0.002)
    d, l = flat.search_qadc(findex, queries, r=100, keep=keep)
    results["flat_qadc_recall@100"] = recall_at_r(np.asarray(l), gt)

    qd = jnp.asarray(queries)

    def run_flat(eps):
        return flat.search_qadc(findex, qd + eps, r=100, keep=keep)

    dt = timed_chain(run_flat, lambda eps: (eps,))
    results["flat_qadc_us_per_query"] = dt * 1e6 / nq
    results["flat_qadc_qps_per_chip"] = nq / dt
    results["flat_scan_code_queries_per_s"] = n * nq / dt

    # --- flat float ADC (reference baseline path)
    def run_flat_adc(eps):
        return flat.search_adc(findex, qd + eps, r=100)

    d, l = run_flat_adc(0.0)
    results["flat_adc_recall@100"] = recall_at_r(np.asarray(l), gt)
    dt = timed_chain(run_flat_adc, lambda eps: (eps,))
    results["flat_adc_us_per_query"] = dt * 1e6 / nq

    # --- IVF-256 Quick ADC (the reference's headline config)
    parts = 64 if args.small else 256
    coarse = ivf.train_coarse(jax.random.PRNGKey(1), base[:100_000], parts, iters=25)
    a = np.asarray(assign_nearest(base[:100_000], coarse))
    pq_r = train_pq(
        jax.random.PRNGKey(2), base[:100_000] - np.asarray(coarse)[a], 16, 4, iters=25
    )
    iindex = ivf.add(ivf.IVFIndex.create(pq_r, coarse), base)
    ma = 24
    keep_ivf = 0.005 if not args.small else 0.02

    d, l = ivf.search_qadc(iindex, queries, r=100, ma=ma, keep=keep_ivf)
    results["ivf_qadc_recall@100"] = recall_at_r(np.asarray(l), gt)

    def run_ivf(eps):
        return ivf.search_qadc(iindex, qd + eps, r=100, ma=ma, keep=keep_ivf)

    dt = timed_chain(run_ivf, lambda eps: (eps,))
    results["ivf_qadc_us_per_query"] = dt * 1e6 / nq
    results["ivf_qadc_qps_per_chip"] = nq / dt

    # Reference comparison (README.md:329-330: total ~120us/query, scan 86us)
    results["vs_reference_ivf_total_120us"] = 120.0 / results["ivf_qadc_us_per_query"]

    if args.json:
        print(json.dumps(results))
    else:
        for k, v in results.items():
            print(f"{k:40s} {v:,.3f}")


if __name__ == "__main__":
    main()
