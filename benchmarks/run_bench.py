"""Benchmark suite: the BASELINE.md configs on synthetic SIFT-like data.

Produces the SURVEY §6 north-star metrics:
  - code-query pairs scanned /s/chip (flat 4-bit kernel)
  - QPS at recall@100 (flat + IVF, Quick ADC)
  - per-query latency at batch sizes 1..512
  - query-parallel scaling over available devices

Run: python benchmarks/run_bench.py [--small]
Timing: slope-fit over two in-jit chain lengths (eval/timing.py) — the axon
relay charges ~8 ms fixed per jit call, which the slope cancels.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from qadc_tpu.eval.timing import slope_seconds


def timed_chain(search, index, queries, k_lo=4, k_hi=16, iters=3):
    """Honest seconds per search call: slope over two in-jit chain lengths.

    search: (index, queries) -> (dists, labels), jittable.
    """
    import jax
    import jax.numpy as jnp

    def time_call(k):
        @jax.jit
        def chained(idx, qs):
            tap = jnp.float32(0)
            for _ in range(k):
                d, _ = search(idx, qs + tap * 1e-12)
                tap = d.sum()
            return tap

        _ = float(chained(index, queries))
        t0 = time.time()
        for _ in range(iters):
            _ = float(chained(index, queries))
        return (time.time() - t0) / iters

    return slope_seconds(time_call, k_lo=k_lo, k_hi=k_hi)


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
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (env vars are too late on this image)",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

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

    dt = timed_chain(
        lambda idx, qs: flat.search_qadc(idx, qs, r=100, keep=keep), findex, qd
    )
    results["flat_qadc_us_per_query"] = dt * 1e6 / nq
    results["flat_qadc_qps_per_chip"] = nq / dt
    results["flat_scan_code_queries_per_s"] = n * nq / dt

    # --- flat float ADC (reference baseline path)
    d, l = flat.search_adc(findex, qd, r=100)
    results["flat_adc_recall@100"] = recall_at_r(np.asarray(l), gt)
    dt = timed_chain(
        lambda idx, qs: flat.search_adc(idx, qs, r=100), findex, qd
    )
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

    run_ivf = lambda idx, qs: ivf.search_qadc(idx, qs, r=100, ma=ma, keep=keep_ivf)
    dt = timed_chain(run_ivf, iindex, qd)
    results["ivf_qadc_us_per_query"] = dt * 1e6 / nq
    results["ivf_qadc_qps_per_chip"] = nq / dt

    # Reference comparison (README.md:329-330: total ~120us/query, scan 86us)
    results["vs_reference_ivf_total_120us"] = 120.0 / results["ivf_qadc_us_per_query"]

    # --- 4-bit conventional ADC, IVF (reference scan_4 via db_query; grouped
    # float kernel, exact f32 distances, 2r-margin window screen)
    d, l = ivf.search_adc(iindex, queries, r=100, ma=ma)
    results["ivf_adc4_recall@100"] = recall_at_r(np.asarray(l), gt)
    dt = timed_chain(
        lambda idx, qs: ivf.search_adc(idx, qs, r=100, ma=ma), iindex, qd
    )
    results["ivf_adc4_us_per_query"] = dt * 1e6 / nq

    # --- 8-bit conventional ADC (reference's published comparisons:
    # flat 8x8 scan 2594 us/query, IVF-256 8x8 ma=24 total 388 us/query,
    # README.md:277-278,300-301)
    pq8 = train_pq(jax.random.PRNGKey(3), base[:100_000], dim // 8, 8, iters=15)
    findex8 = flat.add(flat.FlatIndex.create(pq8), base)
    d, l = flat.search_adc(findex8, qd, r=100)
    results["flat_adc8_recall@100"] = recall_at_r(np.asarray(l), gt)
    dt = timed_chain(
        lambda idx, qs: flat.search_adc(idx, qs, r=100), findex8, qd
    )
    results["flat_adc8_us_per_query"] = dt * 1e6 / nq
    results["vs_reference_flat_adc8_2594us"] = (
        2594.0 / results["flat_adc8_us_per_query"]
    )

    pq8_r = train_pq(
        jax.random.PRNGKey(4), base[:100_000] - np.asarray(coarse)[a],
        dim // 8, 8, iters=15,
    )
    iindex8 = ivf.add(ivf.IVFIndex.create(pq8_r, coarse), base)
    d, l = ivf.search_adc(iindex8, queries, r=100, ma=ma)
    results["ivf_adc8_recall@100"] = recall_at_r(np.asarray(l), gt)
    dt = timed_chain(
        lambda idx, qs: ivf.search_adc(idx, qs, r=100, ma=ma), iindex8, qd
    )
    results["ivf_adc8_us_per_query"] = dt * 1e6 / nq
    results["vs_reference_ivf_adc8_388us"] = (
        388.0 / results["ivf_adc8_us_per_query"]
    )
    # jnp (non-grouped) path for the A/B — the one-hot einsum materializes
    # ~6-10 GB/batch of f32 at full geometry; guard so an OOM doesn't abort
    # the rest of the sweep.
    try:
        dt = timed_chain(
            lambda idx, qs: ivf.search_adc(idx, qs, r=100, ma=ma, grouped=False),
            iindex8, qd,
        )
        results["ivf_adc8_jnp_us_per_query"] = dt * 1e6 / nq
    except Exception as e:  # noqa: BLE001 — record instead of aborting
        results["ivf_adc8_jnp_us_per_query"] = float("nan")
        print(f"# adc8 jnp A/B skipped: {type(e).__name__}", flush=True)

    # --- per-query latency vs batch size (reference's -b flag; b=1 is its
    # default engine, b=32 its published config)
    for b in (1, 32, 128, 512):
        qb = jnp.asarray(
            np.tile(queries, (-(-b // nq), 1))[:b]
        )
        k_lo, k_hi = (16, 96) if b == 1 else (4, 16)
        dtb = timed_chain(run_ivf, iindex, qb, k_lo=k_lo, k_hi=k_hi)
        results[f"ivf_qadc_us_per_query_b{b}"] = dtb * 1e6 / b

    if args.json:
        print(json.dumps(results))
    else:
        for k, v in results.items():
            print(f"{k:40s} {v:,.3f}")


if __name__ == "__main__":
    main()
