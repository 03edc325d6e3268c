"""Benchmark: Quick-ADC on one TPU chip — prints ONE JSON line.

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Headline metric: code-query pairs scanned per second by the Pallas LUT-scan
kernel on the flagship config (SIFT1M-scale: 1M codes, 16x4 PQ = 8-byte codes,
128-query batch, window-16 reduction) — the TPU analog of the reference's scan
phase. Baseline: the reference's AVX2 scan rate derived from its published
IVF-256 SIFT1M numbers (README.md:329-330): scan 86 us/query over ma=24
partitions of ~3906 codes => ~93,750 codes / 86 us = 1.09e9 cq pairs/s.

detail carries the BASELINE.md scorecard: IVF-256 ma=24 r=100 end-to-end
us/query at batch 128/32/1 (reference total: ~120 us/query), speed-of-light
ratios (HBM byte-bound and int8-MXU formulation-bound), and PARITY-GRADE
recall@100 at 1M on the SIFT-moment-matched generator (flat 8x8, IVF 8x8,
IVF 16x4 rerank/no-rerank — the reference's published table shape,
README.md:277-330) plus QPS on the trained index.

Stages run independently: a crashing stage records {stage, error, tail}
under detail.stage_errors and every completed stage's numbers still emit
(round-4 postmortem — one crash must not vaporize the scorecard).

Timing is honest under the axon relay: iterations run in a device-side
fori_loop chained through a scalar tap (data dependence), a scalar readback
fences the call, and per-iteration time is the SLOPE over two chain lengths
long enough that device time dwarfs the relay RTT — short unrolled chains
measured up to 40% fast because the relay overlaps dispatch with execution
(see qadc_tpu/eval/timing.py:fori_slope_seconds).
"""

import json

import numpy as np

from qadc_tpu.eval.timing import fori_slope_percentiles, fori_slope_seconds

REFERENCE_SCAN_CQ_PER_S = 93_750 / 86e-6  # ~1.09e9, README.md:329-330
HBM_GBPS = 819.0          # v5e
MXU_INT8_TOPS = 394.0     # v5e


def _bench_kernel(rng):
    """Flat 4-bit LUT-scan kernel: 1M codes x 128 queries, production path.

    Round 5: the production flat scan is the tq plane-major kernel
    (kernels/lut_scan.py:lut_scan_tq — zero expansion matmuls; 63% of the
    int8-MXU formulation bound vs the row128 kernel's 40%).
    """
    import jax
    import jax.numpy as jnp
    from qadc_tpu.kernels.lut_scan import (
        build_scan_tables_tq, lut_scan_tq, pick_block_n_tq, to_planes,
    )

    n, m, q = 1_048_576, 16, 128
    codes = jnp.asarray(rng.integers(0, 256, size=(n // 16, 128), dtype=np.uint8))
    qtables = jnp.asarray(rng.integers(0, 127, size=(q, m, 16)).astype(np.int8))
    tcat = build_scan_tables_tq(qtables)
    bn = pick_block_n_tq(n)
    planes = to_planes(codes, 8, bn)

    def body(args, tap):
        planes_, tcat_ = args
        d = (tap.astype(jnp.int32) & 1).astype(jnp.int8)
        vals = lut_scan_tq(planes_, tcat_ + d, cb=8, block_n=bn)
        return vals[0, 0].astype(jnp.float32)

    dt = fori_slope_seconds(body, (planes, tcat), k_lo=30, k_hi=150)
    return n, q, m, dt


def _make_ivf(rng):
    import jax.numpy as jnp
    from qadc_tpu.index.ivf import IVFIndex
    from qadc_tpu.quantizers.pq import ProductQuantizer

    dim, parts, part_pad, m = 128, 256, 4096, 16
    pq = ProductQuantizer(
        centroids=jnp.asarray(rng.normal(size=(m, 16, dim // m)).astype(np.float32)),
        sq_bits=4,
    )
    return IVFIndex(
        pq=pq,
        coarse_centroids=jnp.asarray(rng.normal(size=(parts, dim)).astype(np.float32)),
        codes=jnp.asarray(
            rng.integers(0, 256, size=(parts, part_pad // 16, 128), dtype=np.uint8)
        ),
        labels=jnp.asarray(
            np.arange(parts * part_pad, dtype=np.int32).reshape(parts, part_pad)
        ),
        part_sizes=jnp.asarray(np.full((parts,), 3906, np.int32)),
        n=parts * 3906,
        max_part_size=3906,
    ).with_planes()


def _bench_ivf_e2e(rng, index, batch, k_lo=20, k_hi=100):
    """Full IVF Quick-ADC search us/query (SIFT1M geometry, given batch).

    Reference: IVF-256 SIFT1M OPQ 16x4 Quick ADC ma=24 totals ~120 us/query
    (index 7 + rotate 13 + table 14 + scan 86, README.md:329-330; batch 32).
    b=1 auto-selects the direct low-latency path (index/ivf.py).
    """
    import jax.numpy as jnp
    from qadc_tpu.index import ivf

    queries = jnp.asarray(rng.normal(size=(batch, 128)).astype(np.float32))

    def body(args, tap):
        idx, qs = args
        d, _ = ivf.search_qadc(idx, qs + tap * 1e-12, r=100, ma=24, keep=0.005)
        return d.sum()

    dt = fori_slope_seconds(body, (index, queries), k_lo=k_lo, k_hi=k_hi)
    return dt * 1e6 / batch


def _bench_ivf_percentiles(rng, index, batch, k_lo, k_hi, trials: int = 20):
    """p50/p90/p99 us/query via per-trial slope pairs (eval.timing)."""
    import jax.numpy as jnp
    from qadc_tpu.index import ivf

    queries = jnp.asarray(rng.normal(size=(batch, 128)).astype(np.float32))

    def body(args, tap):
        idx, qs = args
        d, _ = ivf.search_qadc(idx, qs + tap * 1e-12, r=100, ma=24, keep=0.005)
        return d.sum()

    pct = fori_slope_percentiles(
        body, (index, queries), k_lo=k_lo, k_hi=k_hi, trials=trials
    )
    return {k: v * 1e6 / batch for k, v in pct.items()}


def _make_ivf8(rng):
    """Synthetic IVF with an 8x8 PQ (timing only — tables random)."""
    import jax.numpy as jnp
    from qadc_tpu.index.ivf import IVFIndex
    from qadc_tpu.quantizers.pq import ProductQuantizer

    dim, parts, part_pad, m = 128, 256, 4096, 8
    pq = ProductQuantizer(
        centroids=jnp.asarray(
            rng.normal(size=(m, 256, dim // m)).astype(np.float32)
        ),
        sq_bits=8,
    )
    return IVFIndex(
        pq=pq,
        coarse_centroids=jnp.asarray(rng.normal(size=(parts, dim)).astype(np.float32)),
        codes=jnp.asarray(
            rng.integers(0, 256, size=(parts, part_pad // 16, 128), dtype=np.uint8)
        ),
        labels=jnp.asarray(
            np.arange(parts * part_pad, dtype=np.int32).reshape(parts, part_pad)
        ),
        part_sizes=jnp.asarray(np.full((parts,), 3906, np.int32)),
        n=parts * 3906,
        max_part_size=3906,
    ).with_planes()


def _bench_ivf_adc(rng, index, batch, k_lo=10, k_hi=50):
    """Conventional (float) ADC IVF e2e us/query at SIFT1M geometry.

    Reference totals (README.md:277-301): IVF-256 OPQ 8x8 ADC ma=24 ~388
    us/query; 4-bit scan_4 has no published IVF total (compare vs 388 too).
    """
    import jax.numpy as jnp
    from qadc_tpu.index import ivf

    queries = jnp.asarray(rng.normal(size=(batch, 128)).astype(np.float32))

    def body(args, tap):
        idx, qs = args
        d, _ = ivf.search_adc(idx, qs + tap * 1e-12, r=100, ma=24)
        return d.sum()

    dt = fori_slope_seconds(body, (index, queries), k_lo=k_lo, k_hi=k_hi)
    return dt * 1e6 / batch


def _bench_recall_parity(rng):
    """Parity-grade recall at 1M: the reference's published table shape.

    SIFT-moment-matched generator (qadc_tpu/eval/synth.py — the same one
    benchmarks/recall_curves.py uses; the old latent-Gaussian synthetic sat
    at 0.59-0.72 recall, unreadable against the reference's 0.94 regime).
    Anchors (reference README.md:277-330, SIFT1M R=100, OPQ):
      flat 8x8 ADC 0.9419; IVF-256 8x8 ADC ma=24 0.9646;
      IVF-256 16x4 Quick-ADC ma=24 keep=0.213% 0.9426 (delta +0.022).
    Also returns QPS at b=128 on the trained 16x4 IVF index.
    """
    import jax
    import jax.numpy as jnp

    from qadc_tpu.eval.recall import recall_at_r
    from qadc_tpu.eval.synth import sift_moment_like
    from qadc_tpu.index import flat, ivf
    from qadc_tpu.ops.knn import assign_nearest, exact_knn
    from qadc_tpu.quantizers.opq import train_opq

    import os

    n = int(os.environ.get("QADC_BENCH_RECALL_N", "1000000"))
    nq, r, ma = 128, 100, 24
    base, queries = sift_moment_like(rng, n, nq=nq)
    learn = base[: min(100_000, n)]
    _, gt = exact_knn(queries, base, 1)
    gt = np.asarray(gt)

    def batched(search_fn, bs=32):
        outs = []
        for s in range(0, nq, bs):
            _, lab = search_fn(jnp.asarray(queries[s : s + bs]))
            outs.append(np.asarray(lab))
        return np.concatenate(outs)

    out = {}
    opq88 = train_opq(jax.random.PRNGKey(0), learn, 8, 8,
                      opq_iters=6, kmeans_iters=12)
    f88 = flat.add(flat.FlatIndex.create(opq88), base)
    out["recall_flat_8x8_adc"] = recall_at_r(
        batched(lambda q: flat.search_adc(f88, q, r=r)), gt
    )
    del f88

    coarse = ivf.train_coarse(jax.random.PRNGKey(2), learn, 256, iters=25,
                              balance_cap=3.0)
    a = np.asarray(assign_nearest(learn, coarse))
    residuals = learn - np.asarray(coarse)[a]
    r88 = train_opq(jax.random.PRNGKey(3), residuals, 8, 8,
                    opq_iters=6, kmeans_iters=12)
    r164 = train_opq(jax.random.PRNGKey(4), residuals, 16, 4,
                     opq_iters=6, kmeans_iters=12)
    i88 = ivf.add(ivf.IVFIndex.create(r88, coarse), base)
    out["recall_ivf256_8x8_adc_ma24"] = recall_at_r(
        batched(lambda q: ivf.search_adc(i88, q, r=r, ma=ma)), gt
    )
    del i88
    i164 = ivf.add(ivf.IVFIndex.create(r164, coarse), base)
    keep0 = 0.00213 * 4  # reference -k 0.213 is % of N; per-partition here
    out["recall_ivf256_16x4_qadc_ma24"] = recall_at_r(
        batched(lambda q: ivf.search_qadc(i164, q, r=r, ma=ma, keep=keep0)),
        gt,
    )
    out["recall_ivf256_16x4_qadc_ma24_norerank"] = recall_at_r(
        batched(
            lambda q: ivf.search_qadc(i164, q, r=r, ma=ma, keep=keep0,
                                      rerank=False)
        ),
        gt,
    )
    # The parity anchor is the reference's own published 4-bit cost:
    # 0.9646 - 0.9426 = +0.022 (README.md:300,329).
    out["recall_ivf_4bit_delta"] = (
        out["recall_ivf256_8x8_adc_ma24"]
        - out["recall_ivf256_16x4_qadc_ma24"]
    )
    out["recall_reference_4bit_delta"] = 0.022
    out["recall_base_n"] = n

    qd = jnp.asarray(queries)

    def body(args, tap):
        idx, qs = args
        dd, _ = ivf.search_qadc(idx, qs + tap * 1e-12, r=r, ma=ma, keep=keep0)
        return dd.sum()

    dt = fori_slope_seconds(body, (i164, qd), k_lo=20, k_hi=100)
    out["trained_ivf_qps_per_chip_b128"] = nq / dt
    return out


def _require_device(timeout_s: float = 180.0):
    """Fail fast (with one JSON line) if the TPU backend can't initialize.

    The dev relay tunneling the TPU can die in a mode where backend init
    HANGS rather than erroring; a benchmark that hangs forever records
    nothing. Probe jax.devices() in a daemon thread and report an explicit
    error JSON if it neither returns nor raises within the timeout.
    """
    import threading

    result = {}

    def probe():
        try:
            import jax

            result["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001 — reported, not swallowed
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    err = result.get("error") if result else (
        f"backend init hung > {timeout_s:.0f}s (TPU relay unreachable)"
    )
    if err:
        print(
            json.dumps(
                {
                    "metric": "qadc4_scan_throughput_1Mcodes_q128",
                    "value": 0,
                    "unit": "code-query pairs/s/chip",
                    "vs_baseline": 0,
                    "detail": {
                        "error": err,
                        # NOT this run's numbers — the last hardware-captured
                        # scorecard, for context only (benchmarks/RESULTS.md
                        # has the full record and date).
                        "last_hardware_scorecard_STALE": {
                            "date": "2026-08-17",
                            "scan_cq_per_s": 300.6e9,
                            "scan_vs_reference": 276.0,
                            "ivf256_ma24_r100_us_b128": 18.4,
                            "ivf256_ma24_r100_us_b32": 38.3,
                            "ivf256_ma24_r100_us_b1": 97.6,
                            "reference_total_us": 120.0,
                            "note": "measured before the relay outage; "
                            "~15 perf commits since are unmeasured",
                        },
                    },
                }
            )
        )
        raise SystemExit(1)


def main():
    _require_device()
    import sys
    import time
    import traceback

    import jax

    rng = np.random.default_rng(0)
    detail = {}
    errors = {}

    def stage(name, fn):
        """Run one bench stage; a failure records {stage, error, tail} in
        detail["stage_errors"] instead of vaporizing earlier stages'
        numbers (round-4 postmortem: one b=1 crash destroyed the whole
        run's scorecard — bench must degrade, not die)."""
        t0 = time.time()
        try:
            out = fn()
            print(f"bench stage {name}: ok ({time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
            return out
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed
            tail = traceback.format_exc().splitlines()[-3:]
            errors[name] = {
                "error": f"{type(e).__name__}: {str(e)[:300]}",
                "tail": tail,
            }
            print(f"bench stage {name}: FAIL {type(e).__name__} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
            return None

    cq_per_s = 0.0
    kr = stage("kernel", lambda: _bench_kernel(rng))
    if kr is not None:
        n, q, m, dt = kr
        cq_per_s = n * q / dt
        # Speed-of-light ratios. HBM-bound: scan reads n*cb bytes once per
        # query batch => cb bytes/code. Formulation-bound: one-hot ADC needs
        # K=2*16*cb int8 MACs per code-query pair on the MXU.
        sol_hbm_s = n * (m // 2) / (HBM_GBPS * 1e9)
        sol_mxu_s = 2.0 * n * q * (2 * 16 * (m // 2)) / (MXU_INT8_TOPS * 1e12)
        detail.update({
            "scan_ms_per_1M_codes_q128": dt * 1e3,
            "us_per_query_per_1M_codes": dt * 1e6 / q,
            "codes_GBps": n * (m // 2) / dt / 1e9,
            "pct_of_hbm_byte_SoL": 100.0 * sol_hbm_s / dt,
            "pct_of_int8_mxu_formulation_SoL": 100.0 * sol_mxu_s / dt,
        })

    ivf_index = stage("make_ivf", lambda: _make_ivf(rng))
    if ivf_index is not None:
        r = stage("ivf_b128", lambda: _bench_ivf_e2e(rng, ivf_index, 128))
        if r is not None:
            detail["ivf256_ma24_r100_us_per_query_e2e"] = r
            detail["ivf_vs_reference_total_120us"] = 120.0 / r
        r = stage("ivf_b32", lambda: _bench_ivf_e2e(rng, ivf_index, 32))
        if r is not None:
            detail["ivf256_ma24_r100_us_per_query_b32"] = r
            detail["ivf_b32_vs_reference_total_120us"] = 120.0 / r
        r = stage("ivf_b1", lambda: _bench_ivf_e2e(
            rng, ivf_index, 1, k_lo=100, k_hi=500))
        if r is not None:
            detail["ivf256_ma24_r100_us_per_query_b1"] = r
        # Percentiles (BASELINE asks p50): per-trial slopes at b=1 and b=32.
        r = stage("ivf_b1_pct", lambda: _bench_ivf_percentiles(
            rng, ivf_index, 1, k_lo=100, k_hi=300))
        if r is not None:
            detail["ivf_b1_p50_us"] = r["p50"]
            detail["ivf_b1_p99_us"] = r["p99"]
        r = stage("ivf_b32_pct", lambda: _bench_ivf_percentiles(
            rng, ivf_index, 32, k_lo=20, k_hi=60))
        if r is not None:
            detail["ivf_b32_p50_us"] = r["p50"]
            detail["ivf_b32_p99_us"] = r["p99"]
        r = stage("adc4_b32", lambda: _bench_ivf_adc(rng, ivf_index, 32))
        if r is not None:
            detail["ivf256_ma24_adc4_us_per_query_b32"] = r
    r = stage("adc8_b32", lambda: _bench_ivf_adc(rng, _make_ivf8(rng), 32))
    if r is not None:
        detail["ivf256_ma24_adc8_us_per_query_b32"] = r
        detail["ivf_adc8_vs_reference_total_388us"] = 388.0 / r

    r = stage("recall_parity_1M", lambda: _bench_recall_parity(
        np.random.default_rng(7)))
    if r is not None:
        detail.update(r)

    if errors:
        detail["stage_errors"] = errors
    detail["backend"] = jax.default_backend()
    detail["timing"] = ("device-side fori_loop chain, slope-fit "
                        "(relay fixed cost cancelled)")
    print(
        json.dumps(
            {
                "metric": "qadc4_scan_throughput_1Mcodes_q128",
                "value": cq_per_s,
                "unit": "code-query pairs/s/chip",
                "vs_baseline": cq_per_s / REFERENCE_SCAN_CQ_PER_S,
                "detail": detail,
            }
        )
    )
    # Partial-success contract: exit 0 if ANY numeric stage landed — the
    # driver must receive whatever was measured; nonzero only when nothing
    # could be (e.g. the backend died before the first stage finished).
    if errors and not detail.get("scan_ms_per_1M_codes_q128") and not any(
        k.startswith("ivf") or k.startswith("recall") for k in detail
    ):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
