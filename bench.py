"""Benchmark: Quick-ADC on one TPU chip — prints ONE JSON line.

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Headline metric: code-query pairs scanned per second by the Pallas LUT-scan
kernel on the flagship config (SIFT1M-scale: 1M codes, 16x4 PQ = 8-byte codes,
128-query batch, window-16 reduction) — the TPU analog of the reference's scan
phase. Baseline: the reference's AVX2 scan rate derived from its published
IVF-256 SIFT1M numbers (README.md:329-330): scan 86 us/query over ma=24
partitions of ~3906 codes => ~93,750 codes / 86 us = 1.09e9 cq pairs/s.

detail carries the BASELINE.md scorecard: IVF-256 ma=24 r=100 end-to-end
us/query at batch 128/32/1 (reference total: ~120 us/query), QPS and
recall@100 on a trained synthetic corpus, and speed-of-light ratios (HBM
byte-bound and int8-MXU formulation-bound).

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
    """Flat 4-bit LUT-scan kernel: 1M codes x 128 queries, production path."""
    import jax
    import jax.numpy as jnp
    from qadc_tpu.kernels.lut_scan import (
        build_scan_tables, lut_scan_reduce, pick_block_n,
    )

    n, m, q = 1_048_576, 16, 128
    codes = jnp.asarray(rng.integers(0, 256, size=(n // 16, 128), dtype=np.uint8))
    qtables = jnp.asarray(rng.integers(0, 127, size=(q, m, 16)).astype(np.int8))
    tlo, thi = build_scan_tables(qtables)
    bn = pick_block_n(n)

    def body(args, tap):
        codes_, tlo_, thi_ = args
        d = (tap.astype(jnp.int32) & 1).astype(jnp.int8)
        vals, _ = lut_scan_reduce(codes_, tlo_ + d, thi_, cb=8, block_n=bn)
        return vals[0, 0].astype(jnp.float32)

    dt = fori_slope_seconds(body, (codes, tlo, thi), k_lo=30, k_hi=150)
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
    )


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
    )


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


def _bench_recall_qps(rng):
    """Trained-index recall@100 + QPS on correlated synthetic (quick: 256k)."""
    import jax
    import jax.numpy as jnp
    from qadc_tpu.eval.recall import recall_at_r
    from qadc_tpu.index import ivf
    from qadc_tpu.ops.knn import assign_nearest, exact_knn
    from qadc_tpu.quantizers.pq import train_pq

    n, dim, nq = 262_144, 128, 128
    latent = 64
    a_mix = rng.normal(size=(latent, dim)).astype(np.float32)
    base = rng.normal(size=(n, latent)).astype(np.float32) @ a_mix \
        + rng.normal(size=(n, dim)).astype(np.float32) * 0.4
    queries = rng.normal(size=(nq, latent)).astype(np.float32) @ a_mix \
        + rng.normal(size=(nq, dim)).astype(np.float32) * 0.4
    _, gt = exact_knn(queries, base, 1)
    gt = np.asarray(gt)

    coarse = ivf.train_coarse(jax.random.PRNGKey(1), base[:100_000], 256, iters=20)
    a = np.asarray(assign_nearest(base[:100_000], coarse))
    pq_r = train_pq(
        jax.random.PRNGKey(2), base[:100_000] - np.asarray(coarse)[a], 16, 4, iters=20
    )
    index = ivf.add(ivf.IVFIndex.create(pq_r, coarse), base)
    ma, keep, r = 24, 0.005, 100

    d, l = ivf.search_qadc(index, jnp.asarray(queries), r=r, ma=ma, keep=keep)
    rec = recall_at_r(np.asarray(l), gt)
    # Float-ADC on the SAME index: isolates the 4-bit Quick-ADC cost from the
    # index/codebook quality (the reference's published delta is 0.022).
    _, l8 = ivf.search_adc(index, jnp.asarray(queries), r=r, ma=ma)
    rec_f = recall_at_r(np.asarray(l8), gt)

    qd = jnp.asarray(queries)

    def body(args, tap):
        idx, qs = args
        dd, _ = ivf.search_qadc(idx, qs + tap * 1e-12, r=r, ma=ma, keep=keep)
        return dd.sum()

    dt = fori_slope_seconds(body, (index, qd), k_lo=20, k_hi=100)
    return rec, rec_f, nq / dt


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
    import jax

    rng = np.random.default_rng(0)

    n, q, m, dt = _bench_kernel(rng)
    cq_per_s = n * q / dt
    code_bytes_per_s = n * (m // 2) / dt

    # Speed-of-light ratios. HBM-bound: scan reads n*cb bytes once per query
    # batch => cb bytes/code. Formulation-bound: one-hot ADC needs K=2*16*cb
    # int8 MACs per code-query pair on the MXU.
    sol_hbm_s = n * (m // 2) / (HBM_GBPS * 1e9)
    sol_mxu_s = 2.0 * n * q * (2 * 16 * (m // 2)) / (MXU_INT8_TOPS * 1e12)

    ivf_index = _make_ivf(rng)
    ivf_us_128 = _bench_ivf_e2e(rng, ivf_index, 128)
    ivf_us_32 = _bench_ivf_e2e(rng, ivf_index, 32)
    ivf_us_1 = _bench_ivf_e2e(rng, ivf_index, 1, k_lo=100, k_hi=500)
    # Percentiles (BASELINE asks p50): per-trial slope pairs at b=1 and b=32.
    ivf_pct_1 = _bench_ivf_percentiles(rng, ivf_index, 1, k_lo=100, k_hi=300)
    ivf_pct_32 = _bench_ivf_percentiles(rng, ivf_index, 32, k_lo=20, k_hi=60)
    adc4_us_32 = _bench_ivf_adc(rng, ivf_index, 32)
    adc8_us_32 = _bench_ivf_adc(rng, _make_ivf8(rng), 32)

    recall100, recall100_float, qps = _bench_recall_qps(rng)

    print(
        json.dumps(
            {
                "metric": "qadc4_scan_throughput_1Mcodes_q128",
                "value": cq_per_s,
                "unit": "code-query pairs/s/chip",
                "vs_baseline": cq_per_s / REFERENCE_SCAN_CQ_PER_S,
                "detail": {
                    "scan_ms_per_1M_codes_q128": dt * 1e3,
                    "us_per_query_per_1M_codes": dt * 1e6 / q,
                    "codes_GBps": code_bytes_per_s / 1e9,
                    "pct_of_hbm_byte_SoL": 100.0 * sol_hbm_s / dt,
                    "pct_of_int8_mxu_formulation_SoL": 100.0 * sol_mxu_s / dt,
                    "ivf256_ma24_r100_us_per_query_e2e": ivf_us_128,
                    "ivf256_ma24_r100_us_per_query_b32": ivf_us_32,
                    "ivf256_ma24_r100_us_per_query_b1": ivf_us_1,
                    "ivf_b1_p50_us": ivf_pct_1["p50"],
                    "ivf_b1_p99_us": ivf_pct_1["p99"],
                    "ivf_b32_p50_us": ivf_pct_32["p50"],
                    "ivf_b32_p99_us": ivf_pct_32["p99"],
                    "ivf_vs_reference_total_120us": 120.0 / ivf_us_128,
                    "ivf_b32_vs_reference_total_120us": 120.0 / ivf_us_32,
                    "ivf256_ma24_adc4_us_per_query_b32": adc4_us_32,
                    "ivf256_ma24_adc8_us_per_query_b32": adc8_us_32,
                    "ivf_adc8_vs_reference_total_388us": 388.0 / adc8_us_32,
                    "trained_ivf_recall_at_100": recall100,
                    "trained_ivf_float_adc_recall_at_100": recall100_float,
                    "trained_ivf_qadc_recall_delta": recall100_float - recall100,
                    "trained_ivf_qps_per_chip_b128": qps,
                    "backend": jax.default_backend(),
                    "timing": "device-side fori_loop chain, slope-fit (relay fixed cost cancelled)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
