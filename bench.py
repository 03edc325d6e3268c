"""Benchmark: Quick-ADC 4-bit LUT scan throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: code-query pairs scanned per second by the Pallas LUT-scan
kernel on the flagship config (SIFT1M-scale: 1M codes, 16x4 PQ = 8-byte codes,
128-query batch, window-16 reduction + exact top-k) — the TPU analog of the
reference's scan phase.

Baseline: the reference's AVX2 scan rate derived from its published IVF-256
SIFT1M numbers (README.md:329-330): scan 86 us/query over ma=24 partitions of
~3906 codes => ~93,750 codes / 86 us = 1.09e9 code-query pairs/s (single query
per pass, one core). vs_baseline = ours / 1.09e9.

Timing is honest under the axon relay: calls are chained (each iteration's
tables depend on the previous output) and a scalar readback fences the chain —
plain block_until_ready over the relay does NOT wait for device execution.
"""

import json
import time

import numpy as np


REFERENCE_SCAN_CQ_PER_S = 93_750 / 86e-6  # ~1.09e9, README.md:329-330


def main():
    import jax
    import jax.numpy as jnp
    from qadc_tpu.kernels.lut_scan import build_scan_tables, lut_scan_reduce

    rng = np.random.default_rng(0)
    n, m, q = 1_048_576, 16, 128
    codes = jnp.asarray(
        rng.integers(0, 256, size=(n // 16, 128), dtype=np.uint8)
    )  # ROW128 storage (16 codes/row)
    qtables = jnp.asarray(
        rng.integers(0, 127, size=(q, m, 16)).astype(np.int8)
    )
    tlo, thi = build_scan_tables(qtables)

    k_inner = 16

    @jax.jit
    def chained(codes, prev, tlo, thi):
        # codes passed as an ARGUMENT: closing over device arrays would embed
        # them as HLO constants (slow remote compiles at scale).
        for _ in range(k_inner):
            d = (prev[0:1, 0:1] & 1).astype(jnp.int8)
            vals, rows = lut_scan_reduce(codes, tlo + d, thi, cb=8)
            prev = vals
        return prev

    zero = jnp.zeros((n // 16, tlo.shape[1]), jnp.int32)
    prev = chained(codes, zero, tlo, thi)
    _ = float(prev[0, 0])  # warmup + fence

    iters = 4
    t0 = time.time()
    for _ in range(iters):
        prev = chained(codes, prev, tlo, thi)
    _ = float(prev[0, 0])  # fence
    dt = (time.time() - t0) / (iters * k_inner)

    cq_per_s = n * q / dt

    # --- End-to-end IVF-256 Quick-ADC search (the reference's headline
    # config: SIFT1M geometry, ma=24, r=100), synthetic codes.
    ivf_us_per_query = _bench_ivf_e2e(rng)

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
                    "codes_GBps": n * (m // 2) / dt / 1e9,
                    "ivf256_ma24_r100_us_per_query_e2e": ivf_us_per_query,
                    "ivf_vs_reference_total_120us": 120.0 / ivf_us_per_query,
                    "backend": jax.default_backend(),
                },
            }
        )
    )


def _bench_ivf_e2e(rng):
    """Full IVF search per-query latency (SIFT1M-like geometry, batch 128).

    Reference comparison: IVF-256 SIFT1M OPQ 16x4 Quick ADC at ma=24 totals
    ~120 us/query (index 7 + rotate 13 + table 14 + scan 86, README.md:329-330).
    """
    import jax
    import jax.numpy as jnp
    from qadc_tpu.index import ivf
    from qadc_tpu.index.ivf import IVFIndex
    from qadc_tpu.quantizers.pq import ProductQuantizer

    dim, parts, part_pad, m, q, ma = 128, 256, 4096, 16, 128, 24
    pq = ProductQuantizer(
        centroids=jnp.asarray(
            rng.normal(size=(m, 16, dim // m)).astype(np.float32)
        ),
        sq_bits=4,
    )
    index = IVFIndex(
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
    queries = jnp.asarray(rng.normal(size=(q, dim)).astype(np.float32))

    k_inner = 8

    @jax.jit
    def chained(idx, qs):
        tap = jnp.float32(0)
        for _ in range(k_inner):
            d, _ = ivf.search_qadc(idx, qs + tap * 1e-12, r=100, ma=ma, keep=0.005)
            tap = d.sum()
        return tap

    _ = float(chained(index, queries))
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        _ = float(chained(index, queries))
    dt = (time.time() - t0) / (iters * k_inner)
    return dt * 1e6 / q


if __name__ == "__main__":
    main()
