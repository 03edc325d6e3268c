"""Deep100M-scale single-chip benchmark: 100M codes, IVF-4096, Quick ADC.

BASELINE.md's large configuration (Deep1B-class geometry: 96-d vectors,
16x4 PQ = 8-byte codes). 100M codes = 800 MB of HBM — a single v5e holds it;
the partition-sharded dist/ path divides it across chips for the full 1B.

All index data is generated ON DEVICE (jax PRNG) — this benchmarks the search
path, not host->device transfer. Timing is dependency-chained (see bench.py).

Run: PYTHONPATH=. python benchmarks/deep100m.py [--q 512] [--ma 24]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from qadc_tpu.index import ivf
    from qadc_tpu.index.ivf import IVFIndex
    from qadc_tpu.quantizers.pq import ProductQuantizer

    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=512, help="query batch")
    ap.add_argument("--ma", type=int, default=24)
    ap.add_argument("--parts", type=int, default=4096)
    ap.add_argument("--group-size", type=int, default=8)
    args = ap.parse_args()

    dim, m = 96, 16
    parts = args.parts
    part_real = 100_000_000 // parts          # ~24414
    part_pad = -(-part_real // 512) * 512     # 24576
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    pq = ProductQuantizer(
        centroids=jax.random.normal(k1, (m, 16, dim // m), jnp.float32),
        sq_bits=4,
    )
    # Device-side index construction (no host transfer of the 800 MB).
    codes = jax.random.randint(
        k2, (parts, part_pad * (m // 2) // 128, 128), 0, 256, dtype=jnp.uint8
    )  # ROW128 storage
    labels = (
        jnp.arange(parts, dtype=jnp.int32)[:, None] * part_pad
        + jnp.arange(part_pad, dtype=jnp.int32)[None, :]
    )
    index = IVFIndex(
        pq=pq,
        coarse_centroids=jax.random.normal(k3, (parts, dim), jnp.float32),
        codes=codes,
        labels=labels,
        part_sizes=jnp.full((parts,), part_real, jnp.int32),
        n=parts * part_real,
        max_part_size=part_real,
    )
    queries = jax.random.normal(k4, (args.q, dim), jnp.float32)
    jax.block_until_ready(index.codes)
    print(
        f"index: {parts} partitions x {part_pad} pad "
        f"({index.n/1e6:.0f}M real codes, {parts*part_pad*(m//2)/2**30:.2f} GiB)",
        flush=True,
    )

    k_inner = 2

    @jax.jit
    def chained(qs):
        tap = jnp.float32(0)
        for _ in range(k_inner):
            d, l = ivf.search_qadc(
                index, qs + tap * 1e-12, r=100, ma=args.ma, keep=0.005,
                group_size=args.group_size,
            )
            tap = d.sum()
        return tap

    t0 = time.time()
    _ = float(chained(queries))
    print(f"compile+first: {time.time()-t0:.0f}s", flush=True)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        _ = float(chained(queries))
    dt = (time.time() - t0) / (reps * k_inner)
    us_per_q = dt * 1e6 / args.q
    scanned = args.q * args.ma * part_pad
    print(
        json.dumps(
            {
                "metric": "deep100m_ivf4096_qadc_us_per_query",
                "value": us_per_q,
                "unit": "us/query",
                "detail": {
                    "batch_ms": dt * 1e3,
                    "q": args.q,
                    "ma": args.ma,
                    "group_size": args.group_size,
                    "rows_scanned_per_query": args.ma * part_pad,
                    "code_query_rows_per_s": scanned / dt,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
