"""Deep100M single-chip benchmark: 100M codes, IVF-4096, Quick ADC.

BASELINE.md's large configuration (Deep1B-class geometry: 96-d vectors,
16x4 PQ = 8-byte codes). 100M codes = 800 MB of HBM — one v5e holds it; the
partition-sharded dist/ path divides it across chips for the full 1B.

All index data is generated ON DEVICE (jax PRNG) — this benchmarks the search
path, not host->device transfer.

Timing: device-side fori_loop chain, slope over two chain lengths
(qadc_tpu/eval/timing.py:fori_slope_seconds) — relay fixed cost cancels and
nothing hides inside the dispatch RTT.

Run: python benchmarks/deep100m_v2.py [--ma 24]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from qadc_tpu.eval.timing import fori_slope_seconds
    from qadc_tpu.index import ivf
    from qadc_tpu.index.ivf import IVFIndex
    from qadc_tpu.quantizers.pq import ProductQuantizer

    ap = argparse.ArgumentParser()
    ap.add_argument("--ma", type=int, default=24)
    ap.add_argument("--parts", type=int, default=4096)
    ap.add_argument("--group-size", type=int, default=128)
    args = ap.parse_args()

    dim, m = 96, 16
    parts = args.parts
    part_real = 100_000_000 // parts
    part_pad = -(-part_real // 512) * 512
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    pq = ProductQuantizer(
        centroids=jax.random.normal(k1, (m, 16, dim // m), jnp.float32), sq_bits=4
    )
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
        codes=codes, labels=labels,
        part_sizes=jnp.full((parts,), part_real, jnp.int32),
        n=parts * part_real, max_part_size=part_real,
    ).with_planes()  # tq grouped kernel storage (round 5); +800 MB on 16 GB
    jax.block_until_ready(index.codes)
    print(f"index ready: {index.n/1e6:.0f}M codes, part_pad={part_pad}", flush=True)

    results = {}
    for batch, klo, khi in ((2048, 2, 10), (512, 4, 20), (1, 40, 200)):
        qs = jax.random.normal(k4, (batch, dim), jnp.float32)

        def body(a, tap):
            idx, q = a
            d, _ = ivf.search_qadc(
                idx, q + tap * 1e-12, r=100, ma=args.ma, keep=0.005,
                group_size=args.group_size,
            )
            return d.sum()

        dt = fori_slope_seconds(body, (index, qs), k_lo=klo, k_hi=khi)
        results[f"us_per_query_b{batch}"] = dt * 1e6 / batch
        print(f"b={batch}: {dt*1e6/batch:.1f} us/query", flush=True)

    print(json.dumps({
        "metric": "deep100m_ivf4096_qadc_us_per_query",
        "value": results["us_per_query_b512"],
        "unit": "us/query (device fori chain, slope-fit)",
        "detail": {**results, "codes_in_index": index.n, "ma": args.ma},
    }))


if __name__ == "__main__":
    main()
