"""Deep100M single-chip benchmark: 100M codes, IVF-4096, Quick ADC.

BASELINE.md's large configuration (Deep1B-class geometry: 96-d vectors,
16x4 PQ = 8-byte codes). 100M codes = 800 MB of HBM — one v5e holds it; the
partition-sharded dist/ path divides it across chips for the full 1B.

All index data is generated ON DEVICE (jax PRNG) — this benchmarks the search
path, not host->device transfer.

Timing: the relay charges a large FIXED cost per fenced call (~40 ms RTT +
dispatch), so per-query time is the SLOPE over two batch sizes — same jitted
search, both real workloads, fixed cost cancels:
  us/query = (t(q_hi) - t(q_lo)) / (q_hi - q_lo).

Run: PYTHONPATH=. python benchmarks/deep100m_v2.py [--ma 24]
"""
import argparse
import json
import time


def main():
    import jax
    import jax.numpy as jnp
    from qadc_tpu.index import ivf
    from qadc_tpu.index.ivf import IVFIndex
    from qadc_tpu.quantizers.pq import ProductQuantizer

    ap = argparse.ArgumentParser()
    ap.add_argument("--ma", type=int, default=24)
    ap.add_argument("--parts", type=int, default=4096)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--q-lo", type=int, default=128)
    ap.add_argument("--q-hi", type=int, default=512)
    ap.add_argument("--reps", type=int, default=6)
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
    )
    jax.block_until_ready(index.codes)
    print(f"index ready: {index.n/1e6:.0f}M codes, part_pad={part_pad}", flush=True)

    # The library search is jitted with `index` as an ARGUMENT (closing over
    # it would embed 800 MB as an HLO constant and break remote compile).
    def run_batch(q):
        qs = jax.random.normal(k4, (q, dim), jnp.float32)
        d, _ = ivf.search_qadc(
            index, qs, r=100, ma=args.ma, keep=0.005, group_size=args.group_size
        )
        tap = float(d[0, 0])  # fence
        t0 = time.time()
        for i in range(args.reps):
            d, _ = ivf.search_qadc(
                index, qs + abs(tap) * 1e-12, r=100, ma=args.ma, keep=0.005,
                group_size=args.group_size,
            )
            tap = float(d[0, 0])  # fences each call
        return (time.time() - t0) / args.reps

    t_lo = run_batch(args.q_lo)
    t_hi = run_batch(args.q_hi)
    us_per_query = (t_hi - t_lo) / (args.q_hi - args.q_lo) * 1e6
    print(json.dumps({
        "metric": "deep100m_ivf4096_qadc_us_per_query",
        "value": us_per_query,
        "unit": "us/query (slope over batch size; fixed relay cost cancelled)",
        "detail": {
            "t_per_call_q%d_ms" % args.q_lo: t_lo * 1e3,
            "t_per_call_q%d_ms" % args.q_hi: t_hi * 1e3,
            "qps_at_q%d" % args.q_hi: args.q_hi / t_hi,
            "codes_in_index": index.n,
            "ma": args.ma,
        },
    }))


if __name__ == "__main__":
    main()
