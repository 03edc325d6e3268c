"""A/B: grouped kernel vs per-pair direct path as probe DENSITY varies.

The grouped path's MXU work is gcap * part_pad * G pairs regardless of how
many of the G query slots are live: at Deep100M geometry (4096 partitions,
b=512, ma=24) only ~3 pairs land per partition, so ~97% of every table slab
is padding — the measured 398 us/query is ~40x the useful work. The direct
path pays per-pair HBM re-reads (a partition probed by p pairs is read p
times) but zero slab padding. Sweep batch size at both geometries to find
the density crossover for the dispatch gate.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_geometry(name, parts, n_codes, dim, ma, batches):
    import jax
    import jax.numpy as jnp

    from qadc_tpu.eval.timing import fori_slope_seconds
    from qadc_tpu.index import ivf
    from qadc_tpu.index.ivf import IVFIndex
    from qadc_tpu.quantizers.pq import ProductQuantizer

    m = 16
    part_real = n_codes // parts
    part_pad = -(-part_real // 512) * 512
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    pq = ProductQuantizer(
        centroids=jax.random.normal(k1, (m, 16, dim // m), jnp.float32),
        sq_bits=4,
    )
    index = IVFIndex(
        pq=pq,
        coarse_centroids=jax.random.normal(k3, (parts, dim), jnp.float32),
        codes=jax.random.randint(
            k2, (parts, part_pad * (m // 2) // 128, 128), 0, 256,
            dtype=jnp.uint8),
        labels=(jnp.arange(parts, dtype=jnp.int32)[:, None] * part_pad
                + jnp.arange(part_pad, dtype=jnp.int32)[None, :]),
        part_sizes=jnp.full((parts,), part_real, jnp.int32),
        n=parts * part_real, max_part_size=part_real,
    )
    jax.block_until_ready(index.codes)
    print(f"=== {name}: {parts} parts x {part_real} codes, pad {part_pad} ===",
          flush=True)

    for b in batches:
        qs = jax.random.normal(k4, (b, dim), jnp.float32)
        density = b * ma / min(parts, b * ma)

        def run_direct(q_chunk):
            def body(a, tap):
                idx, q = a
                return ivf.search_qadc(
                    idx, q + tap * 1e-12, r=100, ma=ma, direct=True
                )[0].sum()
            return body

        def body_grouped(a, tap):
            idx, q = a
            return ivf.search_qadc(
                idx, q + tap * 1e-12, r=100, ma=ma, keep=0.005, direct=False
            )[0].sum()

        klo, khi = (4, 20) if b > 8 else (20, 100)
        tg = fori_slope_seconds(body_grouped, (index, qs), k_lo=klo, k_hi=khi)
        row = f"b={b:4d} density={density:6.1f}: grouped {tg*1e6/b:8.1f} us/q"
        # direct in query chunks that keep the (q, ma*part_pad) matrix < 512MB
        # (power-of-two so every chunk shares one compiled shape)
        chunk = max(1, min(b, (512 << 20) // (ma * part_pad * 4)))
        chunk = 1 << (chunk.bit_length() - 1)
        def body_direct(a, tap):
            idx, q = a
            acc = 0.0
            for s in range(0, b, chunk):
                acc = acc + ivf.search_qadc(
                    idx, q[s:s+chunk] + tap * 1e-12, r=100, ma=ma, direct=True
                )[0].sum()
            return acc
        try:
            td = fori_slope_seconds(body_direct, (index, qs), k_lo=klo, k_hi=khi)
            row += f"   direct {td*1e6/b:8.1f} us/q (chunk {chunk})"
            row += f"   -> {'DIRECT' if td < tg else 'grouped'} wins {max(tg,td)/min(tg,td):.1f}x"
        except Exception as e:  # noqa: BLE001
            row += f"   direct FAILED: {str(e).splitlines()[0][:80]}"
        print(row, flush=True)


def main():
    import jax

    assert jax.default_backend() == "tpu"
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="include the 100M-code Deep100M geometry")
    args = ap.parse_args()

    # Deep100M geometry scaled to 25M codes for iteration speed (same
    # per-partition size -> same per-query work; only HBM residency differs).
    bench_geometry("deep-geometry 25M", parts=1024, n_codes=25_000_000,
                   dim=96, ma=24, batches=(1, 8, 64, 512))
    # SIFT1M geometry
    bench_geometry("sift 1M", parts=256, n_codes=1_000_000, dim=128,
                   ma=24, batches=(8, 32, 128))
    if args.full:
        bench_geometry("deep100m", parts=4096, n_codes=100_000_000,
                       dim=96, ma=24, batches=(512,))


if __name__ == "__main__":
    main()
