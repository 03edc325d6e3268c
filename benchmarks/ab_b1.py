"""A/B the two b=1 direct-path cuts on hardware.

1. rows_adc kernel block size: blk = gcd(512, rpp) makes nblocks == 1 at
   SIFT1M IVF-256 geometry (rpp = 512), so ragged trimming cannot skip the
   ~52% padding (real partition ~3906 codes, pad 8192). Finer blocks let
   group_nblk trim; measure the sweet spot.
2. Screen aggregation: approx_min_k(aggregate_to_topk=True) ends in the
   K-dominated TopK custom call; aggregating the (.., L) segment minima with
   the sort cascade instead should be cheaper at L ~ 1-2k.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qadc_tpu.eval.timing import fori_slope_seconds

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(5)

    # --- 1. kernel block-size sweep at SIFT1M IVF-256 b=1 geometry ---------
    import qadc_tpu.kernels.lut_scan as ls

    parts, rpp, cb, ma = 256, 512, 8, 24           # part_pad 8192, 16x4
    codes = jnp.asarray(
        rng.integers(0, 256, size=(parts * rpp, 128), dtype=np.uint8)
    )
    gp = jnp.asarray(rng.permutation(parts)[:ma].astype(np.int32))
    tlo = jnp.asarray(rng.uniform(0, 4, size=(ma, 128)).astype(np.float32))
    thi = jnp.asarray(rng.uniform(0, 4, size=(ma, 128)).astype(np.float32))
    real_rows = 3906 // (128 // cb) + 1            # ~245 live rows of 512

    orig_gcd = math.gcd
    for blk in (512, 256, 128, 64, 32):
        if rpp % blk:
            continue
        # monkeypatch the block unit (measurement only); the kernel wrapper
        # is jitted on static args that do not include blk, so drop the
        # trace cache each round
        ls.math.gcd = lambda a, b, _blk=blk: orig_gcd(_blk, b)
        jax.clear_caches()
        try:
            nblk = jnp.full((ma,), -(-real_rows // blk), jnp.int32)

            def body(args, tap):
                (c,) = args
                d = ls.rows_adc_grouped_prefetch(
                    c, gp, tlo + tap * 1e-12, thi, rpp, cb=cb,
                    compact_out=True, group_nblk=nblk,
                )
                return d.sum()

            dt = fori_slope_seconds(body, (codes,), k_lo=4, k_hi=24)
            scanned = int(np.asarray(nblk).sum()) * blk
            print(f"blk={blk:4d} (trim -> {scanned} of {ma*rpp} rows): "
                  f"{dt*1e6:7.1f} us", flush=True)
        finally:
            ls.math.gcd = orig_gcd

    # --- 1b. dense-gather accumulate vs in-place prefetch -------------------
    # The prefetch kernel's b=1 cost is grid-step-overhead-bound (gcap *
    # nblocks tiny steps). Alternative: ONE row gather of the live rows
    # (static cap = max_part rows) into a dense array + rows_adc_accumulate
    # over it (few big steps) + the XLA selector reduce the non-fused
    # compact path uses. Trades a 0.75 MB gather + 1.5 MB lane-sum round
    # trip for ~4x fewer grid steps.
    max_rows = -(-real_rows // 64) * 64
    ids = (gp[:, None] * rpp + jnp.arange(max_rows, dtype=jnp.int32)[None, :]
           ).reshape(-1)
    cpr = 128 // cb
    smat = jnp.asarray(
        (np.arange(128)[:, None] // cb) == np.arange(cpr)[None, :],
        jnp.float32,
    )

    def body_dense(args, tap):
        (c,) = args
        rows = c[ids]                                  # (ma*max_rows, 128)
        tl = jnp.repeat(tlo + tap * 1e-12, max_rows, axis=0)
        th = jnp.repeat(thi, max_rows, axis=0)
        d = ls.rows_adc_accumulate(rows, tl, th, cb=cb)
        dd = jnp.dot(d, smat, precision=jax.lax.Precision.HIGHEST)
        return dd.sum()

    dt = fori_slope_seconds(body_dense, (codes,), k_lo=4, k_hi=24)
    print(f"dense-gather accumulate ({ma}x{max_rows} rows + reduce): "
          f"{dt*1e6:7.1f} us", flush=True)

    # --- 2. screen aggregation ----------------------------------------------
    from qadc_tpu.ops.topk import exact_screen_smallest

    for q, w in [(1, 196608), (32, 196608)]:
        d = jnp.asarray(rng.uniform(0, 1, size=(q, w)).astype(np.float32))

        def s_agg(args, tap):
            (a,) = args
            v, _ = jax.lax.approx_min_k(
                (a + tap * 1e-12).astype(jnp.bfloat16), 200)
            return v.astype(jnp.float32).sum()

        def s_sort(args, tap):
            (a,) = args
            v, i = jax.lax.approx_min_k(
                (a + tap * 1e-12).astype(jnp.bfloat16), 200,
                aggregate_to_topk=False)
            sv, si = exact_screen_smallest(v.astype(jnp.float32), 200)
            return sv.sum() + (si % 7).sum() * 1e-20

        for name, fn in [("agg=topk (current)", s_agg),
                         ("agg=sort-cascade", s_sort)]:
            dt = fori_slope_seconds(fn, (d,), k_lo=4, k_hi=24)
            print(f"(q={q}, w={w}) screen {name:20s}: {dt*1e6:7.1f} us",
                  flush=True)
        v, _ = jax.lax.approx_min_k(d, 200, aggregate_to_topk=False)
        print(f"   (reduced width L = {v.shape[-1]})")


if __name__ == "__main__":
    main()
