"""A/B harness for lut_scan_reduce variants on real TPU.

Chained in-jit timing (relay-safe): each iteration's tables depend on the
previous output, a scalar readback fences the end.
"""
import time

import numpy as np


def bench_scan(n, m, q, variant, with_rows, block_n=1024, window=16, iters=4,
               k_lo=8, k_hi=40):
    """Slope-fit timing: the axon relay charges ~8 ms per jit call regardless
    of inner work; per-iteration cost = slope between two chain lengths."""
    import jax
    import jax.numpy as jnp
    from qadc_tpu.kernels.lut_scan import build_scan_tables, lut_scan_reduce

    cb = m // 2
    cpr = 128 // cb
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 256, size=(n // cpr, 128), dtype=np.uint8))
    qtables = jnp.asarray(rng.integers(0, 127, size=(q, m, 16)).astype(np.int8))
    tlo, thi = build_scan_tables(qtables)

    def make(k_inner):
        @jax.jit
        def chained(codes, prev, tlo, thi):
            for _ in range(k_inner):
                d = (prev[0:1, 0:1] & 1).astype(jnp.int8)
                vals, rows = lut_scan_reduce(
                    codes, tlo + d, thi, cb=cb, block_n=block_n, window=window,
                    variant=variant, with_rows=with_rows,
                )
                prev = vals
            return prev
        return chained

    def run(chained):
        zero = jnp.zeros((n // window, tlo.shape[1]), jnp.int32)
        prev = chained(codes, zero, tlo, thi)
        _ = float(prev[0, 0])
        t0 = time.time()
        for _ in range(iters):
            prev = chained(codes, prev, tlo, thi)
        _ = float(prev[0, 0])
        return (time.time() - t0) / iters

    t_lo = run(make(k_lo))
    t_hi = run(make(k_hi))
    return (t_hi - t_lo) / (k_hi - k_lo)


def bench_scan_vpu(n, m, q, block_n=1024, window=16, iters=4, k_lo=4, k_hi=12):
    """VPU select-accumulate contraction variant (SURVEY §7 'must benchmark
    both'): expected ~2 orders slower than the MXU one-hot matmuls — this
    measurement retires the question in docs/kernels.md. Short chains: each
    iteration is expensive."""
    import jax
    import jax.numpy as jnp
    from qadc_tpu.eval.timing import fori_slope_seconds
    from qadc_tpu.kernels.lut_scan import build_scan_tables, lut_scan_vpu_reduce

    cb = m // 2
    cpr = 128 // cb
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 256, size=(n // cpr, 128), dtype=np.uint8))
    qtables = jnp.asarray(rng.integers(0, 127, size=(q, m, 16)).astype(np.int8))
    tlo, thi = build_scan_tables(qtables)

    def body(args, tap):
        codes_, tlo_, thi_ = args
        d = (tap.astype(jnp.int32) & 1).astype(jnp.int8)
        vals = lut_scan_vpu_reduce(
            codes_, tlo_ + d, thi_, cb=cb, block_n=block_n, window=window
        )
        return vals[0, 0].astype(jnp.float32)

    return fori_slope_seconds(body, (codes, tlo, thi), k_lo=k_lo, k_hi=k_hi)


def main():
    n, q = 1_048_576, 128
    # MXU-vs-VPU A/B at the headline geometry (smaller n: the VPU variant is
    # expected ~100x slower; 64k codes keeps the run bounded).
    for m in (16, 32):
        try:
            dt_v = bench_scan_vpu(65_536, m, q)
            print(f"m={m} VPU-select blk=1024: {dt_v*1e3:.3f} ms/64k "
                  f"{65_536 * q / dt_v / 1e9:.2f} Gcq/s")
        except Exception as e:  # noqa: BLE001
            print(f"m={m} VPU-select: FAIL {type(e).__name__}: {e}")
    for m in (16, 32):
        for variant in ("bf16", "int8", "int8c"):
            for with_rows in (True, False):
                for block_n in (512, 1024, 2048):
                    try:
                        dt = bench_scan(n, m, q, variant, with_rows, block_n=block_n)
                    except Exception as e:  # noqa: BLE001
                        msg = " ".join(str(e).split())[:300]
                        print(f"m={m} {variant} rows={int(with_rows)} blk={block_n}: FAIL {type(e).__name__}: {msg}")
                        continue
                    cqs = n * q / dt
                    print(
                        f"m={m} {variant} rows={int(with_rows)} blk={block_n}: "
                        f"{dt*1e3:.3f} ms  {cqs/1e9:.1f} Gcq/s  "
                        f"{n * (m // 2) / dt / 1e9:.1f} GB/s codes"
                    )


if __name__ == "__main__":
    main()
