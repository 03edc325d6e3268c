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


def main():
    n, q = 1_048_576, 128
    for m in (16, 32):
        for variant in ("bf16", "int8"):
            for with_rows in (True, False):
                for block_n in (512, 1024, 2048):
                    try:
                        dt = bench_scan(n, m, q, variant, with_rows, block_n=block_n)
                    except Exception as e:  # noqa: BLE001
                        print(f"m={m} {variant} rows={int(with_rows)} blk={block_n}: FAIL {type(e).__name__}")
                        continue
                    cqs = n * q / dt
                    print(
                        f"m={m} {variant} rows={int(with_rows)} blk={block_n}: "
                        f"{dt*1e3:.3f} ms  {cqs/1e9:.1f} Gcq/s  "
                        f"{n * (m // 2) / dt / 1e9:.1f} GB/s codes"
                    )


if __name__ == "__main__":
    main()
