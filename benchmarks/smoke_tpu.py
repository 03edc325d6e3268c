"""Real-TPU smoke test: compile + run every Pallas kernel config.

The CPU test suite runs kernels in interpret mode, which accepts programs
Mosaic rejects (round 2 example: offset-lane table halves on 1-sublane
vectors compiled fine in interpret mode but failed 'Invalid input layout'
on hardware, breaking every M=32 search). This script drives each kernel
entry point at each supported code size on the real chip; run it after any
kernel change and before recording benchmarks.

Run: python benchmarks/smoke_tpu.py   (from anywhere; repo root is added
to sys.path below so the environment's PYTHONPATH stays intact).
Exit code 0 = all configs compile and run.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("not on TPU — smoke test is for real hardware", file=sys.stderr)
        return 1
    rng = np.random.default_rng(0)
    failures = []

    def check(name, fn):
        try:
            out = fn()
            jax.block_until_ready(out)
            tap = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
            print(f"ok   {name} (tap {tap:.3g})", flush=True)
        except Exception as e:  # noqa: BLE001 — report every broken config
            failures.append(name)
            print(f"FAIL {name}: {str(e).splitlines()[0][:120]}", flush=True)

    from qadc_tpu.kernels.lut_scan import (
        build_scan_tables,
        lut_scan_grouped_prefetch,
        lut_scan_reduce,
        rows_adc_accumulate,
        rows_adc_grouped_prefetch,
    )

    for m in (16, 32):  # SIFT (8 B codes) and GIST (16 B codes) configs
        cb = m // 2
        cpr = 128 // cb
        n = 8192
        codes = jnp.asarray(
            rng.integers(0, 256, size=(n * cb // 128, 128), dtype=np.uint8)
        )
        qt = jnp.asarray(rng.integers(0, 127, size=(128, m, 16)).astype(np.int8))
        tlo, thi = build_scan_tables(qt)
        check(
            f"lut_scan_reduce m={m}",
            lambda: lut_scan_reduce(codes, tlo, thi, cb=cb, block_n=2048),
        )
        check(
            f"lut_scan_reduce m={m} f32",
            lambda: lut_scan_reduce(
                codes, tlo.astype(jnp.float32), thi.astype(jnp.float32),
                cb=cb, block_n=2048, acc_dtype_name="float32",
            ),
        )
        check(
            f"lut_scan_reduce m={m} transpose_out",
            lambda: lut_scan_reduce(
                codes, tlo, thi, cb=cb, block_n=2048, transpose_out=True,
            ),
        )

        gcap, rpp = 4, 512 // cpr * 2
        pcodes = jnp.asarray(
            rng.integers(0, 256, size=(8 * rpp, 128), dtype=np.uint8)
        )
        gp = jnp.asarray(np.arange(gcap, dtype=np.int32))
        lanes = 16 * cb
        tl = jnp.asarray(rng.normal(size=(gcap, lanes)).astype(np.float32))
        th = jnp.asarray(rng.normal(size=(gcap, lanes)).astype(np.float32))
        check(
            f"rows_adc_grouped_prefetch cb={cb}",
            lambda: rows_adc_grouped_prefetch(pcodes, gp, tl, th, rpp, cb=cb),
        )
        rows = jnp.asarray(rng.integers(0, 256, size=(512, 128), dtype=np.uint8))
        tlr = jnp.asarray(rng.normal(size=(512, lanes)).astype(np.float32))
        check(
            f"rows_adc_accumulate cb={cb}",
            lambda: rows_adc_accumulate(rows, tlr, tlr, cb=cb),
        )
        gq = 128
        slab = jnp.asarray(
            rng.integers(-127, 127, size=(gcap * lanes, gq)).astype(np.int8)
        )
        check(
            f"lut_scan_grouped_prefetch cb={cb}",
            lambda: lut_scan_grouped_prefetch(
                pcodes, gp, slab, slab, rows_per_group=rpp * cpr, cb=cb,
                block_n=512, window=min(cpr, 16),
            ),
        )
        check(
            f"lut_scan_grouped_prefetch cb={cb} transpose_out",
            lambda: lut_scan_grouped_prefetch(
                pcodes, gp, slab, slab, rows_per_group=rpp * cpr, cb=cb,
                block_n=512, window=min(cpr, 16), transpose_out=True,
            ),
        )
        fslab = slab.astype(jnp.float32)
        check(
            f"lut_scan_grouped_prefetch cb={cb} float32",
            lambda: lut_scan_grouped_prefetch(
                pcodes, gp, fslab, fslab, rows_per_group=rpp * cpr, cb=cb,
                block_n=512, window=min(cpr, 16), transpose_out=True,
                acc_dtype_name="float32",
            ),
        )

    # 8-bit conventional-ADC kernel
    from qadc_tpu.kernels.lut_scan import build_scan8_tables, lut_scan8_reduce

    codes8 = jnp.asarray(
        rng.integers(0, 256, size=(8192 * 8 // 128, 128), dtype=np.uint8)
    )
    t8 = build_scan8_tables(
        jnp.asarray(rng.uniform(0, 10, size=(32, 8, 256)).astype(np.float32))
    )
    check(
        "lut_scan8_reduce m=8",
        lambda: lut_scan8_reduce(codes8, t8, m=8, block_n=256),
    )
    check(
        "lut_scan8_reduce m=8 transpose_out",
        lambda: lut_scan8_reduce(
            codes8, t8, m=8, block_n=256, transpose_out=True
        ),
    )

    # 8-bit grouped IVF kernel (scalar prefetch), both layouts
    from qadc_tpu.kernels.lut_scan import lut_scan8_grouped_prefetch

    parts8, gcap8, rpp8 = 8, 4, 512  # codes per partition
    pcodes8 = jnp.asarray(
        rng.integers(0, 256, size=(parts8 * rpp8 // 16, 128), dtype=np.uint8)
    )
    gp8 = jnp.asarray(rng.permutation(parts8)[:gcap8].astype(np.int32))
    tg8 = jnp.concatenate([t8[:, :128]] * gcap8, axis=0)  # (gcap*2048, 128)
    check(
        "lut_scan8_grouped_prefetch m=8",
        lambda: lut_scan8_grouped_prefetch(
            pcodes8, gp8, tg8, rows_per_group=rpp8, m=8, block_n=256,
        ),
    )
    check(
        "lut_scan8_grouped_prefetch m=8 transpose_out",
        lambda: lut_scan8_grouped_prefetch(
            pcodes8, gp8, tg8, rows_per_group=rpp8, m=8, block_n=256,
            transpose_out=True,
        ),
    )

    # End-to-end search paths (both geometries, all batch regimes)
    from qadc_tpu.index import flat as flat_mod, ivf as ivf_mod
    from qadc_tpu.index.ivf import IVFIndex
    from qadc_tpu.quantizers.pq import ProductQuantizer

    for m, dim in ((16, 128), (32, 960)):
        cb = m // 2
        pq = ProductQuantizer(
            centroids=jnp.asarray(
                rng.normal(size=(m, 16, dim // m)).astype(np.float32)
            ),
            sq_bits=4,
        )
        parts, part_pad = 16, 1024
        index = IVFIndex(
            pq=pq,
            coarse_centroids=jnp.asarray(
                rng.normal(size=(parts, dim)).astype(np.float32)
            ),
            codes=jnp.asarray(
                rng.integers(
                    0, 256, size=(parts, part_pad * cb // 128, 128), dtype=np.uint8
                )
            ),
            labels=jnp.asarray(
                np.arange(parts * part_pad, dtype=np.int32).reshape(parts, part_pad)
            ),
            part_sizes=jnp.asarray(np.full((parts,), 1000, np.int32)),
            n=parts * 1000,
            max_part_size=1000,
        )
        qs = jnp.asarray(rng.normal(size=(32, dim)).astype(np.float32))
        check(
            f"ivf.search_qadc grouped m={m}",
            lambda: ivf_mod.search_qadc(
                index, qs, r=50, ma=4, keep=0.01, direct=False
            ),
        )
        check(
            f"ivf.search_qadc direct m={m}",
            lambda: ivf_mod.search_qadc(index, qs[:1], r=50, ma=4, direct=True),
        )
        check(
            f"ivf.search_adc m={m}",
            lambda: ivf_mod.search_adc(index, qs, r=50, ma=4),
        )
        fidx = flat_mod.FlatIndex(
            pq=pq,
            codes=index.codes.reshape(-1, 128),
            n=parts * part_pad,
        )
        check(
            f"flat.search_qadc m={m}",
            lambda: flat_mod.search_qadc(fidx, qs, r=50, keep=0.01),
        )

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}", file=sys.stderr)
        return 1
    print("\nALL TPU SMOKE CONFIGS OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
