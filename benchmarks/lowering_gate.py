"""Hardware lowering gate: compile+run every production kernel config.

WHY THIS EXISTS (round-4 postmortem): all 158 CPU tests and the multichip
dryrun execute Pallas in interpret mode, which accepts Mosaic-ILLEGAL
programs — round 4's final commit added an in-kernel reshape that interpret
mode happily ran but Mosaic rejected ("unsupported shape cast") at the
flagship b=1 SIFT geometry, so HEAD could not run its own benchmark on the
chip. This gate is the cheap check that class of failure never lands again.

RULE (also in STATUS.md): no commit touching qadc_tpu/kernels/ or
qadc_tpu/index/ lands without a clean run of this script on the TPU:

    python benchmarks/lowering_gate.py            # full gate (~1-2 min warm)

Each entry compiles AND runs once (runs are microseconds; compiles dominate
and catch Mosaic layout/legality errors, runs catch runtime shape/oob
issues). Failures print the config + first error line and the script exits
nonzero; every other entry still runs (one bad config must not hide the
rest). The configs are the production geometries:

  - IVF Quick-ADC direct (b=1) at m in {16,32}, part_pad in {4096,3072} —
    rows_adc_grouped_prefetch w/ compact_out + mask_sizes + tile_min
    (index/ivf.py:_search_qadc_direct_impl)
  - IVF Quick-ADC grouped (b=32) at the same geometries — int8
    lut_scan_grouped_prefetch (index/ivf.py:_search_qadc_grouped_impl)
  - IVF conventional ADC 4-bit f32 grouped + 8-bit grouped (b=32)
  - Flat Quick-ADC (lut_scan_reduce) and flat 8-bit (lut_scan8_reduce)
  - rows_adc_grouped_prefetch standalone, tile_min in {None, 32}
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_ivf(rng, m=16, parts=256, part_pad=4096, dim=128, sq_bits=4):
    import jax.numpy as jnp

    from qadc_tpu.index.ivf import IVFIndex
    from qadc_tpu.quantizers.pq import ProductQuantizer

    k = 16 if sq_bits == 4 else 256
    cpr = 128 // (m if sq_bits == 8 else m // 2)
    pq = ProductQuantizer(
        centroids=jnp.asarray(
            rng.normal(size=(m, k, dim // m)).astype(np.float32)
        ),
        sq_bits=sq_bits,
    )
    sizes = rng.integers(part_pad // 2, part_pad - 100, size=(parts,))
    return IVFIndex(
        pq=pq,
        coarse_centroids=jnp.asarray(
            rng.normal(size=(parts, dim)).astype(np.float32)
        ),
        codes=jnp.asarray(
            rng.integers(
                0, 256, size=(parts, part_pad // cpr, 128), dtype=np.uint8
            )
        ),
        labels=jnp.asarray(
            np.arange(parts * part_pad, dtype=np.int32).reshape(parts, part_pad)
        ),
        part_sizes=jnp.asarray(sizes.astype(np.int32)),
        n=int(sizes.sum()),
        max_part_size=int(sizes.max()),
    ).with_planes()


def _entries():
    """Yield (name, thunk) pairs; each thunk compiles+runs one config."""
    import jax.numpy as jnp

    from qadc_tpu.index import flat as flat_mod
    from qadc_tpu.index import ivf as ivf_mod

    rng = np.random.default_rng(0)
    qs = {b: jnp.asarray(rng.normal(size=(b, 128)).astype(np.float32))
          for b in (1, 32, 128)}

    ivf_geoms = [  # (m, part_pad) production geometries
        (16, 4096),   # SIFT1M flagship
        (32, 4096),   # GIST-style M=32
        (16, 3072),   # Deep100M-style pad bucket
    ]
    idx4 = {g: _make_ivf(rng, m=g[0], part_pad=g[1]) for g in ivf_geoms}

    def block(x):
        import jax

        jax.block_until_ready(x)

    for g in ivf_geoms:
        ix = idx4[g]
        name = f"ivf_m{g[0]}_pad{g[1]}"

        def direct(ix=ix):
            block(ivf_mod.search_qadc(ix, qs[1], r=100, ma=24, keep=0.005,
                                      direct=True))

        def grouped(ix=ix):
            block(ivf_mod.search_qadc(ix, qs[32], r=100, ma=24, keep=0.005,
                                      direct=False))

        yield f"{name}_qadc_direct_b1", direct
        yield f"{name}_qadc_grouped_b32", grouped

    # Row128 grouped fallback must stay compilable (planes=None path).
    import dataclasses as _dc
    ix_nopl = _dc.replace(idx4[(16, 4096)], planes=None)
    yield "ivf_m16_pad4096_qadc_grouped_b32_row128", lambda: block(
        ivf_mod.search_qadc(ix_nopl, qs[32], r=100, ma=24, keep=0.005,
                            direct=False)
    )
    ix = idx4[(16, 4096)]
    yield "ivf_m16_pad4096_qadc_grouped_b128", lambda: block(
        ivf_mod.search_qadc(ix, qs[128], r=100, ma=24, keep=0.005,
                            direct=False)
    )
    yield "ivf_m16_pad4096_qadc_saturate_b32", lambda: block(
        ivf_mod.search_qadc(ix, qs[32], r=100, ma=24, keep=0.005,
                            direct=False, rerank=False, saturate=True)
    )
    yield "ivf_m16_pad4096_adc4_f32_b32", lambda: block(
        ivf_mod.search_adc(ix, qs[32], r=100, ma=24)
    )
    ix8 = _make_ivf(rng, m=8, sq_bits=8)
    yield "ivf_m8_8bit_adc_b32", lambda: block(
        ivf_mod.search_adc(ix8, qs[32], r=100, ma=24)
    )
    ix8_nopl = _dc.replace(ix8, planes=None)
    yield "ivf_m8_8bit_adc_b32_row128", lambda: block(
        ivf_mod.search_adc(ix8_nopl, qs[32], r=100, ma=24)
    )

    # Flat paths: lut_scan_reduce / lut_scan8_reduce at 256k codes.
    def flat_entries():
        from qadc_tpu.index.flat import FlatIndex
        from qadc_tpu.quantizers.pq import ProductQuantizer

        n = 262_144
        pq4 = ProductQuantizer(
            centroids=jnp.asarray(
                rng.normal(size=(16, 16, 8)).astype(np.float32)
            ),
            sq_bits=4,
        )
        fx4 = FlatIndex(
            pq=pq4,
            codes=jnp.asarray(
                rng.integers(0, 256, size=(n // 16, 128), dtype=np.uint8)
            ),
            n=n,
        )
        pq8 = ProductQuantizer(
            centroids=jnp.asarray(
                rng.normal(size=(8, 256, 16)).astype(np.float32)
            ),
            sq_bits=8,
        )
        fx8 = FlatIndex(
            pq=pq8,
            codes=jnp.asarray(
                rng.integers(0, 256, size=(n // 16, 128), dtype=np.uint8)
            ),
            n=n,
        )
        return fx4, fx8

    fx4, fx8 = flat_entries()
    yield "flat_m16_qadc_b128", lambda: block(
        flat_mod.search_qadc(fx4, qs[128], r=100, keep=0.005)
    )
    yield "flat_m8_8bit_adc_b32", lambda: block(
        flat_mod.search_adc(fx8, qs[32], r=100)
    )
    # tq plane-major flat scans (round-5 kernel; int8 QADC + f32 ADC).
    fx4_tq = fx4.with_planes()
    assert fx4_tq.planes is not None
    yield "flat_m16_qadc_tq_b128", lambda: block(
        flat_mod.search_qadc(fx4_tq, qs[128], r=100, keep=0.005)
    )
    yield "flat_m16_adc4_f32_tq_b32", lambda: block(
        flat_mod.search_adc(fx4_tq, qs[32], r=100)
    )

    # rows_adc_grouped_prefetch standalone: the direct path's kernel, with
    # and without tile_min, both table widths.
    from qadc_tpu.index.ivf import tile_tables_rows
    from qadc_tpu.kernels.lut_scan import rows_adc_grouped_prefetch

    for m, pad in ivf_geoms:
        cb = m // 2
        cpr = 128 // cb
        rpp = pad // cpr
        gcap = 24
        tables = jnp.asarray(
            rng.normal(size=(gcap, m, 16)).astype(np.float32)
        )
        tlo, thi = tile_tables_rows(tables)
        gp = jnp.asarray(
            rng.integers(0, 256, size=(gcap,)).astype(np.int32)
        )
        codes = idx4[(m, pad)].codes.reshape(-1, 128)
        sz = jnp.asarray(
            rng.integers(pad // 2, pad, size=(gcap,)).astype(np.int32)
        )
        for tile in (None, 32):
            if tile is not None and rpp % tile:
                continue

            def run(codes=codes, gp=gp, tlo=tlo, thi=thi, rpp=rpp, cb=cb,
                    sz=sz, tile=tile):
                block(
                    rows_adc_grouped_prefetch(
                        codes, gp, tlo, thi, rpp, cb=cb, compact_out=True,
                        mask_sizes=sz, tile_min=tile,
                    )
                )

            yield f"rows_adc_m{m}_pad{pad}_tile{tile}", run


def main() -> int:
    import jax

    backend = jax.default_backend()
    print(f"lowering gate on backend={backend} devices={jax.devices()}",
          flush=True)
    if backend != "tpu":
        print("WARNING: not on TPU — this gate only proves Mosaic legality "
              "on real hardware; CPU runs use interpret-free XLA:CPU "
              "lowering which differs from Mosaic.", flush=True)
    failures = []
    t_all = time.time()
    for name, thunk in _entries():
        t0 = time.time()
        try:
            thunk()
            print(f"GATE ok   {name}  ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — every config must report
            failures.append(name)
            first = str(e).splitlines()[0][:200] if str(e) else repr(e)
            print(f"GATE FAIL {name}: {first}", flush=True)
            traceback.print_exc(limit=3, file=sys.stderr)
    print(f"gate total {time.time() - t_all:.1f}s; "
          f"{'FAIL: ' + ', '.join(failures) if failures else 'ALL OK'}",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
