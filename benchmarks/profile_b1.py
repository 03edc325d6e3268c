"""Stage-level profile of the b=1 direct IVF path (fori-chain slope timing).

Times cumulative prefixes of _search_qadc_direct_impl's stages; successive
differences are per-stage device costs with relay dispatch cancelled.
Run: python benchmarks/profile_b1.py [batch]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from qadc_tpu.eval.timing import fori_slope_seconds
    from qadc_tpu.index.ivf import (
        adc_tables,
        assign_queries,
        rows_adc,
        tile_tables_rows,
    )
    from qadc_tpu.kernels.lut_scan import rows_adc_grouped_prefetch
    from qadc_tpu.ops.topk import screen_smallest, topk_smallest

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    r, ma = 100, 24

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    rng = np.random.default_rng(0)
    index = bench._make_ivf(rng)
    queries = jnp.asarray(rng.normal(size=(batch, 128)).astype(np.float32))

    m = index.pq.sq_count
    cb = index.pq.code_size
    cpr = index.cpr
    rpp = index.part_pad // cpr

    def front(idx, qs):
        parts, rot = assign_queries(idx, qs, ma)
        tables = adc_tables(rot, idx.pq.centroids)
        qa = qs.shape[0] * ma
        tlo, thi = tile_tables_rows(tables.reshape(qa, m, 16))
        return parts, tlo, thi

    def kernel(idx, parts, tlo, thi):
        # Production kernel: compact fused-epilogue output + block trimming
        # + tile minima for the screen (_search_qadc_direct_impl).
        from qadc_tpu.kernels.lut_scan import rows_adc_block_rows

        pflat = parts.reshape(-1)
        blk_rows = rows_adc_block_rows(rpp)
        sz_flat = idx.part_sizes[pflat]
        sz_rows = -(-sz_flat // cpr)
        tile = 32 if rpp % 32 == 0 else None
        qa = pflat.shape[0]
        ppg = next(
            (p for p in (4, 3, 2) if qa % p == 0), 1
        ) if blk_rows == rpp else 1
        return rows_adc_grouped_prefetch(
            idx.codes.reshape(-1, 128), pflat, tlo, thi, rpp, cb=cb,
            compact_out=True,
            group_nblk=jnp.clip(
                (sz_rows + blk_rows - 1) // blk_rows, 1, rpp // blk_rows
            ).astype(jnp.int32),
            mask_sizes=sz_flat,  # fused validity mask (kernel epilogue)
            tile_min=tile,
            pairs_per_step=ppg,
        )

    def mask(idx, parts, dm, q):
        # Validity masking is fused into the kernel epilogue (mask_sizes);
        # this stage is now just the (Q, width) views for the screen.
        d, mins = dm
        return (
            d.reshape(q, ma * idx.part_pad),
            mins.reshape(q, ma * idx.part_pad // 32),
        )

    def screen(idx, parts, dm, q, wq):
        # Production screen: EXACT tile-min cascade at wq == r, fed the
        # kernel's precomputed tile minima (ascending output IS the final
        # ranking — no second top-k, no 2*r oversampling).
        from qadc_tpu.ops.topk import exact_tile_screen

        d, mins = dm
        return exact_tile_screen(d, wq, mins=mins)

    def labels_of(idx, parts, col):
        # Winners-only label reconstruction (select-accumulate the partition
        # ids, one (Q, r) element gather) AFTER the final cut.
        from qadc_tpu.index.ivf import _select_cols

        a_id = col // idx.part_pad
        within = col % idx.part_pad
        part_sel = _select_cols(parts, a_id, ma)
        code_local = (within % rpp) * cpr + within // rpp
        return idx.labels.reshape(-1)[part_sel * idx.part_pad + code_local]

    stages = {}

    def bodies(upto):
        def body(args, tap):
            idx, qs = args
            qs = qs + tap * 1e-12
            q = qs.shape[0]
            parts, tlo, thi = front(idx, qs)
            if upto == 1:
                return tlo.sum()
            d = kernel(idx, parts, tlo, thi)
            if upto == 2:
                return d[0][0, 0] + d[1][0, 0]
            d = mask(idx, parts, d, q)
            if upto == 3:
                return d[0][0, 0] + d[1][0, 0]
            sv, col = screen(idx, parts, d, q, r)
            if upto == 4:
                return sv[0, 0]
            fl = labels_of(idx, parts, col)
            return jnp.where(
                sv[0, 0] >= 3.0e38, jnp.inf, sv[0, 0]
            ) + fl[0, 0].astype(jnp.float32) * 1e-30

        return body

    k_lo, k_hi = (100, 500) if batch == 1 else (30, 150)
    prev = 0.0
    names = ["front", "kernel", "mask", "screen", "labels"]
    for i, name in enumerate(names, start=1):
        dt = fori_slope_seconds(
            bodies(i), (index, queries), k_lo=k_lo, k_hi=k_hi
        )
        us = dt * 1e6
        stages[name] = us - prev
        print(f"cum @{name:<7} {us:8.1f} us   stage {us - prev:7.1f} us",
              flush=True)
        prev = us
    total = prev
    print(f"\nb={batch}: total {total:.1f} us "
          f"({total / batch:.1f} us/query)")
    for n, v in stages.items():
        print(f"  {n:<7} {v:7.1f} us  {100 * v / total:5.1f}%")


if __name__ == "__main__":
    main()
