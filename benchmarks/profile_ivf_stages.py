"""Stage-by-stage profile of the grouped Quick-ADC IVF search (real TPU).

Times CUMULATIVE PREFIXES of the PRODUCTION pipeline (front, +route, +slabs,
+kernel, +window-select, +rerank = full) with chained-in-jit iterations and a
single scalar readback (the axon relay acks without completing — see
bench.py), then differences them into per-stage costs.

The stage bodies mirror index.ivf._search_qadc_grouped_impl at HEAD — tq
(plane-major) grouped kernel when the index carries planes, EXACT tile
screen, wq = r — so the deltas attribute the same work the e2e number pays.
(An earlier version replicated the round-4 pipeline — row128 kernel, approx
screen, wq = 2r — and its deltas stopped matching production; if these
stages drift from the impl again, trust the impl.)

Run: python benchmarks/profile_ivf_stages.py [--ma 24] [--q 128]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def build_index(rng, dim=128, parts=256, part_pad=4096, m=16, real=3906):
    import jax.numpy as jnp
    from qadc_tpu.index.ivf import IVFIndex
    from qadc_tpu.quantizers.pq import ProductQuantizer

    pq = ProductQuantizer(
        centroids=jnp.asarray(rng.normal(size=(m, 16, dim // m)).astype(np.float32)),
        sq_bits=4,
    )
    return IVFIndex(
        pq=pq,
        coarse_centroids=jnp.asarray(rng.normal(size=(parts, dim)).astype(np.float32)),
        codes=jnp.asarray(
            rng.integers(0, 256, size=(parts, part_pad // 16, 128), dtype=np.uint8)
        ),
        labels=jnp.asarray(
            np.arange(parts * part_pad, dtype=np.int32).reshape(parts, part_pad)
        ),
        part_sizes=jnp.asarray(np.full((parts,), real, np.int32)),
        n=parts * real,
        max_part_size=real,
    ).with_planes()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ma", type=int, default=24)
    ap.add_argument("--q", type=int, default=128)
    ap.add_argument("--r", type=int, default=100)
    ap.add_argument("--keep", type=float, default=0.005)
    ap.add_argument("--group-size", type=int, default=64)
    ap.add_argument("--window", type=int, default=16)
    ap.add_argument("--block-n", type=int, default=2048)
    ap.add_argument("--k-inner", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from qadc_tpu.index import ivf as ivf_mod
    from qadc_tpu.index.ivf import (
        _group_nblk,
        _group_table_slabs_tq,
        _quantized_tables,
        _window_valid_mask,
        window_rerank,
    )
    from qadc_tpu.index.routing import route_queries
    from qadc_tpu.kernels.lut_scan import (
        build_scan_tables_tq,
        lut_scan_grouped_tq,
    )
    from qadc_tpu.ops.topk import exact_tile_screen
    import math

    rng = np.random.default_rng(0)
    index = build_index(rng)
    q, r, ma, keep = args.q, args.r, args.ma, args.keep
    queries = jnp.asarray(rng.normal(size=(q, index.pq.dim)).astype(np.float32))
    m = index.pq.sq_count
    part_pad = index.part_pad
    prefix_pad = max(1, int(index.max_part_size * keep))
    window = args.window
    group_size = args.group_size
    block_n = math.gcd(args.block_n, part_pad)
    qa = q * ma
    c = part_pad // window
    assert index.tq_block_n() == block_n and block_n % (window * 128) == 0, (
        "profile geometry no longer routes to the tq kernel — update this "
        "profiler alongside _search_qadc_grouped_impl"
    )

    # ---- pipeline stages as composable pieces; stage k returns a scalar tap.
    def front(idx, qs):
        parts, tables, qtables, tiles = _quantized_tables(
            idx, qs, r, ma, keep, prefix_pad
        )
        return (parts, tables, qtables, tiles), qtables.astype(jnp.float32).sum()

    def route(idx, st):
        parts, tables, qtables, tiles = st
        routed = route_queries(parts, idx.part_count, group_size)
        return (
            (parts, tables, qtables, tiles, routed),
            routed.group_part.sum().astype(jnp.float32),
        )

    def slabs(idx, st):
        parts, tables, qtables, tiles, routed = st
        tcat_pairs = build_scan_tables_tq(qtables.reshape(qa, m, 16), q_pad=qa)
        (gcat,) = _group_table_slabs_tq(routed, tcat_pairs)
        return (
            (parts, tables, qtables, tiles, routed, gcat),
            gcat.astype(jnp.float32).sum(),
        )

    def kern(idx, st):
        parts, tables, qtables, tiles, routed, gcat = st
        nblk = _group_nblk(
            idx.part_sizes, routed.group_part, block_n, part_pad // block_n
        )
        vals_rows = lut_scan_grouped_tq(
            idx.planes, routed.group_part, gcat,
            rows_per_group=part_pad, cb=m // 2, block_n=block_n,
            window=window, group_nblk=nblk,
        )
        return (
            (parts, tables, tiles, routed, vals_rows),
            vals_rows.astype(jnp.float32)[0, 0],
        )

    def winsel(idx, st):
        parts, tables, tiles, routed, vals_rows = st
        g = routed.group_size
        qa_g = routed.qa_group.reshape(qa)
        qa_s = routed.qa_slot.reshape(qa)
        cv = vals_rows[qa_g * g + qa_s].astype(jnp.float32)    # (QA, C)
        p_of_pair = parts.reshape(qa)
        sz = idx.part_sizes[p_of_pair]
        cv = jnp.where(
            _window_valid_mask(sz, c, block_n, window, m // 2), cv, jnp.inf
        )
        wq = min(r, ma * c)                                    # production wq
        cv_q = cv.reshape(q, ma * c)
        screen_v, selq = exact_tile_screen(cv_q, wq)
        sel_ai = selq // c
        sel_wi = selq % c
        sel_pair = jnp.arange(q, dtype=jnp.int32)[:, None] * ma + sel_ai
        sel_part = jnp.take_along_axis(parts, sel_ai, axis=1)
        sel_sz = jnp.take_along_axis(sz.reshape(q, ma), sel_ai, axis=1)
        return (
            (tables, tiles, screen_v, sel_part, sel_pair, sel_wi, sel_sz),
            screen_v.sum(),
        )

    def rerank(idx, st):
        tables, tiles, screen_v, sel_part, sel_pair, sel_wi, sel_sz = st
        d, l = window_rerank(
            idx.codes.reshape(-1, 128), idx.labels.reshape(-1), part_pad,
            tables, screen_v, sel_part, sel_pair, sel_wi, sel_sz,
            r, block_n, window, tiles=tiles,
        )
        return None, jnp.where(jnp.isfinite(d), d, 0.0).sum()

    stages = [front, route, slabs, kern, winsel, rerank]
    names = ["front", "route", "slabs", "kernel", "winsel", "rerank"]

    def make_prefix_fn(k, k_inner):
        @jax.jit
        def run(idx, qs):
            tap = jnp.float32(0)
            for _ in range(k_inner):
                st, t = front(idx, qs + tap * 1e-12)
                tap = t
                for s in stages[1:k]:
                    st, t = s(idx, st)
                    tap = t
            return tap
        return run

    from qadc_tpu.eval.timing import slope_seconds

    results = {}
    for k in range(1, len(stages) + 1):
        def time_call(k_inner, k=k):
            fn = make_prefix_fn(k, k_inner)
            _ = float(fn(index, queries))  # warmup + fence
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(index, queries)
            _ = float(out)
            return (time.time() - t0) / args.iters

        dt = slope_seconds(time_call, k_lo=args.k_inner, k_hi=args.k_inner * 4)
        results[names[k - 1]] = dt
        print(f"prefix through {names[k-1]:8s}: {dt*1e3:8.3f} ms/batch "
              f"({dt*1e6/q:7.2f} us/query)")

    prev = 0.0
    print("\nper-stage deltas:")
    for n in names:
        d = results[n] - prev
        print(f"  {n:8s}: {d*1e3:8.3f} ms/batch ({d*1e6/q:7.2f} us/query)")
        prev = results[n]


if __name__ == "__main__":
    main()
