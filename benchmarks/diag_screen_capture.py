"""Which knob recovers the direct path's deep-rank capture on clustered data?

The default-screen contract measured 0.8609 top-100 capture at the contract
index (clustered candidates), vs 0.9906 on uniform values. Suspects: bf16
rounding of heavily-tied distances, approx_min_k's segment collisions
(recall_target), or both. Sweep them and time each at the real b=1 shape.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from qadc_tpu.index import ivf as ivf_mod
    from qadc_tpu.ops.knn import assign_nearest
    from qadc_tpu.quantizers.pq import train_pq
    from qadc_tpu.eval.timing import fori_slope_seconds
    from qadc_tpu.ops.topk import exact_screen_smallest

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(11)
    dim, n, parts_n, m, nq = 64, 30000, 32, 16, 64
    centers = rng.normal(scale=2.0, size=(48, dim)).astype(np.float32)
    base = (centers[rng.integers(0, 48, n)]
            + rng.normal(size=(n, dim)).astype(np.float32) * 0.7)
    queries = (centers[rng.integers(0, 48, nq)]
               + rng.normal(size=(nq, dim)).astype(np.float32) * 0.7)
    coarse = ivf_mod.train_coarse(jax.random.PRNGKey(0), base[:10000],
                                  parts_n, iters=6)
    a0 = np.asarray(assign_nearest(base[:10000], coarse))
    pq = train_pq(jax.random.PRNGKey(1),
                  base[:10000] - np.asarray(coarse)[a0], m, 4, iters=6)
    index = ivf_mod.add(ivf_mod.IVFIndex.create(pq, coarse), base)
    qs = jnp.asarray(queries)
    r, ma = 100, 8

    # exact reference labels from the exact mode (proven vs oracle)
    _, l_ex = ivf_mod.search_qadc(index, qs, r=r, ma=ma, direct=True)
    l_ex = np.asarray(l_ex)

    def capture(l):
        l = np.asarray(l)
        return float(np.mean([
            len(set(l[i].tolist()) & set(l_ex[i].tolist())) / r
            for i in range(nq)
        ]))

    # A. shipped default (bf16 + rt 0.95)
    d, l = ivf_mod.search_qadc(index, qs, r=r, ma=ma, direct=True)
    print(f"A. default (bf16, rt=.95): capture {capture(l):.4f}")

    # B. f32 screen (QADC_BF16_SCREEN=0)
    os.environ["QADC_BF16_SCREEN"] = "0"
    jax.clear_caches()
    _, l = ivf_mod.search_qadc(index, qs, r=r, ma=ma, direct=True)
    print(f"B. f32 screen,  rt=.95  : capture {capture(l):.4f}")
    os.environ.pop("QADC_BF16_SCREEN", None)

    # C. recall_target sweep on the actual screened matrix (f32 + bf16)
    parts, rot = ivf_mod.assign_queries(index, qs, ma)
    # rebuild d exactly as the direct impl does, via its own stages: easiest
    # is to call the impl up to the screen — instead reuse search internals:
    # screen input reconstruction
    import math as _m
    from qadc_tpu.index.ivf import tile_tables_rows
    from qadc_tpu.kernels.lut_scan import (
        rows_adc_block_rows, rows_adc_grouped_prefetch)

    tables = ivf_mod.adc_tables(rot, index.pq.centroids)
    q = qs.shape[0]
    qa = q * ma
    cb = index.pq.code_size
    cpr = index.cpr
    rpp = index.part_pad // cpr
    tlo, thi = tile_tables_rows(tables.reshape(qa, m, 16))
    pflat = parts.reshape(qa)
    blk_rows = rows_adc_block_rows(rpp)
    sz_rows = -(-index.part_sizes[pflat] // cpr)
    dmat = rows_adc_grouped_prefetch(
        index.codes.reshape(-1, 128), pflat, tlo, thi, rpp, cb=cb,
        compact_out=True,
        group_nblk=jnp.clip((sz_rows + blk_rows - 1) // blk_rows, 1,
                            rpp // blk_rows).astype(jnp.int32),
    ).reshape(q, ma * index.part_pad)
    sz = index.part_sizes[parts]
    col = jnp.arange(index.part_pad, dtype=jnp.int32)
    code_of_col = (col % rpp) * cpr + col // rpp
    valid = (code_of_col[None, None, :] < sz[:, :, None]).reshape(
        q, ma * index.part_pad)
    big = jnp.float32(3.0e38)
    dmat = jnp.where(valid, dmat, big)

    _, si_ex = exact_screen_smallest(dmat, 2 * r)
    top_ex = np.asarray(si_ex)[:, :r]

    for rt in (0.95, 0.99, 0.999):
        for cast in ("f32", "bf16"):
            x = dmat.astype(jnp.bfloat16) if cast == "bf16" else dmat
            rv, ri = jax.lax.approx_min_k(x, 2 * r, recall_target=rt,
                                          aggregate_to_topk=False)
            sv, ss = exact_screen_smallest(rv.astype(jnp.float32), 2 * r)
            sel = np.asarray(jnp.take_along_axis(ri, ss, axis=-1))
            cap = np.mean([
                len(set(sel[i].tolist()) & set(top_ex[i].tolist())) / r
                for i in range(nq)
            ])
            print(f"C. rt={rt} {cast}: L={rv.shape[-1]:6d} capture {cap:.4f}")

    # D. timing at the real b=1 SIFT shape for the promising settings
    w = 196608
    dbig = jnp.asarray(rng.uniform(0, 1, size=(1, w)).astype(np.float32))
    for rt in (0.95, 0.99, 0.999):
        def body(args, tap):
            (a,) = args
            rv, ri = jax.lax.approx_min_k(
                (a + tap * 1e-12).astype(jnp.bfloat16), 200,
                recall_target=rt, aggregate_to_topk=False)
            sv, ss = exact_screen_smallest(rv.astype(jnp.float32), 200)
            return sv.sum() + (jnp.take_along_axis(ri, ss, -1) % 7).sum() * 1e-20

        dt = fori_slope_seconds(body, (dbig,), k_lo=4, k_hi=24)
        print(f"D. rt={rt} bf16 @(1,{w}): {dt*1e6:7.1f} us")


if __name__ == "__main__":
    main()
