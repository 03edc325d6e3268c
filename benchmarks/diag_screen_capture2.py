"""Pin down why the shipped direct path (bf16 screen) loses deep ranks while
an identical-looking reconstruction outside jit does not."""

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
    from qadc_tpu.ops.topk import (bf16_screen, exact_screen_smallest,
                                   screen_smallest, topk_smallest)

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
    wq = 2 * r

    _, l_ex = ivf_mod.search_qadc(index, qs, r=r, ma=ma, direct=True)
    l_ex = np.asarray(l_ex)

    # rebuild d EXACTLY as the impl does
    import math as _m
    from qadc_tpu.index.ivf import tile_tables_rows, _select_cols
    from qadc_tpu.kernels.lut_scan import (
        rows_adc_block_rows, rows_adc_grouped_prefetch)

    parts, rot = ivf_mod.assign_queries(index, qs, ma)
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
    d = rows_adc_grouped_prefetch(
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
    d = jnp.where(valid, d, big)

    # replicate the impl's tail OUTSIDE jit, step by step
    _, si = screen_smallest(bf16_screen(d), wq)
    sv = jnp.take_along_axis(d, si, axis=-1)
    a_id = si // index.part_pad
    part_sel = _select_cols(parts, a_id, ma)
    within = si % index.part_pad
    code_local = (within % rpp) * cpr + within // rpp
    sl = index.labels.reshape(-1)[part_sel * index.part_pad + code_local]
    fv, fl = topk_smallest(sv, sl, r)
    fl = np.asarray(fl)
    cap = np.mean([
        len(set(fl[i].tolist()) & set(l_ex[i].tolist())) / r
        for i in range(nq)
    ])
    print(f"replicated tail, bf16 screen: capture {cap:.4f}")

    # now WITHOUT the impl's bf16 cast
    _, si2 = screen_smallest(d, wq)
    sv2 = jnp.take_along_axis(d, si2, axis=-1)
    miss = np.mean([
        len(set(np.asarray(si)[i].tolist()) ^ set(np.asarray(si2)[i].tolist()))
        for i in range(nq)
    ])
    print(f"screen index sets bf16 vs f32: mean symmetric diff {miss:.1f}")

    # does the bf16 SCREEN drop true winners, or does the tail mangle them?
    _, si_ex = exact_screen_smallest(d, wq)
    top_ex_idx = np.asarray(si_ex)[:, :r]
    cap_scr = np.mean([
        len(set(np.asarray(si)[i].tolist()) & set(top_ex_idx[i].tolist())) / r
        for i in range(nq)
    ])
    print(f"bf16 screen captures true top-{r} indices: {cap_scr:.4f}")

    # sanity: label distinctness (duplicates shrink set intersections)
    dup_ex = np.mean([r - len(set(l_ex[i].tolist())) for i in range(nq)])
    dup_got = np.mean([r - len(set(fl[i].tolist())) for i in range(nq)])
    print(f"mean duplicate labels per row: exact={dup_ex:.2f} default={dup_got:.2f}")


if __name__ == "__main__":
    main()
