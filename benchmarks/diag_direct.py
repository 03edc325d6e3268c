"""Diagnose the direct-path exact-ranking contract failure on real TPU.

smoke_tpu's direct_path_exact_ranking_vs_numpy_oracle failed on first
hardware run (2026-08-19). Two suspects:
  (1) the fused compact_out selector matmul inside the rows_adc kernel —
      exactness depends on Mosaic honoring Precision.HIGHEST
      (kernels/lut_scan.py _rows_adc_group_compact_kernel);
  (2) jax.lax.approx_min_k screening at recall_target=0.95 genuinely
      dropping true top-r members at (Q, ma*part_pad) widths.

This script isolates each stage:
  A. micro: in-kernel dot(x, selector, HIGHEST) vs numpy float64;
  B. rows_adc_grouped_prefetch compact_out vs non-compact + XLA HIGHEST
     matmul (same in-kernel accumulate, isolates only the fused matmul);
  C. full direct search with screen_smallest forced EXACT (monkeypatched
     top_k) — if the contract then passes, the screen was the culprit;
  D. measure approx_min_k's actual hit rate vs exact at contract shapes.
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    assert jax.default_backend() == "tpu", "diagnosis is for real hardware"
    rng = np.random.default_rng(11)

    # ---- A. micro selector-matmul precision probe -------------------------
    cb, cpr = 8, 16
    x = jnp.asarray(rng.uniform(0, 500, size=(512, 128)).astype(np.float32))
    smat_np = np.zeros((128, 128), np.float32)
    smat_np[np.arange(128), np.arange(128) // cb] = 1.0
    smat = jnp.asarray(smat_np)

    def _k(x_ref, s_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], s_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    got = pl.pallas_call(
        _k, out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32)
    )(x, smat)
    want = np.asarray(x, np.float64) @ np.asarray(smat_np, np.float64)
    err = np.abs(np.asarray(got, np.float64) - want)[:, :cpr]
    rel = (err / np.maximum(np.abs(want[:, :cpr]), 1e-9)).max()
    print(f"A. in-kernel HIGHEST selector matmul: max rel err {rel:.3e} "
          f"({'f32-exact' if rel < 1e-6 else 'bf16-CONTAMINATED' if rel > 1e-4 else 'intermediate'})")

    # also probe DEFAULT precision for comparison
    def _kd(x_ref, s_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], s_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    got_d = pl.pallas_call(
        _kd, out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32)
    )(x, smat)
    err_d = np.abs(np.asarray(got_d, np.float64) - want)[:, :cpr]
    rel_d = (err_d / np.maximum(np.abs(want[:, :cpr]), 1e-9)).max()
    print(f"   (DEFAULT precision baseline: max rel err {rel_d:.3e})")

    # ---- contract index (identical setup to smoke_tpu.contracts) ----------
    from qadc_tpu.index import ivf as ivf_mod
    from qadc_tpu.ops.knn import assign_nearest
    from qadc_tpu.quantizers.pq import train_pq
    from qadc_tpu.index.ivf import tile_tables_rows

    dim, n, parts_n, m, nq = 64, 30000, 32, 16, 64
    centers = rng.normal(scale=2.0, size=(48, dim)).astype(np.float32)
    base = (centers[rng.integers(0, 48, n)]
            + rng.normal(size=(n, dim)).astype(np.float32) * 0.7)
    queries = (centers[rng.integers(0, 48, nq)]
               + rng.normal(size=(nq, dim)).astype(np.float32) * 0.7)
    coarse = ivf_mod.train_coarse(jax.random.PRNGKey(0), base[:10000], parts_n,
                                  iters=6)
    a0 = np.asarray(assign_nearest(base[:10000], coarse))
    pq = train_pq(jax.random.PRNGKey(1),
                  base[:10000] - np.asarray(coarse)[a0], m, 4, iters=6)
    index = ivf_mod.add(ivf_mod.IVFIndex.create(pq, coarse), base)
    qs = jnp.asarray(queries)
    r, ma = 100, 8

    # ---- B. compact_out vs non-compact lane sums --------------------------
    from qadc_tpu.kernels.lut_scan import rows_adc_grouped_prefetch
    import math as _math

    parts, rot = ivf_mod.assign_queries(index, qs, ma)
    tables = ivf_mod.adc_tables(rot, index.pq.centroids)
    q = qs.shape[0]
    qa = q * ma
    cbv = index.pq.code_size
    cprv = index.cpr
    rpp = index.part_pad // cprv
    tlo, thi = tile_tables_rows(tables.reshape(qa, m, 16))
    pflat = parts.reshape(qa)
    blk_rows = _math.gcd(512, rpp)
    sz_rows = -(-index.part_sizes[pflat] // cprv)
    gnb = jnp.clip((sz_rows + blk_rows - 1) // blk_rows, 1, rpp // blk_rows
                   ).astype(jnp.int32)
    d_compact = rows_adc_grouped_prefetch(
        index.codes.reshape(-1, 128), pflat, tlo, thi, rpp, cb=cbv,
        compact_out=True, group_nblk=gnb,
    )                                          # (QA*cpr, rpp)
    lane = rows_adc_grouped_prefetch(
        index.codes.reshape(-1, 128), pflat, tlo, thi, rpp, cb=cbv,
        compact_out=False, group_nblk=gnb,
    )                                          # (QA*rpp, 128)
    smat2 = jnp.asarray(
        (np.arange(128)[:, None] // cbv) == np.arange(cprv)[None, :],
        jnp.float32)
    d_ref = jnp.dot(lane, smat2, precision=jax.lax.Precision.HIGHEST)
    d_ref = d_ref.reshape(qa, rpp, cprv).transpose(0, 2, 1).reshape(
        qa * cprv, rpp)
    dc = np.asarray(d_compact)
    dr = np.asarray(d_ref)
    diff = np.abs(dc - dr)
    denom = np.maximum(np.abs(dr), 1e-9)
    print(f"B. compact_out vs non-compact+XLA-HIGHEST: max abs {diff.max():.3e}"
          f"  max rel {(diff / denom).max():.3e}")

    # ---- C/D. screen isolation --------------------------------------------
    from benchmarks.smoke_tpu import (
        _np_ivf_adc_oracle, _tie_aware_labels_equal)
    from qadc_tpu.core.layout import from_row128
    from qadc_tpu.core.packing import unpack_codes

    coarse_np = np.asarray(index.coarse_centroids)
    cents_np = np.asarray(index.pq.centroids)
    sizes_np = np.asarray(index.part_sizes)
    labels_np = np.asarray(index.labels)
    packed = np.asarray(
        from_row128(np.asarray(index.codes).reshape(-1, 128),
                    index.pq.code_size)
    ).reshape(parts_n, index.part_pad, index.pq.code_size)
    codes_u = np.asarray(unpack_codes(packed, m, 4))
    parts_np = np.asarray(parts)
    d_orc, l_orc = _np_ivf_adc_oracle(
        queries, parts_np, coarse_np, cents_np, codes_u, labels_np,
        sizes_np, r)

    def check(tag, d, l):
        d, l = np.asarray(d), np.asarray(l)
        ad = np.abs(d - d_orc)
        n_bad = int((ad > (1e-3 + 2e-4 * np.abs(d_orc))).sum())
        ok, where = _tie_aware_labels_equal(d_orc, l_orc, l, 1e-3)
        print(f"{tag}: max|dd|={ad.max():.3e}  entries>tol={n_bad}/{d.size}"
              f"  labels {'OK' if ok else f'MISMATCH at {where}'}")

    d1, l1 = ivf_mod.search_qadc(index, qs, r=r, ma=ma, direct=True)
    check("C0. direct as shipped", d1, l1)

    os.environ["QADC_BF16_SCREEN"] = "0"
    jax.clear_caches()
    d2, l2 = ivf_mod.search_qadc(index, qs, r=r, ma=ma, direct=True)
    check("C1. direct, f32 screen", d2, l2)
    os.environ.pop("QADC_BF16_SCREEN", None)

    # force an exact screen
    orig = ivf_mod.screen_smallest

    def exact_screen(vals, k, recall_target=0.95):
        neg, idx = jax.lax.top_k(-vals.astype(jnp.float32), k)
        return -neg, idx

    ivf_mod.screen_smallest = exact_screen
    jax.clear_caches()
    try:
        d3, l3 = ivf_mod.search_qadc(index, qs, r=r, ma=ma, direct=True)
        check("C2. direct, EXACT screen", d3, l3)
    finally:
        ivf_mod.screen_smallest = orig
        jax.clear_caches()

    # D. approx_min_k hit rate at the contract shape
    width = ma * index.part_pad
    vals = jnp.asarray(rng.uniform(0, 1, size=(nq, width)).astype(np.float32))
    wq = 2 * r
    _, si_a = jax.lax.approx_min_k(vals, wq, recall_target=0.95)
    _, si_e = jax.lax.top_k(-vals, wq)
    hits = np.mean([
        len(set(np.asarray(si_a)[i].tolist())
            & set(np.asarray(si_e)[i].tolist())) / wq
        for i in range(nq)
    ])
    # and within the top-r specifically
    hits_r = np.mean([
        len(set(np.asarray(si_a)[i].tolist())
            & set(np.asarray(si_e)[i, :r].tolist())) / r
        for i in range(nq)
    ])
    print(f"D. approx_min_k@(Q,{width}) wq={wq}: recall vs exact {hits:.4f}; "
          f"true top-{r} captured {hits_r:.4f}")


if __name__ == "__main__":
    main()
