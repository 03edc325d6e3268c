"""A/B: window-screen width wq = r vs 2r on the grouped Quick-ADC path.

Post-tq the rerank tail dominates the b=32 budget (profile_ivf_stages:
rerank 9.6 us/q vs kernel 7.1): its candidate volume is wq*window per
query. The exact screen's containment argument (top-wq QUANTIZED window
minima with wq >= r hold the quantized top-r) does not by itself bound the
f32-reranked recall — the 2r margin was for int8 quantization coarseness
near the cut. ab_bound variant B already showed WIDENING (4r) buys
nothing; this measures NARROWING to r: recall@100 + b=32 e2e.

MEASURED + ADOPTED (v5e 2026-08-20): recall IDENTICAL at wq = r / 1.5r /
2r (0.9141 on the 1M parity build — the 16x4 exact-ADC ceiling, matching
every ab_bound variant) and b=32 45.7 -> 39.9 us/q on that build. wq = r
is now the production default; screen_windows=200 reproduces the old 2r.

Run after benchmarks/ab_bound.py has populated the cache:
    python benchmarks/ab_screen_width.py [--cache /tmp/qadc_ab_bound_cache.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.ab_bound import build_or_load
    from qadc_tpu.eval.recall import recall_at_r
    from qadc_tpu.eval.timing import fori_slope_seconds
    from qadc_tpu.index import ivf

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cache", default="/tmp/qadc_ab_bound_cache.npz")
    args = ap.parse_args()

    index, queries, gt, _ = build_or_load(args.n, args.cache)
    r, ma, keep = 100, 24, 0.00852
    q32 = jnp.asarray(np.asarray(queries)[:32])

    for sw, label in ((0, "wq=2r (production)"), (100, "wq=r"),
                      (150, "wq=1.5r")):
        d, l = jax.block_until_ready(ivf.search_qadc(
            index, queries, r=r, ma=ma, keep=keep, grouped=True,
            screen_windows=sw,
        ))
        rec = recall_at_r(np.asarray(l), np.asarray(gt))

        def body(a, tap, sw=sw):
            idx, qs = a
            dd, _ = ivf.search_qadc(
                idx, qs + tap * 1e-12, r=r, ma=ma, keep=keep, grouped=True,
                screen_windows=sw,
            )
            return dd.sum()

        dt = fori_slope_seconds(body, (index, q32), k_lo=20, k_hi=100)
        print(f"{label:22s}: recall@100 {rec:.4f}   b=32 {dt*1e6/32:6.1f} us/q")


if __name__ == "__main__":
    main()
