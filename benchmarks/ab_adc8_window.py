"""A/B: grouped 8-bit IVF window size (16 vs 8) after whole-window expansion.

The round-4 expansion rerank costs wq*window exact-f32 element gathers per
query — at window=16 that is ~60% of the adc8 b=32 budget (350 us/q). A
smaller window halves the expansion volume but doubles the kernel's
window-minima output stream and the screen width. This measures both sides
at the headline geometry (1M codes, IVF-256, ma=24, r=100, b=32) plus
recall parity against the jnp oracle on clustered data.

Run: python benchmarks/ab_adc8_window.py [--n 1000000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from qadc_tpu.eval.recall import recall_at_r
    from qadc_tpu.eval.timing import fori_slope_seconds
    from qadc_tpu.index import ivf
    from qadc_tpu.index.ivf import _search_adc8_grouped_impl
    from qadc_tpu.ops.knn import assign_nearest, exact_knn
    from qadc_tpu.quantizers.pq import train_pq

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=128)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    centers = rng.normal(scale=2.0, size=(512, 128)).astype(np.float32)
    base = (centers[rng.integers(0, 512, args.n)]
            + rng.normal(size=(args.n, 128)).astype(np.float32) * 0.7)
    queries = (centers[rng.integers(0, 512, args.nq)]
               + rng.normal(size=(args.nq, 128)).astype(np.float32) * 0.7)
    learn = base[:100_000]
    coarse = ivf.train_coarse(jax.random.PRNGKey(0), learn, 256, iters=10)
    a = np.asarray(assign_nearest(learn, coarse))
    pq = train_pq(jax.random.PRNGKey(1), learn - np.asarray(coarse)[a], 8, 8,
                  iters=8)
    index = ivf.add(ivf.IVFIndex.create(pq, coarse), base)
    _, gt = exact_knn(jnp.asarray(queries), jnp.asarray(base), 1)
    gt = np.asarray(gt)
    qs = jnp.asarray(queries[:32])
    print(f"backend={jax.default_backend()} part_pad={index.part_pad}",
          flush=True)

    # Oracle recall for parity.
    l_orc = np.asarray(
        ivf.search_adc(index, jnp.asarray(queries), r=100, ma=24,
                       grouped=False)[1]
    )
    rec_orc = recall_at_r(l_orc, gt)
    print(f"jnp oracle recall@100: {rec_orc:.4f}", flush=True)

    for window in (16, 8, 4):
        def body(args_, tap, _w=window):
            idx, q_ = args_
            d, _ = _search_adc8_grouped_impl(
                idx, q_ + tap * 1e-12, 100, 24, 128, window=_w
            )
            return d[0, 0]

        try:
            dt = fori_slope_seconds(body, (index, qs), k_lo=8, k_hi=32)
        except Exception as e:  # noqa: BLE001
            print(f"window={window}: FAIL {type(e).__name__}: "
                  f"{' '.join(str(e).split())[:160]}", flush=True)
            continue
        l = []
        for s in range(0, args.nq, 32):
            l.append(np.asarray(_search_adc8_grouped_impl(
                index, jnp.asarray(queries[s:s+32]), 100, 24, 128,
                window=window)[1]))
        rec = recall_at_r(np.concatenate(l), gt)
        print(f"window={window}: {dt*1e6/32:7.1f} us/query (b=32)  "
              f"recall@100={rec:.4f} (oracle {rec_orc:.4f})", flush=True)


if __name__ == "__main__":
    main()
