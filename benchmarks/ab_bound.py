"""Dynamic-bound A/B: does a tighter int8 quantization bound buy recall?

The reference tightens its pruning bound INTRA-scan (bh.max() after every
match batch, simd_scan.hpp:76-118); the TPU design fixes the bound per
query from the keep-prefix. This measures what that departure costs at the
bench geometry (1M SIFT-moment clustered, balanced IVF-256, 16x4 OPQ,
ma=24, keep 0.852%) and whether bound tightening closes the measured 4-bit
recall gap (round-5 bench: qadc 0.9141 vs 8-bit 0.9844, rerank == norerank
-> the int8 screen's candidate set is the limiter):

  A  one-shot keep-prefix bound (production)
  B  r=200 (widens the window screen wq 2x; recall read @100)
  C  ORACLE bound: true r-th neighbor distance x 1.1 per query — an upper
     bound on ANY dynamic-bound scheme's benefit
  D  C + r=200
  E  two-phase: pass 1 = production; bound2 = pass-1 r-th distance x 1.02;
     pass 2 with bound2 (realizable: costs one extra scan, or amortizes
     by splitting the probe set)

Also reports bound magnitudes (one-shot vs oracle) and the int8 step size
ratio. Run: python benchmarks/ab_bound.py [--n 1000000] [--cache PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DEFAULT = "/tmp/qadc_ab_bound_cache.npz"


def build_or_load(n, cache):
    import jax
    import jax.numpy as jnp

    from qadc_tpu.eval.synth import sift_moment_like
    from qadc_tpu.index import ivf
    from qadc_tpu.index.ivf import IVFIndex
    from qadc_tpu.ops.knn import assign_nearest, exact_knn
    from qadc_tpu.quantizers.opq import OPQQuantizer, train_opq

    if cache and os.path.exists(cache):
        z = np.load(cache)
        if int(z["n"]) == n:
            pq = OPQQuantizer(
                centroids=jnp.asarray(z["cents"]), sq_bits=4,
                rotation=jnp.asarray(z["rot"]),
            )
            index = IVFIndex(
                pq=pq, coarse_centroids=jnp.asarray(z["coarse"]),
                codes=jnp.asarray(z["codes"]), labels=jnp.asarray(z["labels"]),
                part_sizes=jnp.asarray(z["sizes"]), n=int(z["n"]),
                max_part_size=int(z["mps"]),
            )
            print(f"loaded cached index from {cache}", file=sys.stderr)
            return index, z["queries"], z["gt"], z["gtd"]

    rng = np.random.default_rng(7)  # bench.py's recall-stage seed
    nq = 128
    base, queries = sift_moment_like(rng, n, nq=nq)
    learn = base[:100_000]
    gtd, gt = exact_knn(queries, base, 100)
    gt, gtd = np.asarray(gt)[:, :1], np.asarray(gtd)
    coarse = ivf.train_coarse(jax.random.PRNGKey(2), learn, 256, iters=25,
                              balance_cap=3.0)
    a = np.asarray(assign_nearest(learn, coarse))
    residuals = learn - np.asarray(coarse)[a]
    r164 = train_opq(jax.random.PRNGKey(4), residuals, 16, 4,
                     opq_iters=6, kmeans_iters=12)
    index = ivf.add(ivf.IVFIndex.create(r164, coarse), base)
    if cache:
        np.savez(
            cache, n=n, cents=np.asarray(r164.centroids),
            rot=np.asarray(r164.rotation), coarse=np.asarray(coarse),
            codes=np.asarray(index.codes), labels=np.asarray(index.labels),
            sizes=np.asarray(index.part_sizes), mps=index.max_part_size,
            queries=queries, gt=gt, gtd=gtd,
        )
    return index, queries, gt, gtd


def main():
    import jax.numpy as jnp

    from qadc_tpu.eval.recall import recall_at_r
    from qadc_tpu.index import ivf

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cache", default=CACHE_DEFAULT)
    args = ap.parse_args()

    index, queries, gt, gtd = build_or_load(args.n, args.cache)
    qs = jnp.asarray(queries)
    ma, keep0 = 24, 0.00213 * 4
    res = {}

    def rec(labels):
        return recall_at_r(np.asarray(labels)[:, :100], gt)

    def run(name, **kw):
        t0 = time.time()
        d, l = ivf.search_qadc(index, qs, ma=ma, keep=keep0, direct=False,
                               **kw)
        r_ = rec(l)
        res[name] = r_
        print(f"{name:<28} recall@100 {r_:.4f}   ({time.time()-t0:.0f}s)",
              flush=True)
        return np.asarray(d), np.asarray(l)

    d_a, _ = run("A_one_shot_r100", r=100)
    run("B_one_shot_r200", r=200)

    oracle = jnp.asarray(gtd[:, 99] * 1.1, jnp.float32)
    run("C_oracle_bound_r100", r=100, bound=oracle)
    run("D_oracle_bound_r200", r=200, bound=oracle)

    # E: realizable two-phase — pass-1 r-th distance as the pass-2 bound.
    b2 = jnp.asarray(
        np.where(np.isfinite(d_a[:, 99]), d_a[:, 99] * 1.02, np.inf),
        jnp.float32,
    )
    run("E_two_phase_r100", r=100, bound=b2)
    run("F_two_phase_r200", r=200, bound=b2)

    # Bound magnitudes: production keep-prefix vs oracle.
    from qadc_tpu.index.ivf import _quantized_tables

    prefix_pad = min(max(1, int(index.max_part_size * keep0)), index.part_pad)
    _, tables, _, _ = _quantized_tables(index, qs, 100, ma, keep0, prefix_pad)
    # recompute the production bound alone for reporting
    import jax

    parts, rot = ivf.assign_queries(index, qs, ma)
    res["bound_oracle_median"] = float(np.median(gtd[:, 99]))
    res["bound_two_phase_median"] = float(np.median(d_a[:, 99]))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
