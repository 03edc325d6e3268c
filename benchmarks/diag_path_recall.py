"""Isolate WHERE the 1M recall inversion comes from: data or search path.

Round-4 facts so far:
  - 300k, CPU jnp path: IVF 0.973 > flat 0.926 (reference ordering holds;
    diag_recall_inversion.py).
  - 1M, TPU kernel paths: flat 0.949 > IVF 0.906 (inverted), with two
    anomalies that point at the GROUPED path rather than the data:
    IVF no-rerank (0.930) > rerank (0.910), and 4-bit qadc (0.910) >
    8-bit float adc (0.906).

This script builds ONE 1M index and measures recall@100 on the SAME
index/queries through every search path, so any difference is the path:
  flat 8x8 adc                     (range-chunked kernel)
  ivf 8x8 adc grouped=True         (grouped Pallas kernel)
  ivf 8x8 adc grouped=False        (jnp oracle semantics)
  ivf 16x4 qadc grouped rerank     (int8 screen + window rerank)
  ivf 16x4 qadc grouped no-rerank  (reference ranking)
  ivf 16x4 qadc direct=True        (exact float ADC over probed codes)

The direct path ranks by exact distance over the probed partitions, so its
recall is the CEILING for any ma=24 IVF variant on this data: grouped paths
below it lose recall in the pipeline; if even the ceiling sits below flat,
the data at 1M genuinely lacks IVF-exploitable structure.

Run: python benchmarks/diag_path_recall.py [--n 1000000] [--nq 256]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recall_curves import sift_moment_like  # noqa: E402


def batched(search_fn, queries, bs=32):
    outs = []
    for s in range(0, queries.shape[0], bs):
        _, l = search_fn(queries[s : s + bs])
        outs.append(np.asarray(l))
    return np.concatenate(outs)


def main():
    import jax

    from qadc_tpu.eval.recall import recall_at_r
    from qadc_tpu.index import flat, ivf
    from qadc_tpu.ops.knn import assign_nearest, exact_knn
    from qadc_tpu.quantizers.opq import train_opq

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=256)
    args = ap.parse_args()
    n, nq, parts = args.n, args.nq, 256

    rng = np.random.default_rng(0)
    t0 = time.time()
    base, queries = sift_moment_like(rng, n, nq=nq)
    learn = base[:100_000]
    _, gt = exact_knn(queries, base, 1)
    gt = np.asarray(gt)
    print(f"data+gt: {time.time()-t0:.0f}s  backend={jax.default_backend()}",
          file=sys.stderr, flush=True)

    # Same seeds/config as recall_curves.py so numbers line up.
    opq88 = train_opq(jax.random.PRNGKey(0), learn, 8, 8, opq_iters=6,
                      kmeans_iters=12)
    f88 = flat.add(flat.FlatIndex.create(opq88), base)
    coarse = ivf.train_coarse(jax.random.PRNGKey(2), learn, parts, iters=25)
    a = np.asarray(assign_nearest(learn, coarse))
    residuals = learn - np.asarray(coarse)[a]
    r88 = train_opq(jax.random.PRNGKey(3), residuals, 8, 8, opq_iters=6,
                    kmeans_iters=12)
    r164 = train_opq(jax.random.PRNGKey(4), residuals, 16, 4, opq_iters=6,
                     kmeans_iters=12)
    i88 = ivf.add(ivf.IVFIndex.create(r88, coarse), base)
    i164 = ivf.add(ivf.IVFIndex.create(r164, coarse), base)
    print(f"indexes built: {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    keep0 = 0.00213 * 4
    rows = []

    def run(name, fn, bs=32):
        t = time.time()
        rec = recall_at_r(batched(fn, queries, bs=bs), gt)
        rows.append((name, rec))
        print(f"{name:42s} {rec:.4f}   ({time.time()-t:.0f}s)", flush=True)

    run("flat 8x8 adc", lambda q: flat.search_adc(f88, q, r=100))
    run("ivf 8x8 adc grouped=True",
        lambda q: ivf.search_adc(i88, q, r=100, ma=24, grouped=True))
    run("ivf 8x8 adc grouped=False (jnp oracle)",
        lambda q: ivf.search_adc(i88, q, r=100, ma=24, grouped=False), bs=8)
    run("ivf 16x4 qadc grouped rerank",
        lambda q: ivf.search_qadc(i164, q, r=100, ma=24, keep=keep0,
                                  grouped=True, direct=False))
    run("ivf 16x4 qadc grouped no-rerank",
        lambda q: ivf.search_qadc(i164, q, r=100, ma=24, keep=keep0,
                                  grouped=True, direct=False, rerank=False))
    run("ivf 16x4 qadc direct (exact-ADC ceiling)",
        lambda q: ivf.search_qadc(i164, q, r=100, ma=24, direct=True), bs=8)

    print("\nverdict:")
    d = dict(rows)
    ceil = d.get("ivf 16x4 qadc direct (exact-ADC ceiling)")
    g8, j8 = d.get("ivf 8x8 adc grouped=True"), d.get(
        "ivf 8x8 adc grouped=False (jnp oracle)")
    if j8 is not None and g8 is not None and j8 - g8 > 0.01:
        print(f"  grouped 8-bit path LOSES {j8 - g8:.4f} recall vs jnp oracle"
              " -> pipeline bug, not data")
    if ceil is not None and d["flat 8x8 adc"] > ceil + 0.005:
        print("  even the exact-ADC ma=24 ceiling sits below flat -> the 1M"
              " synthetic genuinely lacks IVF-exploitable structure at this"
              " scale (generator artifact, not a pipeline bug)")
    if ceil is not None and d["ivf 16x4 qadc grouped rerank"] < ceil - 0.01:
        print(f"  grouped qadc sits {ceil - d['ivf 16x4 qadc grouped rerank']:.4f}"
              " below its probed-exact ceiling -> screen/window losses")


if __name__ == "__main__":
    main()
