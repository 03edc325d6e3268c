"""End-to-end example: the reference's SIFT1M workflow, qadc-tpu style.

With the real SIFT1M files (http://corpus-texmex.irisa.fr/) this reproduces
the reference README walkthrough; without them it falls back to a synthetic
set so the example always runs.

  python examples/sift_pipeline.py [--data-dir sift/]

Reference workflow (README.md:220-330):
  indexdb_create1 -> external OPQ training -> indexdb_create2 -> db_add
  -> db_query_4 -r 100 -m 24 -k 0.213 -b 32
qadc-tpu workflow: train in-framework, build, add, search — four calls.
"""

import argparse
import os
import time

import numpy as np


def load_or_synthesize(data_dir):
    from qadc_tpu.io import load_vectors

    paths = {
        "learn": os.path.join(data_dir or "", "sift_learn.fvecs"),
        "base": os.path.join(data_dir or "", "sift_base.fvecs"),
        "query": os.path.join(data_dir or "", "sift_query.fvecs"),
        "gt": os.path.join(data_dir or "", "sift_groundtruth.ivecs"),
    }
    if data_dir and all(os.path.exists(p) for p in paths.values()):
        return (
            load_vectors(paths["learn"]),
            load_vectors(paths["base"]),
            load_vectors(paths["query"]),
            load_vectors(paths["gt"], to_float=False),
            "SIFT1M",
        )
    print("SIFT1M not found — using a synthetic stand-in")
    from qadc_tpu.ops.knn import exact_knn

    rng = np.random.default_rng(0)
    a = rng.normal(size=(64, 128)).astype(np.float32)
    mk = lambda n: (rng.normal(size=(n, 64)).astype(np.float32) @ a
                    + 0.4 * rng.normal(size=(n, 128)).astype(np.float32))
    learn, base, query = mk(100_000), mk(200_000), mk(256)
    _, gt = exact_knn(query, base, 10)
    return learn, base, query, np.asarray(gt), "synthetic"


def main():
    import jax

    from qadc_tpu.eval.recall import recall_at_r
    from qadc_tpu.index import ivf
    from qadc_tpu.index.ivf import keep_for_init
    from qadc_tpu.ops.knn import assign_nearest
    from qadc_tpu.quantizers.opq import train_opq

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    args = ap.parse_args()
    learn, base, query, gt, name = load_or_synthesize(args.data_dir)

    # 1. Coarse quantizer (replaces indexdb_create1).
    t0 = time.time()
    coarse = ivf.train_coarse(jax.random.PRNGKey(0), learn, part_count=256)
    print(f"coarse k-means: {time.time()-t0:.0f}s")

    # 2. OPQ on residuals (replaces the external Quantizations project +
    #    convert-quantizer.py + indexdb_create2).
    t0 = time.time()
    a = np.asarray(assign_nearest(learn, coarse))
    residuals = learn - np.asarray(coarse)[a]
    opq = train_opq(jax.random.PRNGKey(1), residuals, sq_count=16, sq_bits=4)
    print(f"OPQ 16x4 training: {time.time()-t0:.0f}s")

    # 3. Build + add (replaces db_add).
    t0 = time.time()
    index = ivf.add(ivf.IVFIndex.create(opq, coarse), base)
    print(f"encode+add {index.n} vectors: {time.time()-t0:.0f}s")

    # 4. Search (replaces db_query_4 -r 100 -m 24 -k 0.213 -b 32).
    keep = keep_for_init(200, index.part_count, 24, index.n)
    dists, labels = ivf.search_qadc(index, query, r=100, ma=24, keep=keep)
    rec = recall_at_r(np.asarray(labels), gt)
    print(f"{name}: recall@100 = {rec:.4f} (reference SIFT1M publishes 0.9426)")


if __name__ == "__main__":
    main()
