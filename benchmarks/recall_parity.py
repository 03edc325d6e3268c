"""Recall parity vs the reference's published SIFT1M table (README.md:277-330).

Reference numbers (SIFT1M, R=100, batch 32):
  flat OPQ 8x8  ADC        recall@100 = 0.9419
  IVF-256 OPQ 8x8 ADC m24  recall@100 = 0.9646
  IVF-256 OPQ 16x4 QADC    recall@100 = 0.9426   (m24, keep 0.213%)
  => 4-bit accuracy cost: IVF delta = 0.022; flat 16x4 ~ parity with 8x8.

SIFT1M itself is unavailable here (zero egress); this benchmark uses a
SIFT-like synthetic (latent low-dimensional structure: x = A z + noise, so
features are correlated and OPQ matters) and checks the same DELTAS: the
4-bit Quick-ADC path must track the 8-bit float path within the reference's
stated gaps.

Run: python benchmarks/recall_parity.py [--n 1000000] [--small]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def sift_like(rng, n, dim=128, latent=64, nq=256, noise=0.4):
    """Correlated synthetic: x = A z + eps, z in a low-dim latent.

    latent=64/noise=0.4 is tuned so 8-byte codes land near the reference's
    SIFT1M recall regime (~0.94) instead of saturating at 1.0 — the deltas
    between configurations are the meaningful output.
    """
    a = rng.normal(size=(latent, dim)).astype(np.float32)
    z_base = rng.normal(size=(n, latent)).astype(np.float32)
    base = z_base @ a + noise * rng.normal(size=(n, dim)).astype(np.float32)
    z_q = rng.normal(size=(nq, latent)).astype(np.float32)
    queries = z_q @ a + noise * rng.normal(size=(nq, dim)).astype(np.float32)
    return base.astype(np.float32), queries.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from qadc_tpu.eval.recall import recall_at_r
    from qadc_tpu.index import flat, ivf
    from qadc_tpu.ops.knn import assign_nearest, exact_knn
    from qadc_tpu.quantizers.opq import train_opq

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    n = 100_000 if args.small else args.n
    parts = 64 if args.small else 256
    ma = 24
    nq = 256

    rng = np.random.default_rng(0)
    t0 = time.time()
    base, queries = sift_like(rng, n, nq=nq)
    _, gt = exact_knn(queries, base, 1)
    gt = np.asarray(gt)
    print(f"data+gt: {time.time()-t0:.0f}s", flush=True)

    learn = base[:100_000]
    results = {}

    # ---- quantizers (in-framework OPQ training, 8x8 and 16x4)
    t0 = time.time()
    opq88 = train_opq(jax.random.PRNGKey(0), learn, 8, 8, opq_iters=6, kmeans_iters=12)
    opq164 = train_opq(jax.random.PRNGKey(1), learn, 16, 4, opq_iters=6, kmeans_iters=12)
    print(f"flat OPQs trained: {time.time()-t0:.0f}s", flush=True)

    # ---- flat
    f88 = flat.add(flat.FlatIndex.create(opq88), base)
    _, l = flat.search_adc(f88, queries, r=100)
    results["flat_8x8_adc"] = recall_at_r(np.asarray(l), gt)

    f164 = flat.add(flat.FlatIndex.create(opq164), base)
    keep_flat = max(200 / n, 0.00213)
    _, l = flat.search_qadc(f164, queries, r=100, keep=keep_flat)
    results["flat_16x4_qadc"] = recall_at_r(np.asarray(l), gt)
    _, l = flat.search_qadc(f164, queries, r=100, keep=keep_flat, rerank=False)
    results["flat_16x4_qadc_norerank"] = recall_at_r(np.asarray(l), gt)

    # ---- IVF (coarse quantizer + OPQ on residuals, per config)
    t0 = time.time()
    coarse = ivf.train_coarse(jax.random.PRNGKey(2), learn, parts, iters=25)
    a = np.asarray(assign_nearest(learn, coarse))
    residuals = learn - np.asarray(coarse)[a]
    r88 = train_opq(jax.random.PRNGKey(3), residuals, 8, 8, opq_iters=6, kmeans_iters=12)
    r164 = train_opq(jax.random.PRNGKey(4), residuals, 16, 4, opq_iters=6, kmeans_iters=12)
    print(f"IVF quantizers trained: {time.time()-t0:.0f}s", flush=True)

    i88 = ivf.add(ivf.IVFIndex.create(r88, coarse), base)
    _, l = ivf.search_adc(i88, queries, r=100, ma=ma)
    results["ivf_8x8_adc_ma24"] = recall_at_r(np.asarray(l), gt)

    i164 = ivf.add(ivf.IVFIndex.create(r164, coarse), base)
    _, l = ivf.search_qadc(i164, queries, r=100, ma=ma, keep=0.00213 * 4)
    results["ivf_16x4_qadc_ma24"] = recall_at_r(np.asarray(l), gt)
    _, l = ivf.search_qadc(i164, queries, r=100, ma=ma, keep=0.00213 * 4, rerank=False)
    results["ivf_16x4_qadc_ma24_norerank"] = recall_at_r(np.asarray(l), gt)

    results["delta_flat_4bit_vs_8bit"] = results["flat_8x8_adc"] - results["flat_16x4_qadc"]
    results["delta_ivf_4bit_vs_8bit"] = results["ivf_8x8_adc_ma24"] - results["ivf_16x4_qadc_ma24"]
    results["reference_delta_ivf"] = 0.022
    results["reference_flat_8x8"] = 0.9419
    results["reference_ivf_8x8"] = 0.9646
    results["reference_ivf_16x4"] = 0.9426
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
