"""Diagnose the 1M recall-ordering inversion (round-3 VERDICT weak #4).

RESULTS.md at 1M showed flat 8x8 (0.9219) > IVF-256 8x8 ma=24 (0.9141),
while the reference publishes IVF 0.9646 > flat 0.9419 on SIFT1M
(README.md:277-301). Hypotheses: (a) the moment-matched generator lacks the
cluster concentration that makes IVF residuals low-energy on real SIFT, so
residual-OPQ gains nothing and IVF nets the coverage loss; (b) the IVF
pipeline itself drops recall.

For each generator variant this script measures the decisive quantities:
  - residual energy ratio  E||x - c(x)||^2 / E||x - xbar||^2  at K=256
    (SIFT1M @ K=256 is ~0.25-0.45 in the PQ literature);
  - NN-partition coverage: P(true NN's partition probed within ma);
  - OPQ 8x8 reconstruction MSE on raw vs on residuals;
  - recall flat-8x8 vs IVF-8x8 (the inverted pair), plus relative contrast.

If (a) holds: the shipped generator shows ratio ~1 and coverage ~1 with
IVF <= flat, and a concentrated variant (lower lognormal scale spread /
additive noise) restores ratio ~0.4 AND the reference ordering without
leaving the SIFT-like recall regime. (b) would show low ratio yet IVF
still losing.

Run: python benchmarks/diag_recall_inversion.py [--n 300000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen(rng, n, nq, dim=128, clusters=2048, scale_spread=0.5,
        noise_spread=0.5):
    """sift_moment_like with the concentration knobs exposed."""
    cell_w = np.array([
        0.55, 0.75, 0.75, 0.55,
        0.75, 1.0, 1.0, 0.75,
        0.75, 1.0, 1.0, 0.75,
        0.55, 0.75, 0.75, 0.55,
    ])
    profile = np.repeat(cell_w, 8)[:dim]
    centers = rng.gamma(1.2, 40.0, size=(clusters, dim)).astype(np.float32)
    centers *= profile[None, :]

    def draw(k):
        who = rng.integers(0, clusters, k)
        c = centers[who]
        x = c * rng.lognormal(0.0, scale_spread, size=(k, 1)).astype(np.float32)
        x = x + rng.normal(scale=noise_spread * (c + 8.0)).astype(np.float32)
        return np.clip(np.rint(x), 0, 255).astype(np.float32)

    return draw(n), draw(nq)


def main():
    import jax
    import jax.numpy as jnp

    from qadc_tpu.eval.recall import recall_at_r
    from qadc_tpu.index import flat, ivf
    from qadc_tpu.ops.knn import assign_nearest, exact_knn
    from qadc_tpu.quantizers.opq import train_opq

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--nq", type=int, default=256)
    args = ap.parse_args()
    n, nq, parts = args.n, args.nq, 256

    variants = [
        ("shipped (scale .5, noise .5)", dict(scale_spread=0.5, noise_spread=0.5)),
        ("concentrated (scale .25, noise .35)",
         dict(scale_spread=0.25, noise_spread=0.35)),
        ("tight (scale .15, noise .25)",
         dict(scale_spread=0.15, noise_spread=0.25)),
    ]
    for name, kw in variants:
        rng = np.random.default_rng(0)
        base, queries = gen(rng, n, nq, **kw)
        learn = base[:100_000]
        _, gt = exact_knn(queries, base, 1)
        gt = np.asarray(gt)

        # relative contrast: mean NN dist / mean pairwise dist
        d_nn = np.sqrt(np.asarray(
            exact_knn(queries, base, 1)[0])[:, 0])
        sub = base[rng.choice(n, 2048, replace=False)]
        d_all = np.sqrt(
            np.maximum(((queries[:, None, :] - sub[None, :, :]) ** 2)
                       .sum(-1), 0))
        contrast = float(d_nn.mean() / d_all.mean())

        coarse = ivf.train_coarse(jax.random.PRNGKey(2), learn, parts, iters=25)
        coarse_np = np.asarray(coarse)
        a = np.asarray(assign_nearest(jnp.asarray(base), coarse))
        res = base - coarse_np[a]
        ratio = float((res ** 2).sum() / ((base - base.mean(0)) ** 2).sum())

        # NN-partition coverage at ma
        nn_part = a[gt[:, 0]]
        qd = ((queries[:, None, :] - coarse_np[None, :, :]) ** 2).sum(-1)
        order = np.argsort(qd, axis=1)
        cov = {ma: float(np.mean([
            nn_part[i] in order[i, :ma] for i in range(nq)
        ])) for ma in (8, 16, 24)}

        # OPQ 8x8 reconstruction MSE, raw vs residual (rotation is
        # orthonormal, so rotated-space MSE == original-space MSE)
        from qadc_tpu.quantizers.pq import decode, encode

        def opq_mse(vectors, key):
            q8 = train_opq(jax.random.PRNGKey(key), vectors[:100_000], 8, 8,
                           opq_iters=6, kmeans_iters=12)
            sample = jnp.asarray(
                vectors[rng.choice(len(vectors), 20_000, replace=False)])
            rec = decode(q8, encode(q8, sample))
            return float(np.asarray(
                ((q8.rotate(sample) - rec) ** 2).mean()))

        mse_raw = opq_mse(base, 3)
        mse_res = opq_mse(res, 4)

        # the inverted pair
        opq88 = train_opq(jax.random.PRNGKey(0), learn, 8, 8, opq_iters=6,
                          kmeans_iters=12)
        f88 = flat.add(flat.FlatIndex.create(opq88), base)
        l = []
        for s in range(0, nq, 32):
            l.append(np.asarray(flat.search_adc(f88, jnp.asarray(
                queries[s:s+32]), r=100)[1]))
        rec_flat = recall_at_r(np.concatenate(l), gt)

        r88 = train_opq(jax.random.PRNGKey(3),
                        learn - coarse_np[a[:100_000]], 8, 8,
                        opq_iters=6, kmeans_iters=12)
        i88 = ivf.add(ivf.IVFIndex.create(r88, coarse), base)
        l = []
        for s in range(0, nq, 32):
            l.append(np.asarray(ivf.search_adc(i88, jnp.asarray(
                queries[s:s+32]), r=100, ma=24)[1]))
        rec_ivf = recall_at_r(np.concatenate(l), gt)

        print(f"\n=== {name} (n={n}) ===")
        print(f"  relative contrast         {contrast:.3f}  (SIFT ~0.4-0.5)")
        print(f"  residual energy ratio     {ratio:.3f}  (SIFT@K256 ~0.25-0.45)")
        print(f"  NN-partition coverage     ma8={cov[8]:.3f} ma16={cov[16]:.3f} "
              f"ma24={cov[24]:.3f}")
        print(f"  OPQ8x8 MSE raw/residual   {mse_raw:.1f} / {mse_res:.1f} "
              f"(res/raw = {mse_res/mse_raw:.3f})")
        print(f"  recall@100 flat / IVFma24 {rec_flat:.4f} / {rec_ivf:.4f} "
              f"({'IVF wins (reference ordering)' if rec_ivf > rec_flat else 'INVERTED'})",
              flush=True)


if __name__ == "__main__":
    main()
