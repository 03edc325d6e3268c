"""Shipped jitted direct path vs identical unjitted tail, same process:
find where they diverge."""

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
    from qadc_tpu.ops.topk import bf16_screen, screen_smallest, topk_smallest

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

    _, l_ex = ivf_mod.search_qadc(index, qs, r=r, ma=ma, direct=True)
    l_ex = np.asarray(l_ex)

    def cap(l):
        l = np.asarray(l)
        return float(np.mean([
            len(set(l[i].tolist()) & set(l_ex[i].tolist())) / r
            for i in range(nq)
        ]))

    dv, l_ship = ivf_mod.search_qadc(index, qs, r=r, ma=ma, direct=True)
    print(f"shipped jitted default: capture {cap(l_ship):.4f}")

    # identical graph, unjitted wrapper
    f = ivf_mod._search_qadc_direct_impl.__wrapped__
    dv2, l_unjit = f(index, qs, r, ma)
    print(f"same impl fn, unjitted: capture {cap(l_unjit):.4f}")

    # worst query: compare value columns
    l_ship = np.asarray(l_ship)
    caps = [len(set(l_ship[i].tolist()) & set(l_ex[i].tolist())) / r
            for i in range(nq)]
    wi = int(np.argmin(caps))
    print(f"worst query {wi}: capture {caps[wi]:.2f}")
    print("ship d[:10] ", np.asarray(dv)[wi, :10])
    print("unjit d[:10]", np.asarray(dv2)[wi, :10])
    ex_d, _ = ivf_mod.search_qadc(index, qs, r=r, ma=ma, direct=True)
    print("exact d[:10]", np.asarray(ex_d)[wi, :10])


if __name__ == "__main__":
    main()
