"""Jitted k-means: k-means++ init + Lloyd iterations.

Reference: learn_coarse_quantizer (databases.cpp:94-118) — OpenCV kmeans++
init (2 iterations) then 48 custom Lloyd iterations with OpenMP-parallel
assignment (databases.cpp:50-90). Here both phases are jitted JAX: assignment
is a GEMM+argmax on the MXU, the update is a segment-sum, and k-means++ is a
lax.scan over D^2-weighted draws with explicit PRNG keys.

The reference divides by zero on empty clusters (databases.cpp:83-88); here
empty clusters keep their previous centroid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from qadc_tpu.ops.knn import _neg_scores

DEFAULT_ITERS = 50  # reference kmeans_iter_max (databases.cpp:92): 2 cv + 48 Lloyd


@partial(jax.jit, static_argnames=("k",))
def kmeans_plusplus_init(key, x, k: int):
    """k-means++ seeding.

    Args:
      key: PRNG key.
      x: (N, dim) float32 data.
      k: number of centroids.

    Returns:
      (k, dim) float32 initial centroids.
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    key0, key_scan = jax.random.split(key)
    first = x[jax.random.randint(key0, (), 0, n)]

    x2 = jnp.sum(x * x, axis=-1)

    def sqdist_to(c):
        return jnp.maximum(x2 - 2.0 * x @ c + jnp.sum(c * c), 0.0)

    def step(carry, key_i):
        min_d2 = carry
        # Sample proportional to D^2 (fall back to uniform if all-zero).
        total = jnp.sum(min_d2)
        probs = jnp.where(total > 0, min_d2 / jnp.maximum(total, 1e-30), 1.0 / n)
        idx = jax.random.categorical(key_i, jnp.log(probs + 1e-30))
        c = x[idx]
        min_d2 = jnp.minimum(min_d2, sqdist_to(c))
        return min_d2, c

    keys = jax.random.split(key_scan, k - 1)
    _, rest = jax.lax.scan(step, sqdist_to(first), keys)
    return jnp.concatenate([first[None], rest], axis=0)


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(key, x, k: int, iters: int = DEFAULT_ITERS):
    """Full k-means.

    Args:
      key: PRNG key (init).
      x: (N, dim) float32.
      k: centroid count.
      iters: Lloyd iterations.

    Returns:
      (centroids (k, dim) float32, assignments (N,) int32).
    """
    x = jnp.asarray(x, jnp.float32)
    centroids = kmeans_plusplus_init(key, x, k)

    def lloyd(centroids, _):
        assign = jnp.argmax(_neg_scores(x, centroids), axis=-1)
        counts = jnp.zeros((k,), jnp.float32).at[assign].add(1.0)
        sums = jnp.zeros_like(centroids).at[assign].add(x)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep the previous centroid (reference bug fixed).
        new = jnp.where(counts[:, None] > 0, new, centroids)
        return new, None

    centroids, _ = jax.lax.scan(lloyd, centroids, None, length=iters)
    assign = jnp.argmax(_neg_scores(x, centroids), axis=-1).astype(jnp.int32)
    return centroids, assign
