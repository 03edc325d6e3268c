"""Data-parallel top-k building blocks.

The reference's bound-pruned binheap (binheap.hpp:75-116) is inherently serial;
on TPU top-k becomes: (1) an optional windowed min-reduction that shrinks N
candidates to N/W per query with negligible recall loss (two of the true top-R
must collide in one window to lose one — probability ≈ R^2*W/(2N)), then
(2) an exact lax.top_k over the survivors, and for sharded scans (3) a merge of
per-shard (value, label) pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def window_min_reduce(dists, window: int, base_index: int = 0):
    """Per-window min + argmin along the leading (code) axis.

    Args:
      dists: (N, Q) distances (any dtype with ordering).
      window: W, must divide N.
      base_index: offset added to returned indices (global code offset).

    Returns:
      (vals (N//W, Q), idx (N//W, Q) int32) — per window, the min distance and
      the GLOBAL index of its code.
    """
    n, q = dists.shape
    if n % window != 0:
        raise ValueError(f"window {window} must divide N={n}")
    g = n // window
    shaped = dists.reshape(g, window, q)
    vals = jnp.min(shaped, axis=1)
    arg = jnp.argmin(shaped, axis=1).astype(jnp.int32)
    row_base = jnp.arange(g, dtype=jnp.int32)[:, None] * window + base_index
    return vals, arg + row_base


def bf16_screen(vals):
    """Cast screen inputs to bf16 on TPU (halves approx_min_k's input
    bytes); downstream uses of screened VALUES are limited to isfinite
    dead-slot masks, and exact reranks absorb selection-boundary swaps.

    Centralized so the pending hardware recall A/B (round-2 STATUS) is one
    switch: QADC_BF16_SCREEN=0 disables it everywhere. Off-TPU the screen is
    an exact top_k and stays f32 (bit-exact against oracles).
    """
    import os

    if jax.default_backend() == "tpu" and os.environ.get(
        "QADC_BF16_SCREEN", "1"
    ) != "0":
        return vals.astype(jnp.bfloat16)
    return vals


def screen_smallest(vals, k: int, recall_target: float = 0.95):
    """Approximate k-smallest screening along the last axis.

    On TPU the reduction is jax.lax.approx_min_k — the PartialReduce
    primitive from "TPU-KNN: K Nearest Neighbor Search at Peak FLOP/s" —
    measured ~9x faster than exact lax.top_k at (128, 65536), k=200. The
    aggregation over the (.., L) segment minima is the sort cascade instead
    of approx_min_k's built-in top_k (aggregate_to_topk pays the K-dominated
    TopK custom call: 51.3 -> 34.0 us at (1, 196608) k=200 on v5e,
    benchmarks/ab_b1.py); selection and tie order are identical — both are
    exact top-k over the same reduced set. Use for candidate SCREENING
    feeding an exact rerank (the rerank absorbs the reduction's ~1% deep-rank
    misses); use topk_smallest for final results. Falls back to exact top_k
    off-TPU.

    Returns (vals (..., k) f32 ascending, idx (..., k)).
    """
    if jax.default_backend() == "tpu":
        rv, ri = jax.lax.approx_min_k(
            vals, k, recall_target=recall_target, aggregate_to_topk=False
        )
        sv, si = exact_screen_smallest(rv, k)
        return sv, jnp.take_along_axis(ri, si, axis=-1)
    neg, idx = jax.lax.top_k(-vals.astype(jnp.float32), k)
    return -neg, idx


# Rows at or below this width go through a full stable sort instead of the
# TopK custom call. The custom call's cost is K-dominated (measured, v5e:
# (1, 98304) k=100 takes 68 us; k=200 over 8x fewer elements takes 88 us), so
# for a 200-wide row a sorting network over the whole row beats paying the
# k=100 fixed cost — this is the tail of the b=1 direct path. Ties break by
# position (stable sort), matching lax.top_k's lower-index-first order.
SORT_TOPK_MAX_C = 1024


def topk_smallest(dists, labels, k: int):
    """Top-k smallest along the LAST axis, carrying labels. Exact.

    Performance note (measured, v5e): the TPU TopK custom call's cost scales
    with K far more than with row length — (1, 98304) k=100 takes 68 us while
    k=200 over 8x fewer elements takes 88 us — and splitting a wide row into
    S parallel chunks of top-k makes it WORSE (each chunk pays the full
    K-cost; full-sort lowering for the merge). Keep exact top-k rows intact,
    and keep K small; screen with screen_smallest when approximation is
    acceptable. Tiny rows (C <= SORT_TOPK_MAX_C) dodge the custom call
    entirely via a stable variadic sort.

    Args:
      dists: (..., C) distances.
      labels: (..., C) int32 labels aligned with dists.
      k: result count.

    Returns:
      (vals (..., k) ascending, labels (..., k) int32).
    """
    d = jnp.asarray(dists, jnp.float32)
    c = d.shape[-1]
    if c <= max(SORT_TOPK_MAX_C, k):
        sv, sl = jax.lax.sort(
            (d, jnp.asarray(labels)), dimension=-1, num_keys=1, is_stable=True
        )
        return sv[..., :k], sl[..., :k]
    top, idx = jax.lax.top_k(-d, k)
    return -top, jnp.take_along_axis(labels, idx, axis=-1)


def exact_screen_smallest(vals, k: int, idx=None):
    """EXACT k-smallest + argmin indices along the last axis, sort-cascade.

    jax.lax.approx_min_k is a per-segment min reduction: it never loses the
    global minimum, but at (Q, 25k-200k) widths it captures only ~99% of the
    true top-100 (measured on v5e, benchmarks/diag_direct.py) — fine for a
    screened+reranked pipeline, a contract violation for the direct path's
    exact ranking. This keeps the per-chunk top-k via stable variadic sorts
    (rows <= SORT_TOPK_MAX_C, where a sort beats the K-dominated TopK custom
    call — see topk_smallest) and recurses on the per-chunk survivors: exact
    because a global top-k member is a top-k member of its chunk. Ties break
    by lower index (stable sorts over index-ordered chunks), matching
    lax.top_k.

    idx: optional (..., C) int32 CUSTOM payload returned in place of the
    positional indices (the cascade carries one int32 payload either way, so
    a caller-supplied column id rides free — a post-sort take_along_axis
    element gather is ~us-scale on TPU, benchmarks/profile_b1.py).

    Returns (vals (..., k) ascending, idx (..., k) int32).
    """
    lead = vals.shape[:-1]
    w = vals.shape[-1]
    v = jnp.asarray(vals, jnp.float32).reshape(-1, w)
    q = v.shape[0]
    if idx is None:
        idx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (q, w))
    else:
        idx = jnp.asarray(idx, jnp.int32).reshape(-1, w)
        idx = jnp.broadcast_to(idx, (q, w))
    c = max(SORT_TOPK_MAX_C, k)
    while v.shape[1] > c:
        w = v.shape[1]
        s = -(-w // c)
        kk = min(k, c)
        if s * kk >= w:  # chunking would not shrink: final sort handles it
            break
        if s * c != w:
            v = jnp.pad(v, [(0, 0), (0, s * c - w)], constant_values=jnp.inf)
            idx = jnp.pad(idx, [(0, 0), (0, s * c - w)])
        v = v.reshape(q * s, c)
        idx = idx.reshape(q * s, c)
        v, idx = jax.lax.sort((v, idx), dimension=-1, num_keys=1, is_stable=True)
        v = v[:, :kk].reshape(q, s * kk)
        idx = idx[:, :kk].reshape(q, s * kk)
    v, idx = jax.lax.sort((v, idx), dimension=-1, num_keys=1, is_stable=True)
    return v[:, :k].reshape(*lead, k), idx[:, :k].reshape(*lead, k)


def _screen_topk_enabled() -> bool:
    """A/B switch: run exact_tile_screen's two exact selections through
    lax.top_k instead of the sort cascade. Read at TRACE time (A/B harnesses
    must jax.clear_caches() between flips). Default OFF: top_k microbenches
    on the v5e are BIMODAL — the same (1, 3072) k=100 call measures either
    ~2 us or ~85 us across identical fori-chain runs (2026-08-20, 3-run
    stability check) — so the e2e number under this flag decides, not the
    primitive's microbench.
    """
    import os

    return os.environ.get("QADC_SCREEN_TOPK", "0") != "0"


def exact_tile_screen(vals, k: int, tile: int = 32, mins=None):
    """EXACT k-smallest + indices along the last axis, via tile minima.

    Same contract as exact_screen_smallest, at a fraction of the sort
    volume: reduce the row to N/tile tile-minima (one cheap VPU reduce),
    exactly screen THOSE, row-gather the winning tiles' members (contiguous
    tile-f32 slices — near-bandwidth, unlike element gathers), and exactly
    screen the k*tile members. Containment is provable: a true top-k
    element's tile min <= its value, so if its tile missed the top-k tile
    cut, k tiles with smaller minima would hold k smaller elements —
    contradiction. Ties at the tile boundary resolve by (tile, position)
    stable order: a valid top-k by value (tie ORDER may differ from
    lax.top_k when equal values straddle the cut).

    mins: optional (..., w // tile) PRECOMPUTED tile minima (the Pallas
    scan emits them in native layout — kernels.rows_adc_grouped_prefetch's
    tile_min); skips the min-reduce over (and relayout of) the full row.
    Must equal jnp.min over each contiguous tile; w % tile must be 0.

    Measured on the b=1 direct path (width 98304, k=200, v5e): 24 us vs
    56 us for the full per-chunk cascade and 22 us for the approx
    segment-min screen whose capture was data-dependent (0.85-1.00).
    """
    w = vals.shape[-1]
    if w <= max(4 * tile, k * 2 * tile, SORT_TOPK_MAX_C) and mins is None:
        return exact_screen_smallest(vals, k)  # tiling would not shrink
    lead = vals.shape[:-1]
    v = jnp.asarray(vals, jnp.float32).reshape(-1, w)
    pad = (-w) % tile
    if pad:
        if mins is not None:
            raise ValueError(f"precomputed mins require tile | width, got "
                             f"width={w} tile={tile}")
        v = jnp.pad(v, [(0, 0), (0, pad)], constant_values=jnp.inf)
    q, wp = v.shape
    ntiles = wp // tile
    dm = v.reshape(q, ntiles, tile)
    if mins is not None:
        if mins.shape[-1] != ntiles:
            raise ValueError(
                f"mins minor dim {mins.shape[-1]} != width//tile {ntiles}"
            )
        mins = jnp.asarray(mins, jnp.float32).reshape(q, ntiles)
    else:
        mins = jnp.min(dm, axis=-1)                        # (Q, ntiles)
    kt = min(k, ntiles)
    if _screen_topk_enabled():
        # TopK-custom-call variant (same exact selection, lower-index-first
        # ties like the stable cascade): one top_k for the tile cut, one for
        # the members, payload columns gathered after.
        _, ti = jax.lax.top_k(-mins, kt)
        ti = jax.lax.sort(ti, dimension=-1)                # ascending tile ids
        cand = jnp.take_along_axis(dm, ti[..., None], axis=1)
        cidx = ti[..., None] * tile + jnp.arange(tile, dtype=jnp.int32)
        nsv, mi = jax.lax.top_k(-cand.reshape(q, kt * tile), min(k, kt * tile))
        sv = -nsv
        idx = jnp.take_along_axis(cidx.reshape(q, kt * tile), mi, axis=-1)
    else:
        inner = exact_tile_screen if ntiles > 16384 else exact_screen_smallest
        _, ti = inner(mins, kt)                            # exact tile cut
        cand = jnp.take_along_axis(dm, ti[..., None], axis=1)  # (Q, kt, tile)
        # Members carry their GLOBAL column as the sort payload — no
        # post-sort take_along_axis element gather (those are per-element
        # expensive on TPU; the cascade carries one int32 payload either way).
        cidx = ti[..., None] * tile + jnp.arange(tile, dtype=jnp.int32)
        sv, idx = exact_screen_smallest(
            cand.reshape(q, kt * tile), min(k, kt * tile),
            idx=cidx.reshape(q, kt * tile),
        )
    kk = sv.shape[-1]
    if kk < k:  # row narrower than k after the tile cut: pad the contract
        sv = jnp.pad(sv, [(0, 0), (0, k - kk)], constant_values=jnp.inf)
        idx = jnp.pad(idx, [(0, 0), (0, k - kk)])
    return sv.reshape(*lead, k), idx.reshape(*lead, k)


def merge_topk(vals_a, labels_a, vals_b, labels_b, k: int):
    """Merge two per-query candidate sets into the k smallest."""
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    labels = jnp.concatenate([labels_a, labels_b], axis=-1)
    return topk_smallest(vals, labels, k)
