"""Measured per-geometry kernel-parameter autotuning (opt-in, cached).

The grouped scan paths ship fixed heuristics — block_n = gcd(2048, part_pad),
window = codes-per-storage-row — picked by measurement at the headline SIFT1M
geometry on one chip (docs/kernels.md). Other geometries (GIST's M=32,
Deep100M's partition shapes) may prefer different blocks. This module times
the REAL search at the index's true geometry on the live backend with the
fori-chain slope timer (eval/timing.py — the relay's ~8 ms fixed dispatch
cost cancels in the slope) and caches the winning parameters keyed by
(backend, path, geometry, batch bucket), in memory and on disk.

Opt-in two ways:
  - explicit: ``pick = tune_ivf_qadc(index, queries, r=, ma=, keep=)`` at
    index-load time; subsequent ``search_qadc`` calls read the recorded pick
    automatically (when the caller did not pass block_n/grouped_window).
  - env ``QADC_AUTOTUNE=1``: search wrappers tune lazily on the first call
    per (geometry, batch bucket). Each candidate costs one XLA compile
    (20-40 s on the relay), so first-call latency is minutes — production
    should ship the cache file instead (``QADC_AUTOTUNE_CACHE``).

The reference has no analog (its scan blocks are fixed by SIMD register
shape, simd_scan.hpp:125-187); on TPU the right block is a measured
property of geometry x compiler, hence tuned, not hardcoded.
"""

from __future__ import annotations

import json
import os
import threading

_mem: dict[str, dict] = {}
_disk_loaded = False
_lock = threading.Lock()


def _cache_path() -> str:
    return os.environ.get(
        "QADC_AUTOTUNE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "qadc_tpu", "autotune.json"
        ),
    )


def _bundled_defaults_path() -> str:
    return os.path.join(os.path.dirname(__file__), "autotune_defaults.json")


def _load_disk() -> None:
    global _disk_loaded
    if _disk_loaded:
        return
    _disk_loaded = True
    # User cache first (its entries win), then the bundled measured defaults
    # shipped with the package (v5e sweeps at common geometries — see
    # autotune_defaults.json provenance comments in git history) so a fresh
    # install starts from a measured pick instead of the fixed heuristic.
    for path in (_cache_path(), _bundled_defaults_path()):
        try:
            with open(path) as f:
                on_disk = json.load(f)
        except (OSError, ValueError):
            continue
        for k, v in on_disk.items():
            _mem.setdefault(k, v)


def _save_disk() -> None:
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_mem, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is an optimization; never fail a search over it


def batch_bucket(q: int) -> int:
    """Quantize batch size to the serving buckets so one tuning run covers a
    range of nearby batch sizes (1, 8, 32, 128, 512, 2048).

    512 and 2048 are SEPARATE buckets deliberately: at Deep100M geometry the
    b=512 winner (window 8) is 1.6x better there but 5.6x WORSE at b=2048 —
    the doubled minima stream pushes the scan-budget governor into query
    chunking (measured 2026-08-20, benchmarks/RESULTS.md autotune section).
    """
    for b in (1, 8, 32, 128, 512):
        if q <= b:
            return b
    return 2048


def geometry_key(index, path: str, q: int) -> str:
    import jax

    pq = index.pq
    parts = getattr(index, "part_count", 0)
    pp = getattr(index, "part_pad", 0)
    return (
        f"{jax.default_backend()}|{path}|m{pq.sq_count}x{pq.sq_bits}"
        f"|d{pq.dim}|pp{pp}|parts{parts}|b{batch_bucket(q)}"
    )


def lookup(key: str) -> dict:
    with _lock:
        _load_disk()
        return dict(_mem.get(key, {}))


def record(key: str, pick: dict) -> None:
    with _lock:
        _load_disk()
        _mem[key] = dict(pick)
        _save_disk()


def enabled() -> bool:
    return os.environ.get("QADC_AUTOTUNE", "").strip() in ("1", "true", "on")


def tune_ivf_qadc(
    index,
    queries,
    r: int = 100,
    ma: int = 24,
    keep: float = 0.00213,
    block_candidates=(512, 1024, 2048),
    window_candidates=None,
    k_lo: int = 20,
    k_hi: int = 80,
    verbose: bool = False,
    interpret: bool = False,
) -> dict:
    """Measure the grouped Quick-ADC search over candidate (block_n,
    grouped_window) pairs at this index's geometry and record the winner.

    Returns the winning pick, e.g. {"block_n": 2048, "grouped_window": 16}.
    """
    import jax.numpy as jnp

    from qadc_tpu.core.layout import codes_per_row
    from qadc_tpu.eval.timing import fori_slope_seconds
    from qadc_tpu.index import ivf

    queries = jnp.asarray(queries)
    cpr = codes_per_row(index.pq.code_size)
    if window_candidates is None:
        base_w = min(cpr, 16)
        window_candidates = sorted({base_w, max(base_w // 2, 1)})
    # Candidate blocks must divide part_pad (kernel grid constraint) and
    # hold at least one window group.
    pp = index.part_pad or 512
    cands = [
        (bn, w)
        for bn in block_candidates
        if pp % bn == 0
        for w in window_candidates
        if bn % w == 0 and bn // w >= 1
    ]
    if not cands:
        return {}

    best, best_dt = None, float("inf")
    results = {}
    for bn, w in cands:
        def body(args, tap, _bn=bn, _w=w):
            idx, qs = args
            d, _ = ivf.search_qadc(
                idx, qs + tap * 1e-12, r=r, ma=ma, keep=keep,
                grouped=True, direct=False, grouped_window=_w, block_n=_bn,
                interpret=interpret,
            )
            return d[0, 0]

        try:
            dt = fori_slope_seconds(
                body, (index, queries), k_lo=k_lo, k_hi=k_hi
            )
        except Exception:  # noqa: BLE001 — an invalid candidate loses, not crashes
            continue
        results[(bn, w)] = dt
        if verbose:
            print(f"autotune ivf_qadc block_n={bn} window={w}: "
                  f"{dt * 1e6:.1f} us/call")
        if dt < best_dt:
            best, best_dt = {"block_n": bn, "grouped_window": w}, dt
    # CONFIRM before recording: one short-chain measure at a big-call
    # geometry can be a relay outlier (a Deep100M sweep once scored a
    # config at 29.8 ms/call whose honest repeats were ~120 ms and which
    # regressed the production path 2.5x when recorded —
    # benchmarks/RESULTS.md, autotune re-sweep section). Re-measure the
    # winner against the shipped heuristic at double chain length and
    # record only a confirmed >3% win.
    import math as _math

    heur = {
        "block_n": _math.gcd(2048, pp),
        "grouped_window": min(cpr, 16),
    }
    if best is not None and best != heur:
        def _confirm(pick):
            def body(args, tap):
                idx, qs_ = args
                d, _ = ivf.search_qadc(
                    idx, qs_ + tap * 1e-12, r=r, ma=ma, keep=keep,
                    grouped=True, direct=False,
                    grouped_window=pick["grouped_window"],
                    block_n=pick["block_n"], interpret=interpret,
                )
                return d[0, 0]

            return fori_slope_seconds(
                body, (index, queries), k_lo=2 * k_lo, k_hi=2 * k_hi
            )

        try:
            t_best = _confirm(best)
            t_heur = _confirm(heur)
        except Exception:  # noqa: BLE001 — confirmation failure: keep heuristic
            return {}
        if verbose:
            print(f"autotune confirm: pick {t_best * 1e6:.1f} us/call vs "
                  f"heuristic {t_heur * 1e6:.1f}")
        if t_best > t_heur * 0.97:
            return {}
    if best is not None:
        record(geometry_key(index, "ivf_qadc_grouped", queries.shape[0]), best)
    return best or {}
