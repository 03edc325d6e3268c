"""Honest device timing under relayed/async dispatch.

Two failure modes make naive timing lie on remote-attached TPUs:

1. `block_until_ready` may return before device execution completes (the
   relay acks enqueue, not completion). Fix: make iteration i+1's INPUT
   depend on iteration i's OUTPUT inside one jit (a scalar tap), and fence
   the end with a host readback of a scalar.
2. Every jit CALL carries a large fixed dispatch cost (measured ~8 ms per
   call through the axon relay, independent of inner work). Amortizing over
   k inner iterations still leaves fixed/k in the estimate. Fix: measure two
   chain lengths and take the SLOPE — per-iteration device time with the
   fixed cost cancelled.

Usage: build `time_call(k) -> seconds per outer call` (warmed up, chained,
fenced), then `slope_seconds(time_call)`.
"""

from __future__ import annotations

from typing import Callable


def slope_seconds(
    time_call: Callable[[int], float], k_lo: int = 8, k_hi: int = 40
) -> float:
    """Per-iteration seconds via slope fit over two chain lengths.

    Args:
      time_call: k -> average seconds of one outer call whose body runs the
        workload k times, chained, warmed up, and fenced by a scalar readback.
    """
    t_lo = time_call(k_lo)
    t_hi = time_call(k_hi)
    return max((t_hi - t_lo) / (k_hi - k_lo), 0.0)


def fori_slope_seconds(
    body: Callable, args, k_lo: int = 100, k_hi: int = 500, iters: int = 3
):
    """Per-iteration seconds via a DEVICE-SIDE fori_loop chain, slope-fit.

    Stronger than the unrolled-chain slope for two reasons (both measured):
    (1) the chain length k is a TRACED argument — one compile serves every k,
    so chains can be long enough that device time dwarfs the relay RTT (the
    unrolled variant underestimates when exec < RTT: the relay overlaps
    dispatch with execution, hiding up to ~60% of short chains — a b=1
    search measured 150 us/iter at k=16..48 vs its true 220 us); (2) no
    per-iteration dispatch exists at all — the loop runs on device.

    Args:
      body: (args, tap scalar) -> new tap scalar; must make iteration i+1's
        input depend on iteration i's output (chain through tap).
      args: pytree of device arrays passed as jit ARGUMENTS (closing over
        big arrays would embed them as HLO constants).
    """
    import jax
    import jax.numpy as jnp
    import time as _time

    @jax.jit
    def chained(a, k):
        return jax.lax.fori_loop(
            0, k, lambda i, tap: body(a, tap), jnp.float32(0)
        )

    def t(k):
        _ = float(chained(args, k))  # warm + fence
        best = float("inf")
        for _ in range(iters):
            t0 = _time.time()
            _ = float(chained(args, k))
            best = min(best, _time.time() - t0)
        return best

    t_lo, t_hi = t(k_lo), t(k_hi)
    slope = (t_hi - t_lo) / (k_hi - k_lo)
    if slope <= 0.0:
        # Noise exceeded the device time (tiny workloads on a loaded host):
        # fall back to the amortized long chain — an upper bound that still
        # excludes most of the fixed dispatch cost, and never zero/negative.
        return t_hi / k_hi
    return slope


def fori_slope_percentiles(
    body: Callable, args, k_lo: int = 100, k_hi: int = 500, trials: int = 20
):
    """Latency percentiles from repeated slope trials (BASELINE asks p50).

    Each trial times one k_lo chain and one k_hi chain back-to-back and
    takes that PAIR's slope — per-trial device seconds/iteration with the
    relay's fixed dispatch cost cancelled within the trial. The trial
    distribution then yields percentiles. Caveats stated in the result:
    percentiles are over CHAIN-AVERAGED iterations (a chain smooths
    per-iteration spikes shorter than k_lo), and p99 from `trials` samples
    is the upper tail estimate, not a calibrated 1%-quantile.

    Returns dict(p50, p90, p99, mean) in seconds/iteration.
    """
    import jax
    import jax.numpy as jnp
    import time as _time

    import numpy as _np

    @jax.jit
    def chained(a, k):
        return jax.lax.fori_loop(
            0, k, lambda i, tap: body(a, tap), jnp.float32(0)
        )

    def once(k):
        t0 = _time.time()
        _ = float(chained(args, k))
        return _time.time() - t0

    _ = float(chained(args, k_lo))  # compile + warm
    _ = float(chained(args, k_hi))
    slopes = []
    for _ in range(trials):
        t_lo = once(k_lo)
        t_hi = once(k_hi)
        slopes.append(max((t_hi - t_lo) / (k_hi - k_lo), 0.0))
    s = _np.asarray(slopes)
    return {
        "p50": float(_np.percentile(s, 50)),
        "p90": float(_np.percentile(s, 90)),
        "p99": float(_np.percentile(s, 99)),
        "mean": float(s.mean()),
    }


def make_time_call(build_chained: Callable[[int], Callable], run, iters: int = 3):
    """Standard time_call builder.

    Args:
      build_chained: k -> a callable (usually a jit) executing k chained steps.
      run: (chained) -> None; must call chained and fence with a scalar
        readback. Called once for warmup and `iters` times under the clock.
    """
    import time as _time

    def time_call(k: int) -> float:
        chained = build_chained(k)
        run(chained)  # warmup (compile)
        t0 = _time.time()
        for _ in range(iters):
            run(chained)
        return (_time.time() - t0) / iters

    return time_call
