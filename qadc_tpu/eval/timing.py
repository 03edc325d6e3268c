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
