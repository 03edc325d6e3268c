"""Tracing / profiling helpers.

Reference (SURVEY §5.1): hand-rolled ustime() phase timers emitted as CSV.
Here: the same phase metrics (eval/metrics.py) plus kernel-level tracing via
jax.profiler — traces open in XProf/TensorBoard and attribute time to the
Pallas kernels, collectives, and gathers individually.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace of the enclosed block into log_dir.

    View with: tensorboard --logdir <log_dir> (Profile tab), or xprof.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-span inside a trace (context manager)."""
    return jax.profiler.TraceAnnotation(name)


def timed(fn, *args, iters: int = 10, chain: bool = True):
    """Honest wall time per call for a jitted fn returning array(s).

    On this image's relayed TPU, block_until_ready does not fence execution
    (see bench.py); when chain=True each call's input is perturbed by the
    previous output's first element and a scalar readback fences the run.
    """
    out = fn(*args)
    first = jax.tree.leaves(out)[0]
    tap = float(first.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        if chain:
            perturbed = [args[0] + abs(tap) * 1e-12, *args[1:]]
            out = fn(*perturbed)
        else:
            out = fn(*args)
        tap = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters
