"""A/B: screen stage of the direct path — approx_min_k vs exact sort-cascade.

Shapes are the direct path's: (b, ma*part_pad) rows at SIFT1M IVF-256
geometry (ma=24, part_pad=8192 -> width 196608) and the contract geometry
(width 24576). Decides whether the exact screen (ops.topk.
exact_screen_smallest) can replace approx_min_k on the direct path without
blowing the b=1 latency budget (<70 us total; the screen was 32.3 us of the
92.2 us profile on 2026-08-19).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qadc_tpu.eval.timing import fori_slope_seconds
    from qadc_tpu.ops.topk import exact_screen_smallest, screen_smallest

    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(3)

    for q, w in [(1, 24576), (1, 196608), (3, 196608), (32, 196608)]:
        d = jnp.asarray(rng.uniform(0, 1, size=(q, w)).astype(np.float32))
        for name, fn in [
            ("approx f32", lambda a, t: screen_smallest(a + t * 1e-12, 200)[0]),
            ("approx bf16", lambda a, t: screen_smallest(
                (a + t * 1e-12).astype(jnp.bfloat16), 200)[0].astype(jnp.float32)),
            ("exact sort-cascade", lambda a, t: exact_screen_smallest(
                a + t * 1e-12, 200)[0]),
            ("exact k=100", lambda a, t: exact_screen_smallest(
                a + t * 1e-12, 100)[0]),
            ("lax.top_k", lambda a, t: -jax.lax.top_k(-(a + t * 1e-12), 200)[0]),
        ]:
            def body(args, tap):
                (a,) = args
                return fn(a, tap).sum()

            dt = fori_slope_seconds(body, (d,), k_lo=4, k_hi=24)
            print(f"(q={q}, w={w}) {name:20s}: {dt*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
