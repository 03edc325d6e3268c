"""A/B: transposed plane-major (tq) 4-bit scan vs the production row128 kernel.

Hypothesis (round-5 VERDICT item 5): the production kernel's selector
(expansion) matmuls cost as many int8 MACs as the accumulation itself —
the measured 40% of the int8-MXU formulation bound. Storing codes as
nibble-planes (cb, N) lets the kernel build the one-hot TRANSPOSED
((16cb, BLK): sublane-replicate the (cb, BLK) nibble planes 16x, one
compare per half) and contract T.T (Q, 16cb) @ OH.T (16cb, BLK) — zero
expansion matmuls, pure-accumulate MXU work.

Run: python benchmarks/ab_tq.py [--interpret]
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qadc_tpu.eval.timing import fori_slope_seconds
from qadc_tpu.kernels.lut_scan import build_scan_tables, lut_scan_reduce, pick_block_n


def _tq_kernel(planes_ref, tlo_ref, thi_ref, vals_ref, *, window, cb):
    # Window-min FUSED into accumulation: process the block in g-wide lane
    # chunks (window w = chunk w), min-folding matmul outputs — the full
    # (Q, BLK) acc and one-hots never materialize (scoped vmem is 16 MB).
    # One small (cb, g) compare per static j value, concatenated along
    # sublanes; int8 cmpi is unsupported on v5e so compares stay int32.
    g = vals_ref.shape[1]
    tlo = tlo_ref[...]
    thi = thi_ref[...]
    m = None
    for w in range(window):
        x = planes_ref[:, w * g : (w + 1) * g].astype(jnp.int32)  # (cb, g)
        lo = x & 15
        hi = x >> 4
        oh_lo = jnp.concatenate(
            [(lo == j).astype(jnp.int8) for j in range(16)], axis=0
        )                                            # (16cb, g) int8
        oh_hi = jnp.concatenate(
            [(hi == j).astype(jnp.int8) for j in range(16)], axis=0
        )
        d = jnp.dot(tlo, oh_lo, preferred_element_type=jnp.int32)
        d = d + jnp.dot(thi, oh_hi, preferred_element_type=jnp.int32)
        m = d if m is None else jnp.minimum(m, d)
    vals_ref[...] = m


@functools.partial(jax.jit, static_argnames=("cb", "block_n", "window", "interpret"))
def lut_scan_tq(planes, tlo_t, thi_t, cb=8, block_n=8192, window=16, interpret=False):
    """planes: (cb, N_pad) u8; tlo_t/thi_t: (Qp, 16cb) int8. -> (Qp, N_pad/window)."""
    n_pad = planes.shape[1]
    lanes = 16 * cb
    qp = tlo_t.shape[0]
    g = block_n // window
    grid = (n_pad // block_n,)
    return pl.pallas_call(
        functools.partial(_tq_kernel, window=window, cb=cb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((cb, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qp, g), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, n_pad // block_n * g), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * lanes * qp,
            bytes_accessed=n_pad * cb + 2 * lanes * qp + (n_pad // window) * qp * 4,
            transcendentals=0,
        ),
    )(planes, tlo_t, thi_t)


def _oracle_window_min(codes_u8, qtables, window, block_n):
    """codes (N, cb) u8, qtables (Q, M, 16) int8 -> (Q, N/window) int32.

    tq window j of block i = codes {i*blk + w*g + j : w in range(window)}.
    """
    n, cb = codes_u8.shape
    q = qtables.shape[0]
    lo = codes_u8 & 15
    hi = codes_u8 >> 4
    t = qtables.astype(np.int32)
    d = np.zeros((q, n), np.int32)
    for b in range(cb):
        d += t[:, 2 * b, :][:, lo[:, b]]
        d += t[:, 2 * b + 1, :][:, hi[:, b]]
    g = block_n // window
    return (
        d.reshape(q, n // block_n, window, g).min(axis=2).reshape(q, -1)
    )


def main():
    interpret = "--interpret" in sys.argv
    rng = np.random.default_rng(0)

    # --- correctness at small N ---
    n_s, m, q = 8192, 16, 128
    cb = m // 2
    codes = rng.integers(0, 256, size=(n_s, cb), dtype=np.uint8)
    qt = rng.integers(0, 127, size=(q, m, 16)).astype(np.int8)
    planes = jnp.asarray(codes.T.copy())
    tlo, thi = build_scan_tables(jnp.asarray(qt))
    got = np.asarray(
        lut_scan_tq(planes, tlo.T.copy(), thi.T.copy(), cb=cb, block_n=2048,
                    window=16, interpret=interpret)
    )
    want = _oracle_window_min(codes, qt, 16, 2048)
    assert got.shape == want.shape, (got.shape, want.shape)
    ok = np.array_equal(got, want)
    print(f"correctness vs numpy oracle: {'OK bit-exact' if ok else 'MISMATCH'}")
    if not ok:
        bad = np.argwhere(got != want)
        print(bad[:5], got[tuple(bad[0])], want[tuple(bad[0])])
        sys.exit(1)
    if interpret:
        return

    # --- perf at the headline geometry: 1M codes x 128 queries ---
    n = 1_048_576
    codes = rng.integers(0, 256, size=(n, cb), dtype=np.uint8)
    planes = jnp.asarray(codes.T.copy())
    rows = jnp.asarray(
        codes.reshape(n // 16, 16 * cb)  # row128: 16 codes' bytes per row
    )
    tlo_t, thi_t = tlo.T.copy(), thi.T.copy()

    for blk in (4096, 8192, 16384, 32768):
        def body(args, tap, blk=blk):
            planes_, tl, th = args
            d = (tap.astype(jnp.int32) & 1).astype(jnp.int8)
            v = lut_scan_tq(planes_, tl + d, th, cb=cb, block_n=blk)
            return v[0, 0].astype(jnp.float32)

        dt = fori_slope_seconds(body, (planes, tlo_t, thi_t), k_lo=30, k_hi=150)
        rate = n * q / dt / 1e9
        print(f"tq    blk={blk:6d}: {dt*1e3:7.3f} ms  {rate:7.1f} G cq/s")

    bn = pick_block_n(n)

    def body_row(args, tap):
        rows_, tl, th = args
        d = (tap.astype(jnp.int32) & 1).astype(jnp.int8)
        v, _ = lut_scan_reduce(rows_, tl + d, th, cb=cb, block_n=bn)
        return v[0, 0].astype(jnp.float32)

    dt = fori_slope_seconds(body_row, (rows, tlo, thi), k_lo=30, k_hi=150)
    print(f"row128 blk={bn:6d}: {dt*1e3:7.3f} ms  {n*q/dt/1e9:7.1f} G cq/s (production)")

    bound = 2 * 2 * n * 128 * q / 394e12  # accumulate-only int8 MXU MACs
    print(f"int8-MXU formulation bound: {bound*1e3:.3f} ms")


if __name__ == "__main__":
    main()
