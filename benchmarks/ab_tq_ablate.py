"""Ablate the tq scan kernel: where do the non-MXU microseconds go?

Variants at 1M codes x 128 q, blk=8192:
  full      — production tq candidate (compares -> one-hot -> 2 matmuls -> min)
  nocmp     — one-hot replaced by concat of casts (no == / select): isolates
              the 32 compare+select passes
  consthot  — matmul against a hoisted CONSTANT one-hot input: pure
              accumulate matmuls + window-min (the formulation floor)
  nomm      — one-hot build + min, matmuls removed: pure VPU cost
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
from qadc_tpu.kernels.lut_scan import build_scan_tables


def _kernel(planes_ref, tlo_ref, thi_ref, ohc_ref, vals_ref, *, window, cb, mode):
    g = vals_ref.shape[1]
    tlo = tlo_ref[...]
    thi = thi_ref[...]
    m = None
    for w in range(window):
        if mode == "bitmm":
            # One-hot via MXU: bitplanes -> match-count matmul (S has a fused
            # "-(popcount-1)" ones column) -> relu. tlo here is T_cat (Q, 256),
            # thi is S_cat (256, 9cb). ohc row 0 is the ones row.
            x = planes_ref[:, w * g : (w + 1) * g].astype(jnp.int32)
            bits = [((x >> i) & 1).astype(jnp.int8) for i in range(8)]
            ones = ohc_ref[0:cb, 0:g]
            b_mat = jnp.concatenate(bits + [ones], axis=0)   # (9cb, g) int8
            mm = jnp.dot(thi, b_mat, preferred_element_type=jnp.int32)
            oh = jnp.maximum(mm, 0).astype(jnp.int8)         # (256, g)
            d = jnp.dot(tlo, oh, preferred_element_type=jnp.int32)
            m = d if m is None else jnp.minimum(m, d)
            continue
        x = planes_ref[:, w * g : (w + 1) * g].astype(jnp.int32)
        lo = x & 15
        hi = x >> 4
        if mode == "widebf":
            # bf16 replicate+compare: nibbles <= 15 exact in bf16; half the
            # register bytes of the int32 compares if cmpf lowers.
            jrow = ohc_ref[cb : cb + 16 * cb, 0:1].astype(jnp.int32).astype(
                jnp.bfloat16
            )
            lo_b = lo.astype(jnp.bfloat16)
            hi_b = hi.astype(jnp.bfloat16)
            rep_lo = jnp.concatenate([lo_b] * 16, axis=0)
            rep_hi = jnp.concatenate([hi_b] * 16, axis=0)
            oh = jnp.concatenate(
                [(rep_lo == jrow).astype(jnp.int8),
                 (rep_hi == jrow).astype(jnp.int8)], axis=0)
            d = jnp.dot(tlo, oh, preferred_element_type=jnp.int32)
            m = d if m is None else jnp.minimum(m, d)
            continue
        if mode in ("wide", "widecat", "widecat16"):
            # Replicate to (16cb, g) int32 FIRST, then one compare per half
            # against the per-sublane j pattern (big-tile VPU ops).
            jrow = ohc_ref[cb : cb + 16 * cb, 0:1].astype(jnp.int32)  # (16cb,1)
            rep_lo = jnp.concatenate([lo] * 16, axis=0)
            rep_hi = jnp.concatenate([hi] * 16, axis=0)
            oh_lo = (rep_lo == jrow).astype(jnp.int8)
            oh_hi = (rep_hi == jrow).astype(jnp.int8)
            if mode == "widecat":
                # tlo is T_cat (Q, 256): one K=256 matmul per chunk
                oh = jnp.concatenate([oh_lo, oh_hi], axis=0)
                d = jnp.dot(tlo, oh, preferred_element_type=jnp.int32)
                m = d if m is None else jnp.minimum(m, d)
                continue
            if mode == "widecat16":
                oh = jnp.concatenate([oh_lo, oh_hi], axis=0)
                d = jnp.dot(tlo, oh, preferred_element_type=jnp.int32)
                m = d if m is None else jnp.minimum(m, d)
                continue
        elif mode == "consthot":
            oh_lo = (
                ohc_ref[cb : cb + 16 * cb, 0:g].astype(jnp.int32) + (lo[0, 0] & 1)
            ).astype(jnp.int8)
            oh_hi = (
                ohc_ref[cb : cb + 16 * cb, g : 2 * g].astype(jnp.int32)
                + (hi[0, 0] & 1)
            ).astype(jnp.int8)
        elif mode == "nocmp":
            oh_lo = jnp.concatenate([lo.astype(jnp.int8)] * 16, axis=0)
            oh_hi = jnp.concatenate([hi.astype(jnp.int8)] * 16, axis=0)
        else:
            oh_lo = jnp.concatenate(
                [(lo == j).astype(jnp.int8) for j in range(16)], axis=0
            )
            oh_hi = jnp.concatenate(
                [(hi == j).astype(jnp.int8) for j in range(16)], axis=0
            )
        if mode == "nomm":
            d = jnp.concatenate(
                [oh_lo.astype(jnp.int32)[0:64] + oh_hi.astype(jnp.int32)[0:64],
                 oh_lo.astype(jnp.int32)[64:128]], axis=0
            )
        else:
            d = jnp.dot(tlo, oh_lo, preferred_element_type=jnp.int32)
            d = d + jnp.dot(thi, oh_hi, preferred_element_type=jnp.int32)
        m = d if m is None else jnp.minimum(m, d)
    vals_ref[...] = m.astype(vals_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cb", "block_n", "window", "mode"))
def scan(planes, tlo_t, thi_t, ohc, cb=8, block_n=8192, window=16, mode="full"):
    n_pad = planes.shape[1]
    qp = tlo_t.shape[0]
    g = block_n // window
    return pl.pallas_call(
        functools.partial(_kernel, window=window, cb=cb, mode=mode),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((cb, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(tlo_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(thi_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ohc.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qp, g), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (qp, n_pad // block_n * g),
            jnp.int16 if mode == "widecat16" else jnp.int32,
        ),
    )(planes, tlo_t, thi_t, ohc)


def main():
    rng = np.random.default_rng(0)
    n, m, q = 1_048_576, 16, 128
    cb = m // 2
    blk = 8192
    g = blk // 16
    codes = rng.integers(0, 256, size=(n, cb), dtype=np.uint8)
    planes = jnp.asarray(codes.T.copy())
    qt = rng.integers(0, 127, size=(q, m, 16)).astype(np.int8)
    tlo, thi = build_scan_tables(jnp.asarray(qt))
    tlo_t, thi_t = tlo.T.copy(), thi.T.copy()
    # ohc: rows 0..cb-1 = ones (bitmm); rows cb..cb+16cb-1 col 0 = j pattern,
    # cols 0..2g random one-hot-ish payload for consthot
    ohc_np = rng.integers(0, 2, size=(cb + 16 * cb, 2 * g)).astype(np.int8)
    ohc_np[:cb, :] = 1
    ohc_np[cb:, 0] = np.arange(16 * cb) // cb
    ohc = jnp.asarray(ohc_np)

    # bitmm operands: S_cat (256, 9cb) agreement matrix w/ fused threshold
    # column block; T_cat (Q, 256) = [tlo_t | thi_t]
    s_cat = np.zeros((2 * 16 * cb, 9 * cb), np.int8)
    for half in range(2):
        for j in range(16):
            pc = bin(j).count("1")
            for b in range(cb):
                r = half * 16 * cb + j * cb + b
                for i in range(4):
                    bit = (j >> i) & 1
                    s_cat[r, (half * 4 + i) * cb + b] = 2 * bit - 1
                s_cat[r, 8 * cb + b] = 1 - pc  # ones-column: -(pc-1)
    s_cat = jnp.asarray(s_cat)
    t_cat = jnp.concatenate([tlo_t, thi_t], axis=1)  # (Q, 256)

    runs = [("widecat", b) for b in (16384,)]
    runs += [("widebf", b) for b in (8192, 16384)]
    for mode, bb in runs:
        if mode == "bitmm":
            args0 = (planes, t_cat, s_cat, ohc)
        elif mode in ("widecat", "widecat16", "widebf"):
            args0 = (planes, t_cat, thi_t, ohc)
        else:
            args0 = (planes, tlo_t, thi_t, ohc)

        def body(args, tap, mode=mode, bb=bb):
            planes_, tl, th, oh = args
            d = (tap.astype(jnp.int32) & 1).astype(jnp.int8)
            v = scan(planes_, tl + d, th, oh, cb=cb, block_n=bb, mode=mode)
            return v[0, 0].astype(jnp.float32)

        dt = fori_slope_seconds(body, args0, k_lo=30, k_hi=150)
        print(f"{mode:9s} blk={bb:6d}: {dt*1e3:7.3f} ms  {n*q/dt/1e9:7.1f} G cq/s")


if __name__ == "__main__":
    main()
