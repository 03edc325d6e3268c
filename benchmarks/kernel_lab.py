"""Scratch experiments isolating lut_scan cost components on real TPU.

Each experiment is a self-contained pallas kernel timed with the chained
pattern. Not part of the library — evidence for docs/kernels.md.
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qadc_tpu.kernels.lut_scan import _expand_consts, _window_min, build_scan_tables

N, M, Q = 1_048_576, 16, 128
CB = M // 2
CPR = 128 // CB
LANES = CB * 16


def timed(fn, codes, tlo, thi, out_shape, iters=4, k_lo=8, k_hi=40):
    """Slope-fit timing: the axon relay charges ~8 ms PER JIT CALL regardless
    of inner work, so per-iteration cost = slope between two chain lengths."""

    def make(k_inner):
        @jax.jit
        def chained(codes, prev, tlo, thi):
            for _ in range(k_inner):
                d = (prev[0:1, 0:1] & 1).astype(tlo.dtype)
                prev = fn(codes, tlo + d, thi)
            return prev
        return chained

    def run(chained):
        zero = jnp.zeros(out_shape, jnp.int32)
        prev = chained(codes, zero, tlo, thi)
        _ = float(prev[0, 0])
        t0 = time.time()
        for _ in range(iters):
            prev = chained(codes, prev, tlo, thi)
        _ = float(prev[0, 0])
        return (time.time() - t0) / iters

    t_lo = run(make(k_lo))
    t_hi = run(make(k_hi))
    return (t_hi - t_lo) / (k_hi - k_lo)


def make_inputs(rng):
    codes = jnp.asarray(rng.integers(0, 256, size=(N // CPR, 128), dtype=np.uint8))
    qtables = jnp.asarray(rng.integers(0, 127, size=(Q, M, 16)).astype(np.int8))
    tlo, thi = build_scan_tables(qtables)
    return codes, tlo, thi


def run_variant(name, kernel_body, block_n=2048, window=16, extra_inputs=(), in_specs_extra=()):
    rng = np.random.default_rng(0)
    codes, tlo, thi = make_inputs(rng)
    e, jpat = _expand_consts(CB)
    g = block_n // window
    r16 = block_n // CPR

    def call(codes, tlo, thi):
        return pl.pallas_call(
            functools.partial(kernel_body, window=window),
            grid=(N // block_n,),
            in_specs=[
                pl.BlockSpec((r16, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((LANES, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((LANES, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((CPR * 128, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((g, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N // window, 128), jnp.int32),
        )(codes, tlo, thi, jpat, e)

    dt = timed(call, codes, tlo, thi, (N // window, 128))
    print(f"{name} blk={block_n}: {dt*1e3:.3f} ms  {N*Q/dt/1e9:.1f} Gcq/s")
    return dt


# --- v1 baseline (per-nibble bf16 expansion, int8 acc matmuls) ---
def v1_body(codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, *, window):
    raw = codes_ref[...]
    r32 = raw.astype(jnp.int32)
    lo_raw = (r32 & 0x0F).astype(jnp.bfloat16)
    hi_raw = (r32 >> 4).astype(jnp.bfloat16)
    e = e_ref[...]
    rep_lo = jnp.concatenate(
        [jnp.dot(lo_raw, e[c * 128:(c + 1) * 128, :], preferred_element_type=jnp.float32)
         for c in range(CPR)], axis=0)
    rep_hi = jnp.concatenate(
        [jnp.dot(hi_raw, e[c * 128:(c + 1) * 128, :], preferred_element_type=jnp.float32)
         for c in range(CPR)], axis=0)
    jp = jpat_ref[0:1, :]
    oh_lo = (rep_lo == jp).astype(jnp.int8)
    oh_hi = (rep_hi == jp).astype(jnp.int8)
    acc = jnp.dot(oh_lo, tlo_ref[...], preferred_element_type=jnp.int32)
    acc = acc + jnp.dot(oh_hi, thi_ref[...], preferred_element_type=jnp.int32)
    vals_ref[...] = _window_min(acc, window)


# --- accum-only ceiling: reuse raw rows as fake one-hot (no expansion/compare)
def acc_only_body(codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, *, window):
    raw = codes_ref[...].astype(jnp.int8)  # (R, 128) — pretend these are one-hots
    blk = raw.shape[0] * CPR
    fake = jnp.concatenate([raw for _ in range(CPR)], axis=0)  # (BLK, 128)
    acc = jnp.dot(fake, tlo_ref[...], preferred_element_type=jnp.int32)
    acc = acc + jnp.dot(fake, thi_ref[...], preferred_element_type=jnp.int32)
    vals_ref[...] = _window_min(acc, window)


# --- expansion-only: no acc matmuls, window-min over rep
def expand_only_body(codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, *, window):
    raw = codes_ref[...]
    r32 = raw.astype(jnp.int32)
    lo_raw = (r32 & 0x0F).astype(jnp.bfloat16)
    hi_raw = (r32 >> 4).astype(jnp.bfloat16)
    e = e_ref[...]
    rep_lo = jnp.concatenate(
        [jnp.dot(lo_raw, e[c * 128:(c + 1) * 128, :], preferred_element_type=jnp.float32)
         for c in range(CPR)], axis=0)
    rep_hi = jnp.concatenate(
        [jnp.dot(hi_raw, e[c * 128:(c + 1) * 128, :], preferred_element_type=jnp.float32)
         for c in range(CPR)], axis=0)
    acc = (rep_lo + rep_hi).astype(jnp.int32)
    vals_ref[...] = _window_min(acc, window)


# --- v1 without compare: cast rep directly (isolates compare+onehot cast cost)
def no_compare_body(codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, *, window):
    raw = codes_ref[...]
    r32 = raw.astype(jnp.int32)
    lo_raw = (r32 & 0x0F).astype(jnp.bfloat16)
    hi_raw = (r32 >> 4).astype(jnp.bfloat16)
    e = e_ref[...]
    rep_lo = jnp.concatenate(
        [jnp.dot(lo_raw, e[c * 128:(c + 1) * 128, :], preferred_element_type=jnp.float32)
         for c in range(CPR)], axis=0)
    rep_hi = jnp.concatenate(
        [jnp.dot(hi_raw, e[c * 128:(c + 1) * 128, :], preferred_element_type=jnp.float32)
         for c in range(CPR)], axis=0)
    oh_lo = rep_lo.astype(jnp.int8)  # skip compare — wrong values, same shapes
    oh_hi = rep_hi.astype(jnp.int8)
    acc = jnp.dot(oh_lo, tlo_ref[...], preferred_element_type=jnp.int32)
    acc = acc + jnp.dot(oh_hi, thi_ref[...], preferred_element_type=jnp.int32)
    vals_ref[...] = _window_min(acc, window)


# --- v3: int8 expansion matmuls (E as int8, nibbles int8) + int32 compare
def v3_body(codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, *, window):
    raw = codes_ref[...]
    r32 = raw.astype(jnp.int32)
    lo_raw = (r32 & 0x0F).astype(jnp.int8)
    hi_raw = (r32 >> 4).astype(jnp.int8)
    e = e_ref[...].astype(jnp.int8)
    rep_lo = jnp.concatenate(
        [jnp.dot(lo_raw, e[c * 128:(c + 1) * 128, :], preferred_element_type=jnp.int32)
         for c in range(CPR)], axis=0)
    rep_hi = jnp.concatenate(
        [jnp.dot(hi_raw, e[c * 128:(c + 1) * 128, :], preferred_element_type=jnp.int32)
         for c in range(CPR)], axis=0)
    jp = jpat_ref[0:1, :].astype(jnp.int32)
    oh_lo = (rep_lo == jp).astype(jnp.int8)
    oh_hi = (rep_hi == jp).astype(jnp.int8)
    acc = jnp.dot(oh_lo, tlo_ref[...], preferred_element_type=jnp.int32)
    acc = acc + jnp.dot(oh_hi, thi_ref[...], preferred_element_type=jnp.int32)
    vals_ref[...] = _window_min(acc, window)


# --- v4: bf16 acc matmuls (one-hot bf16, tables bf16 -> f32)
def v4_body(codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, *, window):
    raw = codes_ref[...]
    r32 = raw.astype(jnp.int32)
    lo_raw = (r32 & 0x0F).astype(jnp.bfloat16)
    hi_raw = (r32 >> 4).astype(jnp.bfloat16)
    e = e_ref[...]
    rep_lo = jnp.concatenate(
        [jnp.dot(lo_raw, e[c * 128:(c + 1) * 128, :], preferred_element_type=jnp.float32)
         for c in range(CPR)], axis=0)
    rep_hi = jnp.concatenate(
        [jnp.dot(hi_raw, e[c * 128:(c + 1) * 128, :], preferred_element_type=jnp.float32)
         for c in range(CPR)], axis=0)
    jp = jpat_ref[0:1, :]
    oh_lo = (rep_lo == jp).astype(jnp.bfloat16)
    oh_hi = (rep_hi == jp).astype(jnp.bfloat16)
    acc = jnp.dot(oh_lo, tlo_ref[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(oh_hi, thi_ref[...].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    vals_ref[...] = _window_min(acc.astype(jnp.int32), window)


# --- v5: int8 BYTE expansion (once) + int32 nibble split + fused K=256 int8 acc
def v5_body(codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, *, window):
    raw = codes_ref[...].astype(jnp.int8)       # bytes as int8 (values may wrap
    # negative for >=128; the selector matmul is exact in int32 accumulation)
    e = e_ref[...].astype(jnp.int8)
    rep = jnp.concatenate(
        [jnp.dot(raw, e[c * 128:(c + 1) * 128, :], preferred_element_type=jnp.int32)
         for c in range(CPR)], axis=0)          # (BLK, 128) byte values (int32, maybe <0)
    rep = rep & 0xFF                            # undo int8 wrap: back to 0..255
    jp = jpat_ref[0:1, :].astype(jnp.int32)
    oh = jnp.concatenate(
        [((rep & 0x0F) == jp), ((rep >> 4) == jp)], axis=1
    ).astype(jnp.int8)                          # (BLK, 256)
    t = jnp.concatenate([tlo_ref[...], thi_ref[...]], axis=0)  # (256, Q) int8
    acc = jnp.dot(oh, t, preferred_element_type=jnp.int32)
    vals_ref[...] = _window_min(acc, window)


# --- min-only cost: matmul-free, expansion-free (pure window-min over raw)
def min_only_body(codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, *, window):
    raw = codes_ref[...].astype(jnp.int32)
    acc = jnp.concatenate([raw for _ in range(CPR)], axis=0)
    vals_ref[...] = _window_min(acc, window)


# --- copy floor: read codes block, write a (g, 128) slice of it (pure DMA)
def copy_body(codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, *, window):
    g = vals_ref.shape[0]
    vals_ref[...] = codes_ref[0:g, :].astype(jnp.int32)


# --- min floor without concat: strided mins directly on raw rows
def min_nc_body(codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, *, window):
    raw = codes_ref[...].astype(jnp.int32)   # (R, 128)
    r = raw.shape[0]
    g = vals_ref.shape[0]
    m = raw[0:g, :]
    for w in range(1, r // g):
        m = jnp.minimum(m, raw[w * g:(w + 1) * g, :])
    vals_ref[...] = m


if __name__ == "__main__":
    which = sys.argv[1:] or [
        "copy", "minnc", "min", "acc", "v3", "v1", "copy", "minnc", "acc", "v3", "v1",
    ]
    bodies = {
        "v1": v1_body, "acc": acc_only_body, "expand": expand_only_body,
        "nocmp": no_compare_body, "v3": v3_body, "v4": v4_body, "min": min_only_body,
        "copy": copy_body, "minnc": min_nc_body,
    }
    for name in which:
        try:
            run_variant(name, bodies[name])
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {e}")
