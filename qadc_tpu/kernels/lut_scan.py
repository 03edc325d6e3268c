"""Pallas TPU LUT-scan kernels — the Quick ADC hot loop, TPU-native.

Reference hot loop: scan_avx_4 (simd_scan.hpp:125-187) — per 16 codes, two
pshufb LUT lookups per code byte, saturating int8 adds, bound-compare, heap.

TPU formulation (measured rationale in docs/kernels.md): the 16-entry LUT
gather is a one-hot × table matmul on the MXU, serving a whole query batch per
pass over the codes:

    acc[BLK, Q] = OneHotLo(codes)[BLK, 8M] @ tables_lo[8M, Q]
                + OneHotHi(codes)[BLK, 8M] @ tables_hi[8M, Q]   (int8 -> int32)

Design points, all measured on v5e:
  - CODES STORAGE IS ROW128 (core/layout.py): u8 (N/cpr, 128), cpr=128/code
    bytes. A narrow (N, 8) operand gets a 16x-padded tiled copy at the Pallas
    call (2 GB per 128 MB of codes; OOM at Deep100M). Kernels deinterleave the
    128-byte rows in VMEM into C-MAJOR SLOT ORDER (slot s = c*R + r for in-row
    position c, raw row r); slots_to_rows maps slot ids back to code indices.
  - One-hots are built in VMEM via a tiny MXU expansion matmul (nibbles @ E)
    plus one compare against a hoisted lane constant — 3.2x faster than
    repeat-based construction.
  - The bound-pruned binheap becomes a fused STRIDED window min (a (G,W,Q)
    reshape relayouts, ~3x whole-kernel cost): window g = slots {g, g+G, ...}.
    The grouped kernel emits only window minima; whole winning windows are
    exactly reranked by the caller (quantization ties harmless).
  - int32 accumulation (no 127 saturation): strictly more informative than
    the reference's saturating adds, free on the MXU.
  - The grouped variant scans probed partitions IN PLACE: partition ids are
    scalar-prefetch operands read by the codes BlockSpec index_map (20x over
    pre-gathering at SIFT1M geometry).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_N = 1024   # codes per kernel block (minimum geometry gate)
MAX_BLOCK_N = 8192       # measured best on v5e (fewer grid steps, same VMEM fit)
DEFAULT_WINDOW = 16


def _transposed_block_legal(minor: int, full_minor: int) -> bool:
    """Mosaic accepts an output block only when its minor dim is a multiple
    of 128 or the FULL array dimension (lowering _check_block_mappings; the
    interpret path accepts anything, which is how the transposed layouts
    shipped broken — caught by benchmarks/smoke_tpu.py on silicon). Callers
    fall back to the natural layout + an XLA transpose when this is False:
    correct everywhere, fused where legal."""
    return minor % 128 == 0 or minor == full_minor


def pick_block_n(n_pad: int, cap: int = MAX_BLOCK_N) -> int:
    """Largest power-of-two block <= cap dividing n_pad (>= DEFAULT_BLOCK_N).

    blk=8192 measured ~30% faster than 1024 at 1M codes (fewer grid steps);
    callers gate on n_pad % DEFAULT_BLOCK_N == 0 and then upgrade via this.
    """
    bn = DEFAULT_BLOCK_N
    while bn * 2 <= cap and n_pad % (bn * 2) == 0:
        bn *= 2
    return bn


def _deinterleave(raw, cb: int):
    """(R, 128) u8 storage rows -> (cpr*R, cb) int32 codes in c-major slot order.

    Each in-row code's bytes are rolled to lane 0 before the sublane concat —
    Mosaic cannot concatenate pieces living at different lane offsets.
    """
    cpr = 128 // cb
    r32 = raw.astype(jnp.int32)
    pieces = [r32[:, 0:cb]]
    for c in range(1, cpr):
        pieces.append(pltpu.roll(r32, 128 - c * cb, axis=1)[:, 0:cb])
    return jnp.concatenate(pieces, axis=0)


def slots_to_rows(slots, block_n: int, cb: int):
    """Map kernel SLOT ids to logical code row ids.

    Within each block of block_n codes (R = block_n*cb/128 raw rows), slot
    s = c*R + r holds the code at logical in-block position r*cpr + c.
    Works on any int array of slot ids (block-local or global).
    """
    cpr = 128 // cb
    r = block_n // cpr
    blk = slots // block_n
    s = slots % block_n
    c = s // r
    rr = s % r
    return blk * block_n + rr * cpr + c


def build_scan_tables(qtables, q_pad: int | None = None):
    """Permute int8 tables into the kernel's (8M, Qp) low/high layout.

    Row order is J-MAJOR: row j*(M/2) + b is sub-quantizer 2b (lo) / 2b+1 (hi),
    centroid j — matching the kernel's lane expansion ([b0..b_{M/2-1}] tiled
    16x across lanes). The nibble packing itself is the reference's (even sq ->
    low nibble, quantizers.hpp:49-68).

    Args:
      qtables: (Q, M, 16) int8 quantized tables.
      q_pad: pad query dim to this (default: next multiple of 128).

    Returns:
      (tables_lo, tables_hi): each ((M/2)*16, Qp) int8.
    """
    q, m, k = qtables.shape
    assert k == 16 and m % 2 == 0
    if q_pad is None:
        q_pad = -(-q // 128) * 128
    lo = qtables[:, 0::2, :]  # (Q, M/2, 16) — even sqs
    hi = qtables[:, 1::2, :]
    # (Q, M/2, 16) -> (Q, 16, M/2) -> rows j*(M/2)+b
    lo = lo.transpose(0, 2, 1).reshape(q, (m // 2) * 16).T
    hi = hi.transpose(0, 2, 1).reshape(q, (m // 2) * 16).T
    pad = [(0, 0), (0, q_pad - q)]
    return jnp.pad(lo, pad), jnp.pad(hi, pad)


@functools.lru_cache(maxsize=None)
def _expand_consts_np(cb: int):
    """Cached NUMPY (E, jpat) — numpy so values cached here never leak tracers."""
    cpr = 128 // cb
    lanes = 16 * cb
    # E_c (stacked): E[c*128 + c*cb + b, j*cb + b] = 1 — selects code c's byte
    # b from a 128-byte row and broadcasts it into the 16 j-lanes.
    e = np.zeros((cpr, 128, lanes), np.float32)
    for c in range(cpr):
        for b in range(cb):
            e[c, c * cb + b, np.arange(16) * cb + b] = 1.0
    jpat = np.broadcast_to((np.arange(lanes) // cb).astype(np.float32), (8, lanes))
    return e.reshape(cpr * 128, lanes), np.ascontiguousarray(jpat)


def _expand_consts(cb: int):
    """(E stack, jpat) constants for the fused deinterleave+expansion.

    E: (cpr*128, 16*cb) bf16 selector stack (see _accumulate_rows).
    jpat: (8, 16*cb) f32, lane l -> centroid id l // cb.
    """
    e, jpat = _expand_consts_np(cb)
    return jnp.asarray(e, jnp.bfloat16), jnp.asarray(jpat)


def _accumulate_rows_generic(
    raw, cb, tlo, thi, jpat_ref, e_ref, acc_dtype, *, int8_expand,
    compare_int8=False,
):
    """Distances straight from (R, 128) storage rows against table slabs.

    The deinterleave and lane expansion fuse into ONE step: per in-row code
    position c, a selector matmul E_c picks that code's nibble lanes and
    broadcasts them into the 16 j-lanes; pieces concatenate along sublanes
    (all at lane offset 0 — Mosaic rejects offset concats) giving the one-hot
    pre-image in c-major slot order. All intermediates are full-lane; no
    rolls, no narrow (BLK, cb) tensors.

    int8_expand: run the expansion matmuls int8 x int8 -> int32 (2x the bf16
    MXU rate on v5e) with integer compares (no f32 round trips). Measured
    1M x 128q m=16: 0.41 ms vs 0.56 ms for the bf16 variant (slope-fit
    timing; see docs/kernels.md). For float tables (acc_dtype f32) the
    expansion still runs int8; only the accumulation matmuls use f32
    one-hots against the f32 tables.
    """
    cpr = 128 // cb
    exp_in = jnp.int8 if int8_expand else jnp.bfloat16
    exp_out = jnp.int32 if int8_expand else jnp.float32
    r32 = raw.astype(jnp.int32)
    lo_raw = (r32 & 0x0F).astype(exp_in)          # (R, 128) nibble values
    hi_raw = (r32 >> 4).astype(exp_in)
    e = e_ref[...]                                # (cpr*128, lanes)
    if int8_expand:
        e = e.astype(jnp.int8)

    def expand(x):                                # (BLK, lanes) slot order
        return jnp.concatenate(
            [
                jnp.dot(x, e[c * 128 : (c + 1) * 128, :],
                        preferred_element_type=exp_out)
                for c in range(cpr)
            ],
            axis=0,
        )

    rep_lo = expand(lo_raw)
    rep_hi = expand(hi_raw)
    jp = jpat_ref[0:1, :]
    oh_dtype = jnp.int8 if acc_dtype == jnp.int32 else jnp.float32
    if int8_expand and compare_int8:
        # Nibble values fit int8: compare on int8 vectors (1/4 the VPU bytes
        # of int32 compares) — A/B row for the remaining VPU overhead
        # (docs/kernels.md roofline: ~0.2 ms of compares/casts at 1M x 128q).
        jp8 = jp.astype(jnp.int8)
        oh_lo = (rep_lo.astype(jnp.int8) == jp8).astype(oh_dtype)
        oh_hi = (rep_hi.astype(jnp.int8) == jp8).astype(oh_dtype)
        return jnp.dot(oh_lo, tlo, preferred_element_type=acc_dtype) + jnp.dot(
            oh_hi, thi, preferred_element_type=acc_dtype
        )
    if int8_expand:
        jp = jp.astype(jnp.int32)
    oh_lo = (rep_lo == jp).astype(oh_dtype)
    oh_hi = (rep_hi == jp).astype(oh_dtype)
    acc = jnp.dot(oh_lo, tlo, preferred_element_type=acc_dtype)
    return acc + jnp.dot(oh_hi, thi, preferred_element_type=acc_dtype)


_accumulate_rows = functools.partial(_accumulate_rows_generic, int8_expand=False)
_accumulate_rows_int8 = functools.partial(_accumulate_rows_generic, int8_expand=True)
_accumulate_rows_int8c = functools.partial(
    _accumulate_rows_generic, int8_expand=True, compare_int8=True
)


def _window_min(acc, window: int):
    """Strided window min over slots: window g = slots {g, g+G, 2G+g, ...}."""
    blk = acc.shape[0]
    g = blk // window
    m = acc[0:g, :]
    for w in range(1, window):
        m = jnp.minimum(m, acc[w * g : (w + 1) * g, :])
    return m


def _scan_min_kernel(
    codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref,
    *, window, acc_dtype, cb, accfn, transpose_out=False,
):
    """Flat scan block: window minima only (callers expand winning windows).

    transpose_out writes (Qp, windows) blocks so per-query window rows come
    out of the kernel directly (no whole-array (C, Qp) -> (Qp, C) relayout).
    """
    acc = accfn(
        codes_ref[...], cb, tlo_ref[...], thi_ref[...], jpat_ref, e_ref, acc_dtype
    )
    m = _window_min(acc, window)
    vals_ref[...] = m.T if transpose_out else m


def _scan_kernel(
    codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, idx_ref,
    *, window, acc_dtype, cb, accfn=_accumulate_rows,
):
    """Flat scan block: window minima + arg-slot ids."""
    acc = accfn(
        codes_ref[...], cb, tlo_ref[...], thi_ref[...], jpat_ref, e_ref, acc_dtype
    )
    blk = acc.shape[0]
    g = blk // window
    qp = tlo_ref.shape[1]

    m = acc[0:g, :]
    arg = jnp.zeros((g, qp), jnp.int32)
    for w in range(1, window):
        nxt = acc[w * g : (w + 1) * g, :]
        take = nxt < m
        m = jnp.where(take, nxt, m)
        arg = jnp.where(take, w, arg)
    base = pl.program_id(0) * blk
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (g, qp), 0)
    vals_ref[...] = m
    idx_ref[...] = base + arg * g + g_iota               # SLOT ids


@functools.partial(
    jax.jit,
    static_argnames=(
        "cb", "block_n", "window", "interpret", "acc_dtype_name", "variant",
        "with_rows", "transpose_out",
    ),
)
def lut_scan_reduce(
    codes_rows,
    tables_lo,
    tables_hi,
    cb: int = 8,
    block_n: int = DEFAULT_BLOCK_N,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
    acc_dtype_name: str = "int32",
    variant: str = "int8",
    with_rows: bool = False,
    transpose_out: bool = False,
):
    """Scan all codes; return per-window candidates (vals, code ROW ids).

    Args:
      codes_rows: (N_pad/cpr, 128) uint8 row128 storage (core/layout.to_row128),
        N_pad % block_n == 0.
      tables_lo/hi: ((M/2)*16, Qp) int8 (int32 acc) or float32 (f32 acc).
      cb: code bytes (M/2 for 4-bit).
      window: reduction window W (candidates = N_pad/W per query).
      variant: "int8" = int8 selector + int8 one-hot matmuls (default, 2x MXU
        rate on v5e); "bf16" = bf16 expansion + int8/f32 accumulate.
      with_rows: also emit arg-min code ROW ids per window (costs ~15 extra
        select passes + one output stream; window-expansion callers don't
        need rows).
      transpose_out: emit vals as (Qp, N_pad/W) — per-query window rows —
        saving callers the (C, Qp) -> (Qp, C) relayout copy. Min-only
        (with_rows=False) layout option.

    Returns:
      (vals (N_pad/W, Qp) — or (Qp, N_pad/W) with transpose_out,
       rows (N_pad/W, Qp) int32 global code rows — None when with_rows=False).
    """
    if with_rows and transpose_out:
        raise ValueError("transpose_out supports the min-only variant")
    cpr = 128 // cb
    n_pad = codes_rows.shape[0] * cpr
    lanes = cb * 16
    assert codes_rows.shape[1] == 128
    assert tables_lo.shape[0] == lanes, (tables_lo.shape, lanes)
    qp = tables_lo.shape[1]
    if n_pad % block_n != 0:
        raise ValueError(f"N_pad {n_pad} not a multiple of block_n {block_n}")
    if block_n % window != 0:
        raise ValueError(f"block_n {block_n} not a multiple of window {window}")
    acc_dtype = jnp.dtype(acc_dtype_name)
    g = block_n // window
    r16 = block_n // cpr
    grid = (n_pad // block_n,)
    e, jpat = _expand_consts(cb)
    accfn = {
        "int8": _accumulate_rows_int8,
        "int8c": _accumulate_rows_int8c,  # int8 compares (A/B row)
        "bf16": _accumulate_rows,
    }[variant]

    in_specs = [
        pl.BlockSpec((r16, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((lanes, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((lanes, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((cpr * 128, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    cost = pl.CostEstimate(
        flops=2 * 2 * n_pad * lanes * qp,
        bytes_accessed=n_pad * cb + 2 * lanes * qp + 2 * (n_pad // window) * qp * 4,
        transcendentals=0,
    )
    if not with_rows:
        # Fused transposed output only where the (qp, g) block lowers; at
        # other shapes emit the natural layout and transpose in XLA.
        fuse_t = transpose_out and _transposed_block_legal(g, n_pad // window)
        kernel = functools.partial(
            _scan_min_kernel, window=window, acc_dtype=acc_dtype, cb=cb,
            accfn=accfn, transpose_out=fuse_t,
        )
        if fuse_t:
            out_specs = pl.BlockSpec(
                (qp, g), lambda i: (0, i), memory_space=pltpu.VMEM
            )
            out_shape = jax.ShapeDtypeStruct((qp, n_pad // window), acc_dtype)
        else:
            out_specs = pl.BlockSpec(
                (g, qp), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            out_shape = jax.ShapeDtypeStruct((n_pad // window, qp), acc_dtype)
        vals = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=cost,
        )(codes_rows, tables_lo, tables_hi, jpat, e)
        if transpose_out and not fuse_t:
            vals = vals.T
        return vals, None

    kernel = functools.partial(
        _scan_kernel, window=window, acc_dtype=acc_dtype, cb=cb, accfn=accfn
    )
    vals, slots = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((g, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // window, qp), acc_dtype),
            jax.ShapeDtypeStruct((n_pad // window, qp), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=cost,
    )(codes_rows, tables_lo, tables_hi, jpat, e)
    return vals, slots_to_rows(slots, block_n, cb)


# --- Transposed plane-major ("tq") scan: round-5 formulation-bound attack ---
#
# The row128 kernel pays selector (expansion) matmuls equal in int8 MACs to
# the accumulation itself (docs/kernels.md roofline) — measured 40% of the
# accumulate-only int8-MXU bound. Storing codes as nibble BYTE-PLANES
# (cb, N) lets the kernel build the one-hot TRANSPOSED with zero matmuls:
# sublane-replicate the (cb, g) nibble chunk 16x (one int32 concat per
# half), one compare against the per-sublane centroid pattern, and contract
# T_cat (Qp, 2*16cb) @ OH (2*16cb, g) — pure-accumulate MXU work. Window-min
# is FUSED: the block is processed in g-wide lane chunks (window w = chunk
# w) min-folded on the fly, so the (Qp, BLK) acc never materializes
# (scoped vmem is 16 MB on v5e). Measured 1M x 128q (ab_tq_ablate.py,
# 2026-08-20): 0.277 ms = 484 G cq/s = 63% of the formulation bound vs the
# row128 kernel's 0.446 ms / 40%. Rejected along the way (same A/B): int8
# vector compare, int8 vector add, and bf16 vector compare (Mosaic: target
# unsupported — narrow types are matmul-operand-only on v5e), bitplane
# match-count matmul one-hot (0.488 ms — the extra K=72 matmul + relu on
# (256, g) eats the compare saving), int16 output (cast cancels the write
# saving), per-j small compares (0.432 ms — (cb, g) tiles underutilize the
# VPU).
#
# Plane column order preserves the PRODUCTION window semantics: when
# window == cpr (every flat/grouped 4-bit config), a scan window is exactly
# one row128 storage row's cpr codes — the property window_rerank's
# single-row-gather economics depend on. to_planes lays chunk w, lane c of
# block i at code (i*blk + c*cpr + w), so tq window ids and membership are
# BIT-IDENTICAL to lut_scan_reduce's: window_slots + slots_to_rows and the
# whole rerank tail run unchanged. The cost: planes are built per block_n
# (pick_block_n_tq(n_pad) — deterministic from the geometry alone).
# Reference hot loop being replaced: simd_scan.hpp:152-186.


def to_planes(codes_rows, cb: int, block_n: int):
    """(N_pad/cpr, 128) u8 row128 storage -> (cb, N_pad) byte-planes.

    Within each block of block_n codes, column s holds the code of
    production SLOT s (slot s = c*rblk + rr <-> storage row i*rblk + rr,
    in-row position c — the row128 kernels' deinterleave order). A tq
    kernel chunking at g = block_n/W then min-folding therefore reproduces
    lut_scan_reduce's window ids and membership for ANY window W (window j
    = slots {w*g + j}), not just W == cpr; the only constraint is the
    lane-slice alignment g % 128 == 0. XLA transpose; run once at
    build/add time (or on the fly for ad-hoc searches — ~100 us at 1M).
    """
    cpr = 128 // cb
    rows = jnp.asarray(codes_rows)
    r = rows.shape[0]
    n_pad = r * cpr
    if n_pad % block_n != 0:
        raise ValueError(f"N_pad {n_pad} not a multiple of block_n {block_n}")
    rblk = block_n // cpr
    nb = n_pad // block_n
    return (
        rows.reshape(nb, rblk, cpr, cb).transpose(3, 0, 2, 1).reshape(cb, n_pad)
    )


def build_scan_tables_tq(qtables, q_pad: int | None = None):
    """Permute tables into the tq kernel's T_cat (Qp, 2*16cb) layout.

    Columns 0..16cb-1 are the lo-nibble rows of build_scan_tables, columns
    16cb.. the hi rows (the kernel's one-hot is [oh_lo; oh_hi] along
    sublanes). Works for int8 (Quick-ADC) and float32 (conventional ADC)
    tables alike.
    """
    tlo, thi = build_scan_tables(qtables, q_pad)
    return jnp.concatenate([tlo.T, thi.T], axis=1)


@functools.lru_cache(maxsize=None)
def _tq_jrow_np(cb: int):
    lanes = 16 * cb
    return np.ascontiguousarray(
        np.broadcast_to((np.arange(lanes) // cb).astype(np.int32)[:, None], (lanes, 128))
    )


def _tq_window_min(planes_ref, tcat, jrow, *, window, cb, acc_dtype):
    """Chunked widecat accumulation: (cb, BLK) planes -> (Qp, BLK/W) minima."""
    g = planes_ref.shape[1] // window
    oh_dtype = jnp.int8 if acc_dtype == jnp.int32 else jnp.float32
    m = None
    for w in range(window):
        x = planes_ref[:, w * g : (w + 1) * g].astype(jnp.int32)  # (cb, g)
        lo = x & 15
        hi = x >> 4
        rep_lo = jnp.concatenate([lo] * 16, axis=0)      # (16cb, g) int32
        rep_hi = jnp.concatenate([hi] * 16, axis=0)
        oh = jnp.concatenate(
            [(rep_lo == jrow).astype(oh_dtype), (rep_hi == jrow).astype(oh_dtype)],
            axis=0,
        )                                                # (2*16cb, g)
        d = jnp.dot(tcat, oh, preferred_element_type=acc_dtype)
        m = d if m is None else jnp.minimum(m, d)
    return m


def _tq_scan_kernel(planes_ref, tcat_ref, jrow_ref, vals_ref, *, window, cb, acc_dtype):
    vals_ref[...] = _tq_window_min(
        planes_ref, tcat_ref[...], jrow_ref[...][:, 0:1],
        window=window, cb=cb, acc_dtype=acc_dtype,
    )


def pick_block_n_tq(n_pad: int, window: int = DEFAULT_WINDOW) -> int | None:
    """Largest legal tq block: divides n_pad, g = blk/window a 128-multiple.

    16384 measured best at 1M x 128q (ab_tq_ablate.py); None = geometry not
    tq-scannable (callers fall back to the row128 kernel).
    """
    for blk in (16384, 8192, 4096, 2048):
        if n_pad % blk == 0 and blk % (window * 128) == 0:
            return blk
    return None


@functools.partial(
    jax.jit,
    static_argnames=("cb", "block_n", "window", "interpret", "acc_dtype_name"),
)
def lut_scan_tq(
    planes,
    tables_cat,
    cb: int = 8,
    block_n: int = 16384,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
    acc_dtype_name: str = "int32",
):
    """Plane-major 4-bit scan; per-query window minima, min-only.

    Args:
      planes: (cb, N_pad) uint8 byte-planes (to_planes with the SAME
        block_n), N_pad % block_n == 0.
      tables_cat: (Qp, 2*16cb) int8 or float32 (build_scan_tables_tq).
      window: reduction window W; block_n % (window*128) == 0 (g-wide lane
        chunks must be 128-aligned).

    Returns:
      vals (Qp, N_pad/W) window minima — bit-identical ids, membership and
      layout to lut_scan_reduce(transpose_out=True) at window == cpr, so
      window_slots + slots_to_rows and the rerank tail run unchanged.
    """
    n_pad = planes.shape[1]
    lanes = 16 * cb
    assert planes.shape[0] == cb
    assert tables_cat.shape[1] == 2 * lanes, (tables_cat.shape, lanes)
    qp = tables_cat.shape[0]
    if n_pad % block_n != 0:
        raise ValueError(f"N_pad {n_pad} not a multiple of block_n {block_n}")
    if block_n % (window * 128) != 0:
        raise ValueError(f"block_n {block_n} not a multiple of {window}*128")
    acc_dtype = jnp.dtype(acc_dtype_name)
    g = block_n // window
    jrow = jnp.asarray(_tq_jrow_np(cb))
    return pl.pallas_call(
        functools.partial(
            _tq_scan_kernel, window=window, cb=cb, acc_dtype=acc_dtype
        ),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((cb, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, 2 * lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qp, g), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, n_pad // window), acc_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * lanes * qp,
            bytes_accessed=n_pad * cb + qp * 2 * lanes + (n_pad // window) * qp * 4,
            transcendentals=0,
        ),
    )(planes, tables_cat, jrow)


def _scan_min_vpu_kernel(
    codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref, *, window, cb,
):
    """VPU-gather variant of the int8 scan (SURVEY §7: "Alternative: VPU
    dynamic gather if supported; must benchmark both").

    Mosaic exposes no per-lane dynamic vector gather, so the 16-entry LUT
    lookup decomposes into data-parallel selects: the same int8 expansion +
    one-hot build as the MXU kernel, but the accumulation contraction
    acc[s, q] = sum_l oh[s, l] * t[l, q] runs as 2 * 16*cb select-accumulate
    VPU passes over (BLK, Qp) instead of two MXU matmuls. Arithmetic
    predicts this loses by ~2 orders (2*16*cb*2 VPU element-ops per
    code-query pair vs 2*16*cb int8 MACs at ~100x the MXU rate); it exists
    to produce the measured A/B row in docs/kernels.md (see
    benchmarks/ab_kernel.py), not to win.
    """
    cpr = 128 // cb
    raw = codes_ref[...]
    r32 = raw.astype(jnp.int32)
    lo_raw = (r32 & 0x0F).astype(jnp.int8)
    hi_raw = (r32 >> 4).astype(jnp.int8)
    e = e_ref[...].astype(jnp.int8)

    def expand(x):
        return jnp.concatenate(
            [
                jnp.dot(x, e[c * 128 : (c + 1) * 128, :],
                        preferred_element_type=jnp.int32)
                for c in range(cpr)
            ],
            axis=0,
        )

    rep_lo = expand(lo_raw)                     # (BLK, 16*cb) nibble values
    rep_hi = expand(hi_raw)
    jp = jpat_ref[0:1, :].astype(jnp.int32)
    oh_lo = rep_lo == jp                        # (BLK, lanes) bool
    oh_hi = rep_hi == jp
    tlo = tlo_ref[...].astype(jnp.int32)        # (lanes, Qp)
    thi = thi_ref[...].astype(jnp.int32)
    blk = oh_lo.shape[0]
    qp = tlo.shape[1]
    lanes = tlo.shape[0]
    acc = jnp.zeros((blk, qp), jnp.int32)
    for l in range(lanes):                      # VPU contraction, no MXU
        acc = acc + jnp.where(oh_lo[:, l : l + 1], tlo[l : l + 1, :], 0)
        acc = acc + jnp.where(oh_hi[:, l : l + 1], thi[l : l + 1, :], 0)
    vals_ref[...] = _window_min(acc, window)


@functools.partial(
    jax.jit, static_argnames=("cb", "block_n", "window", "interpret")
)
def lut_scan_vpu_reduce(
    codes_rows,
    tables_lo,
    tables_hi,
    cb: int = 8,
    block_n: int = DEFAULT_BLOCK_N,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
):
    """Flat int8 scan through the VPU select-accumulate contraction.

    Same contract as lut_scan_reduce(with_rows=False, variant="int8") —
    identical window minima; only the accumulation engine differs. Exists
    for the measured MXU-vs-VPU A/B (docs/kernels.md).
    """
    cpr = 128 // cb
    n_pad = codes_rows.shape[0] * cpr
    lanes = cb * 16
    assert tables_lo.shape[0] == lanes
    qp = tables_lo.shape[1]
    if n_pad % block_n != 0:
        raise ValueError(f"N_pad {n_pad} not a multiple of block_n {block_n}")
    if block_n % window != 0:
        raise ValueError(f"block_n {block_n} not a multiple of window {window}")
    g = block_n // window
    r16 = block_n // cpr
    e, jpat = _expand_consts(cb)
    vals = pl.pallas_call(
        functools.partial(_scan_min_vpu_kernel, window=window, cb=cb),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((r16, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cpr * 128, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // window, qp), jnp.int32),
        interpret=interpret,
    )(codes_rows, tables_lo, tables_hi, jpat, e)
    return vals


def _grouped_scan_kernel(
    codes_ref, tlo_ref, thi_ref, jpat_ref, e_ref, vals_ref,
    *, window, acc_dtype, cb, transpose_out=False,
):  # acc_dtype int32 (int8 Quick-ADC tables) or float32 (conventional ADC)
    """Grouped variant: table blocks are the current group's (lanes, G) slab.

    Emits only window-min VALUES (no arg): the caller reranks whole winning
    windows (see window_rerank), which removes arg bookkeeping and makes
    quantization ties harmless.

    transpose_out writes the block as (G, windows) — slot-major — so callers
    needing per-pair window rows skip the whole-array (gcap, C, G) ->
    (gcap, G, C) relayout copy (measured 10.7 ms of a 130 ms Deep100M
    b=2048 batch); the in-VMEM transpose rides the per-block matmul cost.
    """
    acc = _accumulate_rows_int8(
        codes_ref[...], cb, tlo_ref[...], thi_ref[...], jpat_ref, e_ref, acc_dtype
    )
    m = _window_min(acc, window)
    vals_ref[...] = m.T if transpose_out else m


_TRIM_SENTINEL_I32 = 1 << 30  # large; escapes only into size-masked windows


@functools.partial(
    jax.jit,
    static_argnames=(
        "rows_per_group", "cb", "block_n", "window", "interpret",
        "transpose_out", "acc_dtype_name",
    ),
)
def lut_scan_grouped_prefetch(
    codes_rows,
    group_part,
    tables_lo,
    tables_hi,
    rows_per_group: int,
    cb: int = 8,
    block_n: int = 512,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
    transpose_out: bool = False,
    acc_dtype_name: str = "int32",
    group_nblk=None,
):
    """Grouped IVF scan reading partitions IN PLACE via scalar prefetch.

    Args:
      codes_rows: (P * rows_per_group / cpr, 128) uint8 — partition-major
        row128 storage (the IVFIndex codes reshaped).
      group_part: (GCAP,) int32 — partition scanned by each group.
      tables_lo/hi: (GCAP * (M/2)*16, G) group-major table slabs — int8
        (Quick-ADC quantized) or float32 (conventional float ADC, with
        acc_dtype_name="float32").
      rows_per_group: padded partition size in CODES (static).
      transpose_out: emit (GCAP*G, C) slot-major window minima instead
        (C = rows_per_group/W) — row gi*G + s holds group gi slot s's windows,
        saving callers the (gcap, C, G) -> (gcap, G, C) relayout.
      acc_dtype_name: accumulation dtype ("int32" for int8 tables, "float32"
        for float tables; the expansion matmuls stay int8 either way).
      group_nblk: optional (GCAP,) int32 in [1, rows_per_group/block_n] —
        blocks actually scanned per group (= ceil(real partition size /
        block_n)). RAGGED-PARTITION TRIMMING: the reference scans exactly
        size_p codes per partition (databases.hpp:270-298); padding every
        partition to the global max makes a skewed corpus pay max-size HBM
        reads on every probe. Trimmed grid steps re-point the codes
        BlockSpec at the group's LAST live block (same index -> Pallas skips
        the DMA) and skip compute via pl.when, writing a sentinel the
        callers' size masks already exclude. The grid stays static.

    Returns:
      vals (GCAP*rows_per_group/W, G) window minima in the accumulation dtype
      (or the transposed layout above). Window wi of group gi covers the
      group's local SLOTS {(wi // gr)*block_n + w*gr + (wi % gr)}
      (gr = block_n/W); map slots to code rows with slots_to_rows / use
      window_slots + slots_to_rows for expansion.
    """
    cpr = 128 // cb
    lanes = cb * 16
    total_t, gq = tables_lo.shape
    gcap = total_t // lanes
    assert group_part.shape == (gcap,), (group_part.shape, gcap)
    assert codes_rows.shape[1] == 128
    if rows_per_group % block_n != 0:
        raise ValueError(f"block_n {block_n} must divide rows_per_group {rows_per_group}")
    if block_n % window != 0:
        raise ValueError(f"block_n {block_n} not a multiple of window {window}")
    acc_dtype = jnp.dtype(acc_dtype_name)
    nblocks = rows_per_group // block_n
    g = block_n // window
    r16 = block_n // cpr
    e, jpat = _expand_consts(cb)
    if group_nblk is None:
        group_nblk = jnp.full((gcap,), nblocks, jnp.int32)
    sentinel = (
        _TRIM_SENTINEL_I32 if acc_dtype == jnp.int32 else jnp.inf
    )

    # Fused slot-major output only where the (gq, g) block lowers (g a
    # multiple of 128, or a single-block group so g is the full minor dim);
    # at other shapes fall back to the natural layout + an XLA transpose.
    fuse_t = transpose_out and _transposed_block_legal(
        g, rows_per_group // window
    )
    body = functools.partial(
        _grouped_scan_kernel, window=window, acc_dtype=acc_dtype, cb=cb,
        transpose_out=fuse_t,
    )

    def kernel(gp_ref, gnb_ref, *rest):  # scalar-prefetch refs arrive first
        i = pl.program_id(0)
        live = (i % nblocks) < gnb_ref[i // nblocks]

        @pl.when(live)
        def _():
            body(*rest)

        @pl.when(jnp.logical_not(live))
        def _():
            vals_ref = rest[-1]
            vals_ref[...] = jnp.full(vals_ref.shape, sentinel, acc_dtype)

    def codes_map(i, gp, gnb):
        # Trimmed steps re-read the group's last live block: the unchanged
        # block index makes Pallas skip the HBM DMA entirely.
        return (
            gp[i // nblocks] * nblocks
            + jnp.minimum(i % nblocks, gnb[i // nblocks] - 1),
            0,
        )

    if fuse_t:
        out_specs = pl.BlockSpec(
            (gq, g), lambda i, gp, gnb: (i // nblocks, i % nblocks)
        )
        out_shape = jax.ShapeDtypeStruct(
            (gcap * gq, rows_per_group // window), acc_dtype
        )
    else:
        out_specs = pl.BlockSpec((g, gq), lambda i, gp, gnb: (i, 0))
        out_shape = jax.ShapeDtypeStruct(
            (gcap * rows_per_group // window, gq), acc_dtype
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gcap * nblocks,),
        in_specs=[
            pl.BlockSpec((r16, 128), codes_map),
            pl.BlockSpec((lanes, gq), lambda i, gp, gnb: (i // nblocks, 0)),
            pl.BlockSpec((lanes, gq), lambda i, gp, gnb: (i // nblocks, 0)),
            pl.BlockSpec((8, lanes), lambda i, gp, gnb: (0, 0)),
            pl.BlockSpec((cpr * 128, lanes), lambda i, gp, gnb: (0, 0)),
        ],
        out_specs=out_specs,
    )
    vals = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * gcap * rows_per_group * lanes * gq,
            bytes_accessed=gcap * rows_per_group * cb + 2 * gcap * lanes * gq,
            transcendentals=0,
        ),
    )(group_part, group_nblk, codes_rows, tables_lo, tables_hi, jpat, e)
    if transpose_out and not fuse_t:
        c = rows_per_group // window
        vals = (
            vals.reshape(gcap, c, gq).transpose(0, 2, 1).reshape(gcap * gq, c)
        )
    return vals


@functools.partial(
    jax.jit,
    static_argnames=(
        "rows_per_group", "cb", "block_n", "window", "interpret",
        "acc_dtype_name",
    ),
)
def lut_scan_grouped_tq(
    planes,
    group_part,
    tables_cat_g,
    rows_per_group: int,
    cb: int = 8,
    block_n: int = 2048,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
    acc_dtype_name: str = "int32",
    group_nblk=None,
):
    """Grouped IVF scan, tq (plane-major) formulation.

    The row128 grouped kernel's expansion matmuls cost blk*2*16cb*128 int8
    MACs per block — INDEPENDENT of the group width G, so at G << 128 they
    dominate the accumulate 128/G : 1. The tq form deletes them (see the
    round-5 kernel comment above to_planes); the MXU work drops to the
    accumulate itself and the scan becomes one-hot-build (VPU) + DMA bound.

    Args:
      planes: (cb, P * rows_per_group) uint8 — per-partition byte-planes in
        to_planes order at THIS block_n (partition p = lane columns
        [p*rows_per_group, (p+1)*rows_per_group)).
      group_part: (GCAP,) int32 — partition scanned by each group.
      tables_cat_g: (GCAP * G, 2*16cb) slot-major T_cat slabs (int8 or f32)
        — _group_table_slabs_tq (NO per-group transpose, unlike the row128
        slabs).
      group_nblk: optional (GCAP,) trimming as in lut_scan_grouped_prefetch.

    Returns:
      vals (GCAP*G, rows_per_group/W) window minima, slot-major — the
      transpose_out=True layout of lut_scan_grouped_prefetch with identical
      window ids/membership (window == cpr contract, to_planes).
    """
    cpr = 128 // cb
    lanes = 16 * cb
    total_t, lanes2 = tables_cat_g.shape
    assert lanes2 == 2 * lanes, (tables_cat_g.shape, lanes)
    gcap = group_part.shape[0]
    gq = total_t // gcap
    assert planes.shape[0] == cb
    if rows_per_group % block_n != 0:
        raise ValueError(f"block_n {block_n} must divide rows_per_group {rows_per_group}")
    if block_n % (window * 128) != 0:
        raise ValueError(f"block_n {block_n} not a multiple of {window}*128")
    acc_dtype = jnp.dtype(acc_dtype_name)
    nblocks = rows_per_group // block_n
    g = block_n // window
    jrow = jnp.asarray(_tq_jrow_np(cb))
    if group_nblk is None:
        group_nblk = jnp.full((gcap,), nblocks, jnp.int32)
    sentinel = _TRIM_SENTINEL_I32 if acc_dtype == jnp.int32 else jnp.inf

    def kernel(gp_ref, gnb_ref, planes_ref, tcat_ref, jrow_ref, vals_ref):
        i = pl.program_id(0)
        live = (i % nblocks) < gnb_ref[i // nblocks]

        @pl.when(live)
        def _():
            vals_ref[...] = _tq_window_min(
                planes_ref, tcat_ref[...], jrow_ref[...][:, 0:1],
                window=window, cb=cb, acc_dtype=acc_dtype,
            )

        @pl.when(jnp.logical_not(live))
        def _():
            vals_ref[...] = jnp.full(vals_ref.shape, sentinel, acc_dtype)

    def planes_map(i, gp, gnb):
        # Trimmed steps re-read the group's last live block (same lane-block
        # index -> Pallas skips the HBM DMA entirely).
        return (
            0,
            gp[i // nblocks] * nblocks
            + jnp.minimum(i % nblocks, gnb[i // nblocks] - 1),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gcap * nblocks,),
        in_specs=[
            pl.BlockSpec((cb, block_n), planes_map),
            pl.BlockSpec((gq, 2 * lanes), lambda i, gp, gnb: (i // nblocks, 0)),
            pl.BlockSpec((lanes, 128), lambda i, gp, gnb: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (gq, g), lambda i, gp, gnb: (i // nblocks, i % nblocks)
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (gcap * gq, rows_per_group // window), acc_dtype
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * gcap * rows_per_group * lanes * gq,
            bytes_accessed=gcap * rows_per_group * cb
            + total_t * 2 * lanes
            + gcap * gq * (rows_per_group // window) * 4,
            transcendentals=0,
        ),
    )(group_part, group_nblk, planes, tables_cat_g, jrow)


def _rows_adc_mux_enabled() -> bool:
    """Barrel-shifter (mux-tree) gather switch for _rows_adc_body_halves.

    Read at TRACE time — flipping the env var after a shape has been jitted
    needs jax.clear_caches() (A/B harnesses do; production picks one value
    per process). Default OFF — measured rejection (2026-08-19, v5e, b=1
    direct geometry): 80.2 vs 75.7 us e2e. The tree does ~2x fewer
    (BLK, 128) ops on paper (15 wheres vs 16 x (2 cmp + 2 sel + 2 add)) but
    Mosaic lowers the masked-accumulate loop to cheaper masked adds, while
    the tree keeps 8 live (BLK, 128) temporaries per nibble. Kept as a
    parity-tested A/B instrument.
    """
    import os

    return os.environ.get("QADC_ROWS_ADC_MUX", "0") != "0"


def _rows_adc_body(raw_u8, tlo, thi, *, cb):
    """Per-row float ADC accumulate: 128 lookups into each row's OWN table.

    raw_u8: (BLK, 128) u8 packed 4-bit codes (cpr codes/row); tlo/thi: (BLK
    or 1, 16*cb) f32 COMPACT tables (lane j*cb + b) — a 1-row table
    broadcasts over the block (per-group calling convention).

    ROTATE-AND-SELECT gather: lane l = c*cb + b needs table lane
    src = j*cb + b, so src - l is always a MULTIPLE OF cb — a full 128-lane
    in-row gather reduces to cpr static rolls of the table with a masked
    accumulate per roll ((j - c) mod cpr == dd selects the lanes each shift
    serves). All full-lane ops: no narrow (BLK, cb) slices (pltpu.repeat of
    one measured ~50x slower), no HBM-materialized tiled tables (gathering
    pre-tiled (A, 16*128) rows cost ~2.5 ms/batch at SIFT1M geometry).
    Tables wider than 128 lanes (cb=16) process as H=16*cb/128 halves;
    narrower ones (cb<8) arrive pre-repeated to 128 lanes (the repetition
    period 16*cb divides 128, so the same roll schedule serves — see
    _rows_adc_body_halves' n_j).
    """
    lanes_t = tlo.shape[1]
    h_count = lanes_t // 128
    return _rows_adc_body_halves(
        raw_u8,
        [tlo[:, h * 128 : (h + 1) * 128] for h in range(h_count)],
        [thi[:, h * 128 : (h + 1) * 128] for h in range(h_count)],
        cb=cb,
    )


def _rows_adc_body_halves(raw_u8, tlo_halves, thi_halves, *, cb):
    """Core of _rows_adc_body over pre-split 128-lane table halves.

    Taking halves as separate arrays (lane offset 0 each) matters for the
    per-group kernel: broadcasting a 1-sublane slice taken at lane offset
    128 fails Mosaic layout inference ("Invalid input layout" on
    vector.broadcast) — the cb=16 / M=32 configs hit this.
    """
    # n_j: distinct table entries served per 128-lane half. cb>=8: 128/cb
    # j-values per half (== cpr). cb<8: the 16*cb-lane table repeats to fill
    # 128 lanes, so only 16 distinct entries exist and the roll schedule is
    # periodic with period 16 (roll by 16*cb lanes is the identity on the
    # repeated table) — 16 rolls, modulus 16, no range masks.
    n_j = min(16, 128 // cb)
    raw = raw_u8.astype(jnp.int32)
    lo = raw & 0x0F
    hi = raw >> 4
    h_count = len(tlo_halves)

    c_lane = jax.lax.broadcasted_iota(jnp.int32, lo.shape, 1) // cb  # code pos
    # n_j == 16 is required, not just implied by h_count == 1: the tree below
    # hard-codes 4 select levels over 16 rolled variants; an n_j < 16 config
    # would silently select wrong entries (advisor r4).
    if h_count == 1 and n_j == 16 and _rows_adc_mux_enabled():
        # MUX-TREE gather: materialize the 16 rolled table variants t_dd
        # (rolls of the (1, 128) group table are near-free; the per-row
        # (BLK, 128) case pays the same 15 rolls the loop already did) and
        # select per lane with a 4-level binary tree over the bits of rel —
        # 15 wheres + 8 bit masks per nibble instead of the loop's
        # 16 x (2 cmp + 2 sel + 2 add) full-block passes (~2x fewer
        # (BLK, 128) VPU ops). NOT a barrel shifter: conditional rolls of
        # the selected data would compose shifts chosen by OTHER lanes' rel
        # bits. Bit-exact vs the loop: the same (tlo, thi) pair is selected
        # per lane and added once.
        lo_rel = (lo - c_lane) % n_j
        hi_rel = (hi - c_lane) % n_j

        def tree(t, rel):
            ts = [t]
            for _ in range(n_j - 1):
                ts.append(pltpu.roll(ts[-1], 128 - cb, axis=1))
            bits = [(rel & (1 << k)) != 0 for k in range(4)]
            for k in range(4):
                ts = [
                    jnp.where(bits[k], ts[2 * j + 1], ts[2 * j])
                    for j in range(len(ts) // 2)
                ]
            return ts[0]

        return tree(tlo_halves[0], lo_rel) + tree(thi_halves[0], hi_rel)
    acc = jnp.zeros(lo.shape, jnp.float32)
    for h in range(h_count):
        tlo_h = tlo_halves[h]
        thi_h = thi_halves[h]
        lo_h = lo - h * n_j                      # in [0, n_j) when in half h
        hi_h = hi - h * n_j
        # Roll-relative shift, hoisted out of the dd loop (one mod each).
        lo_rel = (lo_h - c_lane) % n_j
        hi_rel = (hi_h - c_lane) % n_j
        if h_count == 1:
            # Single half: every nibble value is in range — the in-range
            # masks are constant-true and the VPU compare+and per pass is
            # pure overhead (~20% of kernel time at cb=8, measured).
            lo_in = hi_in = None
        else:
            lo_in = (lo_h >= 0) & (lo_h < n_j)
            hi_in = (hi_h >= 0) & (hi_h < n_j)
        for dd in range(n_j):
            # roll(t, -dd*cb)[l] = t[(l + dd*cb) % 128] = t[(c+dd)%cpr*cb + b]
            take_lo = lo_rel == dd
            take_hi = hi_rel == dd
            if lo_in is not None:
                take_lo = lo_in & take_lo
                take_hi = hi_in & take_hi
            acc = (
                acc
                + jnp.where(take_lo, tlo_h, 0.0)
                + jnp.where(take_hi, thi_h, 0.0)
            )
            if dd + 1 < n_j:
                tlo_h = pltpu.roll(tlo_h, 128 - cb, axis=1)
                thi_h = pltpu.roll(thi_h, 128 - cb, axis=1)
    return acc


def _rows_adc_kernel(rows_ref, tlo_ref, thi_ref, acc_ref, *, cb):
    """Per-row tables: row i of the block uses table row i."""
    acc_ref[...] = _rows_adc_body(rows_ref[...], tlo_ref[...], thi_ref[...], cb=cb)


def _rows_adc_group_kernel(rows_ref, *t_refs_and_out, cb):
    """Per-group table: all block rows share table row 0 (broadcast).

    t_refs_and_out: h_count lo-half refs, h_count hi-half refs (each
    (8, 128), row 0 live), then the output ref.
    """
    acc_ref = t_refs_and_out[-1]
    t_refs = t_refs_and_out[:-1]
    h_count = len(t_refs) // 2
    acc_ref[...] = _rows_adc_body_halves(
        rows_ref[...],
        [r[0:1, :] for r in t_refs[:h_count]],
        [r[0:1, :] for r in t_refs[h_count:]],
        cb=cb,
    )


def _rows_adc_group_compact_kernel(rows_ref, *refs, cb, cpr):
    """Per-group table + FUSED per-code reduction, transposed compact output.

    refs: h_count lo-half refs, h_count hi-half refs, smat_ref ((128, 128)
    0/1 selector, only the first cpr columns live), out_ref ((cpr, BLK)).
    The selector matmul that reduced (BLK, 128) lane sums to (BLK, cpr)
    per-code distances used to run as a separate XLA stage reading the whole
    lane-sum array back from HBM; fusing it here shrinks the kernel's HBM
    output 128/cpr-fold and drops that stage from the b=1 critical path.
    HIGHEST precision: the sums must stay f32-exact for the exact-ranking
    contract of the direct path (index.ivf._search_qadc_direct_impl).
    """
    out_ref = refs[-1]
    smat_ref = refs[-2]
    t_refs = refs[:-2]
    h_count = len(t_refs) // 2
    acc = _rows_adc_body_halves(
        rows_ref[...],
        [r[0:1, :] for r in t_refs[:h_count]],
        [r[0:1, :] for r in t_refs[h_count:]],
        cb=cb,
    )
    d = jax.lax.dot_general(
        acc, smat_ref[...], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                              # (BLK, 128), cpr live lanes
    out_ref[...] = d.T[0:cpr, :]


@functools.partial(jax.jit, static_argnames=("cb", "interpret"))
def rows_adc_accumulate(rows, tlo_c, thi_c, cb: int = 8, interpret: bool = False):
    """(A, 128) u8 rows + (A, 16*cb) f32 compact tables -> (A, 128) f32 lane
    sums (lane l = c*cb + b holds T[2b or 2b+1][nibble]); callers reduce bytes
    per code with a selector matmul. Pads A to the block size internally."""
    a = rows.shape[0]
    lanes_t = 16 * cb
    if lanes_t < 128:
        # Narrow tables (cb<8, e.g. sq_count=8): repeat to 128 lanes so the
        # kernel's roll schedule applies (16*cb divides 128, so the repeated
        # table is roll-periodic — see _rows_adc_body_halves).
        rep = 128 // lanes_t
        tlo_c = jnp.tile(tlo_c, (1, rep))
        thi_c = jnp.tile(thi_c, (1, rep))
        lanes_t = 128
    blk = 512
    a_pad = -(-a // blk) * blk
    if a_pad != a:
        rows = jnp.pad(rows, [(0, a_pad - a), (0, 0)])
        tlo_c = jnp.pad(tlo_c, [(0, a_pad - a), (0, 0)])
        thi_c = jnp.pad(thi_c, [(0, a_pad - a), (0, 0)])
    acc = pl.pallas_call(
        functools.partial(_rows_adc_kernel, cb=cb),
        grid=(a_pad // blk,),
        in_specs=[
            pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, lanes_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, lanes_t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a_pad, 128), jnp.float32),
        interpret=interpret,
    )(rows, tlo_c, thi_c)
    return acc[:a]


def rows_adc_block_rows(rows_per_part: int) -> int:
    """Trimming block unit (ROWS) for rows_adc_grouped_prefetch.

    256 measured best on v5e at SIFT1M IVF-256 b=1 geometry (rpp=512,
    real ~245 rows): 28.8 us vs 135.7 at 512 (a 512 unit makes nblocks==1,
    so ragged trimming cannot skip the ~52% padding) and vs 69.6/144.4 at
    128/64 (per-step overhead) — benchmarks/ab_b1.py. Callers computing
    group_nblk must use this same unit.
    """
    return math.gcd(256, rows_per_part)


# Finite sentinel written into masked (padding) outputs: callers screen on
# it and restore +inf after the final top-k (0 * inf would NaN any matmul
# the screened values later touch — see index/ivf.py's direct path).
MASK_BIG = 3.0e38


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_part", "cb", "interpret", "compact_out",
                     "tile_min", "pairs_per_step"),
)
def rows_adc_grouped_prefetch(
    codes_rows, group_part, tlo_c, thi_c, rows_per_part: int, cb: int = 8,
    interpret: bool = False, group_nblk=None, compact_out: bool = False,
    mask_sizes=None, tile_min: int | None = None, pairs_per_step: int = 1,
):
    """Float ADC over whole partitions read IN PLACE (scalar prefetch).

    Group i scans all rows_per_part row128 rows of partition group_part[i]
    with its own compact table — the low-latency path's scan (one group per
    (query, assignment) pair). Versus gathering rows + per-row tables to HBM
    first (rows_adc_accumulate's calling convention): saves the (A, 128) u8
    row gather and two (A, 16cb) f32 table gathers — 31 us of the b=1
    latency budget at SIFT1M geometry.

    Args:
      codes_rows: (P * rows_per_part, 128) uint8 partition-major row128 codes.
      group_part: (GCAP,) int32 partition scanned by each group.
      tlo_c/thi_c: (GCAP, 16*cb) f32 compact tables (tile_tables_rows order).
      rows_per_part: padded partition size in row128 ROWS (static).
      group_nblk: optional (GCAP,) int32 live block count per group (blocks
        of rows_adc_block_rows(rows_per_part) ROWS) — ragged-partition
        trimming, see lut_scan_grouped_prefetch. Trimmed steps write 0 rows
        (MASK_BIG when mask_sizes is given); callers mask by real partition
        size unless mask_sizes does it for them.
      compact_out: fuse the per-code selector reduction into the kernel and
        emit (GCAP * cpr, rows_per_part) f32 — row gi*cpr + c, column rr is
        the distance of code rr*cpr + c of group gi's partition. 128/cpr x
        less output HBM and one fewer XLA stage on the b=1 direct path.
      mask_sizes: optional (GCAP,) int32 real CODE count per group. When
        given, outputs for codes at or past each group's count hold MASK_BIG
        — the validity masking fuses into the kernel epilogue (saves the
        caller's separate compare+where pass over the whole distance array,
        ~7 us of the b=1 budget).
      tile_min: optional TILE width — additionally emit per-(c-row, tile)
        column minima of the masked compact output, (GCAP * cpr,
        rows_per_part // tile_min) f32, as a native-layout XLA reduce over
        the kernel's compact output (NOT fused in-kernel: the fused
        epilogue's minor-dim-splitting reshape is Mosaic-illegal at the
        production geometry — round-4 VERDICT, reproduced on v5e). Feeds
        the direct path's exact tile screen so it never recomputes minima
        from the relayouted full array. Requires compact_out + mask_sizes
        and tile_min | rows_per_part.

    Returns:
      (GCAP * rows_per_part, 128) f32 lane sums, group-major; reduce bytes
      per code with the selector matmul as for rows_adc_accumulate. With
      compact_out, the transposed per-code layout above instead. With
      tile_min accepted (see above), a (compact, mins) tuple.
    """
    gcap = group_part.shape[0]
    lanes_t = 16 * cb
    if lanes_t < 128:
        # Narrow tables (cb<8): repeat to 128 lanes; the repeated table is
        # roll-periodic so the kernel schedule applies unchanged (see
        # _rows_adc_body_halves' n_j).
        rep = 128 // lanes_t
        tlo_c = jnp.tile(tlo_c, (1, rep))
        thi_c = jnp.tile(thi_c, (1, rep))
        lanes_t = 128
    h_count = lanes_t // 128
    blk = rows_adc_block_rows(rows_per_part)
    nblocks = rows_per_part // blk
    # Mosaic needs >= 8 sublanes per block (each group's table stored
    # 8-repeated, kernel reads row 0) and each 128-lane HALF as a separate
    # input (an offset-lane slice of a 1-sublane vector fails layout
    # inference — see _rows_adc_body_halves).
    halves = [
        jnp.repeat(t[:, h * 128 : (h + 1) * 128], 8, axis=0)
        for t in (tlo_c, thi_c)
        for h in range(h_count)
    ]
    cpr = 128 // cb
    # The fused (cpr, blk) compact block lowers only when blk is a multiple
    # of 128 or the whole partition (see _transposed_block_legal); elsewhere
    # emit lane sums and do the selector reduction as an XLA HIGHEST matmul
    # (measured f32-exact in-kernel AND in XLA — benchmarks/diag_direct.py).
    fuse_c = compact_out and _transposed_block_legal(blk, rows_per_part)
    if fuse_c:
        body = functools.partial(_rows_adc_group_compact_kernel, cb=cb, cpr=cpr)
    else:
        body = functools.partial(_rows_adc_group_kernel, cb=cb)
    if group_nblk is None:
        group_nblk = jnp.full((gcap,), nblocks, jnp.int32)
    mask_fused = mask_sizes is not None and fuse_c
    # tile_min reduction happens OUTSIDE the kernel (XLA reduce over the
    # compact output, line ~1150): the in-kernel epilogue needed a
    # minor-dim-splitting reshape (cpr, blk) -> (cpr, blk//tile, tile) that
    # Mosaic rejects ("unsupported shape cast") at the production b=1 SIFT
    # geometry (cpr=16, blk=256, tile=32) — reproduced on v5e, round-4
    # VERDICT. The XLA reduce reads the (gcap*cpr, rpp) f32 array once
    # (~400 KB at b=1 ma=24) in its native layout; same values.
    gsz = (
        jnp.full((gcap,), rows_per_part * cpr, jnp.int32)
        if mask_sizes is None
        else jnp.asarray(mask_sizes, jnp.int32)
    )

    def _finish(out):
        if tile_min is None:
            return out
        if not compact_out or rows_per_part % tile_min or mask_sizes is None:
            raise ValueError(
                "tile_min needs compact_out + mask_sizes and "
                "tile_min | rows_per_part"
            )
        mins = jnp.min(  # native-layout XLA reduce (see fuse_c note above)
            out.reshape(gcap * cpr, rows_per_part // tile_min, tile_min),
            axis=-1,
        )
        return out, mins

    if pairs_per_step > 1:
        # FATTER GRID STEPS: scan pairs_per_step whole partitions per step.
        # The b=1 direct path is grid-step-overhead-bound (24 steps of ~2 us
        # at SIFT geometry, ~50 us kernel stage); amortizing the fixed
        # per-step cost over ppg partitions is the lever (round-4 VERDICT
        # item 6). Legal only in the fused-compact nblocks==1 regime (whole
        # partition per step, mask fused): the output block then spans ppg
        # contiguous groups' rows.
        if not (fuse_c and nblocks == 1 and mask_sizes is not None):
            raise ValueError(
                "pairs_per_step > 1 requires compact_out (fused-legal "
                "geometry), nblocks == 1 and mask_sizes"
            )
        if gcap % pairs_per_step:
            raise ValueError(
                f"gcap {gcap} not a multiple of pairs_per_step "
                f"{pairs_per_step}"
            )
        ppg = pairs_per_step
        per = 2 * h_count

        def kernel_ppg(gp_ref, gsz_ref, *rest):  # scalar prefetch first
            i = pl.program_id(0)
            out_ref = rest[-1]
            smat_ref = rest[-2]
            codes_refs = rest[:ppg]
            t_refs = rest[ppg : ppg + ppg * per]
            code_id = jax.lax.broadcasted_iota(
                jnp.int32, (cpr, blk), 1
            ) * cpr + jax.lax.broadcasted_iota(jnp.int32, (cpr, blk), 0)
            for k in range(ppg):
                tk = t_refs[k * per : (k + 1) * per]
                acc = _rows_adc_body_halves(
                    codes_refs[k][...],
                    [r[0:1, :] for r in tk[:h_count]],
                    [r[0:1, :] for r in tk[h_count:]],
                    cb=cb,
                )
                d = jax.lax.dot_general(
                    acc, smat_ref[...], (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                dt = jnp.where(
                    code_id < gsz_ref[i * ppg + k], d.T[0:cpr, :], MASK_BIG
                )
                out_ref[k * cpr : (k + 1) * cpr, :] = dt

        in_specs_p = [
            pl.BlockSpec(
                (blk, 128),
                (lambda k: lambda i, gp, gsz_: (gp[i * ppg + k], 0))(k),
            )
            for k in range(ppg)
        ]
        for k in range(ppg):
            in_specs_p += [
                pl.BlockSpec(
                    (8, 128),
                    (lambda k: lambda i, gp, gsz_: (i * ppg + k, 0))(k),
                )
                for _ in range(per)
            ]
        smat = jnp.zeros((128, 128), jnp.float32).at[
            jnp.arange(128), jnp.arange(128) // cb
        ].set(1.0)
        in_specs_p.append(pl.BlockSpec((128, 128), lambda i, gp, gsz_: (0, 0)))
        operands_p = (
            [codes_rows] * ppg
            + [h for _ in range(ppg) for h in halves]
            + [smat]
        )
        out = pl.pallas_call(
            kernel_ppg,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(gcap // ppg,),
                in_specs=in_specs_p,
                out_specs=pl.BlockSpec(
                    (ppg * cpr, blk), lambda i, gp, gsz_: (i, 0)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (gcap * cpr, rows_per_part), jnp.float32
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * 16 * gcap * rows_per_part * 128,
                bytes_accessed=gcap * rows_per_part * 128 * 5
                + gcap * lanes_t * 8,
                transcendentals=0,
            ),
        )(group_part, gsz, *operands_p)
        return _finish(out)

    def kernel(gp_ref, gnb_ref, gsz_ref, *rest):  # scalar prefetch first
        i = pl.program_id(0)
        live = (i % nblocks) < gnb_ref[i // nblocks]
        acc_ref = rest[-1]

        @pl.when(live)
        def _():
            body(*rest)
            if mask_fused:
                # Fused validity mask: output block (cpr, blk) — row c,
                # column rr_local; code local id = rr_global*cpr + c.
                rr = (i % nblocks) * blk + jax.lax.broadcasted_iota(
                    jnp.int32, (cpr, blk), 1
                )
                code_id = rr * cpr + jax.lax.broadcasted_iota(
                    jnp.int32, (cpr, blk), 0
                )
                acc_ref[...] = jnp.where(
                    code_id < gsz_ref[i // nblocks], acc_ref[...], MASK_BIG
                )

        @pl.when(jnp.logical_not(live))
        def _():
            acc_ref[...] = jnp.full(
                acc_ref.shape, MASK_BIG if mask_fused else 0.0, jnp.float32
            )

    def codes_map(i, gp, gnb, gsz_):
        # Trimmed steps re-read the last live block (no DMA; see
        # lut_scan_grouped_prefetch).
        return (
            gp[i // nblocks] * nblocks
            + jnp.minimum(i % nblocks, gnb[i // nblocks] - 1),
            0,
        )

    in_specs = [
        pl.BlockSpec((blk, 128), codes_map),
    ] + [
        pl.BlockSpec((8, 128), lambda i, gp, gnb, gsz_: (i // nblocks, 0))
        for _ in range(2 * h_count)
    ]
    operands = [group_part, group_nblk, gsz, codes_rows, *halves]
    if fuse_c:
        # 0/1 selector, 128 lanes (only the first cpr columns live): the
        # fused reduction matmul needs full-lane operands.
        smat = jnp.zeros((128, 128), jnp.float32).at[
            jnp.arange(128), jnp.arange(128) // cb
        ].set(1.0)
        in_specs.append(
            pl.BlockSpec((128, 128), lambda i, gp, gnb, gsz_: (0, 0))
        )
        operands.append(smat)
        out_specs = pl.BlockSpec(
            (cpr, blk), lambda i, gp, gnb, gsz_: (i // nblocks, i % nblocks)
        )
        # rows_per_part is in ROWS of 128 bytes; each block covers blk rows ->
        # blk output columns (one per storage row): total columns = rows_per_part.
        out_shape = jax.ShapeDtypeStruct((gcap * cpr, rows_per_part), jnp.float32)
    else:
        out_specs = pl.BlockSpec((blk, 128), lambda i, gp, gnb, gsz_: (i, 0))
        out_shape = jax.ShapeDtypeStruct((gcap * rows_per_part, 128), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gcap * nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * 16 * gcap * rows_per_part * 128,
            bytes_accessed=gcap * rows_per_part * 128 * 5 + gcap * lanes_t * 8,
            transcendentals=0,
        ),
    )(*operands)
    if compact_out and not fuse_c:
        smat = jnp.asarray(
            (np.arange(128)[:, None] // cb) == np.arange(cpr)[None, :],
            jnp.float32,
        )
        d = jnp.dot(out, smat, precision=jax.lax.Precision.HIGHEST)
        out = (
            d.reshape(gcap, rows_per_part, cpr)
            .transpose(0, 2, 1)
            .reshape(gcap * cpr, rows_per_part)
        )
        if mask_sizes is not None:  # same contract as the fused epilogue
            rr = jnp.arange(rows_per_part, dtype=jnp.int32)
            c_row = jnp.arange(cpr, dtype=jnp.int32)
            code_id = rr[None, None, :] * cpr + c_row[None, :, None]
            ok = code_id < gsz[:, None, None]
            out = jnp.where(
                ok.reshape(gcap * cpr, rows_per_part), out, MASK_BIG
            )
    elif mask_sizes is not None and not compact_out:
        # Lane-sum layout: row g*rpp + rr, lane l -> code rr*cpr + l//cb.
        rr = jnp.arange(rows_per_part, dtype=jnp.int32)
        lane_c = jnp.arange(128, dtype=jnp.int32) // cb
        code_id = rr[None, :, None] * cpr + lane_c[None, None, :]
        ok = code_id < gsz[:, None, None]
        out = jnp.where(
            ok.reshape(gcap * rows_per_part, 128), out, MASK_BIG
        )
    return _finish(out)


def window_slots(window_ids, block_n: int, window: int):
    """Expand window ids to the SLOTS they cover.

    Args:
      window_ids: (..., K) int32 window indices (within one group's slot space).

    Returns:
      (..., K, window) int32 slots; map to code rows with slots_to_rows.
    """
    gr = block_n // window
    b = window_ids // gr
    s = window_ids % gr
    w = jnp.arange(window, dtype=jnp.int32)
    return b[..., None] * block_n + w * gr + s[..., None]


def _scan8_kernel(
    codes_ref, t_ref, jpat_ref, e_ref, vals_ref, idx_ref,
    *, window, m, transpose_out=False,
):
    """8-bit conventional ADC scan block: one-hot over 256 centroids per sq.

    Reference: scan_standard<uint8_t, NSQ> (query_common.hpp:92-118). Tables
    are bf16 for MXU rate; exactness is restored by the caller's f32 gather
    rerank of the winning candidates. transpose_out writes (Qp, g) blocks —
    per-query rows straight out of the kernel.
    """
    codes_c = _deinterleave(codes_ref[...], m)           # (BLK, M) slot order
    blk = codes_c.shape[0]
    g = blk // window

    c = codes_c.astype(jnp.bfloat16)  # 0..255 exact in bf16
    rep = jnp.dot(c, e_ref[...], preferred_element_type=jnp.float32)
    jp = jpat_ref[0:1, :]
    oh = (rep == jp).astype(jnp.bfloat16)
    acc = jnp.dot(oh, t_ref[...], preferred_element_type=jnp.float32)

    m_v = acc[0:g, :]
    arg = jnp.zeros((g, acc.shape[1]), jnp.int32)
    for w in range(1, window):
        nxt = acc[w * g : (w + 1) * g, :]
        take = nxt < m_v
        m_v = jnp.where(take, nxt, m_v)
        arg = jnp.where(take, w, arg)
    base = pl.program_id(0) * blk
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (g, acc.shape[1]), 0)
    slots = base + arg * g + g_iota                      # SLOT ids
    if transpose_out:
        vals_ref[...] = m_v.T
        idx_ref[...] = slots.T
    else:
        vals_ref[...] = m_v
        idx_ref[...] = slots


@functools.lru_cache(maxsize=None)
def _expand8_consts_np(m: int):
    lanes = 256 * m
    e = np.zeros((m, lanes), np.float32)
    for b in range(m):
        e[b, np.arange(256) * m + b] = 1.0
    jpat = np.broadcast_to((np.arange(lanes) // m).astype(np.float32), (8, lanes))
    return e, np.ascontiguousarray(jpat)


def build_scan8_tables(tables, q_pad: int | None = None):
    """(Q, M, 256) float tables -> (M*256, Qp) bf16 in j-major row order."""
    q, m, k = tables.shape
    assert k == 256
    if q_pad is None:
        q_pad = -(-q // 128) * 128
    t = tables.transpose(0, 2, 1).reshape(q, m * 256).T  # rows j*M+b
    return jnp.pad(t, [(0, 0), (0, q_pad - q)]).astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("m", "block_n", "window", "interpret", "transpose_out"),
)
def lut_scan8_reduce(
    codes_rows, tables, m: int = 8, block_n: int = 256,
    window: int = DEFAULT_WINDOW, interpret: bool = False,
    transpose_out: bool = False,
):
    """8-bit ADC scan over all codes: window minima + arg code rows.

    Args:
      codes_rows: (N_pad/cpr, 128) uint8 row128 storage (cpr = 128/M).
      tables: (M*256, Qp) bf16 (from build_scan8_tables).
      m: sub-quantizer count (= code bytes at 8 bits).
      transpose_out: emit (Qp, N_pad/W) per-query rows instead — saves the
        caller's (C, Qp) -> (Qp, C) relayout copy.

    Returns:
      (vals (N_pad/W, Qp) f32, rows (N_pad/W, Qp) int32 global code rows) —
      or the (Qp, N_pad/W) layouts with transpose_out.
    """
    cpr = 128 // m
    n_pad = codes_rows.shape[0] * cpr
    lanes = m * 256
    assert tables.shape[0] == lanes
    qp = tables.shape[1]
    if n_pad % block_n != 0:
        raise ValueError(f"N_pad {n_pad} not a multiple of block_n {block_n}")
    g = block_n // window
    r16 = block_n // cpr
    e_np, jpat_np = _expand8_consts_np(m)
    e = jnp.asarray(e_np, jnp.bfloat16)
    jpat = jnp.asarray(jpat_np)

    # Fused transposed output only where the (qp, g) block lowers; at other
    # shapes emit the natural layout and transpose in XLA (see
    # _transposed_block_legal).
    fuse_t = transpose_out and _transposed_block_legal(g, n_pad // window)
    kernel = functools.partial(
        _scan8_kernel, window=window, m=m, transpose_out=fuse_t
    )
    if fuse_t:
        out_specs = [
            pl.BlockSpec((qp, g), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(2)
        ]
        out_shape = [
            jax.ShapeDtypeStruct((qp, n_pad // window), dt)
            for dt in (jnp.float32, jnp.int32)
        ]
    else:
        out_specs = [
            pl.BlockSpec((g, qp), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(2)
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_pad // window, qp), dt)
            for dt in (jnp.float32, jnp.int32)
        ]
    vals, slots = pl.pallas_call(
        kernel,
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((r16, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * lanes * qp * 2,
            bytes_accessed=n_pad * m + 2 * lanes * qp,
            transcendentals=0,
        ),
    )(codes_rows, tables, jpat, e)
    if transpose_out and not fuse_t:
        vals, slots = vals.T, slots.T
    return vals, slots_to_rows(slots, block_n, m)


def _grouped_scan8_kernel(
    codes_ref, t_ref, jpat_ref, e_ref, vals_ref, idx_ref,
    *, window, m, base, transpose_out=False,
):
    """Grouped 8-bit ADC scan block: the group's (m*256, G) bf16 table slab.

    Same accumulate as _scan8_kernel (one-hot over 256 centroids per byte);
    emits window min + GROUP-LOCAL arg slots. base = the block's group-local
    slot offset, computed by the WRAPPER (pl.program_id inside this body
    would sit under the trimming pl.when, which the interpret path cannot
    substitute). transpose_out writes (G, g) slot-major blocks — see
    _grouped_scan_kernel.
    """
    codes_c = _deinterleave(codes_ref[...], m)           # (BLK, M) slot order
    blk = codes_c.shape[0]
    g = blk // window

    c = codes_c.astype(jnp.bfloat16)  # 0..255 exact in bf16
    rep = jnp.dot(c, e_ref[...], preferred_element_type=jnp.float32)
    jp = jpat_ref[0:1, :]
    oh = (rep == jp).astype(jnp.bfloat16)
    acc = jnp.dot(oh, t_ref[...], preferred_element_type=jnp.float32)

    m_v = acc[0:g, :]
    arg = jnp.zeros((g, acc.shape[1]), jnp.int32)
    for w in range(1, window):
        nxt = acc[w * g : (w + 1) * g, :]
        take = nxt < m_v
        m_v = jnp.where(take, nxt, m_v)
        arg = jnp.where(take, w, arg)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (g, acc.shape[1]), 0)
    slots = base + arg * g + g_iota                      # group-local SLOT ids
    if transpose_out:
        vals_ref[...] = m_v.T
        idx_ref[...] = slots.T
    else:
        vals_ref[...] = m_v
        idx_ref[...] = slots


@functools.partial(
    jax.jit,
    static_argnames=(
        "rows_per_group", "m", "block_n", "window", "interpret", "transpose_out",
    ),
)
def lut_scan8_grouped_prefetch(
    codes_rows,
    group_part,
    tables_g,
    rows_per_group: int,
    m: int = 8,
    block_n: int = 256,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
    transpose_out: bool = False,
    group_nblk=None,
):
    """Grouped 8-bit conventional-ADC IVF scan, partitions read IN PLACE.

    The 8-bit analog of lut_scan_grouped_prefetch (scalar-prefetch block
    routing): each group scans its whole partition once against its (m*256, G)
    bf16 table slab. Reference: scan_standard<uint8_t> over probed partitions
    (query_common.hpp:92-118, db_query.cpp:17-46), inverted MoE-style.

    Args:
      codes_rows: (P * rows_per_group / cpr, 128) uint8 partition-major row128
        storage (cpr = 128/m codes per row).
      group_part: (GCAP,) int32 partition scanned by each group.
      tables_g: (GCAP * m*256, G) bf16 group-major table slabs (per-pair
        build_scan8_tables columns scattered to group slots).
      rows_per_group: padded partition size in CODES (static).
      group_nblk: optional (GCAP,) int32 live block count per group —
        ragged-partition trimming, see lut_scan_grouped_prefetch.

    Returns:
      (vals, slots): (GCAP*rows_per_group/W, G) f32 window minima + int32
      GROUP-LOCAL arg slots (map to partition rows with slots_to_rows);
      (GCAP*G, C) slot-major with transpose_out.
    """
    cpr = 128 // m
    lanes = m * 256
    total_t, gq = tables_g.shape
    gcap = total_t // lanes
    assert group_part.shape == (gcap,), (group_part.shape, gcap)
    if rows_per_group % block_n != 0:
        raise ValueError(f"block_n {block_n} must divide rows_per_group {rows_per_group}")
    if block_n % window != 0:
        raise ValueError(f"block_n {block_n} not a multiple of window {window}")
    nblocks = rows_per_group // block_n
    g = block_n // window
    r16 = block_n // cpr
    e_np, jpat_np = _expand8_consts_np(m)
    e = jnp.asarray(e_np, jnp.bfloat16)
    jpat = jnp.asarray(jpat_np)
    if group_nblk is None:
        group_nblk = jnp.full((gcap,), nblocks, jnp.int32)

    # Fused slot-major output only where the (gq, g) block lowers; at other
    # shapes fall back to the natural layout + an XLA transpose (see
    # _transposed_block_legal).
    fuse_t = transpose_out and _transposed_block_legal(
        g, rows_per_group // window
    )

    def kernel(gp_ref, gnb_ref, *rest):  # scalar-prefetch refs arrive first
        i = pl.program_id(0)
        live = (i % nblocks) < gnb_ref[i // nblocks]
        base = (i % nblocks) * block_n  # hoisted: see _grouped_scan8_kernel

        @pl.when(live)
        def _():
            _grouped_scan8_kernel(
                *rest, window=window, m=m, base=base,
                transpose_out=fuse_t,
            )

        @pl.when(jnp.logical_not(live))
        def _():
            vals_ref, idx_ref = rest[-2], rest[-1]
            vals_ref[...] = jnp.full(vals_ref.shape, jnp.inf, jnp.float32)
            idx_ref[...] = jnp.zeros(idx_ref.shape, jnp.int32)

    def codes_map(i, gp, gnb):
        # Trimmed steps re-read the last live block (no DMA; see
        # lut_scan_grouped_prefetch).
        return (
            gp[i // nblocks] * nblocks
            + jnp.minimum(i % nblocks, gnb[i // nblocks] - 1),
            0,
        )

    if fuse_t:
        out_specs = [
            pl.BlockSpec((gq, g), lambda i, gp, gnb: (i // nblocks, i % nblocks))
            for _ in range(2)
        ]
        out_shape = [
            jax.ShapeDtypeStruct((gcap * gq, rows_per_group // window), dt)
            for dt in (jnp.float32, jnp.int32)
        ]
    else:
        out_specs = [
            pl.BlockSpec((g, gq), lambda i, gp, gnb: (i, 0)) for _ in range(2)
        ]
        out_shape = [
            jax.ShapeDtypeStruct((gcap * rows_per_group // window, gq), dt)
            for dt in (jnp.float32, jnp.int32)
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gcap * nblocks,),
        in_specs=[
            pl.BlockSpec((r16, 128), codes_map),
            pl.BlockSpec((lanes, gq), lambda i, gp, gnb: (i // nblocks, 0)),
            pl.BlockSpec((8, lanes), lambda i, gp, gnb: (0, 0)),
            pl.BlockSpec((m, lanes), lambda i, gp, gnb: (0, 0)),
        ],
        out_specs=out_specs,
    )
    vals, slots = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * gcap * rows_per_group * lanes * gq,
            bytes_accessed=gcap * rows_per_group * m + 2 * gcap * lanes * gq,
            transcendentals=0,
        ),
    )(group_part, group_nblk, codes_rows, tables_g, jpat, e)
    if transpose_out and not fuse_t:
        c = rows_per_group // window
        vals, slots = (
            x.reshape(gcap, c, gq).transpose(0, 2, 1).reshape(gcap * gq, c)
            for x in (vals, slots)
        )
    return vals, slots


@functools.lru_cache(maxsize=None)
def _tq_jrow8_np(m: int):
    lanes = m * 256
    return np.ascontiguousarray(
        np.broadcast_to((np.arange(lanes) // m).astype(np.int32)[:, None], (lanes, 128))
    )


@functools.partial(
    jax.jit,
    static_argnames=("rows_per_group", "m", "block_n", "window", "interpret"),
)
def lut_scan8_grouped_tq(
    planes,
    group_part,
    tables_cat_g,
    rows_per_group: int,
    m: int = 8,
    block_n: int = 1024,
    window: int = 8,
    interpret: bool = False,
    group_nblk=None,
):
    """Grouped 8-bit ADC scan, tq (plane-major) formulation.

    The 8-bit analog of lut_scan_grouped_tq: byte-planes replace the row128
    deinterleave + bf16 expansion matmul (blk*m*256 bf16 MACs per block,
    independent of the group width); the 256-wide one-hot builds transposed
    with one sublane replication + one int32 compare per chunk. Emits the
    SAME window minima + GROUP-LOCAL arg slots as lut_scan8_grouped_prefetch
    (slot ids are production slot order by the to_planes contract), in the
    slot-major (GCAP*G, C) transpose_out layout.

    Args:
      planes: (m, P * rows_per_group) uint8 byte-planes (to_planes at THIS
        block_n; code_size == m at 8 bits).
      tables_cat_g: (GCAP*G, m*256) slot-major bf16 slabs
        (_group_table_slabs_tq of build_scan8_tables(...).T rows).
    """
    lanes = m * 256
    total_t, lanes2 = tables_cat_g.shape
    assert lanes2 == lanes, (tables_cat_g.shape, lanes)
    gcap = group_part.shape[0]
    gq = total_t // gcap
    assert planes.shape[0] == m
    if rows_per_group % block_n != 0:
        raise ValueError(f"block_n {block_n} must divide rows_per_group {rows_per_group}")
    if block_n % (window * 128) != 0:
        raise ValueError(f"block_n {block_n} not a multiple of {window}*128")
    nblocks = rows_per_group // block_n
    g = block_n // window
    jrow = jnp.asarray(_tq_jrow8_np(m))
    if group_nblk is None:
        group_nblk = jnp.full((gcap,), nblocks, jnp.int32)

    def body(planes_ref, tcat_ref, jrow_ref, vals_ref, idx_ref, base):
        tcat = tcat_ref[...]
        jr = jrow_ref[...][:, 0:1]                       # (m*256, 1) int32
        m_v = None
        arg = None
        for w in range(window):
            x = planes_ref[:, w * g : (w + 1) * g].astype(jnp.int32)  # (m, g)
            rep = jnp.concatenate([x] * 256, axis=0)     # (m*256, g) int32
            oh = (rep == jr).astype(jnp.bfloat16)
            d = jnp.dot(tcat, oh, preferred_element_type=jnp.float32)
            if m_v is None:
                m_v = d
                arg = jnp.zeros(d.shape, jnp.int32)
            else:
                take = d < m_v
                m_v = jnp.where(take, d, m_v)
                arg = jnp.where(take, w, arg)
        g_iota = jax.lax.broadcasted_iota(jnp.int32, m_v.shape, 1)
        vals_ref[...] = m_v
        idx_ref[...] = base + arg * g + g_iota           # group-local SLOTS

    def kernel(gp_ref, gnb_ref, planes_ref, tcat_ref, jrow_ref, vals_ref, idx_ref):
        i = pl.program_id(0)
        live = (i % nblocks) < gnb_ref[i // nblocks]
        base = (i % nblocks) * block_n

        @pl.when(live)
        def _():
            body(planes_ref, tcat_ref, jrow_ref, vals_ref, idx_ref, base)

        @pl.when(jnp.logical_not(live))
        def _():
            vals_ref[...] = jnp.full(vals_ref.shape, jnp.inf, jnp.float32)
            idx_ref[...] = jnp.zeros(idx_ref.shape, jnp.int32)

    def planes_map(i, gp, gnb):
        return (
            0,
            gp[i // nblocks] * nblocks
            + jnp.minimum(i % nblocks, gnb[i // nblocks] - 1),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gcap * nblocks,),
        in_specs=[
            pl.BlockSpec((m, block_n), planes_map),
            pl.BlockSpec((gq, lanes), lambda i, gp, gnb: (i // nblocks, 0)),
            pl.BlockSpec((lanes, 128), lambda i, gp, gnb: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gq, g), lambda i, gp, gnb: (i // nblocks, i % nblocks))
            for _ in range(2)
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((gcap * gq, rows_per_group // window), dt)
            for dt in (jnp.float32, jnp.int32)
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * gcap * rows_per_group * lanes * gq,
            bytes_accessed=gcap * rows_per_group * m
            + total_t * lanes * 2
            + gcap * gq * (rows_per_group // window) * 8,
            transcendentals=0,
        ),
    )(group_part, group_nblk, planes, tables_cat_g, jrow)


@functools.partial(
    jax.jit, static_argnames=("r", "num_valid", "cb", "block_n", "window", "interpret")
)
def lut_scan_topk_int8(
    codes_rows,
    qtables,
    r: int,
    num_valid: int,
    cb: int = 8,
    block_n: int = DEFAULT_BLOCK_N,
    window: int = DEFAULT_WINDOW,
    interpret: bool = False,
):
    """Full Quick-ADC scan: Pallas kernel + screened top-r over window candidates.

    Args:
      codes_rows: (N_pad/cpr, 128) uint8 row128 storage.
      qtables: (Q, M, 16) int8.
      r: results per query.
      num_valid: real code count (padded rows masked).

    Returns:
      (vals (Q, r) float32 quantized distances, +inf for masked/absent slots;
       rows (Q, r) int32 code rows).
    """
    q = qtables.shape[0]
    tlo, thi = build_scan_tables(qtables)
    vals, rows = lut_scan_reduce(
        codes_rows, tlo, thi, cb=cb, block_n=block_n, window=window,
        interpret=interpret, with_rows=True,
    )
    # Mask candidates from padded rows (window minima can come from padding).
    from qadc_tpu.ops.topk import exact_tile_screen

    vals_t = jnp.where(rows < num_valid, vals.astype(jnp.float32), jnp.inf).T[:q]
    rows_t = rows.T[:q]
    out_v, sel = exact_tile_screen(vals_t, min(r, vals_t.shape[1]))
    out_rows = jnp.take_along_axis(rows_t, sel, axis=1)
    return out_v, out_rows
