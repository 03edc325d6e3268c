"""PQ code bit-packing.

Byte layout matches the reference exactly so that codes round-trip between
frameworks (reference: multiple_set_bits_4, quantizers.hpp:49-68;
multiple_set_bits_native, quantizers.hpp:35-47):

- 4-bit:  byte b holds sub-quantizer 2b in the LOW nibble and sub-quantizer
          2b+1 in the HIGH nibble; code_size = sq_count / 2 bytes.
- 8-bit:  one byte per sub-quantizer, in order.
- 16-bit: one little-endian uint16 per sub-quantizer, in order.

All functions are jittable and accept numpy or jax arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

SUPPORTED_BITS = (4, 8, 16)


def code_bytes(sq_count: int, sq_bits: int) -> int:
    """Bytes per packed code (reference: base_pq::code_size, quantizers.hpp:197-199)."""
    if sq_bits not in SUPPORTED_BITS:
        raise ValueError(f"sq_bits must be one of {SUPPORTED_BITS}, got {sq_bits}")
    if (sq_count * sq_bits) % 8 != 0:
        raise ValueError(f"sq_count*sq_bits must be a multiple of 8 ({sq_count}x{sq_bits})")
    return sq_count * sq_bits // 8


def pack_codes(indices, sq_bits: int):
    """Pack per-sub-quantizer centroid indices into bytes.

    Args:
      indices: (..., sq_count) integer array, each value < 2**sq_bits.
      sq_bits: 4, 8 or 16.

    Returns:
      (..., code_bytes) uint8 array.
    """
    indices = jnp.asarray(indices)
    m = indices.shape[-1]
    if sq_bits == 4:
        if m % 2 != 0:
            raise ValueError("4-bit packing requires even sq_count")
        lo = indices[..., 0::2].astype(jnp.uint8)
        hi = indices[..., 1::2].astype(jnp.uint8)
        return (lo | (hi << 4)).astype(jnp.uint8)
    if sq_bits == 8:
        return indices.astype(jnp.uint8)
    if sq_bits == 16:
        v = indices.astype(jnp.uint32)
        lo = (v & 0xFF).astype(jnp.uint8)
        hi = ((v >> 8) & 0xFF).astype(jnp.uint8)
        # little-endian interleave: [lo0, hi0, lo1, hi1, ...]
        return jnp.stack([lo, hi], axis=-1).reshape(*indices.shape[:-1], 2 * m)
    raise ValueError(f"unsupported sq_bits={sq_bits}")


def unpack_codes(packed, sq_count: int, sq_bits: int):
    """Inverse of pack_codes.

    Args:
      packed: (..., code_bytes) uint8 array.

    Returns:
      (..., sq_count) int32 array of centroid indices.
    """
    packed = jnp.asarray(packed).astype(jnp.uint8)
    if sq_bits == 4:
        lo = (packed & 0x0F).astype(jnp.int32)
        hi = (packed >> 4).astype(jnp.int32)
        out = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], sq_count)
        return out
    if sq_bits == 8:
        return packed.astype(jnp.int32)
    if sq_bits == 16:
        shaped = packed.reshape(*packed.shape[:-1], sq_count, 2).astype(jnp.int32)
        return shaped[..., 0] | (shaped[..., 1] << 8)
    raise ValueError(f"unsupported sq_bits={sq_bits}")


def row128_to_codes(rows, code_size: int):
    """jnp: (R, 128) storage rows -> (R*cpr, code_size) packed codes.

    Device-side inverse of core.layout.to_row128. Fine for SMALL arrays
    (gathered candidates, prefixes); converting a whole index materializes the
    padded narrow layout — use the kernels for bulk scans instead.
    """
    rows = jnp.asarray(rows)
    r = rows.shape[0]
    cpr = 128 // code_size
    return rows.reshape(r * cpr, code_size)


def gather_codes_row128(rows128, row_ids, code_size: int):
    """jnp: gather packed codes by GLOBAL code row id from row128 storage.

    rows128: (R, 128) u8; row_ids: (...,) int32 code indices.
    Returns (..., code_size) u8. Row gather + cpr-way lane select (single-axis
    gathers only; see docs/kernels.md).
    """
    cpr = 128 // code_size
    picked = rows128[row_ids // cpr]                       # (..., 128)
    c = (row_ids % cpr)[..., None]
    out = jnp.zeros((*row_ids.shape, code_size), jnp.uint8)
    for ci in range(cpr):
        out = jnp.where(
            c == ci, picked[..., ci * code_size : (ci + 1) * code_size], out
        )
    return out


def unpack_nibbles_split(packed):
    """Split packed 4-bit codes into (low, high) nibble planes without interleaving.

    Returns (lo, hi), each (..., code_bytes) int32 holding the EVEN and ODD
    sub-quantizer indices respectively. Used by the Pallas scan kernel, which
    avoids the interleave by permuting distance-table rows host-side instead.
    """
    packed = jnp.asarray(packed).astype(jnp.uint8)
    return (packed & 0x0F).astype(jnp.int32), (packed >> 4).astype(jnp.int32)
