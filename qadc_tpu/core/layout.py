"""Blocked code layout for the TPU scan.

The reference interleaves codes into 16-code SIMD blocks and pads the final
block by repeating the last code (simd_layout.hpp:41-65). On TPU, Mosaic tiles
row-major arrays itself, so codes stay row-major (N_pad, code_bytes); we keep
only the padding convention: the tail is padded by repeating the LAST code, and
padded labels clamp to the last real label (reference quirk: simd_scan.hpp:67,
simd_layout.hpp:47-50 — duplicate results possible, recall tolerates it).
"""

from __future__ import annotations

import numpy as np

# Rows per scan-kernel block. Multiple of the int8 sublane tile (32) and large
# enough that the one-hot MXU matmul per block is well shaped.
DEFAULT_BLOCK = 1024


def padded_count(n: int, block: int = DEFAULT_BLOCK) -> int:
    """Smallest multiple of `block` that is >= max(n, 1)."""
    n = max(int(n), 1)
    return -(-n // block) * block


def pad_codes_to_block(codes: np.ndarray, block: int = DEFAULT_BLOCK) -> np.ndarray:
    """Pad (N, code_bytes) packed codes to a block multiple by repeating the last row.

    Host-side (numpy) — runs once at index build/add time.
    """
    codes = np.asarray(codes, dtype=np.uint8)
    n = codes.shape[0]
    n_pad = padded_count(n, block)
    if n == 0:
        return np.zeros((n_pad, codes.shape[1]), dtype=np.uint8)
    if n_pad == n:
        return codes
    pad = np.broadcast_to(codes[-1], (n_pad - n, codes.shape[1]))
    return np.concatenate([codes, pad], axis=0)


def pad_labels_to_block(labels: np.ndarray, block: int = DEFAULT_BLOCK) -> np.ndarray:
    """Pad (N,) labels to a block multiple by repeating the last label."""
    labels = np.asarray(labels, dtype=np.int32)
    n = labels.shape[0]
    n_pad = padded_count(n, block)
    if n == 0:
        return np.zeros((n_pad,), dtype=np.int32)
    if n_pad == n:
        return labels
    pad = np.full((n_pad - n,), labels[-1], dtype=np.int32)
    return np.concatenate([labels, pad], axis=0)
