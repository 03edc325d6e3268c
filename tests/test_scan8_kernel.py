"""8-bit ADC Pallas kernel parity (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from qadc_tpu.core.layout import to_row128
from qadc_tpu.kernels.lut_scan import (
    build_scan8_tables,
    lut_scan8_reduce,
    slots_to_rows,
    window_slots,
)
from qadc_tpu.kernels.scan_ref import adc_scan_f32


def test_scan8_matches_reference(rng):
    n, m, q = 1024, 8, 3
    codes = rng.integers(0, 256, size=(n, m)).astype(np.uint8)
    tables = rng.uniform(0, 10, size=(q, m, 256)).astype(np.float32)
    full = np.asarray(adc_scan_f32(codes, jnp.asarray(tables), 8))  # (Q, N)

    t8 = build_scan8_tables(jnp.asarray(tables))
    rows128 = jnp.asarray(to_row128(codes))
    vals, rows = lut_scan8_reduce(
        rows128, t8, m=m, block_n=256, window=16, interpret=True
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    # Simulate strided-slot windows with the deinterleave permutation.
    c_total = n // 16
    wins = np.asarray(window_slots(jnp.arange(c_total, dtype=jnp.int32), 256, 16))
    rmap = np.asarray(slots_to_rows(jnp.asarray(wins), 256, m))
    want = full[:, rmap].min(axis=2).T  # (C, Q)
    # bf16 tables: tolerance ~0.4% relative
    np.testing.assert_allclose(vals[:, :q], want, rtol=6e-3, atol=0.05)
    # rows point at codes achieving (approximately) the window min
    for g in range(0, c_total, 7):
        for qi in range(q):
            assert abs(full[qi, rows[g, qi]] - vals[g, qi]) < full[qi].max() * 6e-3 + 0.05


def test_scan8_transpose_out_parity(rng):
    """transpose_out layouts are exact transposes of the default outputs."""
    import jax.numpy as jnp
    from qadc_tpu.kernels.lut_scan import build_scan8_tables, lut_scan8_reduce

    m, n = 8, 4096
    codes = jnp.asarray(
        rng.integers(0, 256, size=(n * m // 128, 128), dtype=np.uint8)
    )
    tables = jnp.asarray(rng.normal(size=(16, m, 256)).astype(np.float32))
    t8 = build_scan8_tables(tables)
    v0, r0 = lut_scan8_reduce(codes, t8, m=m, block_n=256, interpret=True)
    v1, r1 = lut_scan8_reduce(
        codes, t8, m=m, block_n=256, interpret=True, transpose_out=True
    )
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0).T)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0).T)
