"""8-bit ADC Pallas kernel parity (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from qadc_tpu.kernels.lut_scan import build_scan8_tables, lut_scan8_reduce
from qadc_tpu.kernels.scan_ref import adc_scan_f32


def test_scan8_matches_reference(rng):
    n, m, q = 1024, 8, 3
    codes = rng.integers(0, 256, size=(n, m)).astype(np.uint8)
    tables = rng.uniform(0, 10, size=(q, m, 256)).astype(np.float32)
    full = np.asarray(adc_scan_f32(codes, jnp.asarray(tables), 8))  # (Q, N)

    t8 = build_scan8_tables(jnp.asarray(tables))
    vals, rows = lut_scan8_reduce(jnp.asarray(codes), t8, block_n=256, window=16, interpret=True)
    vals, rows = np.asarray(vals), np.asarray(rows)
    # bf16 tables: tolerance ~0.4% relative
    want = full.T.reshape(n // 256, 16, 256 // 16, q).min(axis=1).reshape(n // 16, q)
    np.testing.assert_allclose(vals[:, :q], want, rtol=6e-3, atol=0.05)
    # rows point at codes achieving (approximately) the window min
    for g in range(0, n // 16, 7):
        for qi in range(q):
            assert abs(full[qi, rows[g, qi]] - vals[g, qi]) < full[qi].max() * 6e-3 + 0.05
