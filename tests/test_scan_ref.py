import numpy as np
import jax.numpy as jnp

from qadc_tpu.core.packing import pack_codes
from qadc_tpu.kernels.scan_ref import adc_scan_f32, adc_scan_int8, scan_topk_f32, scan_topk_int8


def _scan_oracle(idx, tables):
    """Scalar oracle: sum_m tables[q, m, idx[b, m]] (query_common.hpp:59-118)."""
    q, m, k = tables.shape
    b = idx.shape[0]
    out = np.zeros((q, b), tables.dtype)
    for qi in range(q):
        for bi in range(b):
            out[qi, bi] = sum(tables[qi, mi, idx[bi, mi]] for mi in range(m))
    return out


def test_adc_scan_f32_oracle(rng):
    for m, bits in [(16, 4), (8, 8)]:
        k = 1 << bits
        idx = rng.integers(0, k, size=(30, m))
        tables = rng.uniform(0, 10, size=(3, m, k)).astype(np.float32)
        packed = pack_codes(idx, bits)
        got = np.asarray(adc_scan_f32(packed, jnp.asarray(tables), bits))
        np.testing.assert_allclose(got, _scan_oracle(idx, tables), rtol=1e-5, atol=1e-4)


def test_adc_scan_int8_saturates(rng):
    m = 16
    idx = rng.integers(0, 16, size=(20, m))
    qt = rng.integers(0, 127, size=(2, m, 16)).astype(np.int8)
    packed = pack_codes(idx, 4)
    got = np.asarray(adc_scan_int8(packed, jnp.asarray(qt)))
    want = np.minimum(_scan_oracle(idx, qt.astype(np.int32)), 127)
    np.testing.assert_array_equal(got, want)
    assert got.max() <= 127


def test_scan_topk_chunked_matches_full(rng):
    m, bits, n, q, r = 16, 4, 256, 4, 10
    idx = rng.integers(0, 16, size=(n, m))
    tables = rng.uniform(0, 10, size=(q, m, 16)).astype(np.float32)
    packed = pack_codes(idx, bits)
    labels = jnp.arange(n, dtype=jnp.int32)
    vals, labs = scan_topk_f32(packed, labels, jnp.asarray(tables), bits, r, chunk=64)
    full = _scan_oracle(idx, tables)
    want_idx = np.argsort(full, axis=1, kind="stable")[:, :r]
    np.testing.assert_allclose(
        np.asarray(vals), np.sort(full, 1)[:, :r], rtol=1e-5, atol=1e-4
    )
    np.testing.assert_array_equal(np.sort(np.asarray(labs), 1), np.sort(want_idx, 1))

    qt = rng.integers(0, 100, size=(q, m, 16)).astype(np.int8)
    vals8, labs8 = scan_topk_int8(
        packed, labels, jnp.asarray(qt), r, chunk=64, saturate=True
    )
    full8 = np.minimum(_scan_oracle(idx, qt.astype(np.int32)), 127)
    np.testing.assert_array_equal(np.asarray(vals8), np.sort(full8, 1)[:, :r])
    # Unsaturated (default for index paths): exact int32 sums.
    vals8u, _ = scan_topk_int8(packed, labels, jnp.asarray(qt), r, chunk=64)
    full8u = _scan_oracle(idx, qt.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(vals8u), np.sort(full8u, 1)[:, :r])
