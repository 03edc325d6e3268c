import numpy as np
import pytest

from qadc_tpu.core.packing import code_bytes, pack_codes, unpack_codes, unpack_nibbles_split


@pytest.mark.parametrize("sq_count,sq_bits", [(16, 4), (32, 4), (8, 8), (16, 8), (4, 16), (8, 16)])
def test_roundtrip(rng, sq_count, sq_bits):
    idx = rng.integers(0, 1 << sq_bits, size=(37, sq_count))
    packed = np.asarray(pack_codes(idx, sq_bits))
    assert packed.shape == (37, code_bytes(sq_count, sq_bits))
    assert packed.dtype == np.uint8
    out = np.asarray(unpack_codes(packed, sq_count, sq_bits))
    np.testing.assert_array_equal(out, idx)


def test_nibble_order_matches_reference():
    """Even sub-quantizer -> LOW nibble (quantizers.hpp:49-68)."""
    idx = np.array([[0x3, 0xA, 0xF, 0x0]])  # sq0..sq3
    packed = np.asarray(pack_codes(idx, 4))
    assert packed[0, 0] == 0x3 | (0xA << 4)
    assert packed[0, 1] == 0xF | (0x0 << 4)


def test_16bit_little_endian():
    idx = np.array([[0x1234, 0xABCD]])
    packed = np.asarray(pack_codes(idx, 16))
    np.testing.assert_array_equal(packed[0], [0x34, 0x12, 0xCD, 0xAB])


def test_nibbles_split(rng):
    idx = rng.integers(0, 16, size=(10, 16))
    packed = pack_codes(idx, 4)
    lo, hi = unpack_nibbles_split(packed)
    np.testing.assert_array_equal(np.asarray(lo), idx[:, 0::2])
    np.testing.assert_array_equal(np.asarray(hi), idx[:, 1::2])
