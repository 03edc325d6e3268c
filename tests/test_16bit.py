"""16-bit sub-quantizer configs (reference: scan_standard<uint16>,
supported (2,16)(4,16)(8,16), query_common.hpp:120-143)."""

import numpy as np
import jax
import pytest

from qadc_tpu.index import flat
from qadc_tpu.quantizers.pq import train_pq, encode, decode
from qadc_tpu.ops.knn import exact_knn
from qadc_tpu.eval.recall import recall_at_r


@pytest.mark.parametrize("m", [2, 4])
def test_16bit_roundtrip_and_search(rng, m):
    dim = 16
    base = rng.normal(size=(3000, dim)).astype(np.float32)
    queries = base[:10] + 0.01 * rng.normal(size=(10, dim)).astype(np.float32)
    # 16-bit: 65536 centroids is overkill for tests; train_pq with sq_bits=16
    # would need k=65536 — use a synthetic codebook instead: random centroids.
    k = 1 << 16
    # Too large to train; construct a small-but-valid PQ via random projection
    # of the data (validate() only checks shape consistency).
    from qadc_tpu.quantizers.pq import ProductQuantizer

    cent = rng.normal(size=(m, k, dim // m)).astype(np.float32) * 0.01
    # Plant the data's subvectors into the codebook so encoding is meaningful.
    cent[:, : 3000 // 1, :] = (
        base.reshape(3000, m, dim // m).transpose(1, 0, 2)[:, :k, :]
    )
    pq = ProductQuantizer(centroids=cent, sq_bits=16).validate()
    codes = np.asarray(encode(pq, base))
    assert codes.shape == (3000, m * 2)
    recon = np.asarray(decode(pq, codes))
    err = np.mean((recon - base) ** 2) / np.mean(base**2)
    assert err < 1e-6  # data vectors are in the codebook -> near-exact

    index = flat.add(flat.FlatIndex.create(pq), base)
    _, gt = exact_knn(queries, base, 1)
    _, labels = flat.search_adc(index, queries, r=10)
    rec = recall_at_r(np.asarray(labels), np.asarray(gt))
    assert rec > 0.9, rec
