from qadc_tpu.quantizers.pq import ProductQuantizer, train_pq, encode, decode
from qadc_tpu.quantizers.opq import OPQQuantizer, train_opq

__all__ = [
    "ProductQuantizer",
    "OPQQuantizer",
    "train_pq",
    "train_opq",
    "encode",
    "decode",
]
