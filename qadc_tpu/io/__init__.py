from qadc_tpu.io.vecs import load_vectors, save_vectors, vecs_info, split_vecs
from qadc_tpu.io.stream import VectorStream
from qadc_tpu.io.quantizer_files import load_quantizer_file, save_quantizer_file
from qadc_tpu.io.checkpoint import save_index, load_index

__all__ = [
    "load_vectors",
    "save_vectors",
    "vecs_info",
    "split_vecs",
    "VectorStream",
    "load_quantizer_file",
    "save_quantizer_file",
    "save_index",
    "load_index",
]
