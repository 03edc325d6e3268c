from qadc_tpu.ops.tables import adc_tables
from qadc_tpu.ops.knn import exact_knn, assign_nearest
from qadc_tpu.ops.kmeans import kmeans, kmeans_plusplus_init
from qadc_tpu.ops.quantization import quantize_tables_int8, keep_prefix_bound
from qadc_tpu.ops.topk import window_min_reduce, merge_topk

__all__ = [
    "adc_tables",
    "exact_knn",
    "assign_nearest",
    "kmeans",
    "kmeans_plusplus_init",
    "quantize_tables_int8",
    "keep_prefix_bound",
    "window_min_reduce",
    "merge_topk",
]
