from qadc_tpu.index.flat import FlatIndex
from qadc_tpu.index.ivf import IVFIndex

__all__ = ["FlatIndex", "IVFIndex"]
