from qadc_tpu.core.packing import pack_codes, unpack_codes, code_bytes
from qadc_tpu.core.layout import pad_codes_to_block, padded_count, DEFAULT_BLOCK

__all__ = [
    "pack_codes",
    "unpack_codes",
    "code_bytes",
    "pad_codes_to_block",
    "padded_count",
    "DEFAULT_BLOCK",
]
