from .formats import FORMATS, QK, QK_K, FormatInfo, GGMLType, row_size, type_from_name
from .codecs import dequantize, quantize, supported_types

__all__ = [
    "FORMATS", "QK", "QK_K", "FormatInfo", "GGMLType", "row_size",
    "type_from_name", "dequantize", "quantize", "supported_types",
]
