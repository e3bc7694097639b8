"""GGUF weight I/O: reader, writer, quant block formats (llamafile L1 analog)."""
from .quants import (GGML_TYPES, QK, QK_K, TYPE_BY_ID, TYPE_BY_NAME, QuantSpec,
                     dequantize, type_size)
from .reader import GGUFReader, TensorInfo
from .writer import GGUFWriter, pack_zip

__all__ = [
    "GGML_TYPES", "QK", "QK_K", "TYPE_BY_ID", "TYPE_BY_NAME", "QuantSpec",
    "dequantize", "type_size", "GGUFReader", "TensorInfo", "GGUFWriter", "pack_zip",
]
