"""`.rten` model format and ONNX import.

Reference: src/header.rs (32-byte header), src/schema.fbs (FlatBuffers graph
schema), rten-convert/ (ONNX converter). This package can both read and write
`.rten` files, including the rten_tpu quantization extension (INT8 constants +
QLinear ops) layered compatibly on the reference schema.
"""

from rten_tpu.format.header import Header, HeaderError
from rten_tpu.format.rten_io import load_rten, save_rten

__all__ = ["Header", "HeaderError", "load_rten", "save_rten"]
