"""rten_tpu — a TPU-native inference framework with the capabilities of RTen.

RTen (the reference, a Rust CPU ONNX runtime) is rebuilt here TPU-first:

- ``rten_tpu.format``   — `.rten` file format (32-byte header + FlatBuffers graph,
  reference: src/header.rs, src/schema.fbs) and an ONNX importer.
- ``rten_tpu.graph``    — graph IR (Constant/Value/Operator nodes, reference:
  src/graph.rs) with plan creation and partial evaluation.
- ``rten_tpu.ops``      — ~100 ONNX operators as jnp/lax compositions
  (reference: src/ops/).
- ``rten_tpu.runtime``  — two executors: eager *interpret* mode with per-op
  timing (reference: src/graph.rs run_plan + src/timing.rs) and *compile* mode
  that lowers a whole plan to one jitted XLA program (the TPU replacement for
  RTen's in-place execution + TensorPool).
- ``rten_tpu.kernels``  — Pallas TPU kernels: blocked MXU matmul, fused INT8
  weight-dequant+matmul, flash/paged attention (the TPU replacement for
  rten-simd / rten-vecmath / src/gemm).
- ``rten_tpu.generate`` — autoregressive generation with a paged KV cache and
  continuous batching (reference: rten-generate).
- ``rten_tpu.text``     — WordPiece/BPE tokenizers (reference: rten-text).
- ``rten_tpu.image``    — image pre/post-processing (reference: rten-imageio /
  rten-imageproc).
- ``rten_tpu.parallel`` — device mesh, shardings and multi-chip execution
  (new scope; the reference is single-process CPU).
- ``rten_tpu.models``   — native flagship model implementations (GPT-2,
  Llama-class, ResNet, Whisper-class) used for serving and benchmarks.
"""

__version__ = "0.1.0"

from rten_tpu.graph import Graph, ConstantNode, ValueNode, OperatorNode
from rten_tpu.runtime.session import Model, ModelOptions, RunOptions

__all__ = [
    "Graph",
    "ConstantNode",
    "ValueNode",
    "OperatorNode",
    "Model",
    "ModelOptions",
    "RunOptions",
    "__version__",
]
