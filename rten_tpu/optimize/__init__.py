"""Load-time graph optimizer.

Reference: src/optimize.rs:295 GraphOptimizer::optimize — pass pipeline:
captured-value→constant conversion, constant propagation, and fusions
(Transpose absorption, SiLU, GELU, LayerNorm). Under XLA most elementwise
fusion is free, so the passes that still pay here are (1) constant
propagation — it shrinks the traced program and keeps shape-math concrete —
and (2) pattern rewrites that change *numerics or kernel choice*: LayerNorm
recognition and quantized-subgraph → fused Pallas dequant-matmul.
"""

from __future__ import annotations

from rten_tpu.graph import Graph
from rten_tpu.optimize.passes import (
    fuse_patterns,
    propagate_constants,
    sweep_dead_constants,
)
from rten_tpu.optimize.quantize import fuse_dequant_matmul


def optimize_graph(graph: Graph) -> Graph:
    # Quant fusion first: constant-folding would otherwise "fold"
    # DequantizeLinear and materialize the f32 weights it exists to avoid.
    graph = fuse_dequant_matmul(graph)
    graph = propagate_constants(graph)
    graph = fuse_patterns(graph)
    graph = sweep_dead_constants(graph)
    return graph
