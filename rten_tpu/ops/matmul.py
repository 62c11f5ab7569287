"""MatMul and Gemm (reference: src/ops/matmul.rs:83 Gemm, :244 MatMul).

The reference lowers these to its BLIS-style CPU GEMM with prepacked weights
(src/gemm.rs); here they lower to XLA dot_general on the MXU via
kernels.dispatch (prepacking is XLA's layout assignment's job).
"""

from __future__ import annotations

import jax.numpy as jnp

from rten_tpu.kernels import dispatch
from rten_tpu.ops.registry import OpError, register


@register("MatMul")
def matmul(ctx, attrs, a, b):
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    # Absorbed input permutations (optimizer transpose-absorption pass,
    # reference FusedTranspose src/ops/fused.rs:69): "reverse" = the ONNX
    # Transpose default (reverse all dims). Under whole-plan jit XLA folds
    # the permutation into dot_general's dimension numbers — the operand is
    # never materialized transposed, which is the reference's lazy-permute
    # intent done the XLA way.
    perm_a = attrs.get("perm_a")
    perm_b = attrs.get("perm_b")
    if perm_a is not None:
        a = jnp.transpose(a, None if perm_a == "reverse" else perm_a)
    if perm_b is not None:
        b = jnp.transpose(b, None if perm_b == "reverse" else perm_b)
    if a.ndim == 0 or b.ndim == 0:
        raise OpError("MatMul inputs must be at least 1-D")
    return dispatch.matmul(a, b)


@register("Gemm")
def gemm(ctx, attrs, a, b, c=None):
    alpha = attrs.get("alpha", 1.0)
    beta = attrs.get("beta", 1.0)
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if attrs.get("transpose_a", False):
        a = a.T
    if attrs.get("transpose_b", False):
        b = b.T
    out = dispatch.matmul(a, b)
    if alpha != 1.0:
        out = alpha * out
    if c is not None and beta != 0.0:
        out = out + beta * jnp.asarray(c)
    return out
