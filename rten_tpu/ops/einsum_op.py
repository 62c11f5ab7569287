"""Einsum (reference: src/ops/einsum.rs:131).

The reference hand-decomposes the expression into pairwise transpose + reshape
+ GEMM steps (einsum.rs:277 einsum_step). On TPU, jnp.einsum hands the whole
contraction to XLA's dot_general optimizer, which picks the MXU-friendly
factorization itself — decomposing by hand would only hide information from
the compiler.
"""

from __future__ import annotations

import jax.numpy as jnp

from rten_tpu.ops.registry import OpError, register


@register("Einsum")
def einsum(ctx, attrs, *xs):
    equation = attrs.get("equation")
    if not equation:
        raise OpError("Einsum requires an equation")
    from rten_tpu.kernels import dispatch

    return jnp.einsum(
        equation.replace(" ", ""),
        *[jnp.asarray(x) for x in xs],
        preferred_element_type=jnp.result_type(*xs) if xs else None,
        precision=dispatch.precision_for(*xs),
    )
