"""Kernel dispatch: route hot ops to Pallas TPU kernels when profitable.

The reference picks a GEMM microkernel per ISA at run time
(src/gemm.rs:233-260 GemmExecutor/KernelType, rten-simd dispatch.rs). Here the
axis of choice is Pallas-vs-XLA: XLA's own matmul/conv emitters are already
MXU-roofline for plain fp32/bf16 shapes, so Pallas is reserved for kernels
XLA cannot produce (fused int8 dequant+matmul, flash/paged attention) and for
shapes where measurements show a win. Dispatch must stay jit-traceable: all
decisions use static shapes/dtypes only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.cache
def default_platform() -> str:
    return jax.default_backend()


def on_tpu() -> bool:
    # The axon tunnel reports platform "axon" but lowers to TPU; treat any
    # non-CPU/GPU default backend as TPU-like.
    return default_platform() not in ("cpu", "gpu", "cuda", "rocm")


def precision_for(*operands):
    """MXU precision policy: float32 operands get Precision.HIGHEST so fp32
    graphs match the reference's fp32 numerics (TPU default would silently
    round inputs to bf16, ~1e-2 error); bf16/int operands take the fast
    default path."""
    if any(jnp.result_type(o) == jnp.float32 for o in operands if o is not None):
        return jax.lax.Precision.HIGHEST
    return None


def matmul(a, b, *, preferred_element_type=None):
    """Batched matmul with numpy semantics (reference: src/ops/matmul.rs:119).

    Plain XLA dot — on TPU, XLA lowers this straight onto the MXU with fused
    operand/result layout changes; a hand-rolled Pallas matmul only wins when
    fusion with dequant/activation is needed (see quant_matmul / matmul_pallas).
    """
    if preferred_element_type is None and jnp.issubdtype(
        jnp.result_type(a, b), jnp.floating
    ):
        preferred_element_type = jnp.promote_types(
            jnp.result_type(a), jnp.result_type(b)
        )
    return jnp.matmul(
        a,
        b,
        preferred_element_type=preferred_element_type,
        precision=precision_for(a, b),
    )
