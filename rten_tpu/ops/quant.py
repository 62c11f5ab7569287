"""Quantization ops — rten_tpu extension (new scope per BASELINE.json; the
reference has no quantization, SURVEY.md §0). Semantics follow ONNX
QuantizeLinear / DequantizeLinear / DynamicQuantizeLinear / QLinearMatMul.

The compiled path routes QLinearMatMul and DequantizeLinear→MatMul subgraphs
to the fused Pallas dequant+matmul kernel (kernels/quant_matmul.py) via the
graph optimizer; these op-level forms are the interpret-mode / fallback
implementations with int32 accumulation on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rten_tpu.kernels import dispatch
from rten_tpu.ops.registry import register


def _qrange(dtype):
    info = jnp.iinfo(dtype)
    return info.min, info.max


def _per_axis_shape(scale, x_ndim: int, axis: int):
    scale = jnp.asarray(scale)
    if scale.ndim == 0:
        return scale
    shape = [1] * x_ndim
    shape[axis % x_ndim] = scale.shape[0]
    return scale.reshape(shape)


@register("QuantizeLinear")
def quantize_linear(ctx, attrs, x, scale, zero_point=None):
    x = jnp.asarray(x)
    axis = attrs.get("axis", 1)
    out_dtype = jnp.asarray(zero_point).dtype if zero_point is not None else jnp.uint8
    s = _per_axis_shape(scale, x.ndim, axis)
    q = jnp.round(x / s)
    if zero_point is not None:
        q = q + _per_axis_shape(zero_point, x.ndim, axis).astype(q.dtype)
    lo, hi = _qrange(out_dtype)
    return jnp.clip(q, lo, hi).astype(out_dtype)


@register("DequantizeLinear")
def dequantize_linear(ctx, attrs, x, scale, zero_point=None):
    x = jnp.asarray(x)
    axis = attrs.get("axis", 1)
    s = _per_axis_shape(scale, x.ndim, axis)
    xf = x.astype(jnp.float32)
    if zero_point is not None:
        xf = xf - _per_axis_shape(zero_point, x.ndim, axis).astype(jnp.float32)
    return xf * s


@register("DynamicQuantizeLinear")
def dynamic_quantize_linear(ctx, attrs, x):
    x = jnp.asarray(x).astype(jnp.float32)
    x_min = jnp.minimum(jnp.min(x), 0.0)
    x_max = jnp.maximum(jnp.max(x), 0.0)
    scale = (x_max - x_min) / 255.0
    scale = jnp.where(scale == 0, 1.0, scale)
    zp = jnp.clip(jnp.round(0.0 - x_min / scale), 0, 255)
    q = jnp.clip(jnp.round(x / scale) + zp, 0, 255).astype(jnp.uint8)
    return q, scale.astype(jnp.float32), zp.astype(jnp.uint8)


@register("QLinearMatMul")
def qlinear_matmul(ctx, attrs, a, a_scale, a_zp, b, b_scale, b_zp, y_scale, y_zp):
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    # int32 accumulation on the MXU; rescale in fp32.
    a_i = a.astype(jnp.int32) - jnp.asarray(a_zp).astype(jnp.int32)
    b_i = b.astype(jnp.int32) - jnp.asarray(b_zp).astype(jnp.int32)
    acc = dispatch.matmul(a_i, b_i, preferred_element_type=jnp.int32)
    m = (
        jnp.asarray(a_scale).astype(jnp.float32)
        * jnp.asarray(b_scale).astype(jnp.float32)
        / jnp.asarray(y_scale).astype(jnp.float32)
    )
    y = jnp.round(acc.astype(jnp.float32) * m) + jnp.asarray(y_zp).astype(jnp.float32)
    out_dtype = jnp.asarray(y_zp).dtype
    lo, hi = _qrange(out_dtype)
    return jnp.clip(y, lo, hi).astype(out_dtype)
