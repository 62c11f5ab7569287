"""Normalization + softmax ops (reference: src/ops/norm.rs).

The reference composes LayerNorm from primitive ops and routes softmax to a
SIMD vec_softmax (rten-vecmath/src/softmax.rs:82). Under XLA these jnp forms
fuse into single VPU loops; numerics match the reference's
max-subtract-exp-normalize softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rten_tpu.ops.registry import register


@register("BatchNormalization")
def batch_norm(ctx, attrs, x, scale, b, mean, var):
    # Inference mode (reference: src/ops/norm.rs:78).
    x = jnp.asarray(x)
    eps = attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    scale = jnp.asarray(scale).reshape(shape)
    b = jnp.asarray(b).reshape(shape)
    mean = jnp.asarray(mean).reshape(shape)
    var = jnp.asarray(var).reshape(shape)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * scale + b


@register("InstanceNormalization")
def instance_norm(ctx, attrs, x, scale, b):
    x = jnp.asarray(x)
    eps = attrs.get("epsilon", 1e-5)
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return (x - mean) * jax.lax.rsqrt(var + eps) * jnp.asarray(scale).reshape(
        shape
    ) + jnp.asarray(b).reshape(shape)


@register("LayerNormalization")
def layer_norm(ctx, attrs, x, scale, bias=None):
    x = jnp.asarray(x)
    axis = attrs.get("axis", -1)
    if axis < 0:
        axis += x.ndim
    axes = tuple(range(axis, x.ndim))
    eps = attrs.get("epsilon", 1e-5)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps) * jnp.asarray(scale)
    if bias is not None:
        out = out + jnp.asarray(bias)
    return out


@register("Softmax")
def softmax(ctx, attrs, x):
    return jax.nn.softmax(jnp.asarray(x), axis=attrs.get("axis", -1))


@register("LogSoftmax")
def log_softmax(ctx, attrs, x):
    return jax.nn.log_softmax(jnp.asarray(x), axis=attrs.get("axis", -1))
