"""Pooling ops (reference: src/ops/pooling.rs:275 AveragePool,
:347 GlobalAveragePool, :384 MaxPool). Lowered to lax.reduce_window, which XLA
vectorizes on the VPU; layout NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rten_tpu.ops.registry import OpError, register
from rten_tpu.ops.conv import _spatial_padding, _norm


def _window_args(attrs, n_spatial):
    kernel = attrs.get("kernel_size")
    if not kernel:
        raise OpError("pool requires kernel_size")
    kernel = tuple(int(k) for k in kernel)
    strides = _norm(attrs.get("strides"), n_spatial)
    if attrs.get("auto_pad", "not_set") == "same":
        pad_pairs = "SAME"
    else:
        pad_pairs = _spatial_padding(attrs.get("pads"), n_spatial)
    return kernel, strides, pad_pairs


def _full_dims(vals, n_spatial):
    return (1, 1) + tuple(vals)


def _full_padding(pad_pairs, x_shape, kernel, strides):
    if pad_pairs == "SAME":
        # SAME_UPPER per spatial dim
        out = []
        for size, k, s in zip(x_shape[2:], kernel, strides):
            out_size = -(-size // s)
            total = max((out_size - 1) * s + k - size, 0)
            out.append((total // 2, total - total // 2))
        pad_pairs = out
    return [(0, 0), (0, 0)] + list(pad_pairs)


@register("MaxPool")
def max_pool(ctx, attrs, x):
    x = jnp.asarray(x)
    n_spatial = x.ndim - 2
    kernel, strides, pad_pairs = _window_args(attrs, n_spatial)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        jnp.array(init, x.dtype),
        jax.lax.max,
        window_dimensions=_full_dims(kernel, n_spatial),
        window_strides=_full_dims(strides, n_spatial),
        padding=_full_padding(pad_pairs, x.shape, kernel, strides),
    )


@register("AveragePool")
def average_pool(ctx, attrs, x):
    x = jnp.asarray(x)
    n_spatial = x.ndim - 2
    kernel, strides, pad_pairs = _window_args(attrs, n_spatial)
    padding = _full_padding(pad_pairs, x.shape, kernel, strides)
    sums = jax.lax.reduce_window(
        x,
        jnp.array(0, x.dtype),
        jax.lax.add,
        window_dimensions=_full_dims(kernel, n_spatial),
        window_strides=_full_dims(strides, n_spatial),
        padding=padding,
    )
    if attrs.get("count_include_pad", False):
        denom = float(np.prod(kernel))
        return sums / denom
    # Count only in-bounds elements per window.
    ones = jnp.ones(x.shape, x.dtype)
    counts = jax.lax.reduce_window(
        ones,
        jnp.array(0, x.dtype),
        jax.lax.add,
        window_dimensions=_full_dims(kernel, n_spatial),
        window_strides=_full_dims(strides, n_spatial),
        padding=padding,
    )
    return sums / counts


@register("GlobalAveragePool")
def global_average_pool(ctx, attrs, x):
    x = jnp.asarray(x)
    axes = tuple(range(2, x.ndim))
    return jnp.mean(x, axis=axes, keepdims=True)
