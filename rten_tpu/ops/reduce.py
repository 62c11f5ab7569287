"""Reduction ops (reference: src/ops/reduce.rs).

ArgMax/ArgMin pick the first max index (ONNX select_last_index=0). Reduce*
with no axes reduce everything. NonZero has a data-dependent output shape and
is interpret-mode only (like the reference excludes it from partial_run,
src/graph.rs:1308 covers random; NonZero simply can't trace under XLA).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rten_tpu.ops.registry import CompileError, register, require_static


def _axes(attrs, ndim) -> tuple[int, ...]:
    axes = attrs.get("axes")
    if not axes:
        return tuple(range(ndim))
    return tuple(a % ndim for a in axes)


def _reduce(name, fn):
    @register(name)
    def op(ctx, attrs, x):
        x = jnp.asarray(x)
        keep = bool(attrs.get("keep_dims", True))
        return fn(x, axis=_axes(attrs, x.ndim), keepdims=keep)

    return op


_reduce("ReduceSum", jnp.sum)
_reduce("ReduceMean", jnp.mean)
_reduce("ReduceProd", jnp.prod)
_reduce("ReduceMin", jnp.min)
_reduce("ReduceMax", jnp.max)
_reduce("ReduceL2", lambda x, axis, keepdims: jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims)))
_reduce("ReduceSumSquare", lambda x, axis, keepdims: jnp.sum(x * x, axis=axis, keepdims=keepdims))


def _arg_reduce(name, fn):
    @register(name)
    def op(ctx, attrs, x):
        x = jnp.asarray(x)
        axis = attrs.get("axis", 0)
        out = fn(x, axis=axis).astype(jnp.int32)
        if attrs.get("keep_dims", True):
            out = jnp.expand_dims(out, axis=axis)
        return out

    return op


_arg_reduce("ArgMax", jnp.argmax)
_arg_reduce("ArgMin", jnp.argmin)


@register("CumSum")
def cumsum(ctx, attrs, x, axis):
    x = jnp.asarray(x)
    ax = int(require_static(axis, "CumSum axis"))
    return jnp.cumsum(x, axis=ax)


@register("NonZero", data_dependent=True)
def nonzero(ctx, attrs, x):
    if ctx.mode != "eager":
        raise CompileError("NonZero has a data-dependent shape; interpret-mode only")
    x = np.asarray(x)
    return jnp.asarray(np.stack(np.nonzero(x)).astype(np.int32))


@register("TopK")
def topk(ctx, attrs, x, k):
    import jax

    x = jnp.asarray(x)
    k_val = int(require_static(k, "TopK k"))
    axis = attrs.get("axis", -1)
    largest = attrs.get("largest", True)
    if axis % x.ndim != x.ndim - 1:
        x_m = jnp.moveaxis(x, axis, -1)
    else:
        x_m = x
    if largest:
        values, indices = jax.lax.top_k(x_m, k_val)
    else:
        values, indices = jax.lax.top_k(-x_m, k_val)
        values = -values
    if axis % x.ndim != x.ndim - 1:
        values = jnp.moveaxis(values, -1, axis)
        indices = jnp.moveaxis(indices, -1, axis)
    return values, indices.astype(jnp.int32)
