"""Gather / Scatter family (reference: src/ops/gather.rs).

Implemented with jnp.take / take_along_axis and `.at[]` scatter updates; XLA
lowers these to native TPU gather/scatter HLOs. Scatter reductions map to the
corresponding `.at[]` combinators (reference: ScatterReduction,
src/schema.fbs:416-422).
"""

from __future__ import annotations

import jax.numpy as jnp

from rten_tpu.ops.registry import OpError, register


def _wrap_indices(indices, dim_size):
    indices = jnp.asarray(indices)
    return jnp.where(indices < 0, indices + dim_size, indices)


@register("Gather")
def gather(ctx, attrs, x, indices):
    x = jnp.asarray(x)
    axis = attrs.get("axis", 0) % x.ndim
    idx = _wrap_indices(indices, x.shape[axis])
    return jnp.take(x, idx, axis=axis)


@register("GatherElements")
def gather_elements(ctx, attrs, x, indices):
    x = jnp.asarray(x)
    axis = attrs.get("axis", 0) % x.ndim
    idx = _wrap_indices(indices, x.shape[axis])
    return jnp.take_along_axis(x, idx, axis=axis)


@register("GatherND")
def gather_nd(ctx, attrs, x, indices):
    x = jnp.asarray(x)
    indices = jnp.asarray(indices)
    batch_dims = attrs.get("batch_dims", 0)
    k = indices.shape[-1]

    if batch_dims == 0:
        idx = tuple(jnp.moveaxis(indices, -1, 0))
        return x[idx]

    # Flatten batch dims, vmap-style gather per batch element.
    batch_shape = x.shape[:batch_dims]
    xb = x.reshape((-1,) + x.shape[batch_dims:])
    ib = indices.reshape((xb.shape[0],) + indices.shape[batch_dims:])
    import jax

    def one(data, ind):
        return data[tuple(jnp.moveaxis(ind, -1, 0))]

    out = jax.vmap(one)(xb, ib)
    del k
    return out.reshape(batch_shape + out.shape[1:])


def _scatter_combine(at_ref, updates, reduction: str):
    if reduction in ("none", None):
        return at_ref.set(updates)
    if reduction == "add":
        return at_ref.add(updates)
    if reduction == "mul":
        return at_ref.multiply(updates)
    if reduction == "min":
        return at_ref.min(updates)
    if reduction == "max":
        return at_ref.max(updates)
    raise OpError(f"unsupported scatter reduction {reduction!r}")


@register("ScatterElements")
def scatter_elements(ctx, attrs, x, indices, updates):
    x = jnp.asarray(x)
    updates = jnp.asarray(updates)
    axis = attrs.get("axis", 0) % x.ndim
    idx = _wrap_indices(indices, x.shape[axis])
    # Build a full coordinate grid: for every element of `updates`, its target
    # position is its own position except along `axis` where `indices` applies.
    import jax

    grids = jnp.meshgrid(
        *[jnp.arange(s) for s in updates.shape], indexing="ij", sparse=False
    ) if updates.ndim else []
    coords = [g for g in grids]
    if updates.ndim:
        coords[axis] = idx
    reduction = attrs.get("reduction", "none")
    del jax
    return _scatter_combine(x.at[tuple(coords)], updates, reduction)


@register("ScatterND")
def scatter_nd(ctx, attrs, x, indices, updates):
    x = jnp.asarray(x)
    indices = jnp.asarray(indices)
    updates = jnp.asarray(updates)
    idx = tuple(jnp.moveaxis(indices, -1, 0))
    reduction = attrs.get("reduction", "none")
    return _scatter_combine(x.at[idx], updates, reduction)


@register("OneHot")
def one_hot(ctx, attrs, indices, depth, values):
    import jax

    from rten_tpu.ops.registry import require_static

    indices = jnp.asarray(indices)
    depth_v = int(require_static(depth, "OneHot depth"))
    values = jnp.asarray(values)  # [off_value, on_value]
    axis = attrs.get("axis", -1)
    idx = _wrap_indices(indices, depth_v)
    oh = jax.nn.one_hot(idx, depth_v, axis=axis, dtype=values.dtype)
    return oh * (values[1] - values[0]) + values[0]
