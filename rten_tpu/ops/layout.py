"""Shape/layout ops (reference: src/ops/layout.rs, slice.rs, split.rs, pad.rs,
concat.rs, trilu.rs, convert.rs, identity.rs).

In the reference most of these are zero-copy view changes; under XLA they are
metadata-only too (bitcasts/copies elided by layout assignment). Shape-valued
inputs (Reshape target, Slice starts/ends, ...) must be static under jit —
they stay concrete at trace time whenever they derive from constants/Shape
(see ops.registry.require_static).
"""

from __future__ import annotations

import builtins

import jax.numpy as jnp
import numpy as np

from rten_tpu.ops.registry import (
    OpError,
    register,
    require_static,
    static_int_list,
)


@register("Identity")
def identity(ctx, attrs, x):
    return jnp.asarray(x)


@register("Cast")
def cast(ctx, attrs, x):
    to = attrs.get("to", "float32")
    np_dtype = {
        "int32": jnp.int32,
        "float": jnp.float32,
        "float32": jnp.float32,
        "int8": jnp.int8,
        "uint8": jnp.uint8,
    }.get(to)
    if np_dtype is None:
        raise OpError(f"Cast: unsupported target dtype {to!r}")
    return jnp.asarray(x).astype(np_dtype)


@register("Shape")
def shape(ctx, attrs, x):
    # Static under jit — shapes are compile-time constants on TPU.
    return np.asarray(jnp.asarray(x).shape, dtype=np.int32)


@register("Size")
def size(ctx, attrs, x):
    return np.asarray(jnp.asarray(x).size, dtype=np.int32)


@register("Reshape")
def reshape(ctx, attrs, x, target_shape):
    x = jnp.asarray(x)
    dims = static_int_list(target_shape, "Reshape shape")
    allow_zero = attrs.get("allow_zero", False)
    out = []
    for i, d in enumerate(dims):
        if d == 0 and not allow_zero:
            if i >= x.ndim:
                raise OpError("Reshape: 0-dim index out of range")
            out.append(x.shape[i])
        else:
            out.append(d)
    return x.reshape(out)  # -1 inference handled by jnp


@register("Flatten")
def flatten(ctx, attrs, x):
    x = jnp.asarray(x)
    axis = attrs.get("axis", 1)
    if axis < 0:
        axis += x.ndim
    lead = int(np.prod(x.shape[:axis]))
    trail = int(np.prod(x.shape[axis:]))
    return x.reshape(lead, trail)


@register("Transpose")
def transpose(ctx, attrs, x):
    x = jnp.asarray(x)
    perm = attrs.get("perm")
    if perm is None:
        perm = list(reversed(range(x.ndim)))
    return jnp.transpose(x, perm)


@register("Squeeze")
def squeeze(ctx, attrs, x, axes=None):
    x = jnp.asarray(x)
    if axes is None:
        return jnp.squeeze(x)
    ax = tuple(a % x.ndim for a in static_int_list(axes, "Squeeze axes"))
    return jnp.squeeze(x, axis=ax)


@register("Unsqueeze")
def unsqueeze(ctx, attrs, x, axes):
    x = jnp.asarray(x)
    ax = static_int_list(axes, "Unsqueeze axes")
    out_ndim = x.ndim + len(ax)
    ax = sorted(a % out_ndim for a in ax)
    return jnp.expand_dims(x, axis=tuple(ax))


@register("Expand")
def expand(ctx, attrs, x, target_shape):
    x = jnp.asarray(x)
    dims = static_int_list(target_shape, "Expand shape")
    # ONNX Expand: broadcast both ways (target dims of 1 keep input size).
    ndim = builtins.max(x.ndim, len(dims))
    dims = [1] * (ndim - len(dims)) + dims
    in_shape = (1,) * (ndim - x.ndim) + x.shape
    out = [builtins.max(d, s) for d, s in zip(dims, in_shape)]
    return jnp.broadcast_to(x.reshape(in_shape), out)


@register("Concat")
def concat(ctx, attrs, *xs):
    axis = attrs.get("axis", 0)
    return jnp.concatenate([jnp.asarray(x) for x in xs], axis=axis)


@register("Tile")
def tile(ctx, attrs, x, repeats):
    x = jnp.asarray(x)
    reps = static_int_list(repeats, "Tile repeats")
    return jnp.tile(x, reps)


@register("Slice")
def slice_(ctx, attrs, x, starts, ends, axes=None, steps=None):
    x = jnp.asarray(x)
    starts_v = static_int_list(starts, "Slice starts")
    ends_v = static_int_list(ends, "Slice ends")
    axes_v = (
        static_int_list(axes, "Slice axes")
        if axes is not None
        else list(range(len(starts_v)))
    )
    steps_v = static_int_list(steps, "Slice steps") if steps is not None else [1] * len(starts_v)
    slices = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts_v, ends_v, axes_v, steps_v):
        ax %= x.ndim
        # Clamp like numpy; INT_MAX/INT_MIN sentinels common in ONNX graphs.
        st_c = None if st in (-(2**31), -(2**63)) else st
        en_c = None if en in (2**31 - 1, 2**63 - 1) else en
        if sp < 0:
            en_c = None if en_c is not None and en_c <= -x.shape[ax] - 1 else en_c
        slices[ax] = slice(st_c, en_c, sp)
    return x[tuple(slices)]


@register("Split")
def split(ctx, attrs, x, splits=None):
    x = jnp.asarray(x)
    axis = attrs.get("axis", 0) % x.ndim
    n_outputs = attrs.get("_n_outputs")  # injected by the executor
    if splits is not None:
        sizes = static_int_list(splits, "Split sizes")
        idx = np.cumsum(sizes[:-1])
        return tuple(jnp.split(x, idx, axis=axis))
    if not n_outputs:
        raise OpError("Split without sizes requires known output count")
    dim = x.shape[axis]
    chunk = -(-dim // n_outputs)
    idx = [chunk * i for i in range(1, n_outputs)]
    return tuple(jnp.split(x, idx, axis=axis))


@register("Pad")
def pad(ctx, attrs, x, pads, value=None, axes=None):
    x = jnp.asarray(x)
    pads_v = static_int_list(pads, "Pad pads")
    if axes is not None:
        axes_v = [a % x.ndim for a in static_int_list(axes, "Pad axes")]
    else:
        axes_v = list(range(x.ndim))
    n = len(axes_v)
    pad_width = [(0, 0)] * x.ndim
    for i, ax in enumerate(axes_v):
        pad_width[ax] = (pads_v[i], pads_v[i + n])
    mode = attrs.get("mode", "constant")
    if mode == "constant":
        cval = 0 if value is None else np.asarray(value).item() if not hasattr(value, "reshape") or np.asarray(value).size == 1 else value
        if any(p < 0 for pair in pad_width for p in pair):
            # Negative pads crop (ONNX allows them).
            slices = tuple(
                slice(-pb if pb < 0 else None, pe if pe < 0 else None)
                for pb, pe in pad_width
            )
            x = x[slices]
            pad_width = [(builtins.max(pb, 0), builtins.max(pe, 0)) for pb, pe in pad_width]
        return jnp.pad(x, pad_width, constant_values=cval)
    if mode == "reflect":
        return jnp.pad(x, pad_width, mode="reflect")
    raise OpError(f"Pad: unsupported mode {mode!r}")


@register("Trilu")
def trilu(ctx, attrs, x, k=None):
    x = jnp.asarray(x)
    kk = int(require_static(k, "Trilu k")) if k is not None else 0
    if attrs.get("upper", True):
        return jnp.triu(x, k=kk)
    return jnp.tril(x, k=kk)
