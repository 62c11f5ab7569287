"""Resize (reference: src/ops/resize.rs:366) — nearest + linear modes with
ONNX coordinate-transform modes, implemented as separable per-axis gathers
(XLA lowers these to TPU gather HLOs; jax.image is not used because its
coordinate conventions don't cover ONNX's asymmetric/align_corners modes).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rten_tpu.ops.registry import OpError, register, require_static


def _src_coords(out_len: int, in_len: int, scale: float, coord_mode: str):
    x_out = jnp.arange(out_len, dtype=jnp.float32)
    if coord_mode == "half_pixel":
        return (x_out + 0.5) / scale - 0.5
    if coord_mode == "asymmetric":
        return x_out / scale
    if coord_mode == "align_corners":
        if out_len == 1:
            return jnp.zeros_like(x_out)
        return x_out * (in_len - 1) / (out_len - 1)
    raise OpError(f"unsupported coord transform mode {coord_mode!r}")


def _round_nearest(x, nearest_mode: str):
    if nearest_mode == "floor":
        return jnp.floor(x)
    if nearest_mode == "ceil":
        return jnp.ceil(x)
    if nearest_mode == "round_prefer_floor":
        return jnp.ceil(x - 0.5)
    if nearest_mode == "round_prefer_ceil":
        return jnp.floor(x + 0.5)
    raise OpError(f"unsupported nearest mode {nearest_mode!r}")


@register("Resize")
def resize(ctx, attrs, x, roi=None, scales=None, sizes=None):
    x = jnp.asarray(x)
    mode = attrs.get("mode", "nearest")
    coord_mode = attrs.get("coord_mode", "half_pixel")
    nearest_mode = attrs.get("nearest_mode", "round_prefer_floor")

    if sizes is not None:
        out_shape = [int(v) for v in np.atleast_1d(require_static(sizes, "Resize sizes"))]
        scale_vals = [o / i for o, i in zip(out_shape, x.shape)]
    elif scales is not None:
        scale_vals = [float(v) for v in np.atleast_1d(require_static(scales, "Resize scales"))]
        out_shape = [int(np.floor(i * s)) for i, s in zip(x.shape, scale_vals)]
    else:
        raise OpError("Resize requires scales or sizes")

    out = x
    for axis in range(x.ndim):
        in_len = x.shape[axis]
        out_len = out_shape[axis]
        if out_len == in_len and scale_vals[axis] == 1.0:
            continue
        src = _src_coords(out_len, in_len, scale_vals[axis], coord_mode)
        if mode == "nearest":
            idx = jnp.clip(_round_nearest(src, nearest_mode), 0, in_len - 1).astype(
                jnp.int32
            )
            out = jnp.take(out, idx, axis=axis)
        elif mode == "linear":
            src_c = jnp.clip(src, 0.0, in_len - 1)
            lo = jnp.floor(src_c).astype(jnp.int32)
            hi = jnp.minimum(lo + 1, in_len - 1)
            frac = (src_c - lo).astype(x.dtype)
            shape = [1] * out.ndim
            shape[axis] = out_len
            frac = frac.reshape(shape)
            out = jnp.take(out, lo, axis=axis) * (1 - frac) + jnp.take(
                out, hi, axis=axis
            ) * frac
        else:
            raise OpError(f"unsupported resize mode {mode!r}")
    return out
