"""Conv / ConvTranspose (reference: src/ops/conv.rs:291, :559).

The reference implements conv three ways on CPU (pointwise→GEMM, depthwise
kernel, im2col-as-virtual-GEMM, src/ops/conv.rs:24-266). On TPU all of those
are one thing: ``lax.conv_general_dilated``, which XLA lowers onto the MXU
with its own implicit im2col / spatial tiling — a hand im2col would only slow
it down. Layout is ONNX NCHW / OIHW; supports 1-D and 2-D (via generic
N spatial dims), groups, dilation, fixed or SAME_UPPER padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rten_tpu.kernels import dispatch
from rten_tpu.ops.registry import OpError, register


def _spatial_padding(pads: list[int] | None, n_spatial: int) -> list[tuple[int, int]]:
    """ONNX pads [x1_begin, x2_begin, ..., x1_end, x2_end...] → per-dim pairs."""
    if not pads:
        return [(0, 0)] * n_spatial
    if len(pads) != 2 * n_spatial:
        raise OpError(f"expected {2 * n_spatial} pad values, got {len(pads)}")
    return [(int(pads[i]), int(pads[i + n_spatial])) for i in range(n_spatial)]


def _norm(vals, n_spatial, default=1):
    if not vals:
        return (default,) * n_spatial
    return tuple(int(v) for v in vals)


@register("Conv")
def conv(ctx, attrs, x, w, b=None):
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    n_spatial = x.ndim - 2
    if n_spatial < 1:
        raise OpError("Conv input must have at least one spatial dim")
    strides = _norm(attrs.get("strides"), n_spatial)
    dilations = _norm(attrs.get("dilations"), n_spatial)
    groups = int(attrs.get("groups", 1) or 1)

    if attrs.get("auto_pad", "not_set") == "same":
        padding = "SAME"
    else:
        padding = _spatial_padding(attrs.get("pads"), n_spatial)

    spatial = "DHW"[-n_spatial:] if n_spatial <= 3 else None
    if spatial is None:
        raise OpError("Conv supports at most 3 spatial dims")
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NC" + spatial, "OI" + spatial, "NC" + spatial)
    )
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        rhs_dilation=dilations,
        dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=jnp.promote_types(x.dtype, w.dtype),
        precision=dispatch.precision_for(x, w),
    )
    if b is not None:
        b = jnp.asarray(b)
        out = out + b.reshape((1, -1) + (1,) * n_spatial)
    return out


@register("ConvTranspose")
def conv_transpose(ctx, attrs, x, w, b=None):
    """ONNX ConvTranspose via fractionally-strided conv: lhs_dilation=strides,
    spatially-flipped kernel with I/O transposed (reference computes it as
    GEMM + col2im, src/ops/conv.rs:559; on TPU XLA lowers this form onto the
    MXU directly)."""
    x = jnp.asarray(x)
    w = jnp.asarray(w)  # [C_in, C_out, *kernel] in ONNX layout
    n_spatial = x.ndim - 2
    strides = _norm(attrs.get("strides"), n_spatial)
    kernel = w.shape[2:]

    if attrs.get("auto_pad", "not_set") == "same":
        # output size = input * stride
        pads = []
        for k, s in zip(kernel, strides):
            total = max(k - s, 0)
            pads.append(total // 2)
        pads = pads + [max(k - s, 0) - p for (k, s), p in zip(zip(kernel, strides), pads)]
    else:
        pads = attrs.get("pads") or [0] * (2 * n_spatial)
    pad_pairs = _spatial_padding(pads, n_spatial)

    # Flip spatial dims, swap I/O channels: [C_in, C_out, *k] → [C_out, C_in, *k]
    w_t = jnp.flip(w, axis=tuple(range(2, w.ndim))).swapaxes(0, 1)

    padding = [
        (k - 1 - pb, k - 1 - pe)
        for k, (pb, pe) in zip(kernel, pad_pairs)
    ]
    spatial = "DHW"[-n_spatial:]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w_t.shape, ("NC" + spatial, "OI" + spatial, "NC" + spatial)
    )
    out = jax.lax.conv_general_dilated(
        x,
        w_t,
        window_strides=(1,) * n_spatial,
        padding=padding,
        lhs_dilation=strides,
        dimension_numbers=dn,
        preferred_element_type=jnp.promote_types(x.dtype, w.dtype),
        precision=dispatch.precision_for(x, w),
    )
    if b is not None:
        out = out + jnp.asarray(b).reshape((1, -1) + (1,) * n_spatial)
    return out
