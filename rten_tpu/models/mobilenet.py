"""MobileNetV2-class CNN (BASELINE config 2: "MobileNet+DistilBERT INT8").

TPU-first design decisions:
- NCHW like the rest of the vision zoo; convs via lax.conv_general_dilated
  (XLA's TPU conv emitter), depthwise via feature_group_count.
- Every POINTWISE (1×1) conv is algebraically a [N·H·W, Cin] @ [Cin, Cout]
  matmul — ~95% of MobileNet's weight bytes — so INT8 weight-only
  quantization routes them through the fused dequant+matmul Pallas kernel
  (quant_matmul_int8). Depthwise 3×3 weights are tiny and stay dense.
- BatchNorm folds into the preceding conv at import (like the ResNet family,
  load_torchvision_state_dict), so inference is conv+bias only.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rten_tpu.kernels import dispatch


@dataclasses.dataclass(frozen=True)
class MobileNetConfig:
    # (expansion t, out channels c, repeats n, stride s) — MobileNetV2 table 2
    blocks: tuple = (
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
        (6, 320, 1, 1),
    )
    stem_channels: int = 32
    last_channels: int = 1280
    num_classes: int = 1000
    width_mult: float = 1.0
    dtype: Any = jnp.float32


MOBILENET_V2 = MobileNetConfig()
MOBILENET_TINY = MobileNetConfig(
    blocks=((1, 8, 1, 1), (4, 12, 2, 2), (4, 16, 2, 2)),
    stem_channels=8,
    last_channels=64,
    num_classes=10,
)


def _c(ch: int, mult: float) -> int:
    return max(8, int(ch * mult + 4) // 8 * 8)


def block_layout(cfg: MobileNetConfig) -> list[tuple[int, int, int, int, bool]]:
    """Static per-block metadata: (cin, cout, hidden, stride, has_expand)."""
    layout = []
    cin = _c(cfg.stem_channels, cfg.width_mult)
    for t, c, n, s in cfg.blocks:
        cout = _c(c, cfg.width_mult)
        for i in range(n):
            layout.append((cin, cout, cin * t, s if i == 0 else 1, t != 1))
            cin = cout
    return layout


def init_params(rng: jax.Array, cfg: MobileNetConfig = MOBILENET_V2) -> dict:
    keys = iter(jax.random.split(rng, 1024))

    def conv(cout, cin, kh, kw, scale=0.1):
        return (
            jax.random.normal(next(keys), (cout, cin, kh, kw), jnp.float32) * scale
        ).astype(cfg.dtype)

    mult = cfg.width_mult
    stem_c = _c(cfg.stem_channels, mult)
    params: dict[str, Any] = {
        "stem_w": conv(stem_c, 3, 3, 3),
        "stem_b": jnp.zeros((stem_c,), cfg.dtype),
        "blocks": [],
    }
    # NOTE: only arrays live in params (it flows through jit as a pytree);
    # static block metadata (stride/channels) is re-derived from cfg via
    # block_layout().
    for cin, cout, hidden, stride, expand in block_layout(cfg):
        block = {}
        if expand:
            block["expand_w"] = conv(hidden, cin, 1, 1)
            block["expand_b"] = jnp.zeros((hidden,), cfg.dtype)
        block["dw_w"] = conv(hidden, 1, 3, 3)
        block["dw_b"] = jnp.zeros((hidden,), cfg.dtype)
        block["project_w"] = conv(cout, hidden, 1, 1)
        block["project_b"] = jnp.zeros((cout,), cfg.dtype)
        params["blocks"].append(block)
    cin = block_layout(cfg)[-1][1]
    last_c = _c(cfg.last_channels, max(1.0, mult))
    params["head_w"] = conv(last_c, cin, 1, 1)
    params["head_b"] = jnp.zeros((last_c,), cfg.dtype)
    params["fc_w"] = (
        jax.random.normal(next(keys), (last_c, cfg.num_classes), jnp.float32) * 0.05
    ).astype(cfg.dtype)
    params["fc_b"] = jnp.zeros((cfg.num_classes,), cfg.dtype)
    return params


def quantize_params_int8(params: dict) -> dict:
    """INT8 weight-only on every pointwise conv + the classifier (routed
    through the fused dequant+matmul kernel); stem/depthwise stay dense."""
    from rten_tpu.kernels.quant_matmul import quantize_weights_int8

    out = dict(params)
    out["blocks"] = []
    for block in params["blocks"]:
        b2 = dict(block)
        for name in ("expand_w", "project_w"):
            if name in b2:
                w = np.asarray(b2[name], np.float32)  # [Cout, Cin, 1, 1]
                mat = w[:, :, 0, 0].T  # [Cin, Cout]
                if mat.shape[0] % 8 == 0 and mat.shape[1] % 8 == 0:
                    qw, s = quantize_weights_int8(mat, axis=-1)
                    b2[name] = {"q": jnp.asarray(qw), "s": jnp.asarray(s)}
        out["blocks"].append(b2)
    w = np.asarray(params["head_w"], np.float32)[:, :, 0, 0].T
    qw, s = quantize_weights_int8(w, axis=-1)
    out["head_w"] = {"q": jnp.asarray(qw), "s": jnp.asarray(s)}
    return out


def _pointwise(x, w, b, *, relu6: bool):
    """1×1 conv as a channel matmul: x [N, C, H, W] → [N, C', H, W]."""
    n, c, hgt, wid = x.shape
    xm = x.transpose(0, 2, 3, 1).reshape(n * hgt * wid, c)
    if isinstance(w, dict):
        from rten_tpu.kernels.quant_matmul import quant_matmul_int8

        if dispatch.on_tpu():
            y = quant_matmul_int8(xm, w["q"], w["s"])
        else:
            y = xm @ (w["q"].astype(x.dtype) * w["s"].astype(x.dtype))
        cout = y.shape[-1]
    else:
        wm = w[:, :, 0, 0].T.astype(x.dtype)  # [Cin, Cout]
        y = dispatch.matmul(xm, wm)
        cout = wm.shape[1]
    y = y + b.astype(y.dtype)
    if relu6:
        y = jnp.clip(y, 0.0, 6.0)
    return y.reshape(n, hgt, wid, cout).transpose(0, 3, 1, 2).astype(x.dtype)


def _depthwise(x, w, b, stride: int):
    ch = x.shape[1]
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=dn, feature_group_count=ch,
        preferred_element_type=x.dtype,
    )
    return jnp.clip(y + b.astype(y.dtype)[None, :, None, None], 0.0, 6.0)


def forward(params: dict, cfg: MobileNetConfig, images: jax.Array) -> jax.Array:
    """images: [N, 3, H, W] normalized; returns logits [N, num_classes]."""
    x = images.astype(cfg.dtype)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, params["stem_w"].shape, ("NCHW", "OIHW", "NCHW")
    )
    x = jax.lax.conv_general_dilated(
        x, params["stem_w"].astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=x.dtype,
    )
    x = jnp.clip(x + params["stem_b"].astype(x.dtype)[None, :, None, None], 0.0, 6.0)

    for block, (cin, cout, _hidden, stride, expand) in zip(
        params["blocks"], block_layout(cfg)
    ):
        resid = x
        y = x
        if expand:
            y = _pointwise(y, block["expand_w"], block["expand_b"], relu6=True)
        y = _depthwise(y, block["dw_w"], block["dw_b"], stride)
        y = _pointwise(y, block["project_w"], block["project_b"], relu6=False)
        if stride == 1 and cin == cout:
            y = y + resid
        x = y

    x = _pointwise(x, params["head_w"], params["head_b"], relu6=True)
    x = jnp.mean(x, axis=(2, 3))  # global average pool
    return (
        dispatch.matmul(x, params["fc_w"].astype(x.dtype))
        + params["fc_b"].astype(x.dtype)
    ).astype(jnp.float32)


import functools  # noqa: E402


@functools.partial(jax.jit, static_argnames=("cfg",))
def predict(params, cfg: MobileNetConfig, images):
    return forward(params, cfg, images)
