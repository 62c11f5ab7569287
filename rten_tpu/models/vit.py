"""ViT-class vision transformer encoder.

Backbone for the reference's vision-transformer examples — DistilViT image
captioning, Segment Anything and Depth Anything image encoders, DETR-style
detection heads (rten-examples/src/{distilvit,segment_anything,
depth_anything,detr}.rs run these as exported ONNX graphs). TPU-first
design: patch embedding as a single reshaped matmul (MXU-friendly — avoids
the strided conv XLA would pad anyway), pre-LN transformer blocks, flash
attention over all patches.

Heads:
- ``encode``      → patch/cls hidden states [B, 1+N, D] (or [B, N, D])
- ``classify``    → ImageNet-style logits from the cls token
- feature map reshape helper for dense prediction heads (depth/segmentation)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rten_tpu.kernels import dispatch
from rten_tpu.kernels.attention import attention_reference, flash_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    n_channels: int = 3
    n_layers: int = 12
    n_heads: int = 12
    d_model: int = 768
    d_ff: int = 3072
    n_classes: int = 1000
    use_cls_token: bool = True
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def patch_dim(self) -> int:
        return self.n_channels * self.patch_size * self.patch_size


VIT_BASE = ViTConfig()
VIT_TINY = ViTConfig(n_layers=4, n_heads=4, d_model=256, d_ff=1024)


def init_params(rng: jax.Array, cfg: ViTConfig) -> dict:
    keys = iter(jax.random.split(rng, 8 + cfg.n_layers * 12))

    def dense(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(
            cfg.dtype
        )

    def ln():
        return {
            "scale": jnp.ones((cfg.d_model,), cfg.dtype),
            "bias": jnp.zeros((cfg.d_model,), cfg.dtype),
        }

    d, ff = cfg.d_model, cfg.d_ff
    seq = cfg.n_patches + (1 if cfg.use_cls_token else 0)
    params: dict[str, Any] = {
        "patch_w": dense((cfg.patch_dim, d)),
        "patch_b": jnp.zeros((d,), cfg.dtype),
        "pos_emb": dense((seq, d)),
        "final_ln": ln(),
        "head_w": dense((d, cfg.n_classes)),
        "head_b": jnp.zeros((cfg.n_classes,), cfg.dtype),
        "layers": [],
    }
    if cfg.use_cls_token:
        params["cls"] = dense((1, 1, d))
    for _ in range(cfg.n_layers):
        params["layers"].append(
            {
                "ln1": ln(),
                "wqkv": dense((d, 3 * d)),
                "bqkv": jnp.zeros((3 * d,), cfg.dtype),
                "wo": dense((d, d)),
                "bo": jnp.zeros((d,), cfg.dtype),
                "ln2": ln(),
                "w_up": dense((d, ff)),
                "b_up": jnp.zeros((ff,), cfg.dtype),
                "w_down": dense((ff, d)),
                "b_down": jnp.zeros((d,), cfg.dtype),
            }
        )
    return params


def _ln_f(x, p, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(
        x.dtype
    )


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, C, H, W] → [B, (H/p)(W/p), C·p·p]: non-overlapping patch pixels
    flattened per patch — the stride-p conv as one big matmul operand."""
    b, c, hgt, wid = images.shape
    gh, gw = hgt // patch, wid // patch
    x = images.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, C, p, p]
    return x.reshape(b, gh * gw, c * patch * patch)


def encode(
    params: dict,
    cfg: ViTConfig,
    images: jax.Array,  # [B, C, H, W]
    *,
    use_flash: bool | None = None,
) -> jax.Array:
    """Returns hidden states [B, 1+N, D] (cls first) or [B, N, D]."""
    if use_flash is None:
        use_flash = dispatch.on_tpu()
    b = images.shape[0]
    x = patchify(images.astype(cfg.dtype), cfg.patch_size)
    x = dispatch.matmul(x, params["patch_w"]) + params["patch_b"]
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.d_model)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_emb"][None]

    h, hd = cfg.n_heads, cfg.head_dim
    t = x.shape[1]
    for layer in params["layers"]:
        resid = x
        xn = _ln_f(x, layer["ln1"], cfg.layer_norm_eps)
        qkv = dispatch.matmul(xn, layer["wqkv"]) + layer["bqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        if use_flash:
            attn = flash_attention(q, k, v, causal=False)
        else:
            attn = attention_reference(q, k, v, causal=False)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
        x = resid + dispatch.matmul(attn, layer["wo"]) + layer["bo"]

        resid = x
        xn = _ln_f(x, layer["ln2"], cfg.layer_norm_eps)
        up = dispatch.matmul(xn, layer["w_up"]) + layer["b_up"]
        up = jax.nn.gelu(up.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = resid + dispatch.matmul(up, layer["w_down"]) + layer["b_down"]
    return _ln_f(x, params["final_ln"], cfg.layer_norm_eps)


def classify(params: dict, cfg: ViTConfig, images: jax.Array) -> jax.Array:
    """ImageNet-style logits [B, n_classes] from the cls token (or mean of
    patch tokens when there is none)."""
    hidden = encode(params, cfg, images)
    feat = hidden[:, 0] if cfg.use_cls_token else hidden.mean(axis=1)
    return dispatch.matmul(feat, params["head_w"]) + params["head_b"]


def feature_map(hidden: jax.Array, cfg: ViTConfig) -> jax.Array:
    """Patch tokens as a [B, D, gh, gw] feature map for dense heads
    (depth estimation, segmentation)."""
    tokens = hidden[:, 1:] if cfg.use_cls_token else hidden
    b, n, d = tokens.shape
    g = cfg.grid
    return tokens.reshape(b, g, g, d).transpose(0, 3, 1, 2)


@functools.partial(jax.jit, static_argnames=("cfg",))
def classify_jit(params, cfg: ViTConfig, images):
    return classify(params, cfg, images)
