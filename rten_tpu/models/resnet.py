"""ResNet image classifiers (BASELINE.json config 1: "ResNet-50 fp32 image
classification" — the reference runs this class of model from .rten via its
imagenet example, rten-examples/src/imagenet.rs:56-100).

Native TPU-first implementation: functional params pytree, NCHW layout,
whole-network single XLA program. Inference-mode batch norm is folded into a
scale+shift at init (the reference relies on its graph optimizer for the
same effect). Runs fp32 (parity) or bf16 (speed).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    block: str = "bottleneck"  # "basic" | "bottleneck"
    stage_sizes: tuple[int, ...] = (3, 4, 6, 3)  # ResNet-50
    num_classes: int = 1000
    width: int = 64
    dtype: Any = jnp.float32


RESNET18 = ResNetConfig(block="basic", stage_sizes=(2, 2, 2, 2))
RESNET50 = ResNetConfig()


def _conv_params(rng, c_in, c_out, k, dtype):
    fan_in = c_in * k * k
    std = float(np.sqrt(2.0 / fan_in))
    return (jax.random.normal(rng, (c_out, c_in, k, k), jnp.float32) * std).astype(dtype)


def _bn_params(c, dtype):
    # Inference-mode folded batchnorm: y = x * scale + shift.
    return {"scale": jnp.ones((c,), dtype), "shift": jnp.zeros((c,), dtype)}


def init_params(rng: jax.Array, cfg: ResNetConfig = RESNET50) -> dict:
    keys = iter(jax.random.split(rng, 512))
    bottleneck = cfg.block == "bottleneck"
    expansion = 4 if bottleneck else 1
    params: dict[str, Any] = {
        "stem": {
            "conv": _conv_params(next(keys), 3, cfg.width, 7, cfg.dtype),
            "bn": _bn_params(cfg.width, cfg.dtype),
        },
        "stages": [],
    }
    c_in = cfg.width
    for si, n_blocks in enumerate(cfg.stage_sizes):
        c_mid = cfg.width * (2**si)
        c_out = c_mid * expansion
        stage = []
        for bi in range(n_blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            block: dict[str, Any] = {}
            if bottleneck:
                block["conv1"] = _conv_params(next(keys), c_in, c_mid, 1, cfg.dtype)
                block["bn1"] = _bn_params(c_mid, cfg.dtype)
                block["conv2"] = _conv_params(next(keys), c_mid, c_mid, 3, cfg.dtype)
                block["bn2"] = _bn_params(c_mid, cfg.dtype)
                block["conv3"] = _conv_params(next(keys), c_mid, c_out, 1, cfg.dtype)
                block["bn3"] = _bn_params(c_out, cfg.dtype)
            else:
                block["conv1"] = _conv_params(next(keys), c_in, c_mid, 3, cfg.dtype)
                block["bn1"] = _bn_params(c_mid, cfg.dtype)
                block["conv2"] = _conv_params(next(keys), c_mid, c_out, 3, cfg.dtype)
                block["bn2"] = _bn_params(c_out, cfg.dtype)
            if stride != 1 or c_in != c_out:
                block["proj"] = _conv_params(next(keys), c_in, c_out, 1, cfg.dtype)
                block["proj_bn"] = _bn_params(c_out, cfg.dtype)
            stage.append(block)
            c_in = c_out
        params["stages"].append(stage)
    params["fc"] = {
        "w": (jax.random.normal(next(keys), (c_in, cfg.num_classes), jnp.float32) * 0.01).astype(cfg.dtype),
        "b": jnp.zeros((cfg.num_classes,), cfg.dtype),
    }
    return params


def _conv(x, w, stride=1):
    # Symmetric k//2 padding (torch semantics) — XLA 'SAME' distributes
    # asymmetrically for strided convs and would diverge from reference
    # weights' numerics.
    k = w.shape[-1]
    pad = (k // 2, k // 2)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    w = w.astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), (pad, pad), dimension_numbers=dn,
        preferred_element_type=x.dtype, precision=precision,
    )


def _bn(x, p):
    scale = p["scale"].astype(x.dtype)
    shift = p["shift"].astype(x.dtype)
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def forward(
    params: dict, cfg: ResNetConfig, images: jax.Array, *, features: bool = False
) -> jax.Array:
    """images: [N, 3, H, W] normalized; returns logits [N, num_classes], or
    the pre-pool feature map [N, C, h, w] with ``features=True`` (backbone
    mode for detection/segmentation heads, ≙ the reference's deeplab/yolo
    examples consuming backbone outputs)."""
    x = images.astype(cfg.dtype)
    x = _conv(x, params["stem"]["conv"], stride=2)
    x = jax.nn.relu(_bn(x, params["stem"]["bn"]))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)],
    )
    bottleneck = cfg.block == "bottleneck"
    for si, stage in enumerate(params["stages"]):
        for bi, block in enumerate(stage):
            stride = 2 if (si > 0 and bi == 0) else 1
            resid = x
            if bottleneck:
                y = jax.nn.relu(_bn(_conv(x, block["conv1"]), block["bn1"]))
                y = jax.nn.relu(_bn(_conv(y, block["conv2"], stride=stride), block["bn2"]))
                y = _bn(_conv(y, block["conv3"]), block["bn3"])
            else:
                y = jax.nn.relu(_bn(_conv(x, block["conv1"], stride=stride), block["bn1"]))
                y = _bn(_conv(y, block["conv2"]), block["bn2"])
            if "proj" in block:
                resid = _bn(_conv(x, block["proj"], stride=stride), block["proj_bn"])
            x = jax.nn.relu(resid + y)
    if features:
        return x
    x = jnp.mean(x, axis=(2, 3))
    return (
        x @ params["fc"]["w"].astype(x.dtype) + params["fc"]["b"].astype(x.dtype)
    ).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def predict(params, cfg: ResNetConfig, images):
    return forward(params, cfg, images)


def load_torchvision_state_dict(state: dict, cfg: ResNetConfig = RESNET50, dtype=None) -> dict:
    """Import torchvision resnet50/resnet18 weights (numpy state dict) with
    batch-norm folding — gives real ImageNet accuracy for parity benchmarks."""
    dtype = dtype or cfg.dtype

    def fold_bn(prefix):
        eps = 1e-5
        gamma = np.asarray(state[f"{prefix}.weight"], np.float32)
        beta = np.asarray(state[f"{prefix}.bias"], np.float32)
        mean = np.asarray(state[f"{prefix}.running_mean"], np.float32)
        var = np.asarray(state[f"{prefix}.running_var"], np.float32)
        scale = gamma / np.sqrt(var + eps)
        shift = beta - mean * scale
        return {"scale": jnp.asarray(scale, dtype), "shift": jnp.asarray(shift, dtype)}

    def conv(name):
        return jnp.asarray(np.asarray(state[name], np.float32), dtype)

    bottleneck = cfg.block == "bottleneck"
    params: dict[str, Any] = {
        "stem": {"conv": conv("conv1.weight"), "bn": fold_bn("bn1")},
        "stages": [],
    }
    for si, n_blocks in enumerate(cfg.stage_sizes):
        stage = []
        for bi in range(n_blocks):
            p = f"layer{si + 1}.{bi}"
            block: dict[str, Any] = {
                "conv1": conv(f"{p}.conv1.weight"),
                "bn1": fold_bn(f"{p}.bn1"),
                "conv2": conv(f"{p}.conv2.weight"),
                "bn2": fold_bn(f"{p}.bn2"),
            }
            if bottleneck:
                block["conv3"] = conv(f"{p}.conv3.weight")
                block["bn3"] = fold_bn(f"{p}.bn3")
            if f"{p}.downsample.0.weight" in state:
                block["proj"] = conv(f"{p}.downsample.0.weight")
                block["proj_bn"] = fold_bn(f"{p}.downsample.1")
            stage.append(block)
        params["stages"].append(stage)
    params["fc"] = {
        "w": jnp.asarray(np.asarray(state["fc.weight"], np.float32).T, dtype),
        "b": jnp.asarray(np.asarray(state["fc.bias"], np.float32), dtype),
    }
    return params
