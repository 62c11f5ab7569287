"""wav2vec2-class speech encoder with a CTC head.

The reference serves this workload by executing an exported ONNX graph
(rten-examples/src/wav2vec2.rs: .wav → Model::run → CtcDecoder); this is the
TPU-first native family: the strided conv feature extractor lowers to
``lax.conv_general_dilated`` (XLA tiles it onto the MXU), the transformer
encoder runs flash attention over the frame sequence, and everything jits
into one program per padded waveform bucket.

Structure mirrors HuggingFace ``Wav2Vec2ForCTC`` with the base-model
conventions (``feat_extract_norm="group"``, ``do_stable_layer_norm=False``):

  waveform [B, N]
    → conv stack (layer 0 followed by per-channel group norm, all GELU)
    → feature projection (LayerNorm → Linear)
    → + grouped positional conv embedding (weight-normed, GELU)
    → LayerNorm → post-norm transformer layers
    → CTC logits [B, T, vocab]

``from_hf_wav2vec2`` imports a ``Wav2Vec2ForCTC.state_dict()`` for parity
testing against upstream (SURVEY.md §4 "PyTorch reference fixtures").
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
from rten_tpu.models.bert import _ln_f, _proj


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    vocab_size: int = 32
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_groups: int = 16
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


WAV2VEC2_BASE = Wav2Vec2Config()


def feat_extract_output_length(cfg: Wav2Vec2Config, n_samples: int) -> int:
    """Number of encoder frames the conv stack produces for ``n_samples``."""
    t = n_samples
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        t = (t - k) // s + 1
    return t


def init_params(rng: jax.Array, cfg: Wav2Vec2Config) -> dict:
    keys = iter(jax.random.split(rng, 16 + cfg.n_layers * 16 + len(cfg.conv_dim) * 2))

    def dense(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(
            cfg.dtype
        )

    def ln(dim):
        return {
            "scale": jnp.ones((dim,), cfg.dtype),
            "bias": jnp.zeros((dim,), cfg.dtype),
        }

    d, ff = cfg.d_model, cfg.d_ff
    convs = []
    c_in = 1
    for i, (c, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        layer = {"conv": dense((c, c_in, k), scale=0.1)}
        if cfg.conv_bias:
            layer["conv_b"] = jnp.zeros((c,), cfg.dtype)
        if i == 0:
            layer["gn"] = ln(c)
        convs.append(layer)
        c_in = c
    params: dict[str, Any] = {
        "convs": convs,
        "fp_ln": ln(cfg.conv_dim[-1]),
        "fp_w": dense((cfg.conv_dim[-1], d)),
        "fp_b": jnp.zeros((d,), cfg.dtype),
        "pos_conv": dense(
            (d, d // cfg.num_conv_pos_groups, cfg.num_conv_pos_embeddings),
            scale=0.05,
        ),
        "pos_conv_b": jnp.zeros((d,), cfg.dtype),
        "enc_ln": ln(d),
        "layers": [],
        "lm_head_w": dense((d, cfg.vocab_size)),
        "lm_head_b": jnp.zeros((cfg.vocab_size,), cfg.dtype),
    }
    for _ in range(cfg.n_layers):
        params["layers"].append(
            {
                "wq": dense((d, d)),
                "bq": jnp.zeros((d,), cfg.dtype),
                "wk": dense((d, d)),
                "bk": jnp.zeros((d,), cfg.dtype),
                "wv": dense((d, d)),
                "bv": jnp.zeros((d,), cfg.dtype),
                "wo": dense((d, d)),
                "bo": jnp.zeros((d,), cfg.dtype),
                "attn_ln": ln(d),
                "w_up": dense((d, ff)),
                "b_up": jnp.zeros((ff,), cfg.dtype),
                "w_down": dense((ff, d)),
                "b_down": jnp.zeros((d,), cfg.dtype),
                "ffn_ln": ln(d),
            }
        )
    return params


def quantize_params_int8(params: dict) -> dict:
    """Weight-only INT8 on the transformer projections (conv stacks and the
    small projection/head matrices stay dense)."""
    from rten_tpu.models.bert import quantize_params_int8 as _q

    return _q(params)


def _gelu(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def _conv1d(x, w, bias=None, *, stride=1, padding=0, groups=1):
    """x: [B, C_in, T]; w: [C_out, C_in/groups, K] — NCH/OIH/NCH."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(stride,),
        padding=[(padding, padding)],
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None]
    return out.astype(x.dtype)


def extract_features(params: dict, cfg: Wav2Vec2Config, wav: jax.Array) -> jax.Array:
    """Strided conv feature extractor: [B, N] waveform → [B, T, C]."""
    x = wav.astype(cfg.dtype)[:, None, :]  # [B, 1, N]
    for i, layer in enumerate(params["convs"]):
        x = _conv1d(
            x, layer["conv"], layer.get("conv_b"), stride=cfg.conv_stride[i]
        )
        if "gn" in layer:
            # GroupNorm with num_groups == num_channels: per-channel
            # normalization over time (HF feat_extract_norm="group").
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            xf = (xf - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
            xf = xf * layer["gn"]["scale"].astype(jnp.float32)[None, :, None]
            xf = xf + layer["gn"]["bias"].astype(jnp.float32)[None, :, None]
            x = xf.astype(x.dtype)
        x = _gelu(x)
    return x.transpose(0, 2, 1)  # [B, T, C]


def encode(
    params: dict,
    cfg: Wav2Vec2Config,
    wav: jax.Array,  # [B, N] float waveform
    *,
    lengths: jax.Array | None = None,  # [B] valid FRAME lengths (None → all)
    use_flash: bool | None = None,
) -> jax.Array:
    """Returns final hidden states [B, T, D]."""
    if use_flash is None:
        use_flash = dispatch.on_tpu()
    feats = extract_features(params, cfg, wav)
    b, t, _ = feats.shape

    # Feature projection: LayerNorm → Linear.
    x = _ln_f(feats, params["fp_ln"], cfg.layer_norm_eps)
    x = _proj(x, params["fp_w"], params["fp_b"])

    # Grouped positional conv embedding (SAME padding, drop the extra frame
    # for even kernels — HF Wav2Vec2SamePadLayer), GELU, residual add.
    k = cfg.num_conv_pos_embeddings
    pos = _conv1d(
        x.transpose(0, 2, 1),
        params["pos_conv"],
        params["pos_conv_b"],
        padding=k // 2,
        groups=cfg.num_conv_pos_groups,
    )
    if k % 2 == 0:
        pos = pos[:, :, :-1]
    x = x + _gelu(pos.transpose(0, 2, 1))
    x = _ln_f(x, params["enc_ln"], cfg.layer_norm_eps)

    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    h, hd = cfg.n_heads, cfg.head_dim
    for layer in params["layers"]:
        q = _proj(x, layer["wq"], layer["bq"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        kk = _proj(x, layer["wk"], layer["bk"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = _proj(x, layer["wv"], layer["bv"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        if use_flash:
            attn = flash_attention(
                q, kk, v, causal=False, kv_len=lengths,
                interpret=not dispatch.on_tpu(),
            )
        else:
            attn = attention_reference(q, kk, v, causal=False, kv_len=lengths)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
        # Post-LN (do_stable_layer_norm=False): LN(x + sublayer(x)).
        x = _ln_f(
            x + _proj(attn, layer["wo"], layer["bo"]),
            layer["attn_ln"],
            cfg.layer_norm_eps,
        )
        up = _gelu(_proj(x, layer["w_up"], layer["b_up"]))
        x = _ln_f(
            x + _proj(up, layer["w_down"], layer["b_down"]),
            layer["ffn_ln"],
            cfg.layer_norm_eps,
        )
    return x


def ctc_logits(
    params: dict,
    cfg: Wav2Vec2Config,
    wav: jax.Array,
    *,
    lengths: jax.Array | None = None,
    use_flash: bool | None = None,
) -> jax.Array:
    """Per-frame CTC character logits [B, T, vocab] (≙ Wav2Vec2ForCTC)."""
    hidden = encode(params, cfg, wav, lengths=lengths, use_flash=use_flash)
    return dispatch.matmul(hidden, params["lm_head_w"]) + params["lm_head_b"]


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash"))
def ctc_logits_jit(params, cfg: Wav2Vec2Config, wav, *, use_flash=None):
    return ctc_logits(params, cfg, wav, use_flash=use_flash)


def infer_config(state: dict, n_heads: int = 12, **overrides) -> Wav2Vec2Config:
    """Infer a Wav2Vec2Config from a ``Wav2Vec2ForCTC`` state dict's shapes
    (head count is not recoverable from shapes — pass it)."""
    state = {k: np.asarray(v) for k, v in state.items()}
    dims, kernels = [], []
    i = 0
    while f"wav2vec2.feature_extractor.conv_layers.{i}.conv.weight" in state:
        w = state[f"wav2vec2.feature_extractor.conv_layers.{i}.conv.weight"]
        dims.append(w.shape[0])
        kernels.append(w.shape[2])
        i += 1
    n_layers = 0
    while f"wav2vec2.encoder.layers.{n_layers}.attention.q_proj.weight" in state:
        n_layers += 1
    d_model = state["wav2vec2.feature_projection.projection.weight"].shape[0]
    pos_w = _pos_conv_weight(state)
    kwargs = dict(
        vocab_size=state["lm_head.weight"].shape[0],
        conv_dim=tuple(dims),
        conv_kernel=tuple(kernels),
        # strides are not recoverable from weight shapes — the base-model
        # schedule is assumed; pass conv_stride in overrides otherwise
        conv_stride=Wav2Vec2Config.conv_stride[: len(dims)],
        conv_bias="wav2vec2.feature_extractor.conv_layers.0.conv.bias" in state,
        d_model=d_model,
        n_layers=n_layers,
        n_heads=n_heads,
        d_ff=state["wav2vec2.encoder.layers.0.feed_forward.intermediate_dense.weight"].shape[0],
        num_conv_pos_embeddings=pos_w.shape[2],
        num_conv_pos_groups=d_model // pos_w.shape[1],
    )
    kwargs.update(overrides)
    return Wav2Vec2Config(**kwargs)


def _pos_conv_weight(state: dict) -> np.ndarray:
    """Reconstruct the weight-normed positional conv weight. Handles both
    the classic ``weight_g``/``weight_v`` naming and torch≥2.1
    parametrizations (``original0``/``original1``). Weight norm is over
    dims (0, 1) per kernel position (torch ``weight_norm(conv, dim=2)``)."""
    base = "wav2vec2.encoder.pos_conv_embed.conv."
    if base + "weight" in state:
        return np.asarray(state[base + "weight"], np.float32)
    if base + "weight_g" in state:
        g = np.asarray(state[base + "weight_g"], np.float32)
        v = np.asarray(state[base + "weight_v"], np.float32)
    else:
        g = np.asarray(state[base + "parametrizations.weight.original0"], np.float32)
        v = np.asarray(state[base + "parametrizations.weight.original1"], np.float32)
    norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
    return v / np.maximum(norm, 1e-12) * g


def from_hf_wav2vec2(hf_state: dict, cfg: Wav2Vec2Config, dtype=None) -> dict:
    """Convert a HuggingFace ``Wav2Vec2ForCTC.state_dict()`` into this
    module's params pytree (linear weights transposed to [in, out])."""
    from rten_tpu.models.decoder import _as_np

    dtype = dtype or cfg.dtype

    def g(name):
        return jnp.asarray(_as_np(hf_state[name]), dtype)

    convs = []
    for i in range(len(cfg.conv_dim)):
        p = f"wav2vec2.feature_extractor.conv_layers.{i}."
        layer = {"conv": g(p + "conv.weight")}
        if p + "conv.bias" in hf_state:
            layer["conv_b"] = g(p + "conv.bias")
        if i == 0 and p + "layer_norm.weight" in hf_state:
            layer["gn"] = {
                "scale": g(p + "layer_norm.weight"),
                "bias": g(p + "layer_norm.bias"),
            }
        convs.append(layer)

    params: dict[str, Any] = {
        "convs": convs,
        "fp_ln": {
            "scale": g("wav2vec2.feature_projection.layer_norm.weight"),
            "bias": g("wav2vec2.feature_projection.layer_norm.bias"),
        },
        "fp_w": g("wav2vec2.feature_projection.projection.weight").T,
        "fp_b": g("wav2vec2.feature_projection.projection.bias"),
        "pos_conv": jnp.asarray(
            _pos_conv_weight({k: _as_np(v) for k, v in hf_state.items()}), dtype
        ),
        "pos_conv_b": g("wav2vec2.encoder.pos_conv_embed.conv.bias"),
        "enc_ln": {
            "scale": g("wav2vec2.encoder.layer_norm.weight"),
            "bias": g("wav2vec2.encoder.layer_norm.bias"),
        },
        "layers": [],
        "lm_head_w": g("lm_head.weight").T,
        "lm_head_b": g("lm_head.bias"),
    }
    for i in range(cfg.n_layers):
        p = f"wav2vec2.encoder.layers.{i}."
        params["layers"].append(
            {
                "wq": g(p + "attention.q_proj.weight").T,
                "bq": g(p + "attention.q_proj.bias"),
                "wk": g(p + "attention.k_proj.weight").T,
                "bk": g(p + "attention.k_proj.bias"),
                "wv": g(p + "attention.v_proj.weight").T,
                "bv": g(p + "attention.v_proj.bias"),
                "wo": g(p + "attention.out_proj.weight").T,
                "bo": g(p + "attention.out_proj.bias"),
                "attn_ln": {
                    "scale": g(p + "layer_norm.weight"),
                    "bias": g(p + "layer_norm.bias"),
                },
                "w_up": g(p + "feed_forward.intermediate_dense.weight").T,
                "b_up": g(p + "feed_forward.intermediate_dense.bias"),
                "w_down": g(p + "feed_forward.output_dense.weight").T,
                "b_down": g(p + "feed_forward.output_dense.bias"),
                "ffn_ln": {
                    "scale": g(p + "final_layer_norm.weight"),
                    "bias": g(p + "final_layer_norm.bias"),
                },
            }
        )
    return params
