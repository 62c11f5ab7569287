"""BERT-class transformer encoder (BERT / DistilBERT / Jina-style embedding
models).

The reference serves these workloads by executing exported ONNX graphs
(rten-examples/src/bert_qa.rs, jina_similarity.rs); this is the TPU-first
native family: one jitted XLA program over padded batches, flash attention
with per-sequence valid lengths (padding never attends), and optional INT8
weight-only quantization through the fused dequant+matmul kernel
(BASELINE.json config 2: "MobileNet+DistilBERT INT8").

Heads provided:
- ``encode``            → final hidden states [B, T, D]
- ``pool``              → sentence embeddings (cls / mean over valid tokens)
- ``qa_logits``         → start/end span logits (extractive QA, ≙ bert_qa.rs)

``from_hf_bert`` imports weights from a HuggingFace ``BertModel`` /
``DistilBertModel`` state dict for parity testing against upstream.
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
class BertConfig:
    vocab_size: int = 30522
    n_layers: int = 12
    n_heads: int = 12
    d_model: int = 768
    d_ff: int = 3072
    max_seq: int = 512
    n_segments: int = 2  # 0 → no token_type embeddings (DistilBERT)
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


BERT_BASE = BertConfig()
DISTILBERT_BASE = BertConfig(n_layers=6, n_segments=0)
JINA_SMALL = BertConfig(n_layers=4, d_model=512, n_heads=8, d_ff=2048, n_segments=2)


def init_params(rng: jax.Array, cfg: BertConfig) -> dict:
    keys = iter(jax.random.split(rng, 8 + cfg.n_layers * 16))

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
    params: dict[str, Any] = {
        "tok_emb": dense((cfg.vocab_size, d)),
        "pos_emb": dense((cfg.max_seq, d)),
        "emb_ln": ln(),
        "layers": [],
    }
    if cfg.n_segments:
        params["seg_emb"] = dense((cfg.n_segments, d))
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
                "attn_ln": ln(),
                "w_up": dense((d, ff)),
                "b_up": jnp.zeros((ff,), cfg.dtype),
                "w_down": dense((ff, d)),
                "b_down": jnp.zeros((d,), cfg.dtype),
                "ffn_ln": ln(),
            }
        )
    return params


def quantize_params_int8(params: dict) -> dict:
    """Weight-only INT8 on every projection matrix (embeddings stay dense —
    they are gathered, not streamed)."""
    from rten_tpu.kernels.quant_matmul import quantize_weights_int8

    def walk(node, key=""):
        if isinstance(node, dict):
            if set(node) == {"q", "s"}:
                return node
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, key) for v in node]
        arr = np.asarray(node, np.float32)
        if key.startswith("w") and arr.ndim == 2 and arr.size >= 1 << 16:
            if arr.shape[0] % 128 == 0 and arr.shape[1] % 128 == 0:
                qw, s = quantize_weights_int8(arr, axis=-1)
                return {"q": jnp.asarray(qw), "s": jnp.asarray(s)}
        return node

    return walk(params)


def _ln_f(x, p, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(
        x.dtype
    )


def _proj(x, w, b):
    if isinstance(w, dict):
        from rten_tpu.kernels.quant_matmul import quant_matmul_int8

        shape = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if dispatch.on_tpu():
            out = quant_matmul_int8(x2, w["q"], w["s"], b)
            return out.reshape(*shape, -1)
        out = x2 @ (w["q"].astype(x.dtype) * w["s"].astype(x.dtype))
        return (out + b).reshape(*shape, -1)
    return dispatch.matmul(x, w) + b


def encode(
    params: dict,
    cfg: BertConfig,
    input_ids: jax.Array,  # [B, T] int32
    *,
    lengths: jax.Array | None = None,  # [B] valid lengths (None → all valid)
    segment_ids: jax.Array | None = None,
    use_flash: bool | None = None,
) -> jax.Array:
    """Returns final hidden states [B, T, D]. Positions ≥ lengths[b] are
    padding: they are masked out of attention (no sequence attends to them),
    and their own outputs are unspecified — use ``pool``/``qa_logits`` which
    mask them."""
    b, t = input_ids.shape
    if use_flash is None:
        use_flash = dispatch.on_tpu()
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)

    x = jnp.take(params["tok_emb"], input_ids, axis=0)
    x = x + params["pos_emb"][None, :t]
    if cfg.n_segments and "seg_emb" in params:
        seg = (
            segment_ids
            if segment_ids is not None
            else jnp.zeros((b, t), jnp.int32)
        )
        x = x + jnp.take(params["seg_emb"], seg, axis=0)
    x = _ln_f(x, params["emb_ln"], cfg.layer_norm_eps)

    h, hd = cfg.n_heads, cfg.head_dim
    for layer in params["layers"]:
        q = _proj(x, layer["wq"], layer["bq"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = _proj(x, layer["wk"], layer["bk"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        v = _proj(x, layer["wv"], layer["bv"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        if use_flash:
            attn = flash_attention(q, k, v, causal=False, kv_len=lengths)
        else:
            attn = attention_reference(q, k, v, causal=False, kv_len=lengths)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
        # Post-LN (original BERT): LN(x + sublayer(x)).
        x = _ln_f(x + _proj(attn, layer["wo"], layer["bo"]), layer["attn_ln"], cfg.layer_norm_eps)
        up = _proj(x, layer["w_up"], layer["b_up"])
        up = jax.nn.gelu(up.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = _ln_f(x + _proj(up, layer["w_down"], layer["b_down"]), layer["ffn_ln"], cfg.layer_norm_eps)
    return x


def pool(hidden: jax.Array, lengths: jax.Array | None = None, mode: str = "mean"):
    """Sentence embedding from hidden states: "cls" (first token) or "mean"
    over valid tokens (≙ jina_similarity.rs mean-pooling + normalize)."""
    b, t, d = hidden.shape
    if mode == "cls":
        emb = hidden[:, 0, :]
    else:
        if lengths is None:
            lengths = jnp.full((b,), t, jnp.int32)
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(hidden.dtype)
        emb = jnp.sum(hidden * mask[:, :, None], axis=1) / jnp.maximum(
            lengths[:, None].astype(hidden.dtype), 1
        )
    norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)
    return (emb.astype(jnp.float32) / jnp.maximum(norm, 1e-9)).astype(hidden.dtype)


def qa_logits(hidden: jax.Array, qa_head: dict, lengths: jax.Array | None = None):
    """Extractive-QA span head: start/end logits over positions, padding
    masked to -inf (≙ bert_qa.rs output handling). qa_head = {"w": [D, 2],
    "b": [2]}."""
    b, t, d = hidden.shape
    logits = dispatch.matmul(hidden, qa_head["w"]) + qa_head["b"]  # [B, T, 2]
    if lengths is not None:
        mask = jnp.arange(t)[None, :] < lengths[:, None]
        logits = jnp.where(mask[:, :, None], logits, -1e30)
    return logits[..., 0], logits[..., 1]


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_jit(params, cfg: BertConfig, input_ids, lengths=None, segment_ids=None):
    return encode(params, cfg, input_ids, lengths=lengths, segment_ids=segment_ids)


def from_hf_bert(hf_state: dict, cfg: BertConfig, dtype=jnp.float32) -> dict:
    """Convert a HuggingFace ``BertModel.state_dict()`` into this module's
    params pytree (linear weights transposed to [in, out]). Used by the
    torch-parity tests, mirroring the reference's PyTorch reference fixtures
    (pytorch-ref-tests/rnn.py, SURVEY.md §4)."""

    from rten_tpu.models.decoder import _as_np

    def g(name):
        return jnp.asarray(_as_np(hf_state[name]), dtype)

    params: dict[str, Any] = {
        "tok_emb": g("embeddings.word_embeddings.weight"),
        "pos_emb": g("embeddings.position_embeddings.weight"),
        "emb_ln": {
            "scale": g("embeddings.LayerNorm.weight"),
            "bias": g("embeddings.LayerNorm.bias"),
        },
        "layers": [],
    }
    if "embeddings.token_type_embeddings.weight" in hf_state:
        params["seg_emb"] = g("embeddings.token_type_embeddings.weight")
    for i in range(cfg.n_layers):
        p = f"encoder.layer.{i}."
        params["layers"].append(
            {
                "wq": g(p + "attention.self.query.weight").T,
                "bq": g(p + "attention.self.query.bias"),
                "wk": g(p + "attention.self.key.weight").T,
                "bk": g(p + "attention.self.key.bias"),
                "wv": g(p + "attention.self.value.weight").T,
                "bv": g(p + "attention.self.value.bias"),
                "wo": g(p + "attention.output.dense.weight").T,
                "bo": g(p + "attention.output.dense.bias"),
                "attn_ln": {
                    "scale": g(p + "attention.output.LayerNorm.weight"),
                    "bias": g(p + "attention.output.LayerNorm.bias"),
                },
                "w_up": g(p + "intermediate.dense.weight").T,
                "b_up": g(p + "intermediate.dense.bias"),
                "w_down": g(p + "output.dense.weight").T,
                "b_down": g(p + "output.dense.bias"),
                "ffn_ln": {
                    "scale": g(p + "output.LayerNorm.weight"),
                    "bias": g(p + "output.LayerNorm.bias"),
                },
            }
        )
    return params
