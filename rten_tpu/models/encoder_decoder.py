"""Whisper-class encoder-decoder (BASELINE.json config 4: "Whisper
encoder-decoder transcription with INT8 weights + INT8 KV-cache").

The reference runs this family from ONNX with per-layer self- AND
cross-attention caches managed by rten-generate
(rten-generate/src/generator.rs:59-66 KvCacheData, cross-attention discovery
:319). TPU-first redesign:

- audio encoder: two strided 1-D convs + GELU + sinusoidal positions +
  pre-norm transformer, one XLA program per audio chunk
- decoder: causal self-attention over a preallocated (optionally INT8) KV
  cache + cross-attention over encoder states whose K/V are projected ONCE
  per utterance (the reference recomputes them into a cross-KV cache the
  same way; here it's one compiled `encode` call)
- INT8 KV cache: K/V quantized per (position, head) with f32 scales on
  write, dequantized on read — halves decode HBM traffic for long audio
  (kernels/attention.py loads bf16 after dequant; a fused int8-load Pallas
  decode path is the serving layer's next optimization)
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rten_tpu.kernels import dispatch

# Default for the fused single-token decode path (see ``decode``'s
# ``fused`` kwarg). Read ONCE at import — the flag shapes the traced
# program but is not part of any jit key, so mid-process env toggles are
# deliberately inert; per-call control goes through the kwarg.
_ED_FUSE_DEFAULT = os.environ.get("RTEN_ED_FUSE", "auto")
from rten_tpu.kernels.attention import attention_reference, flash_attention


@dataclasses.dataclass(frozen=True)
class EncDecConfig:
    n_mels: int = 80
    n_audio_ctx: int = 1500
    vocab_size: int = 51865
    d_model: int = 384
    n_heads: int = 6
    n_audio_layers: int = 4
    n_text_layers: int = 4
    d_ff: int = 1536
    max_text_ctx: int = 448
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    int8_kv: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


WHISPER_TINY = EncDecConfig()


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def _ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _attn_params(keys, d, dtype, scale=0.02):
    def dense(shape):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dtype)

    return {
        "wq": dense((d, d)), "bq": jnp.zeros((d,), dtype),
        "wk": dense((d, d)),
        "wv": dense((d, d)), "bv": jnp.zeros((d,), dtype),
        "wo": dense((d, d)), "bo": jnp.zeros((d,), dtype),
    }


def _mlp_params(keys, d, ff, dtype, scale=0.02):
    def dense(shape):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dtype)

    return {
        "w_up": dense((d, ff)), "b_up": jnp.zeros((ff,), dtype),
        "w_down": dense((ff, d)), "b_down": jnp.zeros((d,), dtype),
    }


def init_params(rng: jax.Array, cfg: EncDecConfig = WHISPER_TINY) -> dict:
    keys = iter(jax.random.split(rng, 16 + 16 * (cfg.n_audio_layers + cfg.n_text_layers)))
    d = cfg.d_model

    def dense(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(cfg.dtype)

    enc_layers = []
    for _ in range(cfg.n_audio_layers):
        enc_layers.append({
            "ln1": _ln(d, cfg.dtype),
            "attn": _attn_params(keys, d, cfg.dtype),
            "ln2": _ln(d, cfg.dtype),
            "mlp": _mlp_params(keys, d, cfg.d_ff, cfg.dtype),
        })
    dec_layers = []
    for _ in range(cfg.n_text_layers):
        dec_layers.append({
            "ln1": _ln(d, cfg.dtype),
            "self_attn": _attn_params(keys, d, cfg.dtype),
            "ln_x": _ln(d, cfg.dtype),
            "cross_attn": _attn_params(keys, d, cfg.dtype),
            "ln2": _ln(d, cfg.dtype),
            "mlp": _mlp_params(keys, d, cfg.d_ff, cfg.dtype),
        })
    return {
        "enc_conv1": dense((d, cfg.n_mels, 3)),  # [out, in, k]
        "enc_conv1_b": jnp.zeros((d,), cfg.dtype),
        "enc_conv2": dense((d, d, 3)),
        "enc_conv2_b": jnp.zeros((d,), cfg.dtype),
        "enc_layers": enc_layers,
        "enc_ln_post": _ln(d, cfg.dtype),
        "tok_emb": dense((cfg.vocab_size, d)),
        "pos_emb": dense((cfg.max_text_ctx, d)),
        "dec_layers": dec_layers,
        "dec_ln": _ln(d, cfg.dtype),
    }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------



def _mm(x, w):
    """Matmul accepting dense [K, N] or INT8-packed {"q","s"} weights (config
    4: "Whisper ... INT8 weights"); int8 routes through the fused
    dequant+matmul / GEMV Pallas kernels on TPU."""
    if isinstance(w, dict):
        from rten_tpu.kernels.quant_matmul import gemv_weight_kn, quant_matmul_int8

        shape = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        pad_k = gemv_weight_kn(w["q"])[0] - x2.shape[-1]
        if pad_k:
            x2 = jnp.pad(x2, ((0, 0), (0, pad_k)))
        if dispatch.on_tpu():
            out = quant_matmul_int8(x2, w["q"], w["s"])
        else:
            w_q = w["q"]
            if w_q.ndim == 3:
                from rten_tpu.kernels.quant_matmul import untile_gemv_weights

                w_q = untile_gemv_weights(w_q)
            out = x2 @ (w_q.astype(x.dtype) * w["s"].astype(x.dtype))
        return out.reshape(*shape, -1).astype(x.dtype)
    return dispatch.matmul(x, w)


def quantize_params_int8(
    params: dict, *, tile_bn: int | None | str = "env"
) -> dict:
    """Weight-only INT8 over every projection matrix (attention + MLP +
    logits head); convs and embeddings stay dense. The tied logits
    projection gets a dedicated padded ``lm_head_q``.

    ``tile_bn`` re-lays the decode-path stripe-streamed GEMV weights
    (lm_head_q, fused wqkv, and the MLP matrices when the whole-matrix
    kernel doesn't apply) as contiguous [S, K, bn] tiles — linear HBM
    reads instead of strided row reads (see decoder._tile_gemv_packs)."""
    from rten_tpu.kernels.quant_matmul import quantize_weights_int8

    if tile_bn == "env":
        from rten_tpu.models.decoder import _TILE_GEMV_BN

        tile_bn = _TILE_GEMV_BN

    def q(leaf):
        arr = np.asarray(leaf, np.float32)
        if arr.ndim == 2 and arr.size >= 1 << 16 and arr.shape[0] % 128 == 0:
            pad_n = -arr.shape[1] % 128
            if pad_n:
                arr = np.pad(arr, ((0, 0), (0, pad_n)))
            qw, s = quantize_weights_int8(arr, axis=-1)
            # Scales stored 2-D [1, N]: the kernels consume a [1, N] VMEM
            # tile, and a 1-D vector forces a rank-changing relayout INSIDE
            # the decode scan every step (see decoder.quantize_params_int8).
            return {"q": jnp.asarray(qw), "s": jnp.asarray(s).reshape(1, -1)}
        return leaf

    mat_keys = {"wq", "wk", "wv", "wo", "w_up", "w_down"}

    def walk(node, key=""):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, key) for v in node]
        return q(node) if key in mat_keys else node

    out = walk(params)
    out["lm_head_q"] = q(np.asarray(params["tok_emb"], np.float32).T)

    # Fuse each decoder layer's self-attention q|k|v into ONE int8 matrix:
    # one weight stream + one GEMV launch per decode step instead of three
    # (mirrors decoder.quantize_params_int8's wqkv; reference runs the
    # three MatMuls separately every token, rten-generate/src/generator.rs
    # :511). Whisper's k projection is biasless — zeros in the fused bias.
    for src, dst in zip(params["dec_layers"], out["dec_layers"]):
        a_src, a_dst = src["self_attn"], dst["self_attn"]
        wq, wk, wv = (np.asarray(a_src[k_], np.float32) for k_ in ("wq", "wk", "wv"))
        fused = np.concatenate([wq, wk, wv], axis=1)
        if not (
            fused.size >= 1 << 16
            and fused.shape[0] % 128 == 0
            and fused.shape[1] % 128 == 0
        ):
            continue
        qw, s = quantize_weights_int8(fused, axis=-1)
        a_dst["wqkv"] = {"q": jnp.asarray(qw), "s": jnp.asarray(s).reshape(1, -1)}
        a_dst["bqkv"] = jnp.asarray(
            np.concatenate(
                [
                    np.asarray(a_src["bq"], np.float32),
                    np.zeros(wk.shape[1], np.float32),
                    np.asarray(a_src["bv"], np.float32),
                ]
            ).reshape(1, -1),
            dtype=jnp.asarray(a_src["bq"]).dtype,
        )
        for k_ in ("wq", "wk", "wv", "bq", "bv"):
            a_dst.pop(k_, None)

    if tile_bn:
        from rten_tpu.kernels.matmul_pallas import pick_block
        from rten_tpu.kernels.quant_matmul import (
            mlp_fused_supported,
            tile_gemv_pack,
        )

        def tile_divisor(pack):
            if not (isinstance(pack, dict) and pack["q"].ndim == 2):
                return pack
            k_, n_ = pack["q"].shape
            bn = pick_block(n_, tile_bn)
            if bn >= n_ or n_ % bn:
                return pack  # single stripe: whole-matrix DMA already linear
            return tile_gemv_pack(pack, bn)

        if isinstance(out.get("lm_head_q"), dict):
            out["lm_head_q"] = tile_gemv_pack(out["lm_head_q"], tile_bn)
        for dst in out["dec_layers"]:
            a_dst = dst["self_attn"]
            if "wqkv" in a_dst:
                # divisor-only: q|k|v segment slicing reads fixed columns
                a_dst["wqkv"] = tile_divisor(a_dst["wqkv"])
            mlp = dst["mlp"]
            if isinstance(mlp.get("w_up"), dict) and mlp["w_up"]["q"].ndim == 2:
                d_, ff_ = mlp["w_up"]["q"].shape
                if not mlp_fused_supported(d_, ff_):
                    mlp["w_up"] = tile_divisor(mlp["w_up"])
                    mlp["w_down"] = tile_divisor(mlp["w_down"])
    return out


def _layer_norm(x, p, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return out.astype(x.dtype) * p["scale"] + p["bias"]


def _heads(x, n_heads):
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def _unheads(x):
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def _sinusoids(length: int, d: int) -> np.ndarray:
    """Whisper-style sinusoidal positions."""
    log_timescale = np.log(10000.0) / (d // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(d // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _attend(q, k, v, *, causal, q_offset=None, kv_len=None, use_flash=None):
    if use_flash is None:
        use_flash = dispatch.on_tpu()
    if use_flash:
        return flash_attention(
            q, k, v, causal=causal, q_offset=q_offset, kv_len=kv_len,
            interpret=not dispatch.on_tpu(),
        )
    return attention_reference(q, k, v, causal=causal, q_offset=q_offset, kv_len=kv_len)


# ---------------------------------------------------------------------------
# INT8 KV quantization (per position+head absmax scales)
# ---------------------------------------------------------------------------


def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x: [B, H, T, D] → (int8 values, f32 scales [B, H, T, 1])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scales = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scales), -127, 127).astype(jnp.int8)
    return q, scales


def dequantize_kv(q: jax.Array, scales: jax.Array, dtype) -> jax.Array:
    return (q.astype(jnp.float32) * scales).astype(dtype)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode(params: dict, cfg: EncDecConfig, mel: jax.Array) -> jax.Array:
    """mel: [B, n_mels, T_audio] → encoder states [B, T_ctx, d]."""
    x = mel.astype(cfg.dtype)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, params["enc_conv1"].shape, ("NCH", "OIH", "NCH")
    )
    x = jax.lax.conv_general_dilated(
        x, params["enc_conv1"], (1,), [(1, 1)], dimension_numbers=dn,
        preferred_element_type=x.dtype,
    ) + params["enc_conv1_b"][None, :, None]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(cfg.dtype)
    dn2 = jax.lax.conv_dimension_numbers(
        x.shape, params["enc_conv2"].shape, ("NCH", "OIH", "NCH")
    )
    x = jax.lax.conv_general_dilated(
        x, params["enc_conv2"], (2,), [(1, 1)], dimension_numbers=dn2,
        preferred_element_type=x.dtype,
    ) + params["enc_conv2_b"][None, :, None]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(cfg.dtype)
    x = x.transpose(0, 2, 1)  # [B, T, d]

    pos = jnp.asarray(_sinusoids(x.shape[1], cfg.d_model), cfg.dtype)
    x = x + pos[None]
    for layer in params["enc_layers"]:
        xn = _layer_norm(x, layer["ln1"], cfg.layer_norm_eps)
        a = layer["attn"]
        q = _heads(_mm(xn, a["wq"]) + a["bq"], cfg.n_heads)
        k = _heads(_mm(xn, a["wk"]), cfg.n_heads)
        v = _heads(_mm(xn, a["wv"]) + a["bv"], cfg.n_heads)
        attn = _attend(q, k, v, causal=False)
        x = x + _mm(_unheads(attn), a["wo"]) + a["bo"]
        xn = _layer_norm(x, layer["ln2"], cfg.layer_norm_eps)
        m = layer["mlp"]
        h = jax.nn.gelu(
            (_mm(xn, m["w_up"]) + m["b_up"]).astype(jnp.float32),
            approximate=False,
        ).astype(cfg.dtype)
        x = x + _mm(h, m["w_down"]) + m["b_down"]
    return _layer_norm(x, params["enc_ln_post"], cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# Decoder state
# ---------------------------------------------------------------------------


def init_decoder_state(
    params: dict, cfg: EncDecConfig, enc_states: jax.Array, max_len: int | None = None
) -> dict:
    """Precompute cross-attention K/V from encoder states (once per
    utterance — the reference's encoder-decoder cross-KV cache,
    generator.rs:59-66) and allocate the self-attention cache."""
    b = enc_states.shape[0]
    max_len = max_len or cfg.max_text_ctx
    h, hd = cfg.n_heads, cfg.head_dim
    cross_k, cross_v = [], []
    for layer in params["dec_layers"]:
        a = layer["cross_attn"]
        xk = _heads(_mm(enc_states, a["wk"]), h)
        xv = _heads(_mm(enc_states, a["wv"]) + a["bv"], h)
        cross_k.append(xk)
        cross_v.append(xv)

    if cfg.int8_kv:
        # Round the cache up so the INT8-KV decode kernel's block/tiling
        # constraints hold (decode_attention_int8_supported) — the extra
        # slots are int8, so the cost is small.
        max_len = -(-max_len // 256) * 256

    # FOLDED self-cache storage [B, H, S·D/128, 128] where possible (see
    # models/decoder.init_cache: avoids XLA layout-conversion copies around
    # every aliased decode-kernel call).
    foldable = hd <= 128 and 128 % hd == 0 and (max_len * hd) % 128 == 0
    if foldable:
        kv_shape = (b, h, max_len * hd // 128, 128)
    else:
        kv_shape = (b, h, max_len, hd)
    state: dict[str, Any] = {
        "cross_k": cross_k,
        "cross_v": cross_v,
        "len": jnp.zeros((b,), jnp.int32),
    }
    if cfg.int8_kv:
        from rten_tpu.kernels.decode_attention import _LANES

        s_f = max_len * hd // _LANES
        state["self_k"] = [jnp.zeros(kv_shape, jnp.int8) for _ in params["dec_layers"]]
        state["self_v"] = [jnp.zeros(kv_shape, jnp.int8) for _ in params["dec_layers"]]
        # Scales live in the decode kernel's packed layout [B, H, 8, S·D/128]
        # (pack_kv_scales); the eager/prefill path converts on the fly.
        state["self_k_scale"] = [
            jnp.zeros((b, h, 8, s_f), jnp.float32) for _ in params["dec_layers"]
        ]
        state["self_v_scale"] = [
            jnp.zeros((b, h, 8, s_f), jnp.float32) for _ in params["dec_layers"]
        ]
    else:
        state["self_k"] = [jnp.zeros(kv_shape, cfg.dtype) for _ in params["dec_layers"]]
        state["self_v"] = [jnp.zeros(kv_shape, cfg.dtype) for _ in params["dec_layers"]]
    return state


def _update_kv(cache, new, start):
    def one(c, n, s):
        return jax.lax.dynamic_update_slice(c, n, (0, s, 0))

    return jax.vmap(one)(cache, new, start)


def decode(
    params: dict,
    cfg: EncDecConfig,
    tokens: jax.Array,  # [B, T]
    state: dict,
    *,
    use_flash: bool | None = None,
    fused: bool | None = None,
) -> tuple[jax.Array, dict]:
    """Decoder forward appending ``tokens`` at state["len"]; returns
    (logits [B, T, vocab], new state)."""
    b, t = tokens.shape
    h = cfg.n_heads
    start = state["len"]
    positions = start[:, None] + jnp.arange(t)[None, :]
    x = jnp.take(params["tok_emb"], tokens, axis=0) + jnp.take(
        params["pos_emb"], positions, axis=0
    )
    x = x.astype(cfg.dtype)

    new_state = dict(state)
    new_state["self_k"] = list(state["self_k"])
    new_state["self_v"] = list(state["self_v"])
    if cfg.int8_kv:
        new_state["self_k_scale"] = list(state["self_k_scale"])
        new_state["self_v_scale"] = list(state["self_v_scale"])

    from rten_tpu.kernels.decode_attention import (
        decode_attention,
        decode_attention_int8,
        decode_attention_int8_supported,
        decode_attention_supported,
        pack_kv_scales,
        unpack_kv_scales,
    )

    from rten_tpu.models.decoder import _fold_like, _unfold, cache_seq_len

    flash = use_flash if use_flash is not None else dispatch.on_tpu()
    s_max = cache_seq_len(state["self_k"][0], cfg.head_dim)
    int8_fast = (
        cfg.int8_kv
        and flash
        and t == 1
        and decode_attention_int8_supported(cfg.head_dim, s_max)
    )
    bf16_fast = (
        not cfg.int8_kv
        and flash
        and t == 1
        and decode_attention_supported(cfg.head_dim, s_max)
    )

    # Fused single-token decode (config 4's hot loop): every projection
    # rides the quant GEMV / whole-MLP Pallas kernels with the layer norms,
    # biases, activations and residuals folded into the weight stream —
    # 5 kernels per layer-pair of work instead of ~8 kernels + ~10 XLA
    # staging fusions. The ``fused`` kwarg forces the path per call; the
    # module default comes from RTEN_ED_FUSE read once at import
    # ("0" eager, "1" fused, "auto" = fused on TPU).
    from rten_tpu.kernels.quant_matmul import (
        mlp_fused_supported,
        quant_gemv_int8,
        quant_mlp_int8,
    )

    if fused is None:
        _kernels_on = (
            dispatch.on_tpu() if _ED_FUSE_DEFAULT == "auto"
            else _ED_FUSE_DEFAULT == "1"
        )
    else:
        _kernels_on = fused
    _interp = not dispatch.on_tpu()
    dm = cfg.d_model
    _l0 = params["dec_layers"][0]
    fused = (
        _kernels_on
        and t == 1
        and b <= 8
        and "wqkv" in _l0["self_attn"]
        and all(
            isinstance(w, dict)
            for w in (
                _l0["self_attn"]["wo"],
                _l0["cross_attn"]["wq"],
                _l0["cross_attn"]["wo"],
                _l0["mlp"]["w_up"],
                _l0["mlp"]["w_down"],
            )
        )
        and mlp_fused_supported(dm, cfg.d_ff)
    )

    def _gemv(x2, w, bias=None, **kw):
        return quant_gemv_int8(
            x2, w["q"], w["s"], bias=bias, interpret=_interp, **kw
        )

    for li, layer in enumerate(params["dec_layers"]):
        a = layer["self_attn"]
        if fused:
            x2 = x.reshape(b, dm)
            qkv = _gemv(
                x2,
                a["wqkv"],
                bias=a["bqkv"],
                norm="layernorm",
                norm_scale=layer["ln1"]["scale"],
                norm_bias=layer["ln1"]["bias"],
                norm_eps=cfg.layer_norm_eps,
                out_dtype=cfg.dtype,
            )[:, None, :]
            q = _heads(qkv[..., :dm], h)
            k = _heads(qkv[..., dm : 2 * dm], h)
            v = _heads(qkv[..., 2 * dm :], h)
        else:
            xn = _layer_norm(x, layer["ln1"], cfg.layer_norm_eps)
            if "wqkv" in a:
                qkv = _mm(xn, a["wqkv"]) + a["bqkv"]
                q = _heads(qkv[..., :dm], h)
                k = _heads(qkv[..., dm : 2 * dm], h)
                v = _heads(qkv[..., 2 * dm :], h)
            else:
                q = _heads(_mm(xn, a["wq"]) + a["bq"], h)
                k = _heads(_mm(xn, a["wk"]), h)
                v = _heads(_mm(xn, a["wv"]) + a["bv"], h)

        if int8_fast:
            # Single-token decode straight over the INT8 cache: the kernel
            # quantizes+appends this token in place and never materializes a
            # dequantized cache (the full-dequant-per-step below is the
            # parity/prefill path only).
            attn, k_c, v_c, ks_c, vs_c = decode_attention_int8(
                q,
                state["self_k"][li],
                state["self_v"][li],
                state["self_k_scale"][li],
                state["self_v_scale"][li],
                start,
                k,
                v,
                interpret=_interp,
            )
            new_state["self_k"][li] = k_c
            new_state["self_v"][li] = v_c
            new_state["self_k_scale"][li] = ks_c
            new_state["self_v_scale"][li] = vs_c
        elif cfg.int8_kv:
            hd_ = cfg.head_dim
            k_q, k_s = quantize_kv(k)
            v_q, v_s = quantize_kv(v)
            k_q_full = _update_kv(_unfold(state["self_k"][li], hd_), k_q, start)
            v_q_full = _update_kv(_unfold(state["self_v"][li], hd_), v_q, start)
            new_state["self_k"][li] = _fold_like(k_q_full, state["self_k"][li])
            new_state["self_v"][li] = _fold_like(v_q_full, state["self_v"][li])
            new_state["self_k_scale"][li] = pack_kv_scales(
                _update_kv(
                    unpack_kv_scales(state["self_k_scale"][li], cfg.head_dim),
                    k_s,
                    start,
                ),
                cfg.head_dim,
            )
            new_state["self_v_scale"][li] = pack_kv_scales(
                _update_kv(
                    unpack_kv_scales(state["self_v_scale"][li], cfg.head_dim),
                    v_s,
                    start,
                ),
                cfg.head_dim,
            )
            k_cache = dequantize_kv(
                k_q_full,
                unpack_kv_scales(new_state["self_k_scale"][li], cfg.head_dim),
                cfg.dtype,
            )
            v_cache = dequantize_kv(
                v_q_full,
                unpack_kv_scales(new_state["self_v_scale"][li], cfg.head_dim),
                cfg.dtype,
            )
        elif bf16_fast:
            attn, k_c, v_c = decode_attention(
                q, state["self_k"][li], state["self_v"][li], start, k, v,
                interpret=_interp,
            )
            new_state["self_k"][li] = k_c
            new_state["self_v"][li] = v_c
        else:
            k_cache = _update_kv(_unfold(state["self_k"][li], cfg.head_dim), k, start)
            v_cache = _update_kv(_unfold(state["self_v"][li], cfg.head_dim), v, start)
            new_state["self_k"][li] = _fold_like(k_cache, state["self_k"][li])
            new_state["self_v"][li] = _fold_like(v_cache, state["self_v"][li])

        if not (int8_fast or bf16_fast):
            attn = _attend(
                q, k_cache, v_cache,
                causal=True, q_offset=start, kv_len=start + t, use_flash=use_flash,
            )

        c = layer["cross_attn"]
        m = layer["mlp"]
        if fused:
            # wo + residual fused; cross-q with its pre-norm fused; cross-wo
            # + residual fused; whole MLP (norm→up→gelu→down→residual) in
            # one kernel. Cross attention itself stays XLA: the cross K/V
            # are precomputed per utterance and the t==1 attention is tiny.
            x2 = _gemv(
                _unheads(attn).reshape(b, dm),
                a["wo"],
                bias=a["bo"],
                residual=x2,
                out_dtype=cfg.dtype,
            )
            qx = _heads(
                _gemv(
                    x2,
                    c["wq"],
                    bias=c["bq"],
                    norm="layernorm",
                    norm_scale=layer["ln_x"]["scale"],
                    norm_bias=layer["ln_x"]["bias"],
                    norm_eps=cfg.layer_norm_eps,
                    out_dtype=cfg.dtype,
                )[:, None, :],
                h,
            )
            attn_x = _attend(
                qx, state["cross_k"][li], state["cross_v"][li],
                causal=False, use_flash=use_flash,
            )
            x2 = _gemv(
                _unheads(attn_x).reshape(b, dm),
                c["wo"],
                bias=c["bo"],
                residual=x2,
                out_dtype=cfg.dtype,
            )
            x2 = quant_mlp_int8(
                x2,
                m["w_up"]["q"],
                m["w_up"]["s"],
                m["w_down"]["q"],
                m["w_down"]["s"],
                b_up=m["b_up"],
                b_down=m["b_down"],
                activation="gelu",
                norm="layernorm",
                norm_scale=layer["ln2"]["scale"],
                norm_bias=layer["ln2"]["bias"],
                norm_eps=cfg.layer_norm_eps,
                residual=x2,
                out_dtype=cfg.dtype,
                interpret=_interp,
            )
            x = x2[:, None, :]
            continue

        x = x + _mm(_unheads(attn), a["wo"]) + a["bo"]

        # Cross attention over precomputed encoder K/V (full length, no mask).
        xn = _layer_norm(x, layer["ln_x"], cfg.layer_norm_eps)
        qx = _heads(_mm(xn, c["wq"]) + c["bq"], h)
        attn_x = _attend(
            qx, state["cross_k"][li], state["cross_v"][li],
            causal=False, use_flash=use_flash,
        )
        x = x + _mm(_unheads(attn_x), c["wo"]) + c["bo"]

        xn = _layer_norm(x, layer["ln2"], cfg.layer_norm_eps)
        hmid = jax.nn.gelu(
            (_mm(xn, m["w_up"]) + m["b_up"]).astype(jnp.float32),
            approximate=False,
        ).astype(cfg.dtype)
        x = x + _mm(hmid, m["w_down"]) + m["b_down"]

    if fused and isinstance(params.get("lm_head_q"), dict):
        logits = _gemv(
            x.reshape(b, dm),
            params["lm_head_q"],
            norm="layernorm",
            norm_scale=params["dec_ln"]["scale"],
            norm_bias=params["dec_ln"]["bias"],
            norm_eps=cfg.layer_norm_eps,
            out_dtype=jnp.float32,
        )[:, None, : cfg.vocab_size]
    else:
        x = _layer_norm(x, params["dec_ln"], cfg.layer_norm_eps)
        if "lm_head_q" in params:
            logits = _mm(x, params["lm_head_q"])[..., : cfg.vocab_size]
        else:
            logits = dispatch.matmul(x, params["tok_emb"].T)
    new_state["len"] = start + t
    return logits.astype(jnp.float32), new_state


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_jit(params, cfg: EncDecConfig, mel):
    return encode(params, cfg, mel)


@functools.partial(
    jax.jit, static_argnames=("cfg", "use_flash", "fused"), donate_argnums=(3,)
)
def decode_step(params, cfg: EncDecConfig, tokens, state, *, use_flash=None, fused=None):
    return decode(params, cfg, tokens, state, use_flash=use_flash, fused=fused)


def from_hf_whisper(hf_state: dict, cfg: EncDecConfig, dtype=None) -> dict:
    """Convert a HuggingFace ``WhisperModel`` state dict into this module's
    params pytree (nn.Linear weights [out, in] → transposed; k_proj has no
    bias in Whisper, matching _attn_params). Encoder sinusoidal positions are
    recomputed (verified identical to HF's buffer to ~1e-6)."""
    import numpy as np

    dtype = dtype or cfg.dtype

    from rten_tpu.models.decoder import _as_np

    def g(name):
        key = name if name in hf_state else "model." + name
        return jnp.asarray(_as_np(hf_state[key]), dtype)

    def attn(prefix):
        return {
            "wq": g(prefix + "q_proj.weight").T,
            "bq": g(prefix + "q_proj.bias"),
            "wk": g(prefix + "k_proj.weight").T,
            "wv": g(prefix + "v_proj.weight").T,
            "bv": g(prefix + "v_proj.bias"),
            "wo": g(prefix + "out_proj.weight").T,
            "bo": g(prefix + "out_proj.bias"),
        }

    def ln(prefix):
        return {"scale": g(prefix + "weight"), "bias": g(prefix + "bias")}

    def mlp(prefix):
        return {
            "w_up": g(prefix + "fc1.weight").T,
            "b_up": g(prefix + "fc1.bias"),
            "w_down": g(prefix + "fc2.weight").T,
            "b_down": g(prefix + "fc2.bias"),
        }

    params: dict = {
        "enc_conv1": g("encoder.conv1.weight"),
        "enc_conv1_b": g("encoder.conv1.bias"),
        "enc_conv2": g("encoder.conv2.weight"),
        "enc_conv2_b": g("encoder.conv2.bias"),
        "enc_ln_post": ln("encoder.layer_norm."),
        "tok_emb": g("decoder.embed_tokens.weight"),
        "pos_emb": g("decoder.embed_positions.weight"),
        "dec_ln": ln("decoder.layer_norm."),
        "enc_layers": [],
        "dec_layers": [],
    }
    for i in range(cfg.n_audio_layers):
        p = f"encoder.layers.{i}."
        params["enc_layers"].append(
            {
                "ln1": ln(p + "self_attn_layer_norm."),
                "attn": attn(p + "self_attn."),
                "ln2": ln(p + "final_layer_norm."),
                "mlp": mlp(p),
            }
        )
    for i in range(cfg.n_text_layers):
        p = f"decoder.layers.{i}."
        params["dec_layers"].append(
            {
                "ln1": ln(p + "self_attn_layer_norm."),
                "self_attn": attn(p + "self_attn."),
                "ln_x": ln(p + "encoder_attn_layer_norm."),
                "cross_attn": attn(p + "encoder_attn."),
                "ln2": ln(p + "final_layer_norm."),
                "mlp": mlp(p),
            }
        )
    return params
