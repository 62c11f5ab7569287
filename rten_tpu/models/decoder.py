"""Generic autoregressive transformer decoder (GPT-2-class and Llama-class).

The reference serves GPT-2 / Qwen2 by executing their exported ONNX graphs
op-by-op with a concat-grown KV cache (rten-examples/src/gpt2.rs,
rten-generate). This native implementation is the TPU-first redesign:

- functional params pytree + pure ``forward`` → one jitted XLA program for
  prefill and one for decode (no per-op dispatch)
- preallocated KV cache updated with dynamic_update_slice (no concat-growth
  reallocations — the reference's per-step cache ownership dance,
  generator.rs:565-641, is the anti-pattern this replaces)
- fused Pallas flash attention with per-batch kv_len/q_offset masks
- optional INT8 weight-only quantization through the fused dequant+matmul
  kernel
- config switches cover GPT-2 (learned pos, LayerNorm, GELU) and Llama
  (RoPE, RMSNorm, SwiGLU, GQA)

Sharding (rten_tpu.parallel) maps heads/ffn onto the "model" mesh axis and
batch onto "data"; this module stays sharding-agnostic — pjit handles it.
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
from rten_tpu.kernels.quant_matmul import quantize_weights_int8

# Contiguous-tiled GEMV weight storage (tile_gemv_weights): stripe DMAs
# run linear instead of K strided row reads. The lm_head is ~31% of the
# per-token weight stream on GPT-2-small; on Llama-class models (layers too
# big for the whole-matrix MLP kernel) nearly every projection streams via
# stripes and is eligible. DEFAULT ON at bn=1024 on measured evidence
# (r04 tiledab A/B, interleaved-min over a shared v5e): rowmajor 246.1
# us/step vs tiled-1024 180.4 (0.985 of the streaming roofline); 2048/4096
# tiles measured no better than rowmajor. RTEN_TILE_GEMV=0 disables;
# snapshotted ONCE at import (jit-cache-key discipline, ADVICE r3).
import os as _os


def _parse_tile_gemv(raw: str) -> int | None:
    """Defensive parse (ADVICE r4): non-integer values warn and fall back to
    the default; 0/negative disables; non-multiples of 128 round down (the
    GEMV stripe width must be lane-aligned or Mosaic rejects the DMA)."""
    try:
        v = int(raw)
    except ValueError:
        import warnings

        warnings.warn(
            f"RTEN_TILE_GEMV={raw!r} is not an integer; using default 1024 "
            "(set 0 to disable tiling)",
            stacklevel=2,
        )
        return 1024
    if v <= 0:
        return None
    if v % 128:
        import warnings

        rounded = max(128, v // 128 * 128)
        warnings.warn(
            f"RTEN_TILE_GEMV={v} is not a multiple of 128; rounding to {rounded}",
            stacklevel=2,
        )
        v = rounded
    return v


_TILE_GEMV_BN: int | None = _parse_tile_gemv(_os.environ.get("RTEN_TILE_GEMV", "1024"))


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 50257
    n_layers: int = 12
    n_heads: int = 12
    n_kv_heads: int | None = None  # None → MHA (= n_heads)
    d_model: int = 768
    d_ff: int = 3072
    max_seq: int = 1024
    pos_encoding: str = "learned"  # "learned" | "rope"
    pos_offset: int = 0  # learned-pos table offset (OPT reserves 2 rows)
    norm: str = "layernorm"  # "layernorm" | "rmsnorm"
    activation: str = "gelu"  # "gelu" | "relu" | "swiglu"
    rope_theta: float = 10000.0
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    tie_embeddings: bool = True
    int8_kv: bool = False  # INT8 KV cache (per-token/head scales)

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


GPT2_SMALL = DecoderConfig()
LLAMA_TINY = DecoderConfig(
    vocab_size=32000,
    n_layers=4,
    n_heads=8,
    n_kv_heads=4,
    d_model=512,
    d_ff=1376,
    max_seq=2048,
    pos_encoding="rope",
    norm="rmsnorm",
    activation="swiglu",
    tie_embeddings=False,
)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: DecoderConfig) -> dict:
    """Random-init params pytree (benchmarks use this; real weights come from
    load_params/convert)."""
    keys = iter(jax.random.split(rng, 4 + cfg.n_layers * 12))

    def dense(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(
            cfg.dtype
        )

    d, ff, h, hk, hd = cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.kv_heads, cfg.head_dim
    params: dict[str, Any] = {
        "tok_emb": dense((cfg.vocab_size, d)),
        "final_norm": _norm_params(cfg, d),
        "layers": [],
    }
    if cfg.pos_encoding == "learned":
        params["pos_emb"] = dense((cfg.max_seq, d))
    if not cfg.tie_embeddings:
        params["lm_head"] = dense((d, cfg.vocab_size))
    for _ in range(cfg.n_layers):
        layer = {
            "ln1": _norm_params(cfg, d),
            "ln2": _norm_params(cfg, d),
            "wq": dense((d, h * hd)),
            "wk": dense((d, hk * hd)),
            "wv": dense((d, hk * hd)),
            "wo": dense((h * hd, d)),
        }
        if cfg.activation == "swiglu":
            layer["w_gate"] = dense((d, ff))
            layer["w_up"] = dense((d, ff))
            layer["w_down"] = dense((ff, d))
        else:
            layer["w_up"] = dense((d, ff))
            layer["b_up"] = jnp.zeros((ff,), cfg.dtype)
            layer["w_down"] = dense((ff, d))
            layer["b_down"] = jnp.zeros((d,), cfg.dtype)
            layer["bq"] = jnp.zeros((h * hd,), cfg.dtype)
            layer["bk"] = jnp.zeros((hk * hd,), cfg.dtype)
            layer["bv"] = jnp.zeros((hk * hd,), cfg.dtype)
            layer["bo"] = jnp.zeros((d,), cfg.dtype)
        params["layers"].append(layer)
    return params


def _norm_params(cfg: DecoderConfig, d: int) -> dict:
    p = {"scale": jnp.ones((d,), cfg.dtype)}
    if cfg.norm == "layernorm":
        p["bias"] = jnp.zeros((d,), cfg.dtype)
    return p


def quantize_params_int8(
    params: dict, *, fuse: bool = True, tile_bn: int | None | str = "env"
) -> dict:
    """Weight-only INT8: every ≥2-D projection matrix becomes
    {"q": int8, "s": f32 per-out-channel scales} (BASELINE.json INT8 path).

    Awkward output dims (vocab) are zero-padded to 128 multiples HERE, once —
    padding inside a traced decode step would copy the whole matrix every
    step. ``_proj`` slices the padded columns back off. Tied embeddings get a
    dedicated quantized ``lm_head_q`` (the gather table itself stays dense).

    ``fuse=False`` skips the qkv / gate|up concatenation — required for
    explicit tensor parallelism (parallel/tp.py), where the concatenated N
    layout would interleave q|k|v across column shards.

    Every small per-channel vector (int8 scales, biases, norm scale/bias)
    is stored 2-D ``[1, N]`` at rest: the kernels consume them as [1, N]
    VMEM tiles, and a 1-D [N] array would need a rank-changing relayout
    (1-D T(1024) tiling → 2-D T(2,128)) that XLA re-runs INSIDE the decode
    scan body every step — measured ~110 reshape ops ≈ 20-30 µs/step on
    GPT-2-small, the single largest non-kernel cost. ``v.reshape(1, -1)``
    on an already-2-D vector traces to no HLO op at all."""

    def q(leaf, dense_dtype=None):
        if isinstance(leaf, dict):
            return leaf
        arr = np.asarray(leaf, np.float32)
        if arr.ndim == 2 and arr.size >= 1 << 16:
            pad_k = -arr.shape[0] % 128
            # Awkward output dims (vocab) pad to a full GEMV stripe so the
            # decode kernel streams 1024-wide blocks instead of falling back
            # to the largest small divisor.
            pad_n = -arr.shape[1] % (1024 if arr.shape[1] >= 8192 else 128)
            if pad_k or pad_n:
                arr = np.pad(arr, ((0, pad_k), (0, pad_n)))
            qw, s = quantize_weights_int8(arr, axis=-1)
            return {"q": jnp.asarray(qw), "s": jnp.asarray(s).reshape(1, -1)}
        if arr.ndim == 1:
            return jnp.asarray(leaf).reshape(1, -1)  # see docstring
        if dense_dtype is not None:
            # Sub-threshold fused concat (built in f32 numpy): keep the
            # MODEL dtype, or downstream activations silently widen to f32
            # and dtype-mismatch the bf16 KV cache.
            return jnp.asarray(arr, dense_dtype)
        return leaf

    def walk(node, key=""):
        if isinstance(node, dict):
            if set(node) == {"q", "s"}:
                return node
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, key) for v in node]
        if key in ("tok_emb", "pos_emb"):
            # Embeddings are gathered, not matmul'd — keep them dense.
            return node
        return q(node)

    if tile_bn == "env":
        tile_bn = _TILE_GEMV_BN

    out = walk(params)
    if "lm_head" not in out:
        # Tied embeddings: quantize the logits projection separately so the
        # decode hot loop reads int8 (the bf16 tied matrix would otherwise be
        # half of all per-token HBM traffic).
        out["lm_head_q"] = q(
            np.asarray(params["tok_emb"], np.float32).T,
            dense_dtype=params["tok_emb"].dtype,
        )

    if not fuse:
        # TP packs (parallel/tp.py) are sharded along N by the caller —
        # never tiled here (the shard-side kernels take 2-D shards).
        return out

    # Fuse the Q/K/V projections into one kernel launch per layer (and
    # gate|up for SwiGLU) — at decode batch sizes per-kernel overhead beats
    # bandwidth as the bottleneck, so fewer, larger kernels win.
    for src, fused in zip(params["layers"], out["layers"]):
        wq, wk, wv = (np.asarray(src[k], np.float32) for k in ("wq", "wk", "wv"))
        if (wq.shape[1] + wk.shape[1] + wv.shape[1]) % 128 == 0:
            fused["wqkv"] = q(
                np.concatenate([wq, wk, wv], axis=1), dense_dtype=src["wq"].dtype
            )
            for k in ("wq", "wk", "wv"):
                fused.pop(k, None)
            if "bq" in src:
                fused["bqkv"] = jnp.concatenate(
                    [jnp.asarray(src[k]).reshape(-1) for k in ("bq", "bk", "bv")]
                ).reshape(1, -1)
                for k in ("bq", "bk", "bv"):
                    fused.pop(k, None)
        if "w_gate" in src:
            wg, wu = np.asarray(src["w_gate"], np.float32), np.asarray(src["w_up"], np.float32)
            if (wg.shape[1] * 2) % 128 == 0:
                fused["w_gu"] = q(
                    np.concatenate([wg, wu], axis=1), dense_dtype=src["w_gate"].dtype
                )
                fused.pop("w_gate", None)
                fused.pop("w_up", None)

    if tile_bn:
        _tile_gemv_packs(out, tile_bn)
    build_decode_slabs(out)
    return out


def build_decode_slabs(qparams: dict, max_bytes: int | None = None) -> dict:
    """Stack every layer's w_up / w_down / wqkv int8 matrices into whole-
    stack ``[L, K, N]`` slabs (``qparams["slabs"]``), kept ALONGSIDE the
    per-layer packs.

    Why: the megakernel decode path (RTEN_DECODE_FUSE=mega) streams these
    from HBM in-kernel. As per-layer matrices (1.8-2.4 MB each) XLA's
    memory-space assignment "helpfully" re-prefetches them into VMEM every
    scan iteration — 85 MB of loop-invariant weights cannot stay resident,
    so the core stalls ~60 us/step on exposed copy waits (profiled,
    BENCH r5 notes). A 20-30 MB slab is unprefetchable; the kernel's own
    double-buffered DMA overlaps the stream under the attention loop.

    Slabs duplicate the layer weights in HBM (~85 MB on GPT-2-small);
    capped at RTEN_MEGA_SLABS_MAX bytes (default 2 GiB) — set 0 to skip."""
    import os

    if max_bytes is None:
        try:
            max_bytes = int(os.environ.get("RTEN_MEGA_SLABS_MAX", str(2 << 30)))
        except ValueError:
            max_bytes = 2 << 30
    layers = qparams.get("layers") or []
    if not layers or max_bytes <= 0:
        return qparams
    slabs = {}
    for key, members in (
        ("w_up", layers),
        ("w_down", layers),
        # layer li's megakernel computes layer li+1's qkv (next_qkv slot):
        # the qkv slab is SHIFTED so one layer_idx addresses all three.
        ("wqkv_next", layers[1:]),
    ):
        packs = [l.get(key.replace("_next", "")) for l in members]
        if not packs or not all(
            isinstance(p, dict) and p.get("q") is not None and p["q"].ndim == 2
            for p in packs
        ):
            continue
        shapes = {p["q"].shape for p in packs}
        if len(shapes) != 1:
            continue
        slabs[key] = jnp.stack([p["q"] for p in packs])
    total = sum(int(s.size) for s in slabs.values())
    if "w_up" in slabs and "w_down" in slabs and total <= max_bytes:
        qparams["slabs"] = slabs
    return qparams


def _tile_gemv_packs(out: dict, tile_bn: int) -> None:
    """Re-lay every stripe-streamed GEMV pack as contiguous [S, K, bn]
    tiles (in place). Eligibility mirrors forward's kernel selection:

    - ``lm_head_q``/``lm_head``: always (consumed by the GEMV / fused-argmax
      kernel; tile padding is sliced off via out_dim).
    - layer ``w_up``/``w_down`` (GELU): only when the whole-matrix-VMEM MLP
      kernel does NOT apply (mlp_fused_supported) — that kernel's one-shot
      DMA is already linear.
    - layer ``wqkv``: only when it can't ride the MLP kernel's next_qkv slot.
    - SwiGLU ``w_gu``/``w_gate``/``w_up``: always (no MLP-kernel path).
    - ``wo``: never — it feeds the fused-wo decode-attention kernel.

    Layer packs use divisor-only tile widths (pick_block) so segment
    slicing (q|k|v, gate|up) sees unchanged column positions."""
    from rten_tpu.kernels.matmul_pallas import pick_block
    from rten_tpu.kernels.quant_matmul import mlp_fused_supported, tile_gemv_pack

    def tile_divisor(pack):
        if not (isinstance(pack, dict) and pack.get("q") is not None):
            return pack
        if pack["q"].ndim != 2:
            return pack
        k, n = pack["q"].shape
        bn = pick_block(n, tile_bn)
        if bn >= n or n % bn:
            return pack  # single stripe: whole-matrix DMA is already linear
        return tile_gemv_pack(pack, bn)

    head_key = "lm_head_q" if "lm_head_q" in out else "lm_head"
    if (
        isinstance(out.get(head_key), dict)
        and out[head_key]["q"].ndim == 2
        # Single-stripe packs (vocab ≤ tile_bn) gain no DMA linearity and
        # would stream pure zero-pad bytes — mirror tile_divisor's early-out
        # (ADVICE r4). They are also unshardable along the model axis (S=1).
        and out[head_key]["q"].shape[1] > tile_bn
    ):
        out[head_key] = tile_gemv_pack(out[head_key], tile_bn)

    for li, layer in enumerate(out.get("layers", [])):
        swiglu = "w_gu" in layer or "w_gate" in layer
        for key in ("w_gu", "w_gate"):
            if isinstance(layer.get(key), dict):
                layer[key] = tile_divisor(layer[key])
        if swiglu and isinstance(layer.get("w_up"), dict):
            layer["w_up"] = tile_divisor(layer["w_up"])
        wu, wd = layer.get("w_up"), layer.get("w_down")
        if (
            not swiglu
            and isinstance(wu, dict)
            and isinstance(wd, dict)
            and wu["q"].ndim == 2
        ):
            d, ff = wu["q"].shape
            if not mlp_fused_supported(d, ff):
                layer["w_up"] = tile_divisor(wu)
                layer["w_down"] = tile_divisor(wd)
        wqkv = layer.get("wqkv")
        if isinstance(wqkv, dict) and wqkv["q"].ndim == 2:
            d, qkv_dim = wqkv["q"].shape
            ff = (
                wu["q"].shape[1]
                if (not swiglu and isinstance(wu, dict) and wu["q"].ndim == 2)
                else None
            )
            # Layer 0's qkv is always a GEMV (_fproj) — there is no previous
            # layer's MLP kernel for it to ride as next_qkv.
            rides_mlp = (
                li > 0
                and not swiglu
                and ff is not None
                and mlp_fused_supported(d, ff, qkv_dim)
            )
            if not rides_mlp:
                layer["wqkv"] = tile_divisor(wqkv)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_cache(cfg: DecoderConfig, batch: int, max_len: int | None = None) -> dict:
    """Preallocated KV cache: per-layer k/v arrays [batch, kv_heads, max_len,
    head_dim] + per-sequence lengths. Per-layer leaves (not one stacked
    array) so each step's dynamic_update_slice aliases its own donated
    buffer — a stacked layout would force XLA to materialize a full cache
    copy per step. Zero reallocation during generation.

    With cfg.int8_kv the k/v arrays are int8 with per-(token, head) f32
    scales stored in the decode kernel's packed layout (pack_kv_scales) —
    halves KV HBM traffic AND the scan-carry copy bytes."""
    max_len = max_len or cfg.max_seq
    if cfg.int8_kv:
        max_len = -(-max_len // 256) * 256  # int8 decode-kernel alignment
    hd = cfg.head_dim
    foldable = hd <= 128 and 128 % hd == 0 and (max_len * hd) % 128 == 0
    if foldable:
        # FOLDED storage [B, Hk, S·D/128, 128]: a 128-lane minor dim keeps
        # XLA on the row-major layout — unfolded [.., S, 64] arrays get a
        # transposed layout and a full-cache conversion copy around every
        # aliased decode-kernel call (measured 48 copies ≈ 140 µs/step on
        # GPT-2-small). Logical [B, Hk, S, D] views are free reshapes.
        shape = (batch, cfg.kv_heads, max_len * hd // 128, 128)
    else:
        shape = (batch, cfg.kv_heads, max_len, hd)
    if cfg.int8_kv:
        from rten_tpu.kernels.decode_attention import _LANES

        s_f = max_len * hd // _LANES
        return {
            "k": [jnp.zeros(shape, jnp.int8) for _ in range(cfg.n_layers)],
            "v": [jnp.zeros(shape, jnp.int8) for _ in range(cfg.n_layers)],
            "k_scale": [
                jnp.zeros((batch, cfg.kv_heads, 8, s_f), jnp.float32)
                for _ in range(cfg.n_layers)
            ],
            "v_scale": [
                jnp.zeros((batch, cfg.kv_heads, 8, s_f), jnp.float32)
                for _ in range(cfg.n_layers)
            ],
            "len": jnp.zeros((batch,), jnp.int32),
        }
    return {
        "k": [jnp.zeros(shape, cfg.dtype) for _ in range(cfg.n_layers)],
        "v": [jnp.zeros(shape, cfg.dtype) for _ in range(cfg.n_layers)],
        "len": jnp.zeros((batch,), jnp.int32),
    }


def cache_seq_len(leaf, head_dim: int) -> int:
    """Logical max sequence length of a cache leaf (folded or unfolded)."""
    if leaf.shape[-1] == 128 and head_dim != 128:
        return leaf.shape[2] * 128 // head_dim
    return leaf.shape[2]


def _unfold(leaf, head_dim: int):
    b, hk = leaf.shape[:2]
    return leaf.reshape(b, hk, cache_seq_len(leaf, head_dim), head_dim)


def _fold_like(updated, like):
    return updated.reshape(like.shape)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _norm(x, p, cfg: DecoderConfig):
    xf = x.astype(jnp.float32)
    if cfg.norm == "rmsnorm":
        inv = jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + cfg.layer_norm_eps)
        return (xf * inv).astype(x.dtype) * p["scale"]
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
    return out.astype(x.dtype) * p["scale"] + p["bias"]


def _proj(x, w, b=None, out_dim: int | None = None, activation: str | None = None):
    """x: [..., K] @ w (+b, +activation); w is either a dense matrix or a
    {"q","s"} int8 pack (pre-padded to 128 multiples — ``out_dim`` slices
    padding back off). On the int8 TPU path, bias and activation fuse into
    the Pallas kernel epilogue."""
    if isinstance(w, dict):
        from rten_tpu.kernels import quant_matmul as qm
        from rten_tpu.kernels.quant_matmul import gemv_weight_kn, quant_matmul_int8

        shape = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        w_k, n_kernel = gemv_weight_kn(w["q"])
        pad_k = w_k - x2.shape[-1]
        if pad_k:
            x2 = jnp.pad(x2, ((0, 0), (0, pad_k)))
        unpadded = out_dim is None or out_dim == n_kernel
        epilogue_fused = dispatch.on_tpu() and unpadded
        # RTEN_W_CONVERT=w8a8 flips the whole quantized model onto the
        # s8 × s8 int8-MXU contract (dynamic per-row activations — the
        # reference's DynamicQuantizeLinear→QLinearMatMul semantics):
        # decode via the GEMV/MLP kernels' w_convert default, prefill here.
        # Measured 275 vs 175 TF/s (w8a8probe vs the dequant kernel).
        # Tiled [S, K, bn] packs keep the dequant path (the w8a8 matmul is
        # 2-D row-major; tiling exists for the decode DMA stream).
        w8a8 = qm._W_CONVERT_DEFAULT == "w8a8" and w["q"].ndim == 2
        if epilogue_fused and w8a8:
            out = qm.quant_matmul_w8a8(x2, w["q"], w["s"], b, activation=activation)
        elif epilogue_fused:
            out = quant_matmul_int8(x2, w["q"], w["s"], b, activation=activation)
        elif w8a8 and dispatch.on_tpu():
            out = qm.quant_matmul_w8a8(x2, w["q"], w["s"])
        elif dispatch.on_tpu():
            out = quant_matmul_int8(x2, w["q"], w["s"])
        else:
            w_q = w["q"]
            if w_q.ndim == 3:
                from rten_tpu.kernels.quant_matmul import untile_gemv_weights

                w_q = untile_gemv_weights(w_q)
            out = x2 @ (w_q.astype(x.dtype) * w["s"].astype(x.dtype))
        out = out.reshape(*shape, -1)
        if out_dim is not None and out.shape[-1] != out_dim:
            out = out[..., :out_dim]
        if not epilogue_fused:
            if b is not None:
                out = out + b
            out = _apply_activation(out, activation, x.dtype)
        return out.astype(x.dtype)
    out = dispatch.matmul(x, w)
    if out_dim is not None and out.shape[-1] != out_dim:
        out = out[..., :out_dim]
    if b is not None:
        out = out + b
    return _apply_activation(out, activation, x.dtype)


def _apply_activation(out, activation, dtype):
    """XLA-path activation matching the kernels' _ACTIVATIONS semantics
    (erf GELU, not tanh) so fused/unfused paths agree numerically."""
    if activation is None or activation == "swiglu":
        return out
    if activation == "gelu":
        return jax.nn.gelu(out.astype(jnp.float32), approximate=False).astype(dtype)
    if activation == "relu":
        return jax.nn.relu(out).astype(dtype)
    from rten_tpu.kernels.matmul_pallas import _ACTIVATIONS

    return _ACTIVATIONS[activation](out.astype(jnp.float32)).astype(dtype)


def _rope(x, positions, theta: float):
    """Rotary embeddings. x: [B, H, T, D], positions: [B, T]."""
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = positions[:, None, :, None].astype(jnp.float32) * freqs  # [B,1,T,D/2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def forward(
    params: dict,
    cfg: DecoderConfig,
    tokens: jax.Array,  # [B, T] int32
    cache: dict | None = None,
    *,
    use_flash: bool | None = None,
    lm_head_mode: str = "logits",  # "argmax": return greedy tokens [B, T]
) -> tuple[jax.Array, dict | None]:
    """Returns (logits [B, T, vocab], updated cache). With a cache, tokens are
    appended at cache["len"]; without, this is a plain full-sequence forward.

    ``lm_head_mode="argmax"`` returns int32 greedy tokens instead of logits;
    on the fused decode path the argmax runs inside the lm_head GEMV kernel
    (the 50k-wide logits row never leaves VMEM — the greedy sampler costs
    nothing beyond the weight stream)."""
    b, t = tokens.shape
    h, hk, hd = cfg.n_heads, cfg.kv_heads, cfg.head_dim
    if use_flash is None:
        use_flash = dispatch.on_tpu()

    x = jnp.take(params["tok_emb"], tokens, axis=0)  # [B, T, D]
    if cache is not None:
        start = cache["len"]  # [B]
        positions = start[:, None] + jnp.arange(t)[None, :]
    else:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    if cfg.pos_encoding == "learned":
        x = x + jnp.take(params["pos_emb"], positions + cfg.pos_offset, axis=0)

    # Decode fast path: at ≤8 total rows the int8 GEMV kernel fuses the
    # pre-norm prologue and bias/activation/residual epilogue, so a whole
    # transformer block runs as a handful of weight-streaming kernels with
    # no intermediate XLA elementwise launches. RTEN_DECODE_FUSE=0 disables
    # (env-flag escape hatch, like the reference's RTEN_USE_POOL,
    # src/graph.rs:961).
    import os

    m_rows = b * t
    _fuse_mode = os.environ.get("RTEN_DECODE_FUSE", "1")
    fuse = dispatch.on_tpu() and m_rows <= 8 and _fuse_mode != "0"
    fuse_norm = fuse and _fuse_mode != "epi"

    # (An RTEN_PIN_HBM experiment using pltpu.with_memory_space_constraint
    # was tried against XLA's per-iteration VMEM weight re-prefetch and
    # fails at the pallas jit boundary — whole-stack weight slabs defeat
    # the prefetch by size instead; see build_decode_slabs.)

    def _fproj(
        src, w, bias=None, *, activation=None, norm_p=None, residual=None, out_dim=None
    ):
        if norm_p is not None and not fuse_norm:
            src = _norm(src, norm_p, cfg)
            norm_p = None
        from rten_tpu.kernels.quant_matmul import gemv_weight_kn

        if (
            fuse
            and isinstance(w, dict)
            and gemv_weight_kn(w["q"])[0] == src.shape[-1]
            and (residual is None or gemv_weight_kn(w["q"])[1] == residual.shape[-1])
        ):
            from rten_tpu.kernels.quant_matmul import quant_gemv_int8

            x2 = src.reshape(m_rows, src.shape[-1])
            r2 = residual.reshape(m_rows, -1) if residual is not None else None
            out = quant_gemv_int8(
                x2,
                w["q"],
                w["s"],
                bias,
                activation=activation,
                norm=cfg.norm if norm_p is not None else None,
                norm_scale=norm_p["scale"] if norm_p is not None else None,
                norm_bias=norm_p.get("bias") if norm_p is not None else None,
                norm_eps=cfg.layer_norm_eps,
                residual=r2,
                out_dtype=src.dtype,
            )
            out = out.reshape(*src.shape[:-1], out.shape[-1])
            if out_dim is not None and out.shape[-1] != out_dim:
                out = out[..., :out_dim]
            return out
        xn = _norm(src, norm_p, cfg) if norm_p is not None else src
        out = _proj(xn, w, bias, out_dim=out_dim, activation=activation)
        if residual is not None:
            out = out + residual
        return out

    new_k_layers = []
    new_v_layers = []
    new_ks_layers = []
    new_vs_layers = []
    qkv_pending = None  # produced by the previous layer's fused MLP kernel
    for li, layer in enumerate(params["layers"]):
        resid = x
        xn = None if fuse else _norm(x, layer["ln1"], cfg)
        qkv_flat = None
        if qkv_pending is not None:
            # This layer's qkv was already computed inside the PREVIOUS
            # layer's MLP kernel (pre-norm included) — one fewer kernel
            # launch per layer on the decode path.
            qkv_dim = (h + 2 * hk) * hd
            qkv = qkv_pending.reshape(b, t, -1)[..., :qkv_dim]
            qkv_pending = None
            qkv_flat = qkv
            q, k, v = (
                qkv[..., : h * hd],
                qkv[..., h * hd : (h + hk) * hd],
                qkv[..., (h + hk) * hd :],
            )
        elif "wqkv" in layer:
            qkv_dim = (h + 2 * hk) * hd
            qkv = _fproj(
                x, layer["wqkv"], layer.get("bqkv"), norm_p=layer["ln1"], out_dim=qkv_dim
            ) if fuse else _proj(xn, layer["wqkv"], layer.get("bqkv"), out_dim=qkv_dim)
            qkv_flat = qkv
            q, k, v = (
                qkv[..., : h * hd],
                qkv[..., h * hd : (h + hk) * hd],
                qkv[..., (h + hk) * hd :],
            )
        elif fuse:
            q = _fproj(x, layer["wq"], layer.get("bq"), norm_p=layer["ln1"])
            k = _fproj(x, layer["wk"], layer.get("bk"), norm_p=layer["ln1"])
            v = _fproj(x, layer["wv"], layer.get("bv"), norm_p=layer["ln1"])
        else:
            q = _proj(xn, layer["wq"], layer.get("bq"))
            k = _proj(xn, layer["wk"], layer.get("bk"))
            v = _proj(xn, layer["wv"], layer.get("bv"))
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, hk, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, hk, hd).transpose(0, 2, 1, 3)
        if cfg.pos_encoding == "rope":
            q = _rope(q, positions, cfg.rope_theta)
            k = _rope(k, positions, cfg.rope_theta)

        from rten_tpu.kernels.decode_attention import (
            decode_attention,
            decode_attention_supported,
        )

        paged = cache is not None and "k_pages" in cache
        int8_kv = cfg.int8_kv and cache is not None and not paged
        if int8_kv:
            from rten_tpu.kernels.decode_attention import (
                decode_attention_int8,
                decode_attention_int8_supported,
                pack_kv_scales,
                unpack_kv_scales,
            )
        s_max_li = (
            cache_seq_len(cache["k"][li], hd)
            if cache is not None and not paged
            else 0
        )
        decode_fast = (
            use_flash
            and cache is not None
            and not paged
            and not int8_kv
            and t == 1
            and decode_attention_supported(hd, s_max_li)
        )
        int8_fast = (
            int8_kv
            and use_flash
            and t == 1
            and decode_attention_int8_supported(hd, s_max_li)
        )
        if paged:
            # Paged KV pool (serve/paged.py): pages are non-contiguous; the
            # Pallas kernel gathers them via the page table and appends this
            # token's k/v in place (interpret mode off-TPU for tests). INT8
            # pools carry per-(token, head) scale pages alongside.
            assert t == 1, "paged cache supports single-token decode only"
            if "k_scale_pages" in cache:
                from rten_tpu.kernels.paged_attention import (
                    paged_decode_attention_int8,
                )

                attn, kp, vp, ksp, vsp = paged_decode_attention_int8(
                    q,
                    cache["k_pages"][li],
                    cache["v_pages"][li],
                    cache["k_scale_pages"][li],
                    cache["v_scale_pages"][li],
                    cache["page_table"],
                    start,
                    k,
                    v,
                    interpret=not dispatch.on_tpu(),
                )
                new_ks_layers.append(ksp)
                new_vs_layers.append(vsp)
            else:
                from rten_tpu.kernels.paged_attention import paged_decode_attention

                attn, kp, vp = paged_decode_attention(
                    q,
                    cache["k_pages"][li],
                    cache["v_pages"][li],
                    cache["page_table"],
                    start,
                    k,
                    v,
                    interpret=not dispatch.on_tpu(),
                )
            new_k_layers.append(kp)
            new_v_layers.append(vp)
        elif int8_fast:
            # Single-token decode over the INT8 cache: quantize+append this
            # token in-kernel, scales streamed beside the payload — the
            # cache never materializes in bf16.
            attn, k_c, v_c, ks_c, vs_c = decode_attention_int8(
                q,
                cache["k"][li],
                cache["v"][li],
                cache["k_scale"][li],
                cache["v_scale"][li],
                start,
                k,
                v,
            )
            new_k_layers.append(k_c)
            new_v_layers.append(v_c)
            new_ks_layers.append(ks_c)
            new_vs_layers.append(vs_c)
        elif int8_kv:
            # Eager/prefill INT8 path (reference full-dequant semantics):
            # quantize per token, splice values + scales, attend over the
            # dequantized view. Folded storage is unfolded for the splice
            # and refolded for the carry.
            from rten_tpu.models.encoder_decoder import dequantize_kv, quantize_kv

            k_q, k_s = quantize_kv(k)
            v_q, v_s = quantize_kv(v)
            k_cache = _update_cache(_unfold(cache["k"][li], hd), k_q, start)
            v_cache = _update_cache(_unfold(cache["v"][li], hd), v_q, start)
            ks_c = pack_kv_scales(
                _update_cache(
                    unpack_kv_scales(cache["k_scale"][li], hd), k_s, start
                ),
                hd,
            )
            vs_c = pack_kv_scales(
                _update_cache(
                    unpack_kv_scales(cache["v_scale"][li], hd), v_s, start
                ),
                hd,
            )
            new_k_layers.append(_fold_like(k_cache, cache["k"][li]))
            new_v_layers.append(_fold_like(v_cache, cache["v"][li]))
            new_ks_layers.append(ks_c)
            new_vs_layers.append(vs_c)
            kv_len = start + t
            attn_in = (
                q,
                dequantize_kv(k_cache, unpack_kv_scales(ks_c, hd), q.dtype),
                dequantize_kv(v_cache, unpack_kv_scales(vs_c, hd), q.dtype),
            )
            q_offset = start
        elif decode_fast:
            # Single-token decode: the prefix-bounded kernel appends this
            # token's k/v into the cache IN-KERNEL (aliased buffers — no XLA
            # dynamic_update_slice, which costs ~70 µs/step in carry copies)
            # and reads only the valid ceil(kv_len/block) cache blocks.
            wo_fused = fuse and isinstance(layer.get("wo"), dict) and layer[
                "wo"
            ]["q"].shape == (h * hd, cfg.d_model)
            # Whole-block megakernel: attention + wo + MLP (+ next layer's
            # qkv) in ONE Pallas kernel — the MLP weights stream from HBM
            # UNDER the attention loop, removing a kernel launch + exposed
            # DMA round-trip per layer. RTEN_DECODE_FUSE=mega opts in
            # (measured A/B gates the default).
            mega_mlp = mega_next = None
            if (
                wo_fused
                and _fuse_mode == "mega"
                and fuse_norm
                and b == 1
                and cfg.activation in ("gelu", "relu", "silu")
                and isinstance(layer.get("w_up"), dict)
                and isinstance(layer.get("w_down"), dict)
                and layer["w_up"]["q"].shape == (cfg.d_model, cfg.d_ff)
                and layer["w_down"]["q"].shape == (cfg.d_ff, cfg.d_model)
            ):
                from rten_tpu.kernels.decode_attention import (
                    mega_block_supported,
                )

                nxt = (
                    params["layers"][li + 1]
                    if li + 1 < len(params["layers"])
                    else None
                )
                # Whole-stack [L, K, N] slabs when packed (production layout
                # — defeats XLA's per-iteration VMEM re-prefetch of the
                # loop-invariant weights; see build_decode_slabs).
                slabs = params.get("slabs") or {}
                qkv_dim = (h + 2 * hk) * hd
                if (
                    nxt is not None
                    and isinstance(nxt.get("wqkv"), dict)
                    and nxt["wqkv"]["q"].shape == (cfg.d_model, qkv_dim)
                ):
                    mega_next = (
                        slabs["wqkv_next"]
                        if "wqkv_next" in slabs
                        else nxt["wqkv"]["q"],
                        nxt["wqkv"]["s"],
                        nxt.get("bqkv"),
                        nxt["ln1"]["scale"],
                        nxt["ln1"].get("bias"),
                    )
                if mega_block_supported(
                    cfg.d_model,
                    cfg.d_ff,
                    qkv_dim if mega_next is not None else 0,
                    hk,
                    hd,
                    s_max_li,
                    kv_bytes=cache["k"][li].dtype.itemsize,
                ):
                    mega_mlp = (
                        slabs["w_up"] if "w_up" in slabs else layer["w_up"]["q"],
                        layer["w_up"]["s"],
                        slabs["w_down"]
                        if "w_down" in slabs
                        else layer["w_down"]["q"],
                        layer["w_down"]["s"],
                        layer.get("b_up"),
                        layer.get("b_down"),
                        layer["ln2"]["scale"],
                        layer["ln2"].get("bias"),
                    )
                else:
                    mega_next = None
            if wo_fused:
                # ... plus the output projection + residual in the SAME
                # kernel: the attention vector never leaves VMEM. MHA models
                # without RoPE hand the kernel the flat qkv PACKED as one
                # operand — the q/k/v split plus per-tensor reshape/pad
                # staging (~6 tiny XLA ops per layer) collapses to a single
                # fusion, and the dead split ops DCE away.
                packed_ok = (
                    qkv_flat is not None
                    and hk == h
                    and cfg.pos_encoding != "rope"
                )
                mega_kw = (
                    dict(
                        mlp=mega_mlp,
                        next_qkv=mega_next,
                        activation=cfg.activation,
                        norm=cfg.norm,
                        norm_eps=cfg.layer_norm_eps,
                        layer_idx=li,
                    )
                    if mega_mlp is not None
                    else {}
                )
                if packed_ok:
                    # [B,3,Hk,1,D]; decode_attention lane/sublane-pads it to
                    # the 128-minor operand in ONE row-major staging fusion.
                    pk = qkv_flat.reshape(b, 3, hk, 1, hd)
                    res_attn = decode_attention(
                        None,
                        cache["k"][li],
                        cache["v"][li],
                        start,
                        None,
                        None,
                        layer["wo"]["q"],
                        layer["wo"]["s"],
                        layer.get("bo"),
                        resid.reshape(b, cfg.d_model),
                        packed_qkv=pk,
                        **mega_kw,
                    )
                else:
                    res_attn = decode_attention(
                        q,
                        cache["k"][li],
                        cache["v"][li],
                        start,
                        k,
                        v,
                        layer["wo"]["q"],
                        layer["wo"]["s"],
                        layer.get("bo"),
                        resid.reshape(b, cfg.d_model),
                        **mega_kw,
                    )
                if mega_mlp is not None and mega_next is not None:
                    hidden, qkv_pending, k_cache, v_cache = res_attn
                else:
                    hidden, k_cache, v_cache = res_attn
                attn = None
                x = hidden.reshape(b, t, cfg.d_model).astype(x.dtype)
                if mega_mlp is not None:
                    # The whole block (incl. MLP) ran in the kernel above.
                    new_k_layers.append(k_cache)
                    new_v_layers.append(v_cache)
                    continue
            else:
                attn, k_cache, v_cache = decode_attention(
                    q, cache["k"][li], cache["v"][li], start, k, v
                )
            new_k_layers.append(k_cache)
            new_v_layers.append(v_cache)
        elif cache is not None:
            # Per-batch scatter at each sequence's own length; per-layer
            # leaves let XLA alias the donated buffers (true in-place
            # update). Folded storage is unfolded for splice + attention and
            # refolded for the carry.
            k_cache = _update_cache(_unfold(cache["k"][li], hd), k, start)
            v_cache = _update_cache(_unfold(cache["v"][li], hd), v, start)
            new_k_layers.append(_fold_like(k_cache, cache["k"][li]))
            new_v_layers.append(_fold_like(v_cache, cache["v"][li]))
            kv_len = start + t
            attn_in = (q, k_cache, v_cache)
            q_offset = start
        else:
            kv_len = jnp.full((b,), t, jnp.int32)
            attn_in = (q, k, v)
            q_offset = jnp.zeros((b,), jnp.int32)

        if paged or decode_fast or int8_fast:
            pass  # attn computed above (or fully projected: attn is None)
        elif use_flash:
            attn = flash_attention(
                *attn_in, causal=True, q_offset=q_offset, kv_len=kv_len
            )
        else:
            attn = attention_reference(
                *attn_in, causal=True, q_offset=q_offset, kv_len=kv_len
            )
        if attn is not None:
            attn = attn.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
            x = _fproj(attn, layer["wo"], layer.get("bo"), residual=resid)

        resid = x
        xn = None if fuse else _norm(x, layer["ln2"], cfg)
        if cfg.activation == "swiglu":
            if "w_gu" in layer:
                gu = (
                    _fproj(x, layer["w_gu"], norm_p=layer["ln2"], out_dim=2 * cfg.d_ff)
                    if fuse
                    else _proj(xn, layer["w_gu"], out_dim=2 * cfg.d_ff)
                )
                gate, up = gu[..., : cfg.d_ff], gu[..., cfg.d_ff :]
            elif fuse:
                gate = _fproj(x, layer["w_gate"], norm_p=layer["ln2"])
                up = _fproj(x, layer["w_up"], norm_p=layer["ln2"])
            else:
                gate = _proj(xn, layer["w_gate"])
                up = _proj(xn, layer["w_up"])
            ff = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
        else:
            from rten_tpu.kernels.quant_matmul import (
                mlp_fused_supported,
                quant_mlp_int8,
            )

            mlp_one_kernel = (
                fuse
                and fuse_norm
                and isinstance(layer["w_up"], dict)
                and isinstance(layer["w_down"], dict)
                and layer["w_up"]["q"].shape == (cfg.d_model, cfg.d_ff)
                and layer["w_down"]["q"].shape == (cfg.d_ff, cfg.d_model)
                and mlp_fused_supported(cfg.d_model, cfg.d_ff)
            )
            if mlp_one_kernel:
                # Whole MLP (pre-norm → up → GELU → down → +residual) as ONE
                # kernel: both int8 matrices resident in VMEM, the FF-wide
                # intermediate never touches HBM. When the NEXT layer's qkv
                # projection fits alongside, it fuses in too and this loop's
                # next iteration starts from qkv_pending.
                nxt = (
                    params["layers"][li + 1]
                    if li + 1 < len(params["layers"])
                    else None
                )
                qkv_dim = (h + 2 * hk) * hd
                next_qkv = None
                if (
                    nxt is not None
                    and isinstance(nxt.get("wqkv"), dict)
                    and nxt["wqkv"]["q"].shape == (cfg.d_model, qkv_dim)
                    and mlp_fused_supported(cfg.d_model, cfg.d_ff, qkv_dim)
                ):
                    next_qkv = (
                        nxt["wqkv"]["q"],
                        nxt["wqkv"]["s"],
                        nxt.get("bqkv"),
                        nxt["ln1"]["scale"],
                        nxt["ln1"].get("bias"),
                    )
                x2 = x.reshape(m_rows, cfg.d_model)
                out = quant_mlp_int8(
                    x2,
                    layer["w_up"]["q"],
                    layer["w_up"]["s"],
                    layer["w_down"]["q"],
                    layer["w_down"]["s"],
                    layer.get("b_up"),
                    layer.get("b_down"),
                    activation=cfg.activation,
                    norm=cfg.norm,
                    norm_scale=layer["ln2"]["scale"],
                    norm_bias=layer["ln2"].get("bias"),
                    norm_eps=cfg.layer_norm_eps,
                    residual=resid.reshape(m_rows, cfg.d_model),
                    next_qkv=next_qkv,
                    out_dtype=x.dtype,
                )
                if next_qkv is not None:
                    out, qkv_pending = out
                x = out.reshape(*x.shape)
                continue
            # Pre-norm + activation both fuse into the up-projection kernel.
            ff = (
                _fproj(
                    x,
                    layer["w_up"],
                    layer.get("b_up"),
                    activation=cfg.activation,
                    norm_p=layer["ln2"],
                )
                if fuse
                else _proj(
                    xn, layer["w_up"], layer.get("b_up"), activation=cfg.activation
                )
            )
        x = _fproj(ff, layer["w_down"], layer.get("b_down"), residual=resid)

    argmax_out = None
    if cfg.tie_embeddings and "lm_head_q" not in params:
        x = _norm(x, params["final_norm"], cfg)
        logits = dispatch.matmul(x, params["tok_emb"].T)
    else:
        head = params["lm_head_q"] if "lm_head_q" in params else params["lm_head"]
        if fuse and isinstance(head, dict):
            # Mirror _fproj's shape guard: quantize_params_int8 may K-pad
            # lm_head_q when d_model isn't a 128 multiple — the GEMV kernel
            # would trace-fail on the k mismatch, so fall through to the
            # logits+argmax path instead.
            if (
                lm_head_mode == "argmax"
                and fuse_norm
                and head["q"].shape[-2] == cfg.d_model
            ):
                from rten_tpu.kernels.quant_matmul import quant_gemv_int8

                fn = params["final_norm"]
                argmax_out = quant_gemv_int8(
                    x.reshape(m_rows, cfg.d_model),
                    head["q"],
                    head["s"],
                    norm=cfg.norm,
                    norm_scale=fn["scale"],
                    norm_bias=fn.get("bias"),
                    norm_eps=cfg.layer_norm_eps,
                    argmax_n=cfg.vocab_size,
                ).reshape(b, t)
                logits = None
            else:
                logits = _fproj(
                    x, head, norm_p=params["final_norm"], out_dim=cfg.vocab_size
                )
        else:
            xn = _norm(x, params["final_norm"], cfg)
            logits = _proj(xn, head, out_dim=cfg.vocab_size)
    if lm_head_mode == "argmax":
        if argmax_out is None:
            argmax_out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        result = argmax_out
    else:
        result = None  # filled below (logits path)

    if cache is not None:
        if "k_pages" in cache:
            new_cache = {
                "k_pages": new_k_layers,
                "v_pages": new_v_layers,
                "page_table": cache["page_table"],
                "len": cache["len"] + t,
            }
            if new_ks_layers:
                new_cache["k_scale_pages"] = new_ks_layers
                new_cache["v_scale_pages"] = new_vs_layers
        else:
            new_cache = {
                "k": new_k_layers,
                "v": new_v_layers,
                "len": cache["len"] + t,
            }
            if new_ks_layers:
                new_cache["k_scale"] = new_ks_layers
                new_cache["v_scale"] = new_vs_layers
        if result is None:
            result = logits.astype(jnp.float32)
        return result, new_cache
    if result is None:
        result = logits.astype(jnp.float32)
    return result, None


def _update_cache(cache_layer, new_kv, start):
    """cache_layer: [B, Hk, S, D]; new_kv: [B, Hk, T, D]; start: [B]."""

    def one(c, n, s):
        return jax.lax.dynamic_update_slice(c, n, (0, s, 0))

    return jax.vmap(one)(cache_layer, new_kv, start)


# ---------------------------------------------------------------------------
# Jitted entry points
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash"), donate_argnums=(3,))
def prefill(params, cfg: DecoderConfig, tokens, cache, *, use_flash=None):
    return forward(params, cfg, tokens, cache, use_flash=use_flash)


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash"), donate_argnums=(3,))
def decode_step(params, cfg: DecoderConfig, tokens, cache, *, use_flash=None):
    """One-token decode: tokens [B, 1]. The cache is donated — XLA updates it
    in place (the TPU equivalent of the reference's by-value cache ownership
    dance, generator.rs:565-641, without any copies)."""
    return forward(params, cfg, tokens, cache, use_flash=use_flash)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "sampler", "use_flash"),
    donate_argnums=(2,),
)
def generate_scan(
    params,
    cfg: DecoderConfig,
    cache,
    last_tokens,  # [B, 1] int32 — first tokens to feed
    rng,
    *,
    n_steps: int,
    sampler=None,  # rten_tpu.generate.sampler.Sampler (hashable, static)
    use_flash=None,
):
    """Device-side generation: n_steps decode iterations as ONE lax.scan in a
    single XLA program — no host round trip per token. This is the bulk/bench
    path; the Python-level Generator remains for streaming consumption.

    Returns (tokens [B, n_steps], cache).
    """
    from rten_tpu.generate.sampler import ArgMaxSampler

    greedy = sampler is None or isinstance(sampler, ArgMaxSampler)
    if greedy:
        # Greedy decode: the argmax runs inside the lm_head GEMV kernel
        # (forward's lm_head_mode="argmax") — no 50k-wide logits row, no
        # per-step RNG split.
        def body(carry, _):
            cache, tok, rng = carry
            nxt, cache = forward(
                params, cfg, tok, cache, use_flash=use_flash,
                lm_head_mode="argmax",
            )
            nxt = nxt[:, -1]
            return (cache, nxt[:, None], rng), nxt

    else:
        sample = sampler.sample

        def body(carry, _):
            cache, tok, rng = carry
            logits, cache = forward(params, cfg, tok, cache, use_flash=use_flash)
            rng, sub = jax.random.split(rng)
            nxt = sample(sub, logits[:, -1, :])
            return (cache, nxt[:, None], rng), nxt

    (cache, _, _), toks = jax.lax.scan(
        body, (cache, last_tokens, rng), None, length=n_steps
    )
    return jnp.transpose(toks, (1, 0)), cache


def _as_np(t):
    """Accept torch tensors (live checkpoints) OR plain numpy arrays
    (.npz state-dict files — the examples' --model path)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu()
    return np.asarray(t)


def from_hf_gpt2(hf_state: dict, cfg: DecoderConfig, dtype=None) -> dict:
    """Convert a HuggingFace ``GPT2LMHeadModel``/``GPT2Model`` state dict into
    this module's params pytree (parity-test path, mirroring the reference's
    PyTorch reference fixtures — SURVEY.md §4). GPT-2 Conv1D weights are
    already [in, out], so no transpose."""
    import numpy as np

    dtype = dtype or cfg.dtype

    def g(name):
        key = name if name in hf_state else "transformer." + name
        return jnp.asarray(_as_np(hf_state[key]), dtype)

    params: dict = {
        "tok_emb": g("wte.weight"),
        "pos_emb": g("wpe.weight"),
        "final_norm": {"scale": g("ln_f.weight"), "bias": g("ln_f.bias")},
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"h.{i}."
        c_attn_w = g(p + "attn.c_attn.weight")  # [D, 3D]
        c_attn_b = g(p + "attn.c_attn.bias")
        d = cfg.d_model
        params["layers"].append(
            {
                "ln1": {"scale": g(p + "ln_1.weight"), "bias": g(p + "ln_1.bias")},
                "ln2": {"scale": g(p + "ln_2.weight"), "bias": g(p + "ln_2.bias")},
                "wq": c_attn_w[:, :d],
                "bq": c_attn_b[:d],
                "wk": c_attn_w[:, d : 2 * d],
                "bk": c_attn_b[d : 2 * d],
                "wv": c_attn_w[:, 2 * d :],
                "bv": c_attn_b[2 * d :],
                "wo": g(p + "attn.c_proj.weight"),
                "bo": g(p + "attn.c_proj.bias"),
                "w_up": g(p + "mlp.c_fc.weight"),
                "b_up": g(p + "mlp.c_fc.bias"),
                "w_down": g(p + "mlp.c_proj.weight"),
                "b_down": g(p + "mlp.c_proj.bias"),
            }
        )
    return params


def from_hf_opt(hf_state: dict, cfg: DecoderConfig, dtype=None) -> dict:
    """Convert a HuggingFace ``OPTForCausalLM``/``OPTModel`` state dict into
    this module's params pytree (ReLU MLP, learned positions with the
    OPT-reserved 2-row offset — cfg.pos_offset=2, pre-norm layout;
    do_layer_norm_before=False variants like opt-350m and its
    project_in/out bottleneck are not supported). nn.Linear weights are
    [out, in] → transposed. Reference analog: the converter's per-arch
    name mapping (rten-convert/rten_convert/converter.py)."""
    dtype = dtype or cfg.dtype

    def g(name):
        for key in (name, "model." + name, "model.decoder." + name, "decoder." + name):
            if key in hf_state:
                return jnp.asarray(_as_np(hf_state[key]), dtype)
        raise KeyError(name)

    if any("project_in" in k for k in hf_state):
        raise ValueError("OPT project_in/out variants (opt-350m) unsupported")
    params: dict = {
        "tok_emb": g("embed_tokens.weight"),
        "pos_emb": g("embed_positions.weight"),
        "final_norm": {
            "scale": g("final_layer_norm.weight"),
            "bias": g("final_layer_norm.bias"),
        },
        "layers": [],
    }
    for i in range(cfg.n_layers):
        p = f"layers.{i}."
        params["layers"].append(
            {
                "ln1": {
                    "scale": g(p + "self_attn_layer_norm.weight"),
                    "bias": g(p + "self_attn_layer_norm.bias"),
                },
                "ln2": {
                    "scale": g(p + "final_layer_norm.weight"),
                    "bias": g(p + "final_layer_norm.bias"),
                },
                "wq": g(p + "self_attn.q_proj.weight").T,
                "bq": g(p + "self_attn.q_proj.bias"),
                "wk": g(p + "self_attn.k_proj.weight").T,
                "bk": g(p + "self_attn.k_proj.bias"),
                "wv": g(p + "self_attn.v_proj.weight").T,
                "bv": g(p + "self_attn.v_proj.bias"),
                "wo": g(p + "self_attn.out_proj.weight").T,
                "bo": g(p + "self_attn.out_proj.bias"),
                "w_up": g(p + "fc1.weight").T,
                "b_up": g(p + "fc1.bias"),
                "w_down": g(p + "fc2.weight").T,
                "b_down": g(p + "fc2.bias"),
            }
        )
    return params


def from_hf_llama(hf_state: dict, cfg: DecoderConfig, dtype=None) -> dict:
    """Convert a HuggingFace ``LlamaForCausalLM``/``LlamaModel`` state dict
    (RoPE + RMSNorm + SwiGLU + GQA) into this module's params pytree.
    nn.Linear weights are [out, in] → transposed."""
    import numpy as np

    dtype = dtype or cfg.dtype

    def g(name):
        key = name if name in hf_state else "model." + name
        return jnp.asarray(_as_np(hf_state[key]), dtype)

    params: dict = {
        "tok_emb": g("embed_tokens.weight"),
        "final_norm": {"scale": g("norm.weight")},
        "layers": [],
    }
    if any(k.endswith("lm_head.weight") for k in hf_state):
        params["lm_head"] = g("lm_head.weight").T
    else:
        params["lm_head"] = g("embed_tokens.weight").T  # tied
    def has(name):
        return name in hf_state or "model." + name in hf_state

    for i in range(cfg.n_layers):
        p = f"layers.{i}."
        layer = {
            "ln1": {"scale": g(p + "input_layernorm.weight")},
            "ln2": {"scale": g(p + "post_attention_layernorm.weight")},
            "wq": g(p + "self_attn.q_proj.weight").T,
            "wk": g(p + "self_attn.k_proj.weight").T,
            "wv": g(p + "self_attn.v_proj.weight").T,
            "wo": g(p + "self_attn.o_proj.weight").T,
            "w_gate": g(p + "mlp.gate_proj.weight").T,
            "w_up": g(p + "mlp.up_proj.weight").T,
            "w_down": g(p + "mlp.down_proj.weight").T,
        }
        # Qwen2-style attention biases (plain Llama has none).
        for ours, theirs in (("bq", "q_proj"), ("bk", "k_proj"), ("bv", "v_proj")):
            if has(p + f"self_attn.{theirs}.bias"):
                layer[ours] = g(p + f"self_attn.{theirs}.bias")
        params["layers"].append(layer)
    return params
