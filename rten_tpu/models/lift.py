"""Lift loaded decoder graphs onto the native fast path.

The reference executes exported ONNX transformer graphs op-by-op with a
concat-grown KV cache; this framework's fast path is the NATIVE decoder
(models/decoder.py: preallocated cache, Pallas decode kernels, one XLA
program per step). ``lift_decoder`` bridges them: given a loaded
`.rten`/ONNX model whose initializers follow HuggingFace naming
(GPT-2 `h.N.attn.c_attn.weight`... or Llama `layers.N.self_attn.q_proj...`),
it extracts the weights into the native params pytree and infers the
DecoderConfig — so a user who converted an HF checkpoint to ONNX gets
native-speed generation without re-exporting anything.

Head count isn't recoverable from weight shapes alone; it is inferred from
the graph's Reshape shape constants ([.., .., n_heads, head_dim] with
n_heads·head_dim = d_model) or passed explicitly.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

from rten_tpu.models.decoder import DecoderConfig


class LiftError(ValueError):
    pass


def graph_weights(graph) -> dict[str, np.ndarray]:
    """Named constants of a Graph (initializer names survive ONNX import)."""
    out: dict[str, np.ndarray] = {}
    for node in graph.nodes:
        name = getattr(node, "name", None)
        value = getattr(node, "value", None)
        if name and value is not None:
            out[name] = np.asarray(value)
    return out


def _strip_prefixes(weights: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in weights.items():
        k2 = re.sub(r"^(transformer|model|m)\.", "", k)
        out[k2] = v
    return out


def infer_n_heads(graph, d_model: int) -> int | None:
    """Scan Reshape-style shape constants for [.., .., h, hd] with
    h · hd == d_model."""
    candidates: dict[int, int] = {}
    for node in graph.nodes:
        value = getattr(node, "value", None)
        if value is None:
            continue
        arr = np.asarray(value)
        if arr.ndim == 1 and arr.size == 4 and np.issubdtype(arr.dtype, np.integer):
            h, hd = int(arr[-2]), int(arr[-1])
            if h > 0 and hd > 0 and h * hd == d_model:
                candidates[h] = candidates.get(h, 0) + 1
    if not candidates:
        return None
    return max(candidates, key=candidates.get)


def lift_decoder(model_or_graph, n_heads: int | None = None, dtype=None):
    """Returns (cfg, params) for models/decoder, or raises LiftError.

    Accepts a runtime Model, a Graph, or a {name: array} mapping."""
    import jax.numpy as jnp

    if isinstance(model_or_graph, dict):
        weights, graph = model_or_graph, None
    else:
        graph = getattr(model_or_graph, "graph", model_or_graph)
        weights = graph_weights(graph)
    w = _strip_prefixes(weights)
    dtype = dtype or jnp.float32

    def g(name):
        if name not in w:
            raise LiftError(f"missing weight {name!r}")
        return jnp.asarray(w[name], dtype)

    if "wte.weight" in w:  # GPT-2 family
        d = w["wte.weight"].shape[1]
        n_layers = 1 + max(
            int(m.group(1)) for k in w if (m := re.match(r"h\.(\d+)\.", k))
        )
        if n_heads is None and graph is not None:
            n_heads = infer_n_heads(graph, d)
        if n_heads is None:
            raise LiftError("n_heads not inferable — pass n_heads=")
        cfg = DecoderConfig(
            vocab_size=w["wte.weight"].shape[0],
            n_layers=n_layers,
            n_heads=n_heads,
            d_model=d,
            d_ff=w["h.0.mlp.c_fc.weight"].shape[-1],
            max_seq=w["wpe.weight"].shape[0],
            dtype=dtype,
        )
        from rten_tpu.models.decoder import from_hf_gpt2

        class _T:  # adapt numpy dict to the .detach().cpu() protocol
            def __init__(self, a):
                self.a = a

            def detach(self):
                return self

            def cpu(self):
                return self

            def __array__(self, *a, **k):
                return np.asarray(self.a)

        params = from_hf_gpt2({k: _T(v) for k, v in w.items()}, cfg, dtype)
        return cfg, params

    if (
        "decoder.embed_tokens.weight" in w
        and "decoder.layers.0.fc1.weight" in w
        # Whisper-class enc-dec decoders also use fc1/fc2 naming — anything
        # with encoder weights or cross-attention belongs to
        # lift_encoder_decoder, not here.
        and not any("encoder" in k for k in w)
    ):
        # OPT family (maskless HF exports previously fell to the interpret
        # path): ReLU MLP, learned positions with the 2-row table offset.
        d = w["decoder.embed_tokens.weight"].shape[1]
        n_layers = 1 + max(
            int(m.group(1))
            for k in w
            if (m := re.match(r"decoder\.layers\.(\d+)\.", k))
        )
        if n_heads is None and graph is not None:
            n_heads = infer_n_heads(graph, d)
        if n_heads is None:
            raise LiftError("n_heads not inferable — pass n_heads=")
        cfg = DecoderConfig(
            vocab_size=w["decoder.embed_tokens.weight"].shape[0],
            n_layers=n_layers,
            n_heads=n_heads,
            d_model=d,
            d_ff=w["decoder.layers.0.fc1.weight"].shape[0],
            max_seq=w["decoder.embed_positions.weight"].shape[0] - 2,
            pos_offset=2,
            activation="relu",
            dtype=dtype,
        )
        from rten_tpu.models.decoder import from_hf_opt

        params = from_hf_opt(w, cfg, dtype)  # _as_np accepts plain numpy
        return cfg, params

    if "embed_tokens.weight" in w:  # Llama family
        d = w["embed_tokens.weight"].shape[1]
        n_layers = 1 + max(
            int(m.group(1)) for k in w if (m := re.match(r"layers\.(\d+)\.", k))
        )
        if n_heads is None and graph is not None:
            n_heads = infer_n_heads(graph, d)
        if n_heads is None:
            raise LiftError("n_heads not inferable — pass n_heads=")
        hd = d // n_heads
        kv_dim = w["layers.0.self_attn.k_proj.weight"].shape[0]
        cfg = DecoderConfig(
            vocab_size=w["embed_tokens.weight"].shape[0],
            n_layers=n_layers,
            n_heads=n_heads,
            n_kv_heads=kv_dim // hd,
            d_model=d,
            d_ff=w["layers.0.mlp.gate_proj.weight"].shape[0],
            max_seq=4096,
            pos_encoding="rope",
            norm="rmsnorm",
            activation="swiglu",
            tie_embeddings=False,
            dtype=dtype,
        )
        from rten_tpu.models.decoder import from_hf_llama

        class _T:
            def __init__(self, a):
                self.a = a

            def detach(self):
                return self

            def cpu(self):
                return self

            def __array__(self, *a, **k):
                return np.asarray(self.a)

        params = from_hf_llama({k: _T(v) for k, v in w.items()}, cfg, dtype)
        return cfg, params

    raise LiftError(
        "graph does not follow a recognized decoder naming scheme "
        "(GPT-2 wte/h.N.* or Llama embed_tokens/layers.N.*)"
    )


def lift_encoder_decoder(
    model_or_graph,
    decoder_graph=None,
    n_heads: int | None = None,
    dtype=None,
    int8_kv: bool = False,
):
    """Lift a Whisper-class encoder-decoder graph onto the native
    models/encoder_decoder fast path (fused int8 kernels, int8-KV decode
    attention, per-utterance cross-KV precompute).

    Accepts a single Model/Graph/{name: array} mapping holding the full HF
    ``WhisperModel`` state (``(model.)encoder.* / decoder.*`` initializer
    names survive ONNX export), or separate encoder and decoder graphs
    (the HF Optimum two-file export) whose weights are merged. Returns
    (EncDecConfig, params) for ``models/encoder_decoder``; raises LiftError
    if the naming scheme is not recognized.

    Reference analog: the reference runs exported encoder/decoder ONNX
    graphs op-by-op with rten-generate's cross-attention cache discovery
    (rten-generate/src/generator.rs:59-66); here the weights are extracted
    once and generation runs the native kernels instead."""
    import jax.numpy as jnp

    def _weights_of(x):
        if x is None:
            return {}
        if isinstance(x, dict):
            return dict(x)
        graph = getattr(x, "graph", x)
        return graph_weights(graph)

    w = _weights_of(model_or_graph)
    w.update(_weights_of(decoder_graph))
    w = _strip_prefixes(w)
    dtype = dtype or jnp.float32

    if "decoder.embed_tokens.weight" not in w or "encoder.conv1.weight" not in w:
        raise LiftError(
            "graph does not follow the Whisper encoder-decoder naming scheme "
            "((model.)encoder.conv1/layers.N.*, decoder.embed_tokens/layers.N.*)"
        )

    from rten_tpu.models.encoder_decoder import EncDecConfig, from_hf_whisper

    vocab, d = w["decoder.embed_tokens.weight"].shape

    def _count(prefix):
        n = 0
        while f"{prefix}.{n}.self_attn.q_proj.weight" in w:
            n += 1
        return n

    n_audio_layers = _count("encoder.layers")
    n_text_layers = _count("decoder.layers")
    if not n_audio_layers or not n_text_layers:
        raise LiftError("no encoder/decoder layers found")

    if n_heads is None and not isinstance(model_or_graph, dict):
        graph = getattr(model_or_graph, "graph", model_or_graph)
        n_heads = infer_n_heads(graph, d)
    if n_heads is None:
        # Whisper convention: head_dim 64 across the published family.
        n_heads = max(1, d // 64)

    if "encoder.embed_positions.weight" in w:
        n_audio_ctx = w["encoder.embed_positions.weight"].shape[0]
    else:
        n_audio_ctx = EncDecConfig.n_audio_ctx  # sinusoids are recomputed

    cfg = EncDecConfig(
        n_mels=w["encoder.conv1.weight"].shape[1],
        n_audio_ctx=n_audio_ctx,
        vocab_size=vocab,
        d_model=d,
        n_heads=n_heads,
        n_audio_layers=n_audio_layers,
        n_text_layers=n_text_layers,
        d_ff=w["decoder.layers.0.fc1.weight"].shape[0],
        max_text_ctx=w["decoder.embed_positions.weight"].shape[0],
        dtype=dtype,
        int8_kv=int8_kv,
    )
    params = from_hf_whisper(w, cfg, dtype)
    return cfg, params
