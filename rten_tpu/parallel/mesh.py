"""Mesh construction and sharding policies for the native decoder.

Tensor parallelism follows the Megatron layout mapped to a ("data", "model")
mesh (scaling-book recipe: annotate shardings, let XLA insert collectives):

- attention q/k/v projections: output (head) dim on "model"  → column-parallel
- attention output projection: input dim on "model"          → row-parallel
  (XLA inserts one reduce-scatter/all-reduce per layer here)
- FFN up/gate: output dim on "model"; FFN down: input dim on "model"
- embeddings: vocab dim on "model" (gather is local + all-gather of slices)
- KV cache: batch on "data", kv-heads on "model" — attention runs fully
  local per chip when kv_heads % model_axis == 0 (GQA co-location)

The reference's only parallelism is intra-op rayon threading
(src/threading.rs); this module is its multi-chip replacement.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def decoder_param_specs(params: dict, mesh: Mesh | None = None) -> dict:
    """PartitionSpec pytree matching rten_tpu.models.decoder params.

    Pass ``mesh`` to get divisibility-safe specs for contiguous-tiled int8
    packs (see _maybe_quant) — without it, 3-D packs assume the stripe axis
    divides the model axis."""

    def _mq(leaf, dense_spec, scale_axis):
        return _maybe_quant(leaf, dense_spec, scale_axis, mesh)

    def layer_spec(layer: dict) -> dict:
        spec = {}
        for name in layer:
            if name in ("wq", "wk", "wv", "w_up", "w_gate"):
                spec[name] = _mq(layer[name], P(None, "model"), "model")
            elif name in ("wo", "w_down"):
                spec[name] = _mq(layer[name], P("model", None), None)
            elif name in ("bq", "bk", "bv", "b_up"):
                spec[name] = _vec_spec(layer[name], "model")
            elif name in ("bo", "b_down"):
                spec[name] = _vec_spec(layer[name], None)
            else:  # norms
                spec[name] = jax.tree.map(
                    lambda leaf: _vec_spec(leaf, None), layer[name]
                )
        return spec

    spec: dict = {
        "tok_emb": _mq(params["tok_emb"], P("model", None), None),
        "final_norm": jax.tree.map(
            lambda leaf: _vec_spec(leaf, None), params["final_norm"]
        ),
        "layers": [layer_spec(l) for l in params["layers"]],
    }
    if "pos_emb" in params:
        spec["pos_emb"] = P(None, None)
    if "lm_head" in params:
        spec["lm_head"] = _mq(params["lm_head"], P(None, "model"), "model")
    if "lm_head_q" in params:
        spec["lm_head_q"] = _mq(params["lm_head_q"], P(None, "model"), "model")
    if "slabs" in params:
        # Whole-stack [L, K, N] megakernel slabs (decoder.build_decode_slabs)
        # serve the SINGLE-chip decode fast path; under a mesh they ride
        # replicated (TP serving uses fuse=False packs, which never build
        # slabs).
        spec["slabs"] = {k: P(None, None, None) for k in params["slabs"]}
    return spec


def _vec_spec(leaf, axis: str | None) -> P:
    """Per-channel vectors (biases, norm params, int8 scales) may be stored
    1-D [N] or 2-D [1, N] (quantize_params_int8 stores 2-D so the kernels'
    [1, N] tile needs no in-loop relayout); shard the channel dim either way."""
    if getattr(leaf, "ndim", 1) == 2:
        return P(None, axis)
    return P(axis)


def _maybe_quant(leaf, dense_spec: P, scale_axis: str | None, mesh: Mesh | None = None):
    """INT8-packed weights {"q","s"}: shard payload like the dense matrix and
    scales along the output-channel axis. Contiguous-tiled payloads
    ([S, K, bn], quant_matmul.tile_gemv_weights) map the dense [K, N] spec
    (k_ax, n_ax) onto (n_ax, k_ax, None): the leading tile axis IS the N
    axis in bn-sized groups. S = ceil(N/bn) is often NOT divisible by the
    mesh axis (GPT-2 lm_head: S=50; vocab ≤ bn: S=1), so with ``mesh`` the
    spec degrades gracefully: stripe axis when divisible, else the bn axis
    (interleaved-column ownership — still correct under GSPMD, which
    resolves layouts with collectives), else replicated."""
    if isinstance(leaf, dict):
        q_spec = dense_spec
        q = leaf["q"]
        if getattr(q, "ndim", 2) == 3:
            k_ax, n_ax = dense_spec
            q_spec = P(n_ax, k_ax, None)
            if mesh is not None and n_ax is not None:
                ax_size = mesh.shape[n_ax]
                if q.shape[0] % ax_size:
                    if q.shape[2] % ax_size == 0:
                        q_spec = P(None, k_ax, n_ax)
                    else:
                        q_spec = P(None, k_ax, None)
        return {"q": q_spec, "s": _vec_spec(leaf["s"], scale_axis)}
    return dense_spec


def cache_specs(cache: dict | None = None) -> dict:
    # per-layer k/v: [batch, kv_heads, max_len, head_dim]
    kv = P("data", "model", None, None)
    n_layers = len(cache["k"]) if cache else None
    if n_layers is None:
        return {"k": kv, "v": kv, "len": P("data")}
    specs = {
        "k": [kv] * n_layers,
        "v": [kv] * n_layers,
        "len": P("data"),
    }
    if cache and "k_scale" in cache:
        # int8-KV scale arrays [B, Hk, 8, S_f] shard with the payload.
        specs["k_scale"] = [kv] * n_layers
        specs["v_scale"] = [kv] * n_layers
    return specs


def shard_decoder_params(params: dict, mesh: Mesh) -> dict:
    specs = decoder_param_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P) or not isinstance(x, (dict, list)),
    )


def shard_cache(cache: dict, mesh: Mesh) -> dict:
    specs = cache_specs(cache)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        cache,
        specs,
        is_leaf=lambda x: isinstance(x, P) or not isinstance(x, (dict, list)),
    )
