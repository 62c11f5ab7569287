"""Explicit shard_map tensor parallelism for the native decoder.

``shard_decoder_params`` + pjit (parallel/mesh.py) lets XLA choose where to
insert collectives; this module is the EXPLICIT path (the scaling-book
recipe for squeezing the last collectives): a shard_map over the
("data", "model") mesh whose body runs the SAME kernels the single-chip
path uses — Pallas decode attention / int8 GEMV / fused MLP on TPU, the
plain jnp fallbacks on CPU — on each device's local shard, with hand-placed
collectives:

- embedding: vocab-sharded table, masked local gather + psum
- qkv / FFN-up: column-parallel (local heads / local FF slice, no comm)
- attention: fully local — KV heads co-located with their query group
- wo / FFN-down: row-parallel → psum (or the OVERLAPPED ring
  matmul_reducescatter+all-gather from parallel/overlap.py when
  ``overlap=True`` — VERDICT/SURVEY "reduce-scatter matmuls via shard_map,
  not just pjit defaults")
- lm head: column-parallel over vocab → tiled all_gather of logits

The reference has no distributed execution at all (SURVEY.md §2.4); this is
the TPU-native replacement for scaling BASELINE config 5 (Llama-class INT8
over N hosts).

Layer weights must be UNFUSED (wq/wk/wv separate): the decode-fused wqkv
concat interleaves q|k|v along N, which breaks head-contiguous column
sharding. quantize_params_int8(..., fuse=False) produces TP-ready packs.
"""

from __future__ import annotations


import functools


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rten_tpu.kernels import dispatch
from rten_tpu.kernels.attention import attention_reference, flash_attention
from rten_tpu.models import decoder as D


def _dense(w):
    if isinstance(w, dict):
        return w["q"].astype(jnp.float32) * w["s"].astype(jnp.float32)
    return w


def _col_proj(x, w, b=None):
    """Column-parallel projection: local output slice, no communication."""
    if isinstance(w, dict) and dispatch.on_tpu():
        from rten_tpu.kernels.quant_matmul import quant_matmul_int8

        out = quant_matmul_int8(x.reshape(-1, x.shape[-1]), w["q"], w["s"])
        out = out.reshape(*x.shape[:-1], -1)
    else:
        out = dispatch.matmul(x, _dense(w).astype(x.dtype))
    if b is not None:
        out = out + b
    return out


def _row_proj(x, w, axis: str, *, overlap: bool = False):
    """Row-parallel projection: local partial matmul + all-reduce over
    ``axis``. With ``overlap`` the reduction rides the explicit ring
    (matmul_reducescatter + tiled all-gather) instead of one psum."""
    shape = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if overlap and not isinstance(w, dict):
        from rten_tpu.parallel.overlap import matmul_allreduce

        out = matmul_allreduce(x2, _dense(w).astype(x2.dtype), axis)
        return out.reshape(*shape, -1)
    if isinstance(w, dict) and dispatch.on_tpu():
        from rten_tpu.kernels.quant_matmul import quant_matmul_int8

        part = quant_matmul_int8(x2, w["q"], w["s"])
    else:
        part = dispatch.matmul(x2, _dense(w).astype(x2.dtype))
    return jax.lax.psum(part, axis).reshape(*shape, -1)


def _embed(params, cfg, tokens, axis: str):
    """Vocab-sharded embedding: masked local gather + psum
    (the Megatron parallel-embedding trick)."""
    table = params["tok_emb"]  # local [V/m, Dm]
    v_local = table.shape[0]
    lo = jax.lax.axis_index(axis) * v_local
    local_ids = jnp.clip(tokens - lo, 0, v_local - 1)
    emb = jnp.take(table, local_ids, axis=0)
    mask = ((tokens >= lo) & (tokens < lo + v_local))[..., None]
    return jax.lax.psum(jnp.where(mask, emb, 0), axis)


def tp_forward(
    params: dict,
    cfg: D.DecoderConfig,
    tokens: jax.Array,  # local [B/d, T]
    cache: dict | None,
    *,
    axis: str = "model",
    use_flash: bool | None = None,
    overlap: bool = False,
    interpret_kernels: bool = False,
) -> tuple[jax.Array, dict | None]:
    """Shard_map BODY: one decoder forward over local shards. All activations
    are replicated along ``axis`` except head/FF-local intermediates; every
    cross-shard reduction is explicit. Mirrors decoder.forward semantics
    exactly (same kernels, same cache layout, per-shard)."""
    m = jax.lax.psum(1, axis)
    b, t = tokens.shape
    assert cfg.n_heads % m == 0 and cfg.kv_heads % m == 0, (
        f"heads must divide the model axis: {cfg.n_heads}/{cfg.kv_heads} over {m}"
    )
    # Local head counts; head_dim is a GLOBAL property (d_model / n_heads) —
    # deriving it from a heads-divided config would inflate it by m.
    h, hk, hd = cfg.n_heads // m, cfg.kv_heads // m, cfg.head_dim
    if use_flash is None:
        use_flash = dispatch.on_tpu()

    x = _embed(params, cfg, tokens, axis)
    if cache is not None:
        start = cache["len"]
        positions = start[:, None] + jnp.arange(t)[None, :]
    else:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    if cfg.pos_encoding == "learned":
        x = x + jnp.take(params["pos_emb"], positions, axis=0)
    x = x.astype(cfg.dtype)

    new_k, new_v, new_ks, new_vs = [], [], [], []
    for li, layer in enumerate(params["layers"]):
        resid = x
        xn = D._norm(x, layer["ln1"], cfg)
        q = _col_proj(xn, layer["wq"], layer.get("bq"))
        k = _col_proj(xn, layer["wk"], layer.get("bk"))
        v = _col_proj(xn, layer["wv"], layer.get("bv"))
        q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, hk, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, hk, hd).transpose(0, 2, 1, 3)
        if cfg.pos_encoding == "rope":
            q = D._rope(q, positions, cfg.rope_theta)
            k = D._rope(k, positions, cfg.rope_theta)

        from rten_tpu.kernels.decode_attention import (
            decode_attention,
            decode_attention_supported,
        )

        paged = cache is not None and "k_pages" in cache
        if paged:
            # Paged pool sharded on KV heads over ``axis``: the page-table
            # indirection is identical on every shard, payload DMAs are
            # local (model-axis TP for PagedServingEngine(mesh=...)). INT8
            # pools carry per-(token, head) scale pages, sharded alongside.
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
                    interpret=interpret_kernels and not dispatch.on_tpu(),
                )
                new_ks.append(ksp)
                new_vs.append(vsp)
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
                    interpret=interpret_kernels and not dispatch.on_tpu(),
                )
            new_k.append(kp)
            new_v.append(vp)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
            x = _row_proj(attn, layer["wo"], axis, overlap=overlap)
            if layer.get("bo") is not None:
                x = x + layer["bo"]
            x = (x + resid).astype(cfg.dtype)
            x = _tp_mlp(x, layer, cfg, axis, overlap)
            continue

        s_max = D.cache_seq_len(cache["k"][li], hd) if cache is not None else 0
        run_pallas = (use_flash or interpret_kernels) and cache is not None
        int8_kv = cfg.int8_kv and cache is not None
        if int8_kv:
            from rten_tpu.kernels.decode_attention import (
                decode_attention_int8,
                decode_attention_int8_supported,
                pack_kv_scales,
                unpack_kv_scales,
            )
            from rten_tpu.models.encoder_decoder import dequantize_kv, quantize_kv
        if (
            int8_kv
            and run_pallas
            and t == 1
            and decode_attention_int8_supported(hd, s_max)
        ):
            # INT8-KV decode on the local head shard — the same fused
            # quantize+append+attend kernel as single-chip (decoder.forward
            # int8_fast), per shard; scale arrays shard on heads with the
            # payload (serve/engine.py tp_mode="shard_map" with int8_kv —
            # the BASELINE config 4 × 5 composition).
            attn, k_c, v_c, ks_c, vs_c = decode_attention_int8(
                q,
                cache["k"][li],
                cache["v"][li],
                cache["k_scale"][li],
                cache["v_scale"][li],
                start,
                k,
                v,
                interpret=interpret_kernels and not dispatch.on_tpu(),
            )
            new_k.append(k_c)
            new_v.append(v_c)
            new_ks.append(ks_c)
            new_vs.append(vs_c)
        elif int8_kv:
            # Eager int8 path (prefill / CPU equality tests): quantize the
            # new tokens per (token, head), splice payload + scales, attend
            # over the dequantized view — decoder.forward's int8_kv branch
            # on the local shard.
            k_q, k_s = quantize_kv(k)
            v_q, v_s = quantize_kv(v)
            k_c = D._update_cache(D._unfold(cache["k"][li], hd), k_q, start)
            v_c = D._update_cache(D._unfold(cache["v"][li], hd), v_q, start)
            ks_c = pack_kv_scales(
                D._update_cache(unpack_kv_scales(cache["k_scale"][li], hd), k_s, start),
                hd,
            )
            vs_c = pack_kv_scales(
                D._update_cache(unpack_kv_scales(cache["v_scale"][li], hd), v_s, start),
                hd,
            )
            new_k.append(D._fold_like(k_c, cache["k"][li]))
            new_v.append(D._fold_like(v_c, cache["v"][li]))
            new_ks.append(ks_c)
            new_vs.append(vs_c)
            kv_len = start + t
            attn_fn = flash_attention if use_flash else attention_reference
            attn = attn_fn(
                q,
                dequantize_kv(k_c, unpack_kv_scales(ks_c, hd), q.dtype),
                dequantize_kv(v_c, unpack_kv_scales(vs_c, hd), q.dtype),
                causal=True,
                q_offset=start,
                kv_len=kv_len,
            )
        elif (
            run_pallas
            and t == 1
            and decode_attention_supported(hd, s_max)
        ):
            # The SAME Pallas decode kernel as single-chip, on the local
            # head shard (in-kernel cache append, aliased buffers).
            attn, k_c, v_c = decode_attention(
                q,
                cache["k"][li],
                cache["v"][li],
                start,
                k,
                v,
                interpret=interpret_kernels and not dispatch.on_tpu(),
            )
            new_k.append(k_c)
            new_v.append(v_c)
        elif cache is not None:
            k_c = D._update_cache(D._unfold(cache["k"][li], hd), k, start)
            v_c = D._update_cache(D._unfold(cache["v"][li], hd), v, start)
            new_k.append(D._fold_like(k_c, cache["k"][li]))
            new_v.append(D._fold_like(v_c, cache["v"][li]))
            kv_len = start + t
            attn_fn = flash_attention if use_flash else attention_reference
            attn = attn_fn(q, k_c, v_c, causal=True, q_offset=start, kv_len=kv_len)
        else:
            kv_len = jnp.full((b,), t, jnp.int32)
            attn_fn = flash_attention if use_flash else attention_reference
            attn = attn_fn(
                q, k, v, causal=True,
                q_offset=jnp.zeros((b,), jnp.int32), kv_len=kv_len,
            )

        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
        # Row-parallel output projection; bias/residual AFTER the reduction
        # (the fused-in-kernel epilogue would add them once per shard).
        x = _row_proj(attn, layer["wo"], axis, overlap=overlap)
        if layer.get("bo") is not None:
            x = x + layer["bo"]
        x = (x + resid).astype(cfg.dtype)
        x = _tp_mlp(x, layer, cfg, axis, overlap)

    xn = D._norm(x, params["final_norm"], cfg)
    if "lm_head" in params:
        logits_local = _col_proj(xn, params["lm_head"])
    elif "lm_head_q" in params:
        logits_local = _col_proj(xn, params["lm_head_q"])
    else:  # tied embeddings: tok_emb is vocab-row sharded → local slice
        logits_local = dispatch.matmul(xn, _dense(params["tok_emb"]).astype(xn.dtype).T)
    logits = jax.lax.all_gather(logits_local, axis, axis=-1, tiled=True)
    logits = logits[..., : cfg.vocab_size].astype(jnp.float32)

    if cache is not None:
        if "k_pages" in cache:
            out = {
                "k_pages": new_k,
                "v_pages": new_v,
                "page_table": cache["page_table"],
                "len": cache["len"] + t,
            }
            if new_ks:
                out["k_scale_pages"] = new_ks
                out["v_scale_pages"] = new_vs
            return logits, out
        out = {"k": new_k, "v": new_v, "len": cache["len"] + t}
        if new_ks:
            out["k_scale"] = new_ks
            out["v_scale"] = new_vs
        return logits, out
    return logits, None


def _tp_mlp(x, layer, cfg, axis, overlap):
    resid = x
    xn = D._norm(x, layer["ln2"], cfg)
    if cfg.activation == "swiglu":
        gate = _col_proj(xn, layer["w_gate"])
        up = _col_proj(xn, layer["w_up"])
        ff = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    else:
        ff = _col_proj(xn, layer["w_up"], layer.get("b_up"))
        ff = jax.nn.gelu(ff.astype(jnp.float32), approximate=False).astype(x.dtype)
    x = _row_proj(ff, layer["w_down"], axis, overlap=overlap)
    if layer.get("b_down") is not None:
        x = x + layer["b_down"]
    return (x + resid).astype(cfg.dtype)


def _specs(params, cache):
    from rten_tpu.parallel.mesh import decoder_param_specs

    pspec = decoder_param_specs(params)
    cspec = _tp_cache_specs(cache)
    return pspec, cspec


def _tp_cache_specs(cache):
    if set(cache) not in (
        {"k", "v", "len"},
        {"k", "v", "k_scale", "v_scale", "len"},
    ):
        raise NotImplementedError(
            f"shard_map TP supports contiguous (optionally int8-KV) caches; "
            f"got leaves {sorted(cache)} (paged caches go through "
            f"tp_paged_decode)"
        )
    # Payload [B, Hk, ·, ·] and scale [B, Hk, 8, S_f] leaves both shard on
    # (batch=data, heads=model).
    kv = P("data", "model", None, None)
    n = len(cache["k"])
    specs = {"k": [kv] * n, "v": [kv] * n, "len": P("data")}
    if "k_scale" in cache:
        specs["k_scale"] = [kv] * n
        specs["v_scale"] = [kv] * n
    return specs


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "use_flash", "overlap", "interpret_kernels"),
    donate_argnums=(3,),
)
def tp_decode_step(
    params,
    cfg: D.DecoderConfig,
    tokens,  # global [B, 1]
    cache,
    *,
    mesh: Mesh,
    use_flash: bool | None = None,
    overlap: bool = False,
    interpret_kernels: bool = False,
):
    """One decode step with the whole layer loop under shard_map — the
    explicit-TP equivalent of decoder.decode_step."""
    pspec, cspec = _specs(params, cache)

    body = functools.partial(
        tp_forward,
        axis="model",
        use_flash=use_flash,
        overlap=overlap,
        interpret_kernels=interpret_kernels,
    )

    fn = jax.shard_map(
        lambda p, t, c: body(p, cfg, t, c),
        mesh=mesh,
        in_specs=(pspec, P("data", None), cspec),
        out_specs=(P("data", None, None), cspec),
        check_vma=False,
    )
    return fn(params, tokens, cache)


# Prefill is the same shard_map program evaluated at T > 1 (the body handles
# both); a separate name keeps call sites readable without duplicating the
# wiring.
tp_prefill = tp_decode_step


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "interpret_kernels"),
    donate_argnums=(3,),
)
def tp_paged_decode(
    params,
    cfg: D.DecoderConfig,
    tokens,  # [B, 1] (replicated — paged TP is model-axis only)
    pool_state,  # {"k_pages": [...], "v_pages": [...]} sharded on KV heads
    page_table,
    lens,
    *,
    mesh: Mesh,
    interpret_kernels: bool = False,
):
    """One paged decode step with KV pages sharded on the model axis — the
    shard_map analog of serve/paged._paged_decode (BASELINE config 4 × 5:
    paged INT8-capable pool under tensor parallelism). The mesh's data axis
    must be 1 (a paged batch is scheduled host-side, not sharded)."""
    assert mesh.shape.get("data", 1) == 1, "paged TP shards the model axis only"
    from rten_tpu.parallel.mesh import decoder_param_specs

    pspec = decoder_param_specs(params)
    page_spec = P("model", None, None, None)
    pool_spec = {k: [page_spec] * len(v) for k, v in pool_state.items()}

    def body(p, t, pool, table, ln):
        cache = {**pool, "page_table": table, "len": ln}
        logits, cache = tp_forward(
            p, cfg, t, cache, axis="model", use_flash=None,
            interpret_kernels=interpret_kernels,
        )
        return logits, {k: cache[k] for k in pool}

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(pspec, P(None, None), pool_spec, P(None, None), P(None)),
        out_specs=(P(None, None, None), pool_spec),
        check_vma=False,
    )
    return fn(params, tokens, pool_state, page_table, lens)


def _replicated_specs(tree):
    return jax.tree.map(lambda _: P(), tree)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis"))
def sp_prefill(
    params,
    cfg: D.DecoderConfig,
    tokens,  # [B, T] with T divisible by the axis size
    *,
    mesh: Mesh,
    axis: str = "model",
):
    """Sequence-parallel (context-parallel) prefill: activations sharded on
    the SEQUENCE dim, weights replicated, attention via the ring kernel
    (kernels/ring_attention.py — ppermute KV rotation with the online-softmax
    correction carried across chips). This is the long-context prefill
    configuration SURVEY.md §5 calls the stretch config: per-chip memory is
    O(T/p) activations instead of O(T), and the KV transfers are neighbor
    ppermutes that overlap the matmuls on real ICI.

    Returns (logits [B, T, V], per-layer (k, v) [B, Hk, T, D]) — the K/V are
    what a decode cache gets seeded with.
    """
    from rten_tpu.kernels.ring_attention import ring_attention

    b, t = tokens.shape
    p = mesh.shape[axis]
    assert t % p == 0, (t, p)

    def body(prm, tok):
        idx = jax.lax.axis_index(axis)
        tloc = tok.shape[1]
        positions = idx * tloc + jnp.arange(tloc)[None, :]
        positions = jnp.broadcast_to(positions, (b, tloc))

        x = jnp.take(prm["tok_emb"], tok, axis=0)
        if cfg.pos_encoding == "learned":
            x = x + jnp.take(prm["pos_emb"], positions, axis=0)
        x = x.astype(cfg.dtype)

        h, hk, hd = cfg.n_heads, cfg.kv_heads, cfg.head_dim
        ks, vs = [], []
        for layer in prm["layers"]:
            resid = x
            xn = D._norm(x, layer["ln1"], cfg)
            q = _col_proj(xn, layer["wq"], layer.get("bq"))
            k = _col_proj(xn, layer["wk"], layer.get("bk"))
            v = _col_proj(xn, layer["wv"], layer.get("bv"))
            q = q.reshape(b, tloc, h, hd).transpose(0, 2, 1, 3)
            k = k.reshape(b, tloc, hk, hd).transpose(0, 2, 1, 3)
            v = v.reshape(b, tloc, hk, hd).transpose(0, 2, 1, 3)
            if cfg.pos_encoding == "rope":
                q = D._rope(q, positions, cfg.rope_theta)
                k = D._rope(k, positions, cfg.rope_theta)
            if hk != h:  # ring kernel is MHA-shaped: expand GQA groups
                rep = h // hk
                k_r = jnp.repeat(k, rep, axis=1)
                v_r = jnp.repeat(v, rep, axis=1)
            else:
                k_r, v_r = k, v
            attn = ring_attention(q, k_r, v_r, axis, causal=True)
            ks.append(k)
            vs.append(v)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, tloc, h * hd)
            x = _col_proj(attn, layer["wo"], layer.get("bo")) + resid
            x = x.astype(cfg.dtype)
            x = _tp_mlp_local(x, layer, cfg)

        xn = D._norm(x, prm["final_norm"], cfg)
        if "lm_head" in prm:
            logits = _col_proj(xn, prm["lm_head"])
        elif "lm_head_q" in prm:
            logits = _col_proj(xn, prm["lm_head_q"])
        else:
            logits = dispatch.matmul(xn, _dense(prm["tok_emb"]).astype(xn.dtype).T)
        return logits[..., : cfg.vocab_size].astype(jnp.float32), ks, vs

    pspec = _replicated_specs(params)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(pspec, P(None, axis)),
        out_specs=(
            P(None, axis, None),
            [P(None, None, axis, None)] * cfg.n_layers,
            [P(None, None, axis, None)] * cfg.n_layers,
        ),
        check_vma=False,
    )
    return fn(params, tokens)


def _tp_mlp_local(x, layer, cfg):
    """Replicated-weight MLP (sequence-parallel prefill: no cross-shard
    reduction — every shard owns whole rows)."""
    resid = x
    xn = D._norm(x, layer["ln2"], cfg)
    if cfg.activation == "swiglu":
        gate = _col_proj(xn, layer["w_gate"])
        up = _col_proj(xn, layer["w_up"])
        ff = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    else:
        ff = _col_proj(xn, layer["w_up"], layer.get("b_up"))
        ff = jax.nn.gelu(ff.astype(jnp.float32), approximate=False).astype(x.dtype)
    x = _col_proj(ff, layer["w_down"], layer.get("b_down"))
    return (x + resid).astype(cfg.dtype)
