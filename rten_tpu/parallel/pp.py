"""Pipeline parallelism: GPipe-style microbatched inference forward.

The reference has no distributed execution at all, and this build's north
star is TP+DP (SURVEY.md §2.4) — but pipeline parallelism completes the
strategy inventory for the cases TP can't reach: models whose layers exceed
one slice's HBM, or meshes whose inter-chip links are too slow for
per-layer collectives. This is the inference (fill-drain) schedule:

- layer params are STACKED along a leading layer axis and sharded over the
  "pipe" mesh axis — stage s holds layers [s·L/p, (s+1)·L/p)
- the batch splits into m microbatches; at tick t, stage s processes
  microbatch (t - s); activations hop to stage s+1 via a neighbor
  ppermute (ICI point-to-point), so after m + p - 1 ticks every
  microbatch has crossed every stage
- embedding runs on stage 0, the LM head on the last stage; logits ride
  home through a psum masked to the last stage

Activations are O(B/m · T · D) per chip; bubbles are the standard
(p-1)/(m+p-1) fill-drain cost — raise n_microbatches to amortize.

Full-sequence forward only (prefill / encoder workloads — the pipelined
regimes); decode's single-token latency chain gains nothing from PP and
keeps TP (parallel/tp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rten_tpu.models import decoder as D


def stack_layer_params(params: dict) -> dict:
    """Stack the per-layer param list into leading-layer-axis arrays so the
    layer axis can shard over the pipe axis. Requires homogeneous layers
    (same keys/shapes — true for every native decoder config) and unfused
    projections."""
    layers = params["layers"]
    keys = sorted(layers[0])
    for l in layers:
        assert sorted(l) == keys, "pipeline stages need homogeneous layers"
    stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves), *layers)
    out = {k: v for k, v in params.items() if k != "layers"}
    out["stacked_layers"] = stacked
    return out


def _one_layer(layer, cfg: D.DecoderConfig, x, positions):
    """One decoder layer (full-sequence, no cache) on local activations."""
    b, t, _ = x.shape
    h, hk, hd = cfg.n_heads, cfg.kv_heads, cfg.head_dim
    from rten_tpu.kernels.attention import attention_reference, flash_attention
    from rten_tpu.kernels import dispatch

    attn_fn = flash_attention if dispatch.on_tpu() else attention_reference

    resid = x
    xn = D._norm(x, layer["ln1"], cfg)
    q = (xn @ layer["wq"]) + layer.get("bq", 0)
    k = (xn @ layer["wk"]) + layer.get("bk", 0)
    v = (xn @ layer["wv"]) + layer.get("bv", 0)
    q = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, hk, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, hk, hd).transpose(0, 2, 1, 3)
    if cfg.pos_encoding == "rope":
        q = D._rope(q, positions, cfg.rope_theta)
        k = D._rope(k, positions, cfg.rope_theta)
    kv_len = jnp.full((b,), t, jnp.int32)
    attn = attn_fn(
        q, k, v, causal=True, q_offset=jnp.zeros((b,), jnp.int32), kv_len=kv_len
    )
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
    x = (attn @ layer["wo"]) + layer.get("bo", 0) + resid
    x = x.astype(cfg.dtype)

    resid = x
    xn = D._norm(x, layer["ln2"], cfg)
    if cfg.activation == "swiglu":
        gate = xn @ layer["w_gate"]
        up = xn @ layer["w_up"]
        ff = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    else:
        ff = (xn @ layer["w_up"]) + layer.get("b_up", 0)
        ff = jax.nn.gelu(ff.astype(jnp.float32), approximate=False).astype(x.dtype)
    x = (ff @ layer["w_down"]) + layer.get("b_down", 0) + resid
    return x.astype(cfg.dtype)


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh", "axis", "n_microbatches")
)
def pp_forward(
    params: dict,
    cfg: D.DecoderConfig,
    tokens: jax.Array,  # [B, T]; B divisible by n_microbatches
    *,
    mesh: Mesh,
    axis: str = "pipe",
    n_microbatches: int | None = None,
):
    """Full-sequence decoder forward under pipeline parallelism. ``params``
    must come from stack_layer_params (dense, unfused). Returns logits
    [B, T, vocab] — numerically equal to decoder.forward(tokens, None)."""
    p = mesh.shape[axis]
    assert cfg.n_layers % p == 0, (cfg.n_layers, p)
    m = n_microbatches or p
    b, t = tokens.shape
    assert b % m == 0, (b, m)
    mb = b // m

    stacked = params["stacked_layers"]
    pspec = {
        "stacked_layers": jax.tree.map(
            lambda _: P(axis), stacked
        ),
        **{
            k: jax.tree.map(lambda _: P(), v)
            for k, v in params.items()
            if k != "stacked_layers"
        },
    }

    def body(prm, tok):
        s = jax.lax.axis_index(axis)
        local = prm["stacked_layers"]  # [L/p, ...] this stage's layers
        l_local = jax.tree.leaves(local)[0].shape[0]
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (mb, t))

        def embed(i):
            ids = jax.lax.dynamic_slice_in_dim(tok, i * mb, mb, axis=0)
            x = jnp.take(prm["tok_emb"], ids, axis=0)
            if cfg.pos_encoding == "learned":
                x = x + jnp.take(prm["pos_emb"], positions, axis=0)
            return x.astype(cfg.dtype)

        def stage(x):
            def layer_step(i, acc):
                layer = jax.tree.map(lambda a: a[i], local)
                return _one_layer(layer, cfg, acc, positions)

            return jax.lax.fori_loop(0, l_local, layer_step, x)

        def head(x):
            xn = D._norm(x, prm["final_norm"], cfg)
            if "lm_head" in prm:
                logits = xn @ prm["lm_head"]
            else:
                logits = xn @ prm["tok_emb"].T
            return logits.astype(jnp.float32)

        perm = [(i, (i + 1) % p) for i in range(p)]
        out = jnp.zeros((m, mb, t, cfg.vocab_size), jnp.float32)
        act0 = jnp.zeros((mb, t, cfg.d_model), cfg.dtype)

        def tick(tk, carry):
            act, out = carry
            # Stage 0 swaps in microbatch tk's embedding; other stages use
            # the activation that just arrived from the previous stage.
            mb_in = jnp.clip(tk, 0, m - 1)
            x = jnp.where(s == 0, embed(mb_in), act)
            y = stage(x)  # idle ticks compute on garbage; results are masked
            # The last stage finished microbatch (tk - (p-1)) this tick.
            done_idx = tk - (p - 1)
            is_valid = jnp.logical_and(s == p - 1, done_idx >= 0)
            logits = head(y)
            out = jax.lax.cond(
                is_valid,
                lambda o: jax.lax.dynamic_update_slice_in_dim(
                    o, logits[None], jnp.clip(done_idx, 0, m - 1), axis=0
                ),
                lambda o: o,
                out,
            )
            act = jax.lax.ppermute(y, axis, perm)
            return act, out

        _, out = jax.lax.fori_loop(0, m + p - 1, tick, (act0, out))
        # Only the last stage holds real logits; psum broadcasts them.
        out = jnp.where(s == p - 1, out, 0)
        out = jax.lax.psum(out, axis)
        return out.reshape(b, t, cfg.vocab_size)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(pspec, P(None, None)),
        out_specs=P(None, None, None),
        check_vma=False,
    )
    return fn(params, tokens)
