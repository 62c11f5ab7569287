"""Ring attention: context-parallel attention with communication overlapped
by compute (SURVEY.md §5 long-context stretch config; guide §16).

The KV cache is sharded on the SEQUENCE dim over a mesh axis; instead of
all-gathering K/V (O(seq·d) bytes to every chip), KV blocks rotate around
the ring with `ppermute` while each chip computes attention for the block in
hand, carrying online-softmax statistics (m, l, acc) across steps — the
flash-attention correction applied across chips instead of VMEM tiles.
After p-1 rotations every query has seen every KV position; communication is
point-to-point neighbor transfers that overlap the matmuls on real ICI.

``ring_attention`` runs inside shard_map with
    q: [B, H, Tq/p, D]  (queries sequence-sharded)
    k, v: [B, H, Tkv/p, D]  (KV sequence-sharded, same axis)
and returns [B, H, Tq/p, D], numerically equal to full causal/full attention
over the gathered sequence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis: str,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
) -> jax.Array:
    b, h, tq, d = q.shape
    _, _, tkv, _ = k.shape
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    p = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % p) for i in range(p)]

    # Global positions of the local queries (chip idx owns rows
    # [idx·tq, (idx+1)·tq)).
    q_pos = idx * tq + jnp.arange(tq)

    qf = q.astype(jnp.float32)

    def step(i, carry):
        m_prev, l_prev, acc, k_cur, v_cur = carry
        # Block in hand originated at chip (idx - i) mod p.
        src = jax.lax.rem(idx - i + p, p)
        kv_pos = src * tkv + jnp.arange(tkv)

        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32)
        ) * sm_scale
        if causal:
            mask = kv_pos[None, :] <= q_pos[:, None]  # [tq, tkv]
            s = jnp.where(mask[None, None], s, DEFAULT_MASK_VALUE)

        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        prob = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(prob, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", prob, v_cur.astype(jnp.float32)
        )

        # Rotate AFTER compute: on hardware the transfer of block i+1
        # overlaps step i+1's matmuls via the latency-hiding scheduler.
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return m_next, l_next, acc, k_nxt, v_nxt

    init = (
        jnp.full((b, h, tq, 1), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, tq, 1), jnp.float32),
        jnp.zeros((b, h, tq, d), jnp.float32),
        k,
        v,
    )
    m_fin, l_fin, acc, _, _ = jax.lax.fori_loop(0, p, step, init)
    l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
    return (acc * l_inv).astype(q.dtype)


def ring_attention_sharded(mesh, q, k, v, *, axis: str = "model", causal=True):
    """Convenience wrapper: shard q/k/v on the sequence dim over ``axis`` and
    run ring_attention under shard_map; returns the full [B, H, T, D]."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    fn = shard_map(
        functools.partial(ring_attention, axis=axis, causal=causal),
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, None, axis, None),
        ),
        out_specs=P(None, None, axis, None),
        check_rep=False,
    )
    return fn(q, k, v)
