"""Explicitly-overlapped collective matmuls (for use inside shard_map).

SURVEY.md §2.4/§7 north star: pjit's default lowering inserts whole-tensor
collectives around sharded matmuls; at ≥85% host-to-host scaling the
all-gather / reduce-scatter must OVERLAP the matmul instead (the
scaling-book recipe: decompose the collective into ring steps with
`ppermute` and interleave each step's chunk matmul, so the ICI transfer of
chunk i+1 hides under MXU work on chunk i).

Two canonical building blocks:

- ``allgather_matmul`` — sequence/row-gathered matmul: X sharded on M
  (sequence parallelism), W replicated; replaces all_gather(X) → X @ W.
- ``matmul_reducescatter`` — row-parallel TP matmul: X and W sharded on the
  contraction dim; replaces psum_scatter(X_p @ W_p). (``matmul_allreduce``
  adds the final all-gather for psum semantics.)

Both are numerically identical to the unfused collective+matmul pair (tests
assert this on the virtual CPU mesh); on real multi-chip hardware XLA
schedules each ppermute concurrently with the next chunk's matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def allgather_matmul(x_shard: jax.Array, w: jax.Array, axis: str) -> jax.Array:
    """y = all_gather_M(x) @ w with the gather overlapped.

    x_shard: [M/p, K] (X sharded on rows over ``axis``); w: [K, N]
    replicated. Returns [M, N] (row-major by device order), identical to
    ``jax.lax.all_gather(x_shard, axis, tiled=True) @ w``.
    """
    p = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % p) for i in range(p)]
    m_chunk, _ = x_shard.shape
    n = w.shape[1]
    out = jnp.zeros((m_chunk * p, n), jnp.promote_types(x_shard.dtype, w.dtype))

    def body(i, carry):
        out, x_cur = carry
        # The chunk in hand originated at device (idx - i) mod p → its rows.
        src = jax.lax.rem(idx - i + p, p)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, jnp.einsum("mk,kn->mn", x_cur, w).astype(out.dtype),
            src * m_chunk, axis=0,
        )
        # Rotate AFTER computing: transfer of the next chunk overlaps the
        # next iteration's matmul on real hardware.
        x_nxt = jax.lax.ppermute(x_cur, axis, perm)
        return out, x_nxt

    out, _ = jax.lax.fori_loop(0, p, body, (out, x_shard))
    return out


def matmul_reducescatter(x_shard: jax.Array, w_shard: jax.Array, axis: str) -> jax.Array:
    """y_shard = psum_scatter_N(x @ w): row-parallel TP matmul with the
    reduction decomposed into a ring.

    x_shard: [M, K/p], w_shard: [K/p, N] (sharded on the contraction dim
    over ``axis``). Returns the [M, N/p] output chunk owned by this device —
    identical to ``jax.lax.psum_scatter(x_shard @ w_shard, axis,
    scatter_dimension=1, tiled=True)``.

    Ring invariant: after step i, the accumulator at device d holds the
    partial sums of devices {d-i..d} for destination chunk (d + p-1-i) % p;
    at i = p-1 every device holds the full sum of its own chunk.
    """
    p = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % p) for i in range(p)]
    n = w_shard.shape[1]
    chunk = n // p
    assert n % p == 0, (n, p)

    partial = jnp.einsum("mk,kn->mn", x_shard, w_shard)  # [M, N] local partial

    def col(j):
        return jax.lax.dynamic_slice_in_dim(partial, j * chunk, chunk, axis=1)

    acc = col(jax.lax.rem(idx - 1 + p, p))

    def body(i, acc):
        j = jax.lax.rem(idx + 2 * p - 1 - i, p)
        return jax.lax.ppermute(acc, axis, perm) + col(j)

    return jax.lax.fori_loop(1, p, body, acc)


def matmul_allreduce(x_shard: jax.Array, w_shard: jax.Array, axis: str) -> jax.Array:
    """y = psum(x_shard @ w_shard) via reduce-scatter ring + all-gather —
    the overlapped replacement for the row-parallel all-reduce."""
    scat = matmul_reducescatter(x_shard, w_shard, axis)
    return jax.lax.all_gather(scat, axis, axis=1, tiled=True)
