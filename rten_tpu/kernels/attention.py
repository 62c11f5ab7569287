"""Flash attention (Pallas TPU) — online-softmax tiled attention.

The reference has NO fused attention: its transformer graphs run unfused
MatMul→Softmax→MatMul emitted by ONNX (SURVEY.md §5 "attention itself is
unfused"), which materializes the (seq, seq) scores matrix. This kernel is
the TPU-first replacement: the scores tile lives only in VMEM, softmax
statistics (m, l) are carried across KV tiles in f32 scratch, and causal
tiles above the diagonal are skipped entirely.

Supports GQA (q_heads a multiple of kv_heads — KV tiles are indexed at
h // group so no repeat/copy materializes), a query position offset
(decode: q positions start at the current cache length), and a KV validity
length (preallocated cache slots beyond kv_len are masked).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _flash_kernel(
    q_off_ref,
    kv_len_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    sm_scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    n_kv: int,
):
    kv_idx = pl.program_id(3)
    q_idx = pl.program_id(2)
    b_idx = pl.program_id(0)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q_offset = q_off_ref[b_idx]
    kv_len = kv_len_ref[b_idx]

    # Skip KV tiles that are entirely (a) above the causal diagonal or
    # (b) beyond the valid cache length.
    first_invalid_col = (q_idx + 1) * block_q + q_offset if causal else None
    run = kv_idx * block_k < kv_len
    if causal:
        run = jnp.logical_and(run, kv_idx * block_k < first_invalid_col)

    @pl.when(run)
    def _tile():
        q = q_ref[0, 0]  # [block_q, d]
        k = k_ref[0, 0]  # [block_k, d]
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k]
        if sm_scale != 1.0:
            s *= sm_scale

        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
        mask = col_ids < kv_len
        if causal:
            row_ids = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                + q_idx * block_q
                + q_offset
            )
            mask = jnp.logical_and(mask, col_ids <= row_ids)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)  # [block_q, LANES]
        p = jnp.exp(s - m_next[:, :1])  # [block_q, block_k]
        l_curr = jnp.sum(p, axis=1, keepdims=True)
        l_next = alpha * l_prev + jnp.broadcast_to(l_curr, l_prev.shape)
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = v_ref[0, 0]  # [block_k, d]
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q,
    k,
    v,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    q_offset=None,
    kv_len=None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
):
    """softmax(q @ kᵀ · scale + mask) @ v, tiled.

    q: [batch, q_heads, seq_q, d]; k, v: [batch, kv_heads, seq_kv, d] with
    q_heads % kv_heads == 0. ``q_offset``: [batch] i32, absolute position of
    q[…, 0, :] (decode). ``kv_len``: [batch] i32, valid KV prefix length.
    """
    batch, q_heads, seq_q, d = q.shape
    _, kv_heads, seq_kv, _ = k.shape
    assert q_heads % kv_heads == 0, (q_heads, kv_heads)
    group = q_heads // kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)

    if q_offset is None:
        q_offset = jnp.zeros((batch,), jnp.int32)
    else:
        q_offset = jnp.asarray(q_offset, jnp.int32).reshape(batch)
    if kv_len is None:
        kv_len = jnp.full((batch,), seq_kv, jnp.int32)
    else:
        kv_len = jnp.asarray(kv_len, jnp.int32).reshape(batch)

    block_q_eff = min(block_q, max(8, seq_q))
    pad_q = -seq_q % block_q_eff
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    pad_k = -seq_kv % block_k
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    sq = q.shape[2]
    skv = k.shape[2]
    n_kv = skv // block_k

    grid = (batch, q_heads, sq // block_q_eff, n_kv)

    kernel = functools.partial(
        _flash_kernel,
        sm_scale=sm_scale,
        causal=causal,
        block_q=block_q_eff,
        block_k=block_k,
        n_kv=n_kv,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # q_offset, kv_len
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q_eff, d), lambda b, h, qi, ki, *_: (b, h, qi, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_k, d),
                    lambda b, h, qi, ki, *_, group=group: (b, h // group, ki, 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_k, d),
                    lambda b, h, qi, ki, *_, group=group: (b, h // group, ki, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q_eff, d), lambda b, h, qi, ki, *_: (b, h, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q_eff, _LANES), jnp.float32),
                pltpu.VMEM((block_q_eff, _LANES), jnp.float32),
                pltpu.VMEM((block_q_eff, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((batch, q_heads, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * batch * q_heads * sq * skv * d * (0.5 if causal else 1.0)),
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + k.size * k.dtype.itemsize
                + v.size * v.dtype.itemsize
            ),
            transcendentals=batch * q_heads * sq * skv,
        ),
        interpret=interpret,
    )(q_offset, kv_len, q, k, v)
    if pad_q:
        out = out[:, :, :seq_q]
    return out


def attention_reference(q, k, v, *, causal=True, sm_scale=None, q_offset=None, kv_len=None):
    """Unfused jnp reference (what the reference runtime effectively executes
    via its ONNX MatMul/Softmax/MatMul subgraph) — used for parity tests and
    as the CPU fallback."""
    batch, q_heads, seq_q, d = q.shape
    _, kv_heads, seq_kv, _ = k.shape
    group = q_heads // kv_heads
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    col = jnp.arange(seq_kv)[None, None, None, :]
    if kv_len is not None:
        mask = col < jnp.asarray(kv_len).reshape(batch, 1, 1, 1)
    else:
        mask = jnp.ones_like(s, dtype=bool)
    if causal:
        row = jnp.arange(seq_q)[None, None, :, None]
        if q_offset is not None:
            row = row + jnp.asarray(q_offset).reshape(batch, 1, 1, 1)
        mask = jnp.logical_and(mask, col <= row)
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
