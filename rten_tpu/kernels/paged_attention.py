"""Paged decode attention (Pallas TPU): virtual-memory KV cache.

Continuous batching with contiguous per-slot caches (serve/engine.py) wastes
HBM on the max_len × max_batch rectangle; paged attention (the vLLM design,
guide §8-13) allocates fixed-size KV PAGES from a shared pool and maps each
sequence's logical positions to physical pages via a per-sequence page
table. Pages are non-contiguous, so the kernel issues one DMA per page
(double-buffered — latency of page i+1 hides under compute on page i), with
the page table delivered through scalar prefetch.

Layout mirrors decode_attention's folded trick: pages are stored
[Hk, n_pages, page_size·D/128, 128] so every DMA is 128-lane aligned; the
f = 128/D packed token sub-columns are scored under one joint online
softmax.

The new token's K/V append is fused: the kernel RMWs the 8-row window of
the page holding position kv_len (pages are aliased input→output buffers —
donate them).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _paged_attn_kernel(
    # scalar prefetch
    kv_len_ref,  # [B]
    pt_ref,  # [B * max_pages] page table (row-major)
    # inputs
    q_ref,  # [1, Hk, Gp, D] VMEM
    k_hbm,  # [Hk, n_pages, rows_per_page, 128] ANY (aliased output)
    v_hbm,
    kn_ref,  # [1, Hk, 8, D] or None
    vn_ref,
    # outputs
    o_ref,
    # scratch
    k_buf,  # [2, Hk, rows_per_page, 128]
    v_buf,
    sem,
    row_buf,  # [2, Hk, 8, 128] or None
    row_sem,
    *,
    page_size: int,
    rows_per_page: int,
    max_pages: int,
    d: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    length = kv_len_ref[b]
    n_blocks = pl.cdiv(length, page_size)
    f = _LANES // d
    hk = q_ref.shape[1]
    gp = q_ref.shape[2]

    def dma(buf_slot, blk_idx):
        page = pt_ref[b * max_pages + blk_idx]
        kc = pltpu.make_async_copy(
            k_hbm.at[:, page], k_buf.at[buf_slot], sem.at[buf_slot, 0]
        )
        vc = pltpu.make_async_copy(
            v_hbm.at[:, page], v_buf.at[buf_slot], sem.at[buf_slot, 1]
        )
        return kc, vc

    @pl.when(n_blocks > 0)
    def _warmup():
        kc0, vc0 = dma(0, 0)
        kc0.start()
        vc0.start()

    if kn_ref is not None:
        # Append into the page holding position ``length``. Same overlapped
        # RMW choreography as decode_attention: reads start together, write
        # completion is deferred to kernel exit (the written row is masked
        # for this kernel's own reads).
        page = pt_ref[b * max_pages + length // page_size]
        inpage = jax.lax.rem(length, page_size)
        row = (inpage * d) // _LANES
        row8 = (row // 8) * 8
        local = row - row8
        sub = jax.lax.rem(inpage, f)

        def _row_copy(which, hbm, to_hbm: bool):
            args = (row_buf.at[which], hbm.at[:, page, pl.ds(row8, 8), :])
            src, dst = (args if to_hbm else args[::-1])
            return pltpu.make_async_copy(src, dst, row_sem.at[which])

        _row_copy(0, k_hbm, False).start()
        _row_copy(1, v_hbm, False).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (hk, 8, _LANES), 2)
        rows = jax.lax.broadcasted_iota(jnp.int32, (hk, 8, _LANES), 1)
        hit = jnp.logical_and(rows == local, lane // d == sub)

        def _merge(which, src_new_ref):
            old = row_buf[which]  # [Hk, 8, 128]
            new = src_new_ref[0, :, 0:1, :d]  # lanes :D valid
            tiled = jnp.concatenate([new] * f, axis=-1) if f > 1 else new
            row_buf[which] = jnp.where(hit, tiled.astype(old.dtype), old)

        _row_copy(0, k_hbm, False).wait()
        _merge(0, kn_ref)
        _row_copy(0, k_hbm, True).start()
        _row_copy(1, v_hbm, False).wait()
        _merge(1, vn_ref)
        _row_copy(1, v_hbm, True).start()

    q = q_ref[0][:, :, :d].astype(jnp.float32)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _prefetch():
            kn, vn = dma(next_slot, i + 1)
            kn.start()
            vn.start()

        kw, vw = dma(slot, i)
        kw.wait()
        k = k_buf[slot].astype(jnp.float32)

        base = i * page_size
        row_tok = jax.lax.broadcasted_iota(jnp.int32, (hk, gp, rows_per_page), 2) * f
        s_parts = []
        for j in range(f):
            kj = k[:, :, j * d : (j + 1) * d]
            s = jax.lax.dot_general(
                q, kj, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if sm_scale != 1.0:
                s = s * sm_scale
            s = jnp.where(base + row_tok + j < length, s, DEFAULT_MASK_VALUE)
            s_parts.append(s)

        m_curr = s_parts[0].max(axis=2, keepdims=True)
        for s in s_parts[1:]:
            m_curr = jnp.maximum(m_curr, s.max(axis=2, keepdims=True))
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)

        vw.wait()
        v = v_buf[slot].astype(jnp.float32)

        l_curr = jnp.zeros_like(l_prev)
        pv = jnp.zeros_like(acc)
        for j, s in enumerate(s_parts):
            p = jnp.exp(s - m_next)
            l_curr = l_curr + jnp.sum(p, axis=2, keepdims=True)
            pv = pv + jax.lax.dot_general(
                p, v[:, :, j * d : (j + 1) * d],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        l_next = alpha * l_prev + l_curr
        acc = acc * alpha + pv
        return m_next, l_next, acc

    if kn_ref is not None:
        k_new = kn_ref[0, :, 0:1, :d].astype(jnp.float32)
        s_new = jax.lax.dot_general(
            q, k_new, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if sm_scale != 1.0:
            s_new = s_new * sm_scale
        init = (
            s_new,
            jnp.ones((hk, gp, 1), jnp.float32),
            jnp.broadcast_to(vn_ref[0, :, 0:1, :d].astype(jnp.float32), (hk, gp, d)),
        )
    else:
        init = (
            jnp.full((hk, gp, 1), -jnp.inf, jnp.float32),
            jnp.zeros((hk, gp, 1), jnp.float32),
            jnp.zeros((hk, gp, d), jnp.float32),
        )
    m_fin, l_fin, acc = jax.lax.fori_loop(0, n_blocks, body, init)
    l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
    final = acc * l_inv
    if d < _LANES:  # lane-pad output to the 128-minor layout (see wrapper)
        final = jnp.concatenate(
            [final] + [jnp.zeros_like(final)] * (_LANES // d - 1), axis=-1
        )
    o_ref[0] = final.astype(o_ref.dtype)
    if kn_ref is not None:
        _row_copy(0, k_hbm, True).wait()
        _row_copy(1, v_hbm, True).wait()


def paged_attention_supported(head_dim: int, page_size: int) -> bool:
    return (
        head_dim <= _LANES
        and _LANES % head_dim == 0
        and (page_size * head_dim) % (8 * _LANES) == 0
    )


def paged_attention_int8_supported(head_dim: int, page_size: int) -> bool:
    # int8 RMW windows span 32 sublane rows → pages must hold whole windows.
    # The [Hk, P, 8, 128] scale-page layout additionally caps capacity: a
    # page's rows_per_page folded rows index the 128 lanes (≤ 128) and the
    # f = 128/head_dim packed-token slots index the 8 sublanes (≤ 8) —
    # enforced here so bad configs fail at PagePool construction with a
    # clear error instead of an opaque negative-pad during kernel tracing.
    return (
        paged_attention_supported(head_dim, page_size)
        and (page_size * head_dim) % (32 * _LANES) == 0
        and page_size * head_dim // _LANES <= _LANES
        and _LANES // head_dim <= 8
    )


def _paged_attn_int8_kernel(
    # scalar prefetch
    kv_len_ref,  # [B]
    pt_ref,  # [B * max_pages]
    # inputs
    q_ref,  # [1, Hk, Gp, D] VMEM
    k_hbm,  # [Hk, n_pages, rows_per_page, 128] int8 ANY (aliased output)
    v_hbm,
    ks_hbm,  # [Hk, n_pages, 8, 128] f32 scale pages (cols ≥ rows_per_page pad)
    vs_hbm,
    kn_ref,  # [1, Hk, 8, D] int8 (row 0 = new token) or None
    vn_ref,
    kdq_ref,  # [1, Hk, 8, D] f32 dequantized new token or None
    vdq_ref,
    # outputs
    o_ref,
    # scratch
    k_buf,  # [2, Hk, rows_per_page, 128] int8
    v_buf,
    s_buf,  # [2, 2, Hk, 8, 128] f32
    sem,  # [2, 4]
    row_buf,  # [2, Hk, 32, 128] int8 or None
    row_sem,
    *,
    page_size: int,
    rows_per_page: int,
    max_pages: int,
    d: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    length = kv_len_ref[b]
    n_blocks = pl.cdiv(length, page_size)
    f = _LANES // d
    hk = q_ref.shape[1]
    gp = q_ref.shape[2]

    def dma(buf_slot, blk_idx):
        page = pt_ref[b * max_pages + blk_idx]
        return (
            pltpu.make_async_copy(
                k_hbm.at[:, page], k_buf.at[buf_slot], sem.at[buf_slot, 0]
            ),
            pltpu.make_async_copy(
                v_hbm.at[:, page], v_buf.at[buf_slot], sem.at[buf_slot, 1]
            ),
            pltpu.make_async_copy(
                ks_hbm.at[:, page], s_buf.at[buf_slot, 0], sem.at[buf_slot, 2]
            ),
            pltpu.make_async_copy(
                vs_hbm.at[:, page], s_buf.at[buf_slot, 1], sem.at[buf_slot, 3]
            ),
        )

    @pl.when(n_blocks > 0)
    def _warmup():
        for copy in dma(0, 0):
            copy.start()

    if kn_ref is not None:
        # Append the (pre-quantized) token into its page — overlapped RMW
        # choreography, write completion deferred to kernel exit.
        page = pt_ref[b * max_pages + length // page_size]
        inpage = jax.lax.rem(length, page_size)
        row = (inpage * d) // _LANES
        row32 = (row // 32) * 32
        local = row - row32
        sub = jax.lax.rem(inpage, f)

        def _row_copy(which, hbm, to_hbm: bool):
            args = (row_buf.at[which], hbm.at[:, page, pl.ds(row32, 32), :])
            src, dst = (args if to_hbm else args[::-1])
            return pltpu.make_async_copy(src, dst, row_sem.at[which])

        _row_copy(0, k_hbm, False).start()
        _row_copy(1, v_hbm, False).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (hk, 32, _LANES), 2)
        rows = jax.lax.broadcasted_iota(jnp.int32, (hk, 32, _LANES), 1)
        hit = jnp.logical_and(rows == local, lane // d == sub)

        def _merge(which, src_new_ref):
            old = row_buf[which]
            new = src_new_ref[0, :, 0:1, :d]  # lanes :D valid
            tiled = jnp.concatenate([new] * f, axis=-1) if f > 1 else new
            row_buf[which] = jnp.where(hit, tiled.astype(old.dtype), old)

        _row_copy(0, k_hbm, False).wait()
        _merge(0, kn_ref)
        _row_copy(0, k_hbm, True).start()
        _row_copy(1, v_hbm, False).wait()
        _merge(1, vn_ref)
        _row_copy(1, v_hbm, True).start()

    q = q_ref[0][:, :, :d].astype(jnp.float32)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _prefetch():
            for copy in dma(next_slot, i + 1):
                copy.start()

        kc, vc, ksc, vsc = dma(slot, i)
        kc.wait()
        ksc.wait()
        k = k_buf[slot].astype(jnp.float32)
        k_scales = s_buf[slot, 0][:, :, :rows_per_page]  # [Hk, 8, rpp]

        base = i * page_size
        row_tok = jax.lax.broadcasted_iota(jnp.int32, (hk, gp, rows_per_page), 2) * f
        s_parts = []
        for j in range(f):
            kj = k[:, :, j * d : (j + 1) * d]
            s = jax.lax.dot_general(
                q, kj, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            s = s * k_scales[:, j : j + 1, :] * sm_scale
            s = jnp.where(base + row_tok + j < length, s, DEFAULT_MASK_VALUE)
            s_parts.append(s)

        m_curr = s_parts[0].max(axis=2, keepdims=True)
        for s in s_parts[1:]:
            m_curr = jnp.maximum(m_curr, s.max(axis=2, keepdims=True))
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)

        vc.wait()
        vsc.wait()
        v = v_buf[slot].astype(jnp.float32)
        v_scales = s_buf[slot, 1][:, :, :rows_per_page]

        l_curr = jnp.zeros_like(l_prev)
        pv = jnp.zeros_like(acc)
        for j, s in enumerate(s_parts):
            p = jnp.exp(s - m_next)
            l_curr = l_curr + jnp.sum(p, axis=2, keepdims=True)
            pv = pv + jax.lax.dot_general(
                p * v_scales[:, j : j + 1, :],
                v[:, :, j * d : (j + 1) * d],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        l_next = alpha * l_prev + l_curr
        acc = acc * alpha + pv
        return m_next, l_next, acc

    if kn_ref is not None:
        k_new = kdq_ref[0, :, 0:1, :d].astype(jnp.float32)
        s_new = jax.lax.dot_general(
            q, k_new, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        init = (
            s_new,
            jnp.ones((hk, gp, 1), jnp.float32),
            jnp.broadcast_to(vdq_ref[0, :, 0:1, :d].astype(jnp.float32), (hk, gp, d)),
        )
    else:
        init = (
            jnp.full((hk, gp, 1), -jnp.inf, jnp.float32),
            jnp.zeros((hk, gp, 1), jnp.float32),
            jnp.zeros((hk, gp, d), jnp.float32),
        )
    m_fin, l_fin, acc = jax.lax.fori_loop(0, n_blocks, body, init)
    l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
    final = acc * l_inv
    if d < _LANES:  # lane-pad output to the 128-minor layout (see wrapper)
        final = jnp.concatenate(
            [final] + [jnp.zeros_like(final)] * (_LANES // d - 1), axis=-1
        )
    o_ref[0] = final.astype(o_ref.dtype)
    if kn_ref is not None:
        _row_copy(0, k_hbm, True).wait()
        _row_copy(1, v_hbm, True).wait()


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "page_size", "interpret"),
)
def paged_decode_attention_int8(
    q,  # [B, H, 1, D]
    k_pages,  # [Hk, n_pages, page·D/128, 128] int8 (folded)
    v_pages,
    k_scale_pages,  # [Hk, n_pages, 8, 128] f32 — token t of a page at
    #                 [t % f, t·D//128]; cols ≥ page·D/128 are padding
    v_scale_pages,
    page_table,  # [B, max_pages] i32
    kv_len,  # [B]
    k_new=None,  # [B, Hk, 1, D] UNquantized — quantized + appended in place
    v_new=None,
    *,
    sm_scale: float | None = None,
    page_size: int | None = None,
    interpret: bool = False,
):
    """INT8-KV paged decode attention (config-4 × config-5 intersection):
    the vLLM-style page pool with int8 payloads + per-(token, head) scales,
    halving decode KV traffic. With k_new/v_new the token is quantized
    per-head (absmax), appended into its page in-kernel (pages aliased —
    donate), and its scales spliced into the scale pages; returns
    (out, k_pages, v_pages, k_scale_pages, v_scale_pages), else just out.
    """
    b, h, sq, d = q.shape
    hk, n_pages = k_pages.shape[:2]
    psz = k_pages.shape[2] * _LANES // d
    if page_size is None:
        page_size = psz
    assert sq == 1 and h % hk == 0 and psz == page_size
    group = h // hk
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    if not paged_attention_int8_supported(d, page_size):
        raise ValueError(
            f"unsupported int8 paged shape: head_dim={d}, page_size={page_size}"
        )
    kv_len = jnp.asarray(kv_len, jnp.int32).reshape(b)
    max_pages = page_table.shape[1]
    pt_flat = page_table.astype(jnp.int32).reshape(-1)
    rows_per_page = page_size * d // _LANES
    f = _LANES // d
    fused_write = k_new is not None

    gp = max(8, -(-group // 8) * 8)
    lane_pad = _LANES - d  # 128-minor small operands; see decode_attention
    qg = q.reshape(b, hk, group, d)
    if gp != group or lane_pad:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - group), (0, lane_pad)))

    in_specs = [
        pl.BlockSpec((1, hk, gp, _LANES), lambda bi, *_: (bi, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [kv_len, pt_flat, qg, k_pages, v_pages, k_scale_pages, v_scale_pages]
    scratch = [
        pltpu.VMEM((2, hk, rows_per_page, _LANES), jnp.int8),
        pltpu.VMEM((2, hk, rows_per_page, _LANES), jnp.int8),
        pltpu.VMEM((2, 2, hk, 8, _LANES), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 4)),
    ]
    if fused_write:
        def quant(x):
            absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3))
            scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)  # [B, Hk]
            qv = jnp.clip(
                jnp.round(x.astype(jnp.float32) / scale[:, :, None, None]),
                -127, 127,
            ).astype(jnp.int8)
            return qv, scale.astype(jnp.float32)

        knq, kns = quant(k_new)
        vnq, vns = quant(v_new)
        kdq = knq.astype(jnp.float32) * kns[:, :, None, None]
        vdq = vnq.astype(jnp.float32) * vns[:, :, None, None]
        knq = jnp.pad(knq, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        vnq = jnp.pad(vnq, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        kdq = jnp.pad(kdq, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        vdq = jnp.pad(vdq, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        in_specs += [
            pl.BlockSpec((1, hk, 8, _LANES), lambda bi, *_: (bi, 0, 0, 0))
            for _ in range(4)
        ]
        args += [knq, vnq, kdq, vdq]
        scratch += [
            pltpu.VMEM((2, hk, 32, _LANES), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        out_shape = (
            jax.ShapeDtypeStruct((b, hk, gp, _LANES), q.dtype),
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        )
        out_specs = (
            pl.BlockSpec((1, hk, gp, _LANES), lambda bi, *_: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        )
        # flattened operand idx: 0=kv_len, 1=pt, 2=q, 3=k, 4=v → outputs 1,2
        aliases = {3: 1, 4: 2}
    else:
        out_shape = jax.ShapeDtypeStruct((b, hk, gp, _LANES), q.dtype)
        out_specs = pl.BlockSpec((1, hk, gp, _LANES), lambda bi, *_: (bi, 0, 0, 0))
        aliases = {}

    def kernel(kv_len_ref, pt_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, *rest):
        if fused_write:
            kn_ref, vn_ref, kdq_ref, vdq_ref = rest[0:4]
            o_ref, ko_ref, vo_ref = rest[4:7]
            k_buf, v_buf, s_buf, sem_, row_buf, row_sem = rest[7:]
            k_tgt, v_tgt = ko_ref, vo_ref
        else:
            kn_ref = vn_ref = kdq_ref = vdq_ref = row_buf = row_sem = None
            o_ref = rest[0]
            k_buf, v_buf, s_buf, sem_ = rest[1:]
            k_tgt, v_tgt = k_hbm, v_hbm
        _paged_attn_int8_kernel(
            kv_len_ref, pt_ref, q_ref, k_tgt, v_tgt, ks_hbm, vs_hbm,
            kn_ref, vn_ref, kdq_ref, vdq_ref, o_ref,
            k_buf, v_buf, s_buf, sem_, row_buf, row_sem,
            page_size=page_size, rows_per_page=rows_per_page,
            max_pages=max_pages, d=d, sm_scale=sm_scale,
        )

    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * max_pages * page_size * d,
            bytes_accessed=2 * b * hk * max_pages * page_size * d,
            transcendentals=b * h * max_pages * page_size,
        ),
        interpret=interpret,
    )(*args)
    if not fused_write:
        return res[:, :, :group, :d].reshape(b, h, 1, d)
    out, k_out, v_out = res
    out = out[:, :, :group, :d].reshape(b, h, 1, d)

    # Splice the new token's scale into its page's scale tile (a small DUS
    # on the donated scale pool — in place at the jit boundary; the paged
    # engine dispatches per step, not in a scan).
    def splice(pages, new):  # pages [Hk, P, 8, 128], new [B, Hk]
        def one(sp, nv, page, rowi, coli):
            return jax.lax.dynamic_update_slice(
                sp, nv.reshape(hk, 1, 1, 1), (0, page, rowi, coli)
            )

        inpage = jax.lax.rem(kv_len, jnp.int32(page_size))
        pagei = page_table[jnp.arange(b), kv_len // page_size]
        rowi = jax.lax.rem(inpage, f)
        coli = (inpage * d) // _LANES
        out_pages = pages
        for bi in range(b):
            out_pages = one(out_pages, new[bi], pagei[bi], rowi[bi], coli[bi])
        return out_pages

    k_scale_pages = splice(k_scale_pages, kns)
    v_scale_pages = splice(v_scale_pages, vns)
    return out, k_out, v_out, k_scale_pages, v_scale_pages


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "page_size", "interpret"),
)
def paged_decode_attention(
    q,  # [B, H, 1, D]
    k_pages,  # [Hk, n_pages, page_size, D]
    v_pages,
    page_table,  # [B, max_pages] i32 physical page per logical block
    kv_len,  # [B]
    k_new=None,  # [B, Hk, 1, D] appended at kv_len (page must be allocated)
    v_new=None,
    *,
    sm_scale: float | None = None,
    page_size: int | None = None,
    interpret: bool = False,
):
    """Decode attention over a paged KV pool. With k_new/v_new the token is
    appended in place (pages aliased input→output — donate them) and its
    score seeds the softmax; returns (out, k_pages, v_pages), else just out.
    """
    b, h, sq, d = q.shape
    hk, n_pages = k_pages.shape[:2]
    # Pages may arrive pre-FOLDED [Hk, P, page·D/128, 128] (preferred — see
    # decode_attention layout note) or unfolded [Hk, P, page, D].
    if k_pages.shape[-1] == _LANES:
        prefolded = True
        psz = k_pages.shape[2] * _LANES // d
    else:
        prefolded = False
        psz = k_pages.shape[2]
    if page_size is None:
        page_size = psz
    assert sq == 1 and h % hk == 0 and psz == page_size
    group = h // hk
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    if not paged_attention_supported(d, page_size):
        raise ValueError(f"unsupported paged shape: head_dim={d}, page_size={page_size}")
    kv_len = jnp.asarray(kv_len, jnp.int32).reshape(b)
    max_pages = page_table.shape[1]
    pt_flat = page_table.astype(jnp.int32).reshape(-1)
    rows_per_page = page_size * d // _LANES
    fused_write = k_new is not None

    if prefolded:
        kf, vf = k_pages, v_pages
    else:
        kf = k_pages.reshape(hk, n_pages, rows_per_page, _LANES)
        vf = v_pages.reshape(hk, n_pages, rows_per_page, _LANES)

    gp = max(8, -(-group // 8) * 8)
    lane_pad = _LANES - d  # 128-minor small operands; see decode_attention
    qg = q.reshape(b, hk, group, d)
    if gp != group or lane_pad:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - group), (0, lane_pad)))

    in_specs = [
        pl.BlockSpec((1, hk, gp, _LANES), lambda bi, *_: (bi, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [kv_len, pt_flat, qg, kf, vf]
    scratch = [
        pltpu.VMEM((2, hk, rows_per_page, _LANES), k_pages.dtype),
        pltpu.VMEM((2, hk, rows_per_page, _LANES), v_pages.dtype),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if fused_write:
        knp = jnp.pad(k_new, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        vnp = jnp.pad(v_new, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        in_specs += [
            pl.BlockSpec((1, hk, 8, _LANES), lambda bi, *_: (bi, 0, 0, 0)),
            pl.BlockSpec((1, hk, 8, _LANES), lambda bi, *_: (bi, 0, 0, 0)),
        ]
        args += [knp, vnp]
        scratch += [
            pltpu.VMEM((2, hk, 8, _LANES), k_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        out_shape = (
            jax.ShapeDtypeStruct((b, hk, gp, _LANES), q.dtype),
            jax.ShapeDtypeStruct(kf.shape, kf.dtype),
            jax.ShapeDtypeStruct(vf.shape, vf.dtype),
        )
        out_specs = (
            pl.BlockSpec((1, hk, gp, _LANES), lambda bi, *_: (bi, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        )
        # operand indices incl. scalar prefetch: 0=kv_len, 1=pt, 2=q, 3=k, 4=v
        aliases = {3: 1, 4: 2}
    else:
        out_shape = jax.ShapeDtypeStruct((b, hk, gp, _LANES), q.dtype)
        out_specs = pl.BlockSpec((1, hk, gp, _LANES), lambda bi, *_: (bi, 0, 0, 0))
        aliases = {}

    def kernel(kv_len_ref, pt_ref, q_ref, k_hbm, v_hbm, *rest):
        if fused_write:
            kn_ref, vn_ref, o_ref = rest[0], rest[1], rest[2]
            ko_ref, vo_ref = rest[3], rest[4]
            k_buf, v_buf, sem_, row_buf, row_sem = rest[5:]
            k_tgt, v_tgt = ko_ref, vo_ref
        else:
            kn_ref = vn_ref = row_buf = row_sem = None
            o_ref = rest[0]
            k_buf, v_buf, sem_ = rest[1:]
            k_tgt, v_tgt = k_hbm, v_hbm
        _paged_attn_kernel(
            kv_len_ref, pt_ref, q_ref, k_tgt, v_tgt, kn_ref, vn_ref, o_ref,
            k_buf, v_buf, sem_, row_buf, row_sem,
            page_size=page_size, rows_per_page=rows_per_page,
            max_pages=max_pages, d=d, sm_scale=sm_scale,
        )

    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * max_pages * page_size * d,
            bytes_accessed=2 * b * hk * max_pages * page_size * d
            * k_pages.dtype.itemsize,
            transcendentals=b * h * max_pages * page_size,
        ),
        interpret=interpret,
    )(*args)
    if not fused_write:
        return res[:, :, :group, :d].reshape(b, h, 1, d)
    out, k_out, v_out = res
    if not prefolded:
        k_out = k_out.reshape(hk, n_pages, page_size, d)
        v_out = v_out.reshape(hk, n_pages, page_size, d)
    return (out[:, :, :group, :d].reshape(b, h, 1, d), k_out, v_out)
