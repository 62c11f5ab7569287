"""Decode attention (Pallas TPU): one query token against a preallocated KV
cache, reading ONLY the valid prefix from HBM.

The reference's decode step re-runs the whole ONNX attention subgraph over a
concat-grown cache every token (rten-generate/src/generator.rs:511-651,
SURVEY.md §5 "attention itself is unfused"). The TPU-first replacement keeps
the cache preallocated at max_seq and makes attention cost proportional to
the *actual* sequence length: the kernel keeps K/V in HBM (memory_space=ANY)
and issues its own double-buffered async DMAs for ceil(kv_len/block) chunks,
skipping the untouched tail of the cache entirely — a BlockSpec grid would
prefetch every block of max_seq regardless of kv_len.

Two layout decisions keep it DMA-efficient at decode sizes:

- Each chunk spans ALL KV heads ([Hk, rows, 128] strided DMA, one start/wait
  pair per chunk) instead of a grid cell per head — per-token caches are only
  a few MB, so a per-head grid would expose DMA latency 12× per layer.
- Mosaic DMA slices must be 128-lane aligned but head_dim is typically 64,
  so the cache is viewed as [B, Hk, S·D/128, 128] (a free reshape of
  contiguous memory): each 128-lane row packs f = 128/D consecutive tokens.
  The kernel scores the f token sub-columns separately and runs one joint
  online softmax over them — column order inside a block doesn't change
  softmax.

Softmax statistics and the output accumulator are fori_loop carries, f32
throughout, [Hk, Gp, ·] batched over heads (GQA query heads of a group ride
along as rows Gp of their KV head's q tile).

The kernel also performs the CACHE WRITE: the new token's k/v are passed
separately, appended into the HBM cache via an in-kernel read-modify-write
DMA on the (128-lane) row holding position kv_len (caches are aliased
inputs→outputs, so this is a true in-place update), and folded into the
online softmax directly from VMEM — its score never round-trips through
HBM. This replaces the XLA dynamic_update_slice per layer, which measured
~70-86 µs/step for GPT-2-small caches inside lax.scan (XLA materializes
carry copies) versus ~0 here.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128

# Default for the batched single-cell decode mode (see decode_attention's
# ``batched`` kwarg). Read ONCE at import so a mid-process env toggle is
# consistently inert instead of silently serving a stale compiled variant
# (the flag is trace-time state, not part of the jit key). Callers that
# need per-call control pass ``batched=`` explicitly — it IS a jit static.
_BATCHED_ATTN_DEFAULT = os.environ.get("RTEN_BATCHED_ATTN", "0") == "1"


def _norm_rows_f32(x, kind, eps, scale_ref, bias_ref):
    """f32 row-norm used by the whole-block fusion (mirrors quant_matmul's
    _norm_rows; duplicated locally to keep kernel modules import-acyclic)."""
    if kind == "rmsnorm":
        x = x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + eps)
    else:
        mean = jnp.mean(x, -1, keepdims=True)
        xc = x - mean
        x = xc * jax.lax.rsqrt(jnp.mean(xc * xc, -1, keepdims=True) + eps)
    x = x * scale_ref[...].astype(jnp.float32)
    if bias_ref is not None:
        x = x + bias_ref[...].astype(jnp.float32)
    return x


def _activate_f32(x, kind):
    # Same table the fused-MLP kernel uses (gelu = the erf polynomial) so the
    # whole-block fusion is numerically identical to the two-kernel path.
    from rten_tpu.kernels.matmul_pallas import _ACTIVATIONS

    return _ACTIVATIONS[kind](x)


def _decode_attn_kernel(
    # scalar prefetch
    kv_len_ref,
    # inputs
    q_ref,  # [1, Hk, Gp, 128] VMEM (data in lanes :D) — or None with pk_ref
    k_hbm,  # [B, Hk, S*D/128, 128] ANY (stays in HBM; aliased as output)
    v_hbm,
    kn_ref,  # [1, Hk, 8, 128] VMEM — new token's k (row 0, lanes :D) or None
    vn_ref,
    pk_ref,  # [1, 3, Hk, 8, 128] VMEM — packed q|k_new|v_new, or None
    wo_ref,  # [Hk, G·D, Dm] int8 — fused output projection, or None
    wos_ref,  # [1, Dm]
    wob_ref,  # [1, Dm] or None
    res_ref,  # [1, Dm] residual or None
    # outputs
    o_ref,  # [1, Hk, Gp, D] VMEM (or [1, Dm] with fused wo)
    # scratch
    k_buf,  # [2, Hk, rows_per_block, 128] VMEM double buffer
    v_buf,
    sem,  # DMA semaphores [2, 2]
    row_buf,  # [2, Hk, 8, 128] VMEM — RMW row staging (k, v) or None
    row_sem,
    *,
    block_s: int,
    rows_per_block: int,
    d: int,
    group: int,
    sm_scale: float,
    mega=None,  # dict of refs — whole-block fusion (MLP [+ next qkv]); see
    #             decode_attention's ``mlp=``/``next_qkv=`` kwargs
    activation=None,
    norm=None,
    norm_eps: float = 1e-5,
):
    b = pl.program_id(0)
    if mega is not None:
        # Whole-block fusion: the MLP (and next layer's qkv) int8 weights
        # stay in HBM (memory_space=ANY) and stream into VMEM scratch UNDER
        # the attention loop — started here, awaited only after the online
        # softmax finishes. A gridless VMEM BlockSpec would serialize the
        # ~6.5 MB weight DMA BEFORE the kernel body (Pallas waits for all
        # blocks), recreating exactly the per-kernel exposure this fusion
        # removes.
        # Weights may arrive as per-layer [K, N] matrices OR whole-stack
        # [L, K, N] slabs (layer_idx picks the layer). Slabs are the
        # production layout: at GPT-2-small scale XLA's memory-space
        # assignment re-prefetches per-layer matrices into VMEM every scan
        # iteration (85 MB of loop-invariant weights >> VMEM — profiled at
        # ~60 us/step of exposed copy waits); a 28 MB slab is unprefetchable,
        # so the weights stream HERE, overlapped under the attention loop.
        li = mega["layer_idx"]

        def _wsrc(ref):
            return ref.at[li] if ref.ndim == 3 else ref

        wsem = mega["wsem"]
        pltpu.make_async_copy(
            _wsrc(mega["wu_hbm"]), mega["wu_buf"], wsem.at[0]
        ).start()
        pltpu.make_async_copy(
            _wsrc(mega["wd_hbm"]), mega["wd_buf"], wsem.at[1]
        ).start()
        if mega.get("wq_hbm") is not None:
            pltpu.make_async_copy(
                _wsrc(mega["wq_hbm"]), mega["wq_buf"], wsem.at[2]
            ).start()
    length = kv_len_ref[b]
    n_blocks = pl.cdiv(length, block_s)
    f = _LANES // d  # tokens packed per 128-lane buffer row
    if pk_ref is not None:
        hk = pk_ref.shape[2]
        gp = pk_ref.shape[3]
    else:
        hk = q_ref.shape[1]
        gp = q_ref.shape[2]
    has_new = kn_ref is not None or pk_ref is not None

    def _new_tok(which):  # [Hk, 1, D] — the appended token's k (0) or v (1)
        # Operands are lane-padded to 128 so the XLA-side staging fusion
        # stays 128-lane-minor row-major (a 64-minor operand gets a
        # transposed layout + a ~2 µs conversion copy per layer); the
        # static lane slice here is the same op the main loop already uses
        # on k_buf.
        if pk_ref is not None:
            return pk_ref[0, 1 + which, :, 0:1, :d]
        return (kn_ref if which == 0 else vn_ref)[0, :, 0:1, :d]

    def dma(buf_slot, blk_idx):
        row0 = blk_idx * rows_per_block
        kc = pltpu.make_async_copy(
            k_hbm.at[b, :, pl.ds(row0, rows_per_block), :],
            k_buf.at[buf_slot],
            sem.at[buf_slot, 0],
        )
        vc = pltpu.make_async_copy(
            v_hbm.at[b, :, pl.ds(row0, rows_per_block), :],
            v_buf.at[buf_slot],
            sem.at[buf_slot, 1],
        )
        return kc, vc

    @pl.when(n_blocks > 0)
    def _warmup():
        # An unguarded start would leave an un-waited DMA in flight when the
        # valid prefix is empty (kv_len == 0) — a hardware fault at kernel
        # exit, not just waste.
        kc0, vc0 = dma(0, 0)
        kc0.start()
        vc0.start()

    if has_new:
        # Append the new token into the cache: read-modify-write the 8-row
        # (sublane-aligned) window holding position ``length``'s 128-lane
        # row. Valid lanes are written back unchanged, and the main loop
        # masks cols ≥ length, so any interleaving with this write is
        # harmless. DMA choreography: both reads start immediately (they
        # overlap each other and the block-0 warmup), writes start as soon
        # as each merge is done, and write COMPLETION is only awaited at
        # kernel exit — four serialized round-trip latencies (~1-2 µs each,
        # measured ~6 µs/layer of self-time) collapse to roughly one.
        row = (length * d) // _LANES
        row8 = (row // 8) * 8
        local = row - row8
        sub = jax.lax.rem(length, f)  # which D-lane slot inside the row

        def _row_copy(which, hbm, to_hbm: bool):
            args = (row_buf.at[which], hbm.at[b, :, pl.ds(row8, 8), :])
            src, dst = (args if to_hbm else args[::-1])
            return pltpu.make_async_copy(src, dst, row_sem.at[which])

        _row_copy(0, k_hbm, False).start()
        _row_copy(1, v_hbm, False).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (hk, 8, _LANES), 2)
        rows = jax.lax.broadcasted_iota(jnp.int32, (hk, 8, _LANES), 1)
        hit = jnp.logical_and(rows == local, lane // d == sub)

        def _merge(which):
            old = row_buf[which]  # [Hk, 8, 128]
            new = _new_tok(which)  # [Hk, 1, D]
            tiled = jnp.concatenate([new] * f, axis=-1) if f > 1 else new
            row_buf[which] = jnp.where(hit, tiled.astype(old.dtype), old)

        _row_copy(0, k_hbm, False).wait()
        _merge(0)
        _row_copy(0, k_hbm, True).start()
        _row_copy(1, v_hbm, False).wait()
        _merge(1)
        _row_copy(1, v_hbm, True).start()

    q = (pk_ref[0, 0] if pk_ref is not None else q_ref[0])[:, :, :d].astype(
        jnp.float32
    )  # [Hk, Gp, D]

    # Hoist the fused-wo int8→f32 convert ABOVE the cache loop: it has no
    # data dependence on the KV stream, so the VPU unpack (~0.6 MB of
    # weights) runs while the block-0 DMA is still in flight instead of
    # serializing after the softmax (measured as part of the ~2.5 µs/layer
    # kernel-critical-path overhang, r05 XPlane trace).
    wo_f32 = wo_ref[...].astype(jnp.float32) if wo_ref is not None else None

    def body(i, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        # Prefetch the next chunk while this one computes.
        @pl.when(i + 1 < n_blocks)
        def _prefetch():
            kn, vn = dma(next_slot, i + 1)
            kn.start()
            vn.start()

        kw, vw = dma(slot, i)
        kw.wait()
        k = k_buf[slot].astype(jnp.float32)  # [Hk, rpb, 128]

        # Scores per packed sub-column j: token index = i*block_s + r*f + j.
        base = i * block_s
        row_tok = (
            jax.lax.broadcasted_iota(jnp.int32, (hk, gp, rows_per_block), 2) * f
        )
        s_parts = []
        for j in range(f):
            kj = k[:, :, j * d : (j + 1) * d]  # [Hk, rpb, D]
            s = jax.lax.dot_general(
                q,
                kj,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [Hk, Gp, rpb]
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
        v = v_buf[slot].astype(jnp.float32)  # [Hk, rpb, 128]

        l_curr = jnp.zeros_like(l_prev)
        pv = jnp.zeros_like(acc)
        for j, s in enumerate(s_parts):
            p = jnp.exp(s - m_next)  # [Hk, Gp, rpb]
            l_curr = l_curr + jnp.sum(p, axis=2, keepdims=True)
            pv = pv + jax.lax.dot_general(
                p,
                v[:, :, j * d : (j + 1) * d],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        l_next = alpha * l_prev + l_curr
        acc = acc * alpha + pv
        return m_next, l_next, acc

    if has_new:
        # Seed the online softmax with the new token itself (it is the last
        # valid position and always attends to itself): m = its score, l = 1,
        # acc = its value — never read back from HBM.
        k_new = _new_tok(0).astype(jnp.float32)  # [Hk, 1, D]
        s_new = jax.lax.dot_general(
            q, k_new, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hk, Gp, 1]
        if sm_scale != 1.0:
            s_new = s_new * sm_scale
        init = (
            s_new,
            jnp.ones((hk, gp, 1), jnp.float32),
            jnp.broadcast_to(_new_tok(1).astype(jnp.float32), (hk, gp, d)),
        )
    else:
        init = (
            jnp.full((hk, gp, 1), -jnp.inf, jnp.float32),
            jnp.zeros((hk, gp, 1), jnp.float32),
            jnp.zeros((hk, gp, d), jnp.float32),
        )
    m_fin, l_fin, acc = jax.lax.fori_loop(0, n_blocks, body, init)
    l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
    final = acc * l_inv  # [Hk, Gp, D] f32
    if wo_ref is None:
        # Output is lane-padded to 128 for the same layout reason as the
        # inputs (zero-fill via lane concat — the [new]*f pattern above).
        if d < _LANES:
            final = jnp.concatenate(
                [final] + [jnp.zeros_like(final)] * (_LANES // d - 1), axis=-1
            )
        o_ref[0] = final.astype(o_ref.dtype)
    else:
        # Fused output projection: per-head partial matmuls against the
        # head's rows of W_o summed across heads — no lane-crossing reshape
        # of the attention vector, and it never round-trips through HBM.
        attn = final[:, :group, :].reshape(hk, 1, group * d)  # [Hk, 1, G·D]
        part = jax.lax.dot_general(
            attn,
            wo_f32,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hk, 1, Dm]
        out = jnp.sum(part, axis=0) * wos_ref[...].astype(jnp.float32)
        if wob_ref is not None:
            out = out + wob_ref[...].astype(jnp.float32)
        if res_ref is not None:
            # 3-D refs are the sublane-padded per-row layout used when the
            # per-cell grid runs at B>1 (a (1, Dm) block over a [B, Dm]
            # array is illegal Mosaic tiling — the sublane block dim must
            # be 8 or the full array dim); row 0 carries the data.
            r = res_ref[...] if res_ref.ndim == 2 else res_ref[0, 0:1, :]
            out = out + r.astype(jnp.float32)
        if mega is not None:
            # The rest of the transformer block runs here, on weights that
            # streamed in under the attention loop. Dots in bf16 (m=1 rows:
            # f32's slower MXU rate would be fully exposed, see _mlp_kernel),
            # norm/scale/activation math in f32 — numerically identical to
            # the standalone quant_mlp_int8 kernel.
            dd = jnp.bfloat16 if o_ref.dtype == jnp.bfloat16 else jnp.float32
            wsem = mega["wsem"]
            pltpu.make_async_copy(
                mega["wu_hbm"], mega["wu_buf"], wsem.at[0]
            ).wait()
            xn = _norm_rows_f32(
                out, norm, norm_eps, mega["ns_ref"], mega.get("nb_ref")
            )
            up = jnp.dot(
                xn.astype(dd),
                mega["wu_buf"][...].astype(dd),
                preferred_element_type=jnp.float32,
            ) * mega["su_ref"][...]
            if mega.get("bu_ref") is not None:
                up = up + mega["bu_ref"][...].astype(jnp.float32)
            up = _activate_f32(up, activation)
            pltpu.make_async_copy(
                mega["wd_hbm"], mega["wd_buf"], wsem.at[1]
            ).wait()
            down = jnp.dot(
                up.astype(dd),
                mega["wd_buf"][...].astype(dd),
                preferred_element_type=jnp.float32,
            ) * mega["sd_ref"][...]
            if mega.get("bd_ref") is not None:
                down = down + mega["bd_ref"][...].astype(jnp.float32)
            down = down + out  # block residual
            out = down
            if mega.get("wq_hbm") is not None:
                pltpu.make_async_copy(
                    mega["wq_hbm"], mega["wq_buf"], wsem.at[2]
                ).wait()
                xq = _norm_rows_f32(
                    down, norm, norm_eps, mega["qns_ref"], mega.get("qnb_ref")
                )
                qkv = jnp.dot(
                    xq.astype(dd),
                    mega["wq_buf"][...].astype(dd),
                    preferred_element_type=jnp.float32,
                ) * mega["sq_ref"][...]
                if mega.get("bq_ref") is not None:
                    qkv = qkv + mega["bq_ref"][...].astype(jnp.float32)
                mega["oq_ref"][...] = qkv.astype(mega["oq_ref"].dtype)
        if o_ref.ndim == 2:
            o_ref[...] = out.astype(o_ref.dtype)
        else:
            o_ref[0] = jnp.broadcast_to(
                out.astype(o_ref.dtype), o_ref.shape[1:]
            )
    if has_new:
        # Await the deferred cache-append writes only now — an un-waited DMA
        # at kernel exit is a hardware fault, but nothing in THIS kernel
        # reads the written window (cols ≥ length are masked), so the writes
        # ran concurrently with the whole attention loop.
        _row_copy(0, k_hbm, True).wait()
        _row_copy(1, v_hbm, True).wait()


def _decode_attn_kernel_batched(
    # scalar prefetch
    kv_len_ref,  # [B] SMEM
    # inputs
    q_ref,  # [B, Hk, Gp, 128] VMEM (lanes :D) — or None with pk_ref
    k_hbm,  # [B, Hk, S*D/128, 128] ANY (aliased as output)
    v_hbm,
    kn_ref,  # [B, Hk, 8, 128] VMEM (row 0, lanes :D) or None
    vn_ref,
    pk_ref,  # [B, 3, Hk, 8, 128] VMEM or None
    wo_ref,  # [Hk, G·D, Dm] int8 or None
    wos_ref,
    wob_ref,
    res_ref,  # [B, Dm] or None
    # outputs
    o_ref,  # [B, Dm] (fused wo) or [B, Hk, Gp, 128]
    # scratch
    k_buf,  # [2, B, Hk, rows_per_block, 128]
    v_buf,
    sem,  # [2, 2]
    row_buf,  # [2, B, Hk, 8, 128] or None
    row_sem,  # [2, B] or None
    *,
    n_batch: int,
    block_s: int,
    rows_per_block: int,
    d: int,
    group: int,
    sm_scale: float,
):
    """Single-grid-cell BATCHED decode attention: one strided DMA pair per
    cache block covers every batch row at once instead of a grid cell (and
    its own DMA chain) per row — at batch 8 the per-row fixed costs
    (exposed block-0 latency, RMW round trips, per-cell epilogues) collapse
    to one. Rows shorter than the longest read extra masked blocks; serving
    slots have similar lengths, so the waste is small against the saved
    fixed costs. Math is identical to _decode_attn_kernel with the online
    softmax batched over (batch·Hk)."""
    B = n_batch
    f = _LANES // d
    if pk_ref is not None:
        hk = pk_ref.shape[2]
        gp = pk_ref.shape[3]
    else:
        hk = q_ref.shape[1]
        gp = q_ref.shape[2]
    bh = B * hk
    has_new = kn_ref is not None or pk_ref is not None

    # Per-row valid lengths (static unroll — B is small) and their max.
    # Everything per-row stays a TRACED SCALAR compared against iotas:
    # Mosaic cannot shape-cast a 1-D [B] lane vector into sublane dims
    # (tpu.reshape vector<8xi32> -> vector<8x1x1x1xi32> is rejected), so no
    # jnp.stack(lens) / [:, None, ...] anywhere in this kernel.
    lens = [kv_len_ref[bi] for bi in range(B)]
    max_len = lens[0]
    for ln in lens[1:]:
        max_len = jnp.maximum(max_len, ln)
    n_blocks = pl.cdiv(max_len, block_s)

    def dma(buf_slot, blk_idx):
        row0 = blk_idx * rows_per_block
        kc = pltpu.make_async_copy(
            k_hbm.at[:, :, pl.ds(row0, rows_per_block), :],
            k_buf.at[buf_slot],
            sem.at[buf_slot, 0],
        )
        vc = pltpu.make_async_copy(
            v_hbm.at[:, :, pl.ds(row0, rows_per_block), :],
            v_buf.at[buf_slot],
            sem.at[buf_slot, 1],
        )
        return kc, vc

    @pl.when(n_blocks > 0)
    def _warmup():
        kc0, vc0 = dma(0, 0)
        kc0.start()
        vc0.start()

    def _new_tok(which):  # [B, Hk, 1, D]
        if pk_ref is not None:
            return pk_ref[:, 1 + which, :, 0:1, :d]
        return (kn_ref if which == 0 else vn_ref)[:, :, 0:1, :d]

    if has_new:
        # Per-row RMW append: each row's 8-row window differs, so B
        # separate row DMAs per direction — all reads start together,
        # write completion deferred to kernel exit (same choreography as
        # the per-cell kernel, just B-wide).
        rows_of = [(ln * d) // _LANES for ln in lens]
        row8s = [(r // 8) * 8 for r in rows_of]

        def _row_copy(which, bi, hbm, to_hbm: bool):
            args = (
                row_buf.at[which, bi],
                hbm.at[bi, :, pl.ds(row8s[bi], 8), :],
            )
            src, dst = (args if to_hbm else args[::-1])
            return pltpu.make_async_copy(src, dst, row_sem.at[which, bi])

        for bi in range(B):
            _row_copy(0, bi, k_hbm, False).start()
            _row_copy(1, bi, v_hbm, False).start()

        rowi3 = jax.lax.broadcasted_iota(jnp.int32, (hk, 8, _LANES), 1)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (hk, 8, _LANES), 2)

        def _merge(which):
            new = _new_tok(which)  # [B, Hk, 1, D]
            for bi in range(B):  # per-row scalar-vs-iota hit masks
                hit3 = jnp.logical_and(
                    rowi3 == rows_of[bi] - row8s[bi],
                    lane3 // d == jax.lax.rem(lens[bi], f),
                )
                old = row_buf[which, bi]  # [Hk, 8, 128]
                nb = new[bi]  # [Hk, 1, D]
                tiled = jnp.concatenate([nb] * f, axis=-1) if f > 1 else nb
                row_buf[which, bi] = jnp.where(hit3, tiled.astype(old.dtype), old)

        for bi in range(B):
            _row_copy(0, bi, k_hbm, False).wait()
        _merge(0)
        for bi in range(B):
            _row_copy(0, bi, k_hbm, True).start()
            _row_copy(1, bi, v_hbm, False).wait()
        _merge(1)
        for bi in range(B):
            _row_copy(1, bi, v_hbm, True).start()

    q4 = (pk_ref[:, 0] if pk_ref is not None else q_ref[...])[:, :, :, :d]
    q = q4.reshape(bh, gp, d).astype(jnp.float32)  # [BH, Gp, D]
    # Loop-invariant per-(batch·head) length map, [BH, 1, rpb]: built by
    # scalar selects over a bh-iota (B statically unrolled) — never via a
    # 1-D [B] vector reshape, which Mosaic rejects. Broadcasts over Gp in
    # the mask compare below.
    bh_row = jax.lax.broadcasted_iota(jnp.int32, (bh, 1, rows_per_block), 0) // hk
    len_map = jnp.zeros((bh, 1, rows_per_block), jnp.int32)
    for bi, ln in enumerate(lens):
        len_map = jnp.where(bh_row == bi, ln, len_map)
    row_tok = (
        jax.lax.broadcasted_iota(jnp.int32, (bh, 1, rows_per_block), 2) * f
    )

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
        k = k_buf[slot].reshape(bh, rows_per_block, _LANES).astype(jnp.float32)

        base = i * block_s
        s_parts = []
        for j in range(f):
            kj = k[:, :, j * d : (j + 1) * d]  # [BH, rpb, D]
            s = jax.lax.dot_general(
                q,
                kj,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [BH, Gp, rpb]
            if sm_scale != 1.0:
                s = s * sm_scale
            s = jnp.where(
                base + row_tok + j < len_map,
                s,
                DEFAULT_MASK_VALUE,
            )
            s_parts.append(s)

        m_curr = s_parts[0].max(axis=2, keepdims=True)
        for s in s_parts[1:]:
            m_curr = jnp.maximum(m_curr, s.max(axis=2, keepdims=True))
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)

        vw.wait()
        v = v_buf[slot].reshape(bh, rows_per_block, _LANES).astype(jnp.float32)

        l_curr = jnp.zeros_like(l_prev)
        pv = jnp.zeros_like(acc)
        for j, s in enumerate(s_parts):
            p = jnp.exp(s - m_next)
            l_curr = l_curr + jnp.sum(p, axis=2, keepdims=True)
            pv = pv + jax.lax.dot_general(
                p,
                v[:, :, j * d : (j + 1) * d],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        l_next = alpha * l_prev + l_curr
        acc = acc * alpha + pv
        return m_next, l_next, acc

    if has_new:
        k_new = _new_tok(0).reshape(bh, 1, d).astype(jnp.float32)
        s_new = jax.lax.dot_general(
            q, k_new, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [BH, Gp, 1]
        if sm_scale != 1.0:
            s_new = s_new * sm_scale
        init = (
            s_new,
            jnp.ones((bh, gp, 1), jnp.float32),
            jnp.broadcast_to(
                _new_tok(1).reshape(bh, 1, d).astype(jnp.float32), (bh, gp, d)
            ),
        )
    else:
        init = (
            jnp.full((bh, gp, 1), -jnp.inf, jnp.float32),
            jnp.zeros((bh, gp, 1), jnp.float32),
            jnp.zeros((bh, gp, d), jnp.float32),
        )
    m_fin, l_fin, acc = jax.lax.fori_loop(0, n_blocks, body, init)
    l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
    final = acc * l_inv  # [BH, Gp, D] f32
    if wo_ref is None:
        out = final.reshape(B, hk, gp, d)
        if d < _LANES:
            out = jnp.concatenate(
                [out] + [jnp.zeros_like(out)] * (_LANES // d - 1), axis=-1
            )
        o_ref[...] = out.astype(o_ref.dtype)
    else:
        # attn [BH, Gp, D] → [B, Hk, G·D]; per-head dots against the W_o
        # slabs, summed (the head sum IS the K contraction of the flat
        # output projection). A batched dot_general with lhs batch dim 1 ↔
        # rhs batch dim 0 fails Mosaic ("batch dims must be equal" — it
        # requires equal POSITIONS), and flattening attn to [B, Hk·G·D]
        # would be a sublane→lane relayout; the static head loop avoids
        # both.
        attn = final[:, :group, :].reshape(B, hk, group * d)
        out = None
        for hh in range(hk):
            p = jnp.dot(
                attn[:, hh, :],
                wo_ref[hh].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )  # [B, Dm]
            out = p if out is None else out + p
        out = out * wos_ref[...].astype(jnp.float32)
        if wob_ref is not None:
            out = out + wob_ref[...].astype(jnp.float32)
        if res_ref is not None:
            out = out + res_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)
    if has_new:
        for bi in range(B):
            _row_copy(0, bi, k_hbm, True).wait()
            _row_copy(1, bi, v_hbm, True).wait()



def decode_attention_supported(head_dim: int, s_max: int, block_s: int = 256) -> bool:
    bs = min(block_s, s_max)
    return (
        head_dim <= _LANES
        and _LANES % head_dim == 0
        and s_max % bs == 0
        and (bs * head_dim) % _LANES == 0
        # fused cache write RMWs an 8-row window: the folded row count must
        # cover whole windows
        and (s_max * head_dim) % (8 * _LANES) == 0
    )


def mega_block_supported(
    d_model: int,
    ff: int,
    n_qkv: int,
    hk: int,
    head_dim: int,
    s_max: int,
    kv_bytes: int = 2,
    block_s: int = 256,
) -> bool:
    """VMEM-budget + shape gate for the whole-block fusion (attention +
    wo + MLP + next qkv in one kernel). Attention double buffers plus the
    int8 weight set must fit comfortably in VMEM (~16 MB on v5e; budget
    12 MB to leave room for the compiler's own staging)."""
    if not decode_attention_supported(head_dim, s_max, block_s):
        return False
    bs = min(block_s, s_max)
    rows = bs * head_dim // _LANES
    attn_bufs = 2 * 2 * hk * rows * _LANES * kv_bytes  # k/v double buffers
    attn_bufs += 2 * 2 * hk * 8 * _LANES * kv_bytes  # RMW row windows
    weights = d_model * ff * 2 + d_model * n_qkv  # int8 bytes
    return attn_bufs + weights <= (12 << 20)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale",
        "block_s",
        "interpret",
        "batched",
        "activation",
        "norm",
        "norm_eps",
        "layer_idx",
    ),
)
def decode_attention(
    q,
    k_cache,
    v_cache,
    kv_len,
    k_new=None,
    v_new=None,
    wo_q=None,  # [H·D, Dm] int8 — fuse the output projection into the kernel
    wo_scales=None,
    wo_bias=None,
    residual=None,  # [B, Dm] added after the projection
    packed_qkv=None,  # [B, 3, Hk, 8, D] — q|k_new|v_new in ONE operand
    mlp=None,  # (w_up_q [Dm,FF] int8, up_scales [FF], w_down_q [FF,Dm] int8,
    #            down_scales [Dm], b_up|None, b_down|None,
    #            ln2_scale [Dm], ln2_bias [Dm]|None) — fuse the WHOLE
    #            transformer block into this kernel (requires fused wo +
    #            residual; B == 1, per-cell path)
    next_qkv=None,  # (w_qkv [Dm,Nq] int8, scales [Nq], bias [Nq]|None,
    #                 next_ln_scale [Dm], next_ln_bias [Dm]|None)
    *,
    sm_scale: float | None = None,
    block_s: int = 256,
    interpret: bool = False,
    batched: bool | None = None,
    activation: str | None = "gelu",
    norm: str | None = "layernorm",
    norm_eps: float = 1e-5,
    layer_idx: int = 0,  # static; selects the layer when mlp/next_qkv
    #                      weights are whole-stack [L, K, N] slabs
):
    """softmax(q @ kᵀ · scale) @ v over the valid cache prefix.

    q: [B, H, 1, D] (the current token's queries — seq_q must be 1);
    k_cache/v_cache: [B, Hk, S, D] preallocated, H % Hk == 0.

    Without k_new/v_new: kv_len is the valid prefix INCLUDING the current
    token (its K/V already written at kv_len-1); returns the attention
    output [B, H, 1, D].

    With k_new/v_new ([B, Hk, 1, D]): kv_len is the prefix length BEFORE
    this token; the kernel appends k_new/v_new into the caches at position
    kv_len (in-place — the caches are aliased input→output buffers, the
    caller MUST donate them) and attends over prefix+new. Returns
    (out, k_cache, v_cache).

    With ``packed_qkv`` (instead of q/k_new/v_new; MHA + fused wo only):
    the query and the appended token arrive as ONE [B, 3, Hk, 8, D] operand
    that the caller builds straight from the flat qkv projection — one XLA
    staging fusion per layer instead of ~6 split/reshape/pad ops.

    Causality is implied either way: the single query is the last valid
    position.

    With ``mlp`` the ENTIRE transformer block runs as this one kernel:
    attention → wo + residual → ln2 → up → activation → down + residual,
    and with ``next_qkv`` additionally the NEXT layer's pre-norm + qkv
    projection of the block output. The MLP/qkv int8 weights stay in HBM
    and stream into VMEM scratch UNDER the attention loop (started at
    kernel entry, awaited after the softmax accumulation) — the ~6.5 MB
    weight DMA and the KV-cache stream overlap instead of paying two
    kernel launches + exposed DMA round-trips per layer. Returns
    (x, k_cache, v_cache) or (x, qkv_next, k_cache, v_cache).
    """
    packed = packed_qkv is not None
    megafused = mlp is not None
    if megafused:
        assert wo_q is not None and residual is not None, (
            "mlp fusion requires the fused wo projection + residual"
        )
        assert norm is not None, "mlp fusion requires fused norms"
        assert next_qkv is None or norm is not None
    if packed:
        assert q is None and k_new is None and v_new is None
        assert wo_q is not None, "packed_qkv requires the fused wo projection"
        b, three, hk, gp_in, d = packed_qkv.shape
        assert three == 3 and gp_in in (1, 8)
        h = wo_q.shape[0] // d
        group = h // hk
        assert group <= 8, "packed_qkv supports group <= 8"
        # A 1-row packed operand is sublane-padded with ZEROS: rows 1..7 of
        # q would be zero queries for GQA groups > 1 — silently-uniform
        # attention, not an error. Require the caller to pre-pad instead.
        assert gp_in == 8 or group == 1, (
            "packed_qkv with gp=1 requires MHA (group == 1); pre-pad the "
            "group rows for GQA"
        )
    else:
        b, h, sq, d = q.shape
        assert sq == 1, "decode_attention handles exactly one query position"
        hk = k_cache.shape[1]
        assert h % hk == 0
        group = h // hk
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    if megafused:
        # A grid cell per batch row would re-stream the whole MLP weight set
        # B times; the fusion is a batch-1 (latency-bound) decode optimization.
        assert b == 1, "mlp fusion supports batch 1 (per-cell grid)"
    kv_len = jnp.asarray(kv_len, jnp.int32).reshape(b)

    # Caches may arrive UNFOLDED [B, Hk, S, D] or pre-FOLDED
    # [B, Hk, S·D/128, 128]. Folded storage is strongly preferred: with a
    # 64-lane minor dim XLA assigns a transposed layout to the unfolded
    # array and inserts a full-cache conversion copy around every aliased
    # custom call (~3 µs per leaf per step); the folded form's 128-lane
    # minor dim keeps the row-major layout end to end. (For d == 128 the
    # two forms coincide.)
    if k_cache.shape[-1] == _LANES:
        prefolded = True
        s_max = k_cache.shape[2] * _LANES // d
        kf, vf = k_cache, v_cache
    else:
        prefolded = False
        s_max = k_cache.shape[2]
        kf = k_cache.reshape(b, hk, s_max * d // _LANES, _LANES)
        vf = v_cache.reshape(b, hk, s_max * d // _LANES, _LANES)

    block_s = min(block_s, s_max)
    if not decode_attention_supported(d, s_max, block_s):
        raise ValueError(
            f"decode_attention needs head_dim | 128 and block-aligned cache; "
            f"got head_dim={d}, s_max={s_max}, block_s={block_s}"
        )
    rows_per_block = block_s * d // _LANES
    fused_write = packed or k_new is not None

    gp = max(8, -(-group // 8) * 8)
    # Small per-token operands are padded out to the FULL 128-lane minor
    # dim (not just the 8-sublane minimum): a head_dim-64-minor operand
    # gets a transposed XLA layout and a lane→sublane conversion fusion
    # per layer (~2 µs × n_layers of the decode step — the staging cost
    # STATUS.md tracks); a 128-minor operand keeps row-major end to end
    # and the kernel just lane-slices [..., :d].
    lane_pad = _LANES - d
    # Batched single-cell mode (serving batches): every batch row handled
    # in ONE grid cell with strided [B, ...] DMAs — per-row fixed costs
    # (exposed block-0 latency, RMW round trips) collapse to one. Default
    # comes from RTEN_BATCHED_ATTN read once at module import; per-call
    # override via the ``batched`` jit-static kwarg.
    if batched is None:
        batched = _BATCHED_ATTN_DEFAULT
    batched = batched and b > 1
    if batched:
        # Shrink the cache block so the [2, B, Hk, rpb, 128] double buffers
        # stay within a ~24 MB VMEM budget; must keep dividing s_max.
        bytes_per = k_cache.dtype.itemsize
        while (
            2 * 2 * b * hk * rows_per_block * _LANES * bytes_per > 24 << 20
            and block_s % 2 == 0
            and s_max % (block_s // 2) == 0
            and ((block_s // 2) * d) % _LANES == 0
        ):
            block_s //= 2
            rows_per_block = block_s * d // _LANES
        if 2 * 2 * b * hk * rows_per_block * _LANES * bytes_per > 24 << 20:
            # Shrinking stalled (divisibility/alignment blocked halving) but
            # the double buffers are still over budget: degrade to the
            # per-cell grid kernel instead of dying in Mosaic's VMEM check.
            batched = False
    lead = b if batched else 1
    _ix = (lambda bi: 0) if batched else (lambda bi: bi)
    if packed:
        if gp_in == 1:
            packed_qkv = jnp.pad(
                packed_qkv, ((0, 0), (0, 0), (0, 0), (0, 7), (0, lane_pad))
            )
        elif lane_pad:
            packed_qkv = jnp.pad(
                packed_qkv, ((0, 0), (0, 0), (0, 0), (0, 0), (0, lane_pad))
            )
        in_specs = [
            pl.BlockSpec(
                (lead, 3, hk, gp, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args = [kv_len, packed_qkv, kf, vf]
    else:
        # [B, H, 1, D] -> [B, Hk, group, D], pad group rows to the f32
        # sublane minimum so the q tile is a legal VMEM shape.
        qg = q.reshape(b, hk, group, d)
        if gp != group or lane_pad:
            qg = jnp.pad(
                qg, ((0, 0), (0, 0), (0, gp - group), (0, lane_pad))
            )
        in_specs = [
            pl.BlockSpec(
                (lead, hk, gp, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args = [kv_len, qg, kf, vf]
    if batched:
        scratch = [
            pltpu.VMEM((2, b, hk, rows_per_block, _LANES), k_cache.dtype),
            pltpu.VMEM((2, b, hk, rows_per_block, _LANES), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    else:
        scratch = [
            pltpu.VMEM((2, hk, rows_per_block, _LANES), k_cache.dtype),
            pltpu.VMEM((2, hk, rows_per_block, _LANES), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    out_dtype = packed_qkv.dtype if packed else q.dtype
    fused_wo = wo_q is not None
    # Per-cell grid at B>1: a (1, Dm) block over a [B, Dm] array is illegal
    # Mosaic tiling (sublane block dim must be 8 or the full array dim), so
    # per-row 2-D operands get a sublane-padded [B, 8, Dm] layout with
    # (1, 8, Dm) blocks; row 0 carries the data.
    pad_rows = fused_wo and not batched and b > 1
    if fused_wo:
        dm = wo_q.shape[1]
        assert wo_q.shape[0] == h * d, (wo_q.shape, h, d)
        if pad_rows:
            attn_out_shape = jax.ShapeDtypeStruct((b, 8, dm), out_dtype)
            attn_out_spec = pl.BlockSpec(
                (1, 8, dm), lambda bi, *_: (bi, 0, 0)
            )
        else:
            attn_out_shape = jax.ShapeDtypeStruct((b, dm), out_dtype)
            attn_out_spec = pl.BlockSpec(
                (lead, dm), lambda bi, *_: (_ix(bi), 0)
            )
    else:
        attn_out_shape = jax.ShapeDtypeStruct((b, hk, gp, _LANES), out_dtype)
        attn_out_spec = pl.BlockSpec(
            (lead, hk, gp, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0)
        )

    if fused_write and not packed:
        knp = jnp.pad(k_new, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        vnp = jnp.pad(v_new, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        in_specs += [
            pl.BlockSpec(
                (lead, hk, 8, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0)
            ),
            pl.BlockSpec(
                (lead, hk, 8, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0)
            ),
        ]
        args += [knp, vnp]
    if fused_write:
        if batched:
            scratch += [
                pltpu.VMEM((2, b, hk, 8, _LANES), k_cache.dtype),
                pltpu.SemaphoreType.DMA((2, b)),
            ]
        else:
            scratch += [
                pltpu.VMEM((2, hk, 8, _LANES), k_cache.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]

    wo_have = []
    if fused_wo:
        args.append(wo_q.reshape(hk, group * d, dm))
        in_specs.append(pl.BlockSpec((hk, group * d, dm), lambda bi, *_: (0, 0, 0)))
        args.append(wo_scales.reshape(1, -1))
        in_specs.append(pl.BlockSpec((1, dm), lambda bi, *_: (0, 0)))
        if wo_bias is not None:
            args.append(wo_bias.reshape(1, -1))
            in_specs.append(pl.BlockSpec((1, dm), lambda bi, *_: (0, 0)))
            wo_have.append("wob")
        if residual is not None:
            if pad_rows:
                args.append(
                    jnp.pad(
                        residual.reshape(b, 1, dm), ((0, 0), (0, 7), (0, 0))
                    )
                )
                in_specs.append(
                    pl.BlockSpec((1, 8, dm), lambda bi, *_: (bi, 0, 0))
                )
            else:
                args.append(residual.reshape(b, dm))
                in_specs.append(
                    pl.BlockSpec((lead, dm), lambda bi, *_: (_ix(bi), 0))
                )
            wo_have.append("res")

    mega_have = []
    n_q = 0
    if megafused:
        w_up_q, up_scales, w_down_q, down_scales, b_up, b_down, ns, nb = mlp
        ff = w_up_q.shape[-1]
        assert w_up_q.shape[-2:] == (dm, ff) and w_down_q.shape[-2:] == (ff, dm)
        assert w_up_q.ndim == w_down_q.ndim  # both per-layer or both slabs
        # Weight matrices stay in HBM (ANY): the kernel streams them into
        # VMEM scratch under the attention loop. Small per-channel params
        # ride in as ordinary VMEM blocks.
        args.append(w_up_q)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(up_scales.reshape(1, ff))
        in_specs.append(pl.BlockSpec((1, ff), lambda bi, *_: (0, 0)))
        args.append(w_down_q)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(down_scales.reshape(1, dm))
        in_specs.append(pl.BlockSpec((1, dm), lambda bi, *_: (0, 0)))
        for name, val, width in (
            ("bu_ref", b_up, ff),
            ("bd_ref", b_down, dm),
            ("ns_ref", ns, dm),
            ("nb_ref", nb, dm),
        ):
            if val is not None:
                args.append(val.reshape(1, width))
                in_specs.append(
                    pl.BlockSpec((1, width), lambda bi, *_: (0, 0))
                )
                mega_have.append(name)
        if next_qkv is not None:
            w_qkv, sq, bq, qns, qnb = next_qkv
            n_q = w_qkv.shape[-1]
            assert w_qkv.shape[-2:] == (dm, n_q)
            args.append(w_qkv)
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            mega_have.append("wq_hbm")
            for name, val, width in (
                ("sq_ref", sq, n_q),
                ("bq_ref", bq, n_q),
                ("qns_ref", qns, dm),
                ("qnb_ref", qnb, dm),
            ):
                if val is not None:
                    args.append(val.reshape(1, width))
                    in_specs.append(
                        pl.BlockSpec((1, width), lambda bi, *_: (0, 0))
                    )
                    mega_have.append(name)

    if fused_write:
        out_shape = (
            attn_out_shape,
            jax.ShapeDtypeStruct(kf.shape, kf.dtype),
            jax.ShapeDtypeStruct(vf.shape, vf.dtype),
        )
        out_specs = (
            attn_out_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        )
        # Flattened operand indices include the scalar-prefetch arg:
        # 0=kv_len, 1=q, 2=k cache, 3=v cache → outputs 1, 2.
        aliases = {2: 1, 3: 2}
    else:
        out_shape = attn_out_shape
        out_specs = attn_out_spec
        aliases = {}
    if next_qkv is not None:
        # qkv output appended LAST so the cache alias output indices above
        # stay valid.
        out_shape = (*out_shape, jax.ShapeDtypeStruct((b, n_q), out_dtype)) if isinstance(out_shape, tuple) else (out_shape, jax.ShapeDtypeStruct((b, n_q), out_dtype))
        out_specs = (*out_specs, pl.BlockSpec((b, n_q), lambda bi, *_: (0, 0))) if isinstance(out_specs, tuple) else (out_specs, pl.BlockSpec((b, n_q), lambda bi, *_: (0, 0)))
    if megafused:
        scratch += [
            pltpu.VMEM((dm, ff), w_up_q.dtype),
            pltpu.VMEM((ff, dm), w_down_q.dtype),
        ]
        if next_qkv is not None:
            scratch.append(pltpu.VMEM((dm, n_q), w_qkv.dtype))
        scratch.append(pltpu.SemaphoreType.DMA((3,)))

    def kernel(kv_len_ref, first_ref, k_hbm, v_hbm, *rest):
        rest = list(rest)
        pk_ref = first_ref if packed else None
        q_ref = None if packed else first_ref
        if fused_write and not packed:
            kn_ref, vn_ref = rest.pop(0), rest.pop(0)
        else:
            kn_ref = vn_ref = None
        if fused_wo:
            wo_ref, wos_ref = rest.pop(0), rest.pop(0)
            wob_ref = rest.pop(0) if "wob" in wo_have else None
            res_ref = rest.pop(0) if "res" in wo_have else None
        else:
            wo_ref = wos_ref = wob_ref = res_ref = None
        mega = None
        if megafused:
            mega = {
                "wu_hbm": rest.pop(0),
                "su_ref": rest.pop(0),
                "wd_hbm": rest.pop(0),
                "sd_ref": rest.pop(0),
            }
            for name in ("bu_ref", "bd_ref", "ns_ref", "nb_ref"):
                if name in mega_have:
                    mega[name] = rest.pop(0)
            if "wq_hbm" in mega_have:
                mega["wq_hbm"] = rest.pop(0)
                for name in ("sq_ref", "bq_ref", "qns_ref", "qnb_ref"):
                    if name in mega_have:
                        mega[name] = rest.pop(0)
            mega["layer_idx"] = layer_idx
            # Mega scratch rides at the TAIL of the scratch list:
            # [..., wu_buf, wd_buf, (wq_buf), wsem].
            mega["wsem"] = rest.pop()
            if "wq_hbm" in mega_have:
                mega["wq_buf"] = rest.pop()
            mega["wd_buf"] = rest.pop()
            mega["wu_buf"] = rest.pop()
        if fused_write:
            o_ref, ko_ref, vo_ref = rest.pop(0), rest.pop(0), rest.pop(0)
            if mega is not None and "wq_hbm" in mega_have:
                mega["oq_ref"] = rest.pop(0)
            k_buf, v_buf, sem_, row_buf, row_sem = rest
            # Aliased outputs ARE the input buffers; write through them.
            k_tgt, v_tgt = ko_ref, vo_ref
        else:
            row_buf = row_sem = None
            o_ref = rest.pop(0)
            if mega is not None and "wq_hbm" in mega_have:
                mega["oq_ref"] = rest.pop(0)
            k_buf, v_buf, sem_ = rest
            k_tgt, v_tgt = k_hbm, v_hbm
        if batched:
            _decode_attn_kernel_batched(
                kv_len_ref, q_ref, k_tgt, v_tgt, kn_ref, vn_ref, pk_ref,
                wo_ref, wos_ref, wob_ref, res_ref, o_ref,
                k_buf, v_buf, sem_, row_buf, row_sem,
                n_batch=b, block_s=block_s, rows_per_block=rows_per_block,
                d=d, group=group, sm_scale=sm_scale,
            )
        else:
            _decode_attn_kernel(
                kv_len_ref, q_ref, k_tgt, v_tgt, kn_ref, vn_ref, pk_ref,
                wo_ref, wos_ref, wob_ref, res_ref, o_ref,
                k_buf, v_buf, sem_, row_buf, row_sem,
                block_s=block_s, rows_per_block=rows_per_block,
                d=d, group=group, sm_scale=sm_scale,
                mega=mega, activation=activation, norm=norm,
                norm_eps=norm_eps,
            )

    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,) if batched else (b,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) if batched else ("parallel",),
            # Batched mode carries [2, B, Hk, rpb, 128] double buffers + the
            # per-row RMW window; Mosaic's default scoped-vmem limit is
            # 16 MB and the shrink loop budgets 24 MB (BATTERY_r05
            # batchedab1 died on exactly this: 19.25M > 16M stack OOM).
            **({"vmem_limit_bytes": 100 << 20} if batched else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_max * d,
            bytes_accessed=2 * b * hk * s_max * d * k_cache.dtype.itemsize,
            transcendentals=b * h * s_max,
        ),
        interpret=interpret,
    )(*args)
    def finish_attn(out):
        if fused_wo:
            if pad_rows:
                out = out[:, 0, :]  # drop the sublane padding rows
            return out  # [B, Dm] projected hidden
        return out[:, :, :group, :d].reshape(b, h, 1, d)

    if fused_write:
        if next_qkv is not None:
            out, k_out, v_out, oq = res
        else:
            out, k_out, v_out = res
        if not prefolded:
            k_out = k_out.reshape(b, hk, s_max, d)
            v_out = v_out.reshape(b, hk, s_max, d)
        if next_qkv is not None:
            return (finish_attn(out), oq, k_out, v_out)
        return (finish_attn(out), k_out, v_out)
    if next_qkv is not None:
        out, oq = res
        return (finish_attn(out), oq)
    return finish_attn(res)


# ---------------------------------------------------------------------------
# INT8 KV-cache variant (BASELINE config 4: encoder-decoder with INT8 KV).
# Same structure as the bf16 kernel; the cache stays int8 END TO END — the
# guide's quantized-paged-attention recipe (load int8 payload + scales,
# dequantize in VMEM) — instead of materializing a dequantized copy of the
# whole cache every step. K's per-token scale multiplies the score columns;
# V's folds into p before the PV matmul (column scale of p = row scale of v).
# ---------------------------------------------------------------------------


def _decode_attn_int8_kernel(
    kv_len_ref,
    q_ref,  # [1, Hk, Gp, D] VMEM f32/bf16
    k_hbm,  # [B, Hk, S*D/128, 128] int8 ANY (aliased output when writing)
    v_hbm,
    ks_hbm,  # [B, Hk, 8, S*D/128] f32 — scale of token t at [t % f, t*D//128]
    vs_hbm,
    kn_ref,  # [1, Hk, 8, D] int8 (row 0 = new token) or None
    vn_ref,
    kdq_ref,  # [1, Hk, 8, D] f32 — dequantized new token (seed math) or None
    vdq_ref,
    o_ref,
    k_buf,  # [2, Hk, rpb, 128] int8
    v_buf,
    s_buf,  # [2, 2, Hk, 8, rpb] f32 (k scales, v scales)
    sem,  # DMA sems [2, 4]
    row_buf,  # [2, Hk, 32, 128] int8 RMW staging or None
    row_sem,
    *,
    block_s: int,
    rows_per_block: int,
    d: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    length = kv_len_ref[b]
    n_blocks = pl.cdiv(length, block_s)
    f = _LANES // d
    hk = q_ref.shape[1]
    gp = q_ref.shape[2]

    def dma(buf_slot, blk_idx):
        row0 = blk_idx * rows_per_block
        return (
            pltpu.make_async_copy(
                k_hbm.at[b, :, pl.ds(row0, rows_per_block), :],
                k_buf.at[buf_slot],
                sem.at[buf_slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[b, :, pl.ds(row0, rows_per_block), :],
                v_buf.at[buf_slot],
                sem.at[buf_slot, 1],
            ),
            pltpu.make_async_copy(
                ks_hbm.at[b, :, :, pl.ds(row0, rows_per_block)],
                s_buf.at[buf_slot, 0],
                sem.at[buf_slot, 2],
            ),
            pltpu.make_async_copy(
                vs_hbm.at[b, :, :, pl.ds(row0, rows_per_block)],
                s_buf.at[buf_slot, 1],
                sem.at[buf_slot, 3],
            ),
        )

    @pl.when(n_blocks > 0)
    def _warmup():
        for copy in dma(0, 0):
            copy.start()

    if kn_ref is not None:
        # In-kernel int8 cache append: 32-row RMW window (int8 sublane
        # tiles), with the same overlapped choreography as the bf16 kernel —
        # reads start together, write completion deferred to kernel exit.
        row = (length * d) // _LANES
        row32 = (row // 32) * 32
        local = row - row32
        sub = jax.lax.rem(length, f)

        def _row_copy(which, hbm, to_hbm: bool):
            args = (row_buf.at[which], hbm.at[b, :, pl.ds(row32, 32), :])
            src, dst = (args if to_hbm else args[::-1])
            return pltpu.make_async_copy(src, dst, row_sem.at[which])

        _row_copy(0, k_hbm, False).start()
        _row_copy(1, v_hbm, False).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (hk, 32, _LANES), 2)
        rows = jax.lax.broadcasted_iota(jnp.int32, (hk, 32, _LANES), 1)
        hit = jnp.logical_and(rows == local, lane // d == sub)

        def _merge(which, src_new_ref):
            old = row_buf[which]  # [Hk, 32, 128]
            new = src_new_ref[0, :, 0:1, :d]  # [Hk, 1, D] (lanes :D valid)
            tiled = jnp.concatenate([new] * f, axis=-1) if f > 1 else new
            row_buf[which] = jnp.where(hit, tiled.astype(old.dtype), old)

        _row_copy(0, k_hbm, False).wait()
        _merge(0, kn_ref)
        _row_copy(0, k_hbm, True).start()
        _row_copy(1, v_hbm, False).wait()
        _merge(1, vn_ref)
        _row_copy(1, v_hbm, True).start()

    q = q_ref[0][:, :, :d].astype(jnp.float32)  # [Hk, Gp, D]

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
        k = k_buf[slot].astype(jnp.float32)  # [Hk, rpb, 128]
        k_scales = s_buf[slot, 0]  # [Hk, 8, rpb]

        base = i * block_s
        row_tok = jax.lax.broadcasted_iota(jnp.int32, (hk, gp, rows_per_block), 2) * f
        s_parts = []
        for j in range(f):
            kj = k[:, :, j * d : (j + 1) * d]
            s = jax.lax.dot_general(
                q, kj, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [Hk, Gp, rpb]
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
        v_scales = s_buf[slot, 1]

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
        k_new = kdq_ref[0, :, 0:1, :d].astype(jnp.float32)  # [Hk, 1, D]
        s_new = jax.lax.dot_general(
            q, k_new, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hk, Gp, 1]
        s_new = s_new * sm_scale
        v_seed = vdq_ref[0, :, 0:1, :d].astype(jnp.float32)
        init = (
            s_new,
            jnp.ones((hk, gp, 1), jnp.float32),
            jnp.broadcast_to(v_seed, (hk, gp, d)),
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
    if d < _LANES:  # lane-pad the output to 128-minor (see bf16 kernel)
        final = jnp.concatenate(
            [final] + [jnp.zeros_like(final)] * (_LANES // d - 1), axis=-1
        )
    o_ref[0] = final.astype(o_ref.dtype)
    if kn_ref is not None:
        _row_copy(0, k_hbm, True).wait()
        _row_copy(1, v_hbm, True).wait()


def _decode_attn_int8_kernel_batched(
    kv_len_ref,  # [B] SMEM
    q_ref,  # [B, Hk, Gp, 128] VMEM f32/bf16 (lanes :D)
    k_hbm,  # [B, Hk, S*D/128, 128] int8 ANY (aliased when writing)
    v_hbm,
    ks_hbm,  # [B, Hk, 8, S*D/128] f32 scale pages
    vs_hbm,
    kn_ref,  # [B, Hk, 8, 128] int8 (row 0, lanes :D) or None
    vn_ref,
    kdq_ref,  # [B, Hk, 8, 128] f32 dequantized new token or None
    vdq_ref,
    o_ref,  # [B, Hk, Gp, 128]
    k_buf,  # [2, B, Hk, rpb, 128] int8
    v_buf,
    s_buf,  # [2, 2, B, Hk, 8, rpb] f32
    sem,  # [2, 4]
    row_buf,  # [2, B, Hk, 32, 128] int8 or None
    row_sem,  # [2, B] or None
    *,
    n_batch: int,
    block_s: int,
    rows_per_block: int,
    d: int,
    sm_scale: float,
):
    """Batched single-cell variant of _decode_attn_int8_kernel — the int8-KV
    twin of _decode_attn_kernel_batched (strided [B, ...] payload + scale
    DMAs, (batch·Hk)-batched online softmax, per-row 32-row RMW appends
    with deferred write waits)."""
    B = n_batch
    f = _LANES // d
    hk = q_ref.shape[1]
    gp = q_ref.shape[2]
    bh = B * hk

    # Traced scalars only (see _decode_attn_kernel_batched: Mosaic rejects
    # 1-D [B] vector reshapes into sublane dims).
    lens = [kv_len_ref[bi] for bi in range(B)]
    max_len = lens[0]
    for ln in lens[1:]:
        max_len = jnp.maximum(max_len, ln)
    n_blocks = pl.cdiv(max_len, block_s)

    def dma(buf_slot, blk_idx):
        row0 = blk_idx * rows_per_block
        return (
            pltpu.make_async_copy(
                k_hbm.at[:, :, pl.ds(row0, rows_per_block), :],
                k_buf.at[buf_slot],
                sem.at[buf_slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[:, :, pl.ds(row0, rows_per_block), :],
                v_buf.at[buf_slot],
                sem.at[buf_slot, 1],
            ),
            pltpu.make_async_copy(
                ks_hbm.at[:, :, :, pl.ds(row0, rows_per_block)],
                s_buf.at[buf_slot, 0],
                sem.at[buf_slot, 2],
            ),
            pltpu.make_async_copy(
                vs_hbm.at[:, :, :, pl.ds(row0, rows_per_block)],
                s_buf.at[buf_slot, 1],
                sem.at[buf_slot, 3],
            ),
        )

    @pl.when(n_blocks > 0)
    def _warmup():
        for copy in dma(0, 0):
            copy.start()

    if kn_ref is not None:
        rows_of = [(ln * d) // _LANES for ln in lens]
        row32s = [(r // 32) * 32 for r in rows_of]

        def _row_copy(which, bi, hbm, to_hbm: bool):
            args = (
                row_buf.at[which, bi],
                hbm.at[bi, :, pl.ds(row32s[bi], 32), :],
            )
            src, dst = (args if to_hbm else args[::-1])
            return pltpu.make_async_copy(src, dst, row_sem.at[which, bi])

        for bi in range(B):
            _row_copy(0, bi, k_hbm, False).start()
            _row_copy(1, bi, v_hbm, False).start()

        rowi3 = jax.lax.broadcasted_iota(jnp.int32, (hk, 32, _LANES), 1)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (hk, 32, _LANES), 2)

        def _merge(which, src_new_ref):
            new = src_new_ref[:, :, 0:1, :d]  # [B, Hk, 1, D]
            for bi in range(B):  # per-row scalar-vs-iota hit masks
                hit3 = jnp.logical_and(
                    rowi3 == rows_of[bi] - row32s[bi],
                    lane3 // d == jax.lax.rem(lens[bi], f),
                )
                old = row_buf[which, bi]  # [Hk, 32, 128]
                nb = new[bi]  # [Hk, 1, D]
                tiled = jnp.concatenate([nb] * f, axis=-1) if f > 1 else nb
                row_buf[which, bi] = jnp.where(hit3, tiled.astype(old.dtype), old)

        for bi in range(B):
            _row_copy(0, bi, k_hbm, False).wait()
        _merge(0, kn_ref)
        for bi in range(B):
            _row_copy(0, bi, k_hbm, True).start()
            _row_copy(1, bi, v_hbm, False).wait()
        _merge(1, vn_ref)
        for bi in range(B):
            _row_copy(1, bi, v_hbm, True).start()

    q = q_ref[...][:, :, :, :d].reshape(bh, gp, d).astype(jnp.float32)
    # Loop-invariant [BH, 1, rpb] length map via scalar selects (no 1-D
    # vector reshapes — see _decode_attn_kernel_batched).
    bh_row = jax.lax.broadcasted_iota(jnp.int32, (bh, 1, rows_per_block), 0) // hk
    len_map = jnp.zeros((bh, 1, rows_per_block), jnp.int32)
    for bi, ln in enumerate(lens):
        len_map = jnp.where(bh_row == bi, ln, len_map)
    row_tok = (
        jax.lax.broadcasted_iota(jnp.int32, (bh, 1, rows_per_block), 2) * f
    )

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
        k = k_buf[slot].reshape(bh, rows_per_block, _LANES).astype(jnp.float32)
        k_scales = s_buf[slot, 0].reshape(bh, 8, rows_per_block)

        base = i * block_s
        s_parts = []
        for j in range(f):
            kj = k[:, :, j * d : (j + 1) * d]
            s = jax.lax.dot_general(
                q, kj, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [BH, Gp, rpb]
            s = s * k_scales[:, j : j + 1, :] * sm_scale
            s = jnp.where(
                base + row_tok + j < len_map,
                s,
                DEFAULT_MASK_VALUE,
            )
            s_parts.append(s)

        m_curr = s_parts[0].max(axis=2, keepdims=True)
        for s in s_parts[1:]:
            m_curr = jnp.maximum(m_curr, s.max(axis=2, keepdims=True))
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)

        vc.wait()
        vsc.wait()
        v = v_buf[slot].reshape(bh, rows_per_block, _LANES).astype(jnp.float32)
        v_scales = s_buf[slot, 1].reshape(bh, 8, rows_per_block)

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
        k_new = kdq_ref[:, :, 0:1, :d].reshape(bh, 1, d).astype(jnp.float32)
        s_new = jax.lax.dot_general(
            q, k_new, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s_new = s_new * sm_scale
        v_seed = vdq_ref[:, :, 0:1, :d].reshape(bh, 1, d).astype(jnp.float32)
        init = (
            s_new,
            jnp.ones((bh, gp, 1), jnp.float32),
            jnp.broadcast_to(v_seed, (bh, gp, d)),
        )
    else:
        init = (
            jnp.full((bh, gp, 1), -jnp.inf, jnp.float32),
            jnp.zeros((bh, gp, 1), jnp.float32),
            jnp.zeros((bh, gp, d), jnp.float32),
        )
    m_fin, l_fin, acc = jax.lax.fori_loop(0, n_blocks, body, init)
    l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
    final = (acc * l_inv).reshape(B, hk, gp, d)
    if d < _LANES:
        final = jnp.concatenate(
            [final] + [jnp.zeros_like(final)] * (_LANES // d - 1), axis=-1
        )
    o_ref[...] = final.astype(o_ref.dtype)
    if kn_ref is not None:
        for bi in range(B):
            _row_copy(0, bi, k_hbm, True).wait()
            _row_copy(1, bi, v_hbm, True).wait()



def pack_kv_scales(scales, head_dim: int):
    """[B, H, S, 1] per-token scales → kernel layout [B, H, 8, S/f] where
    f = 128/head_dim: token t sits at row t % f, column t // f (matching the
    folded int8 cache row index). Rows f..8 are padding (DMA slices need an
    8-aligned sublane dim)."""
    b, h, s, _ = scales.shape
    f = _LANES // head_dim
    packed = scales.reshape(b, h, s // f, f).transpose(0, 1, 3, 2)
    return jnp.pad(packed, ((0, 0), (0, 0), (0, 8 - f), (0, 0))).astype(jnp.float32)


def unpack_kv_scales(packed, head_dim: int):
    """Inverse of pack_kv_scales → [B, H, S, 1]."""
    b, h, _, s_f = packed.shape
    f = _LANES // head_dim
    return packed[:, :, :f, :].transpose(0, 1, 3, 2).reshape(b, h, s_f * f, 1)


def decode_attention_int8_supported(head_dim: int, s_max: int, block_s: int = 256) -> bool:
    bs = min(block_s, s_max)
    rpb = bs * head_dim // _LANES
    total_rows = s_max * head_dim // _LANES
    return (
        head_dim <= _LANES
        and _LANES % head_dim == 0
        and s_max % bs == 0
        and (bs * head_dim) % _LANES == 0
        and rpb % _LANES == 0  # scale-tile lane slices need 128 alignment
        and total_rows % 32 == 0  # int8 RMW window
    )


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_s", "interpret", "batched"),
)
def decode_attention_int8(
    q,
    k_cache_q,  # [B, Hk, S, D] int8
    v_cache_q,
    k_scales,  # [B, Hk, 8, S*D/128] f32 (kernel layout — see pack_kv_scales)
    v_scales,
    kv_len,
    k_new=None,  # [B, Hk, 1, D] UNquantized — quantized + appended in place
    v_new=None,
    *,
    sm_scale: float | None = None,
    block_s: int = 256,
    interpret: bool = False,
    batched: bool | None = None,
):
    """INT8-KV decode attention over the valid prefix. With k_new/v_new the
    new token is quantized (per-head absmax), appended into the int8 caches
    IN-KERNEL (aliased buffers — donate them), its scales spliced into the
    scale arrays, and its score seeds the online softmax. Returns
    (out, k_cache_q, v_cache_q, k_scales, v_scales) — or just ``out``
    without k_new."""
    b, h, sq, d = q.shape
    hk = k_cache_q.shape[1]
    assert sq == 1 and h % hk == 0
    group = h // hk
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    kv_len = jnp.asarray(kv_len, jnp.int32).reshape(b)
    # Accept folded [B, Hk, S·D/128, 128] storage (see decode_attention —
    # avoids XLA layout-conversion copies around every aliased call).
    if k_cache_q.shape[-1] == _LANES:
        prefolded = True
        s_max = k_cache_q.shape[2] * _LANES // d
    else:
        prefolded = False
        s_max = k_cache_q.shape[2]
    block_s = min(block_s, s_max)
    if not decode_attention_int8_supported(d, s_max, block_s):
        raise ValueError(
            f"unsupported int8-KV decode shape: head_dim={d}, s_max={s_max}, "
            f"block_s={block_s}"
        )
    rows_per_block = block_s * d // _LANES
    f = _LANES // d
    fused_write = k_new is not None

    if prefolded:
        kf, vf = k_cache_q, v_cache_q
    else:
        kf = k_cache_q.reshape(b, hk, s_max * d // _LANES, _LANES)
        vf = v_cache_q.reshape(b, hk, s_max * d // _LANES, _LANES)

    gp = max(8, -(-group // 8) * 8)
    lane_pad = _LANES - d  # 128-minor operands/outputs; see decode_attention
    # Batched single-cell mode — see decode_attention.
    if batched is None:
        batched = _BATCHED_ATTN_DEFAULT
    batched = batched and b > 1
    if batched:
        while (
            2 * 2 * b * hk * rows_per_block * _LANES > 24 << 20
            and block_s % 2 == 0
            and decode_attention_int8_supported(d, s_max, block_s // 2)
        ):
            block_s //= 2
            rows_per_block = block_s * d // _LANES
        if 2 * 2 * b * hk * rows_per_block * _LANES > 24 << 20:
            # Over budget with halving blocked: fall back to the per-cell
            # grid kernel rather than an opaque Mosaic VMEM error.
            batched = False
    lead = b if batched else 1
    _ix = (lambda bi: 0) if batched else (lambda bi: bi)
    qg = q.reshape(b, hk, group, d)
    if gp != group or lane_pad:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - group), (0, lane_pad)))

    in_specs = [
        pl.BlockSpec((lead, hk, gp, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [kv_len, qg, kf, vf, k_scales, v_scales]
    if batched:
        scratch = [
            pltpu.VMEM((2, b, hk, rows_per_block, _LANES), jnp.int8),
            pltpu.VMEM((2, b, hk, rows_per_block, _LANES), jnp.int8),
            pltpu.VMEM((2, 2, b, hk, 8, rows_per_block), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ]
    else:
        scratch = [
            pltpu.VMEM((2, hk, rows_per_block, _LANES), jnp.int8),
            pltpu.VMEM((2, hk, rows_per_block, _LANES), jnp.int8),
            pltpu.VMEM((2, 2, hk, 8, rows_per_block), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ]
    if fused_write:
        # Quantize the new token per head (absmax over all D lanes).
        def quant(x):
            absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3))
            scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)  # [B, Hk]
            qv = jnp.clip(
                jnp.round(x.astype(jnp.float32) / scale[:, :, None, None]),
                -127,
                127,
            ).astype(jnp.int8)
            return qv, scale.astype(jnp.float32)

        knq, kns = quant(k_new)
        vnq, vns = quant(v_new)
        # The seed math uses the DEQUANTIZED new token (scalar per-head scale
        # vectors don't map onto VPU tiles; a [Hk, 8, D] float block does).
        kdq = (knq.astype(jnp.float32) * kns[:, :, None, None]).astype(jnp.float32)
        vdq = (vnq.astype(jnp.float32) * vns[:, :, None, None]).astype(jnp.float32)
        knq = jnp.pad(knq, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        vnq = jnp.pad(vnq, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        kdq = jnp.pad(kdq, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        vdq = jnp.pad(vdq, ((0, 0), (0, 0), (0, 7), (0, lane_pad)))
        in_specs += [
            pl.BlockSpec((lead, hk, 8, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0)),
            pl.BlockSpec((lead, hk, 8, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0)),
            pl.BlockSpec((lead, hk, 8, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0)),
            pl.BlockSpec((lead, hk, 8, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0)),
        ]
        args += [knq, vnq, kdq, vdq]
        if batched:
            scratch += [
                pltpu.VMEM((2, b, hk, 32, _LANES), jnp.int8),
                pltpu.SemaphoreType.DMA((2, b)),
            ]
        else:
            scratch += [
                pltpu.VMEM((2, hk, 32, _LANES), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        out_shape = (
            jax.ShapeDtypeStruct((b, hk, gp, _LANES), q.dtype),
            jax.ShapeDtypeStruct(kf.shape, kf.dtype),
            jax.ShapeDtypeStruct(vf.shape, vf.dtype),
        )
        out_specs = (
            pl.BlockSpec(
                (lead, hk, gp, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        )
        aliases = {2: 1, 3: 2}
    else:
        out_shape = jax.ShapeDtypeStruct((b, hk, gp, _LANES), q.dtype)
        out_specs = pl.BlockSpec(
            (lead, hk, gp, _LANES), lambda bi, *_: (_ix(bi), 0, 0, 0)
        )
        aliases = {}

    def kernel(kv_len_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, *rest):
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
        if batched:
            _decode_attn_int8_kernel_batched(
                kv_len_ref, q_ref, k_tgt, v_tgt, ks_hbm, vs_hbm,
                kn_ref, vn_ref, kdq_ref, vdq_ref, o_ref,
                k_buf, v_buf, s_buf, sem_, row_buf, row_sem,
                n_batch=b, block_s=block_s, rows_per_block=rows_per_block,
                d=d, sm_scale=sm_scale,
            )
        else:
            _decode_attn_int8_kernel(
                kv_len_ref, q_ref, k_tgt, v_tgt, ks_hbm, vs_hbm,
                kn_ref, vn_ref, kdq_ref, vdq_ref, o_ref,
                k_buf, v_buf, s_buf, sem_, row_buf, row_sem,
                block_s=block_s, rows_per_block=rows_per_block, d=d,
                sm_scale=sm_scale,
            )

    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,) if batched else (b,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) if batched else ("parallel",),
            # See the bf16 twin: batched double buffers exceed Mosaic's
            # default 16 MB scoped-vmem stack limit.
            **({"vmem_limit_bytes": 100 << 20} if batched else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_max * d,
            bytes_accessed=2 * b * hk * s_max * d,
            transcendentals=b * h * s_max,
        ),
        interpret=interpret,
    )(*args)

    if not fused_write:
        return res[:, :, :group, :d].reshape(b, h, 1, d)
    out, k_out, v_out = res
    out = out[:, :, :group, :d].reshape(b, h, 1, d)
    if not prefolded:
        k_out = k_out.reshape(b, hk, s_max, d)
        v_out = v_out.reshape(b, hk, s_max, d)

    # Splice the new token's scales into the (small) scale arrays.
    def splice(scales, new):  # scales [B,Hk,8,S_f], new [B,Hk]
        rowi = jax.lax.rem(kv_len, f)
        coli = (kv_len * d) // _LANES

        def one(sc, nv, r, c):
            return jax.lax.dynamic_update_slice(
                sc, nv.reshape(hk, 1, 1), (0, r, c)
            )

        return jax.vmap(one)(scales, new, rowi, coli)

    k_scales = splice(k_scales, kns)
    v_scales = splice(v_scales, vns)
    return out, k_out, v_out, k_scales, v_scales
