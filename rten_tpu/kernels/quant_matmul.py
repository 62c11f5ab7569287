"""Fused INT8 weight-dequant + matmul (Pallas) — the north-star kernel
(BASELINE.json: "every dequant+matmul kernel at speed-of-light per chip").

Weight-only quantization: activations stay bf16/f32, weights are int8 with
per-output-channel f32 scales. The kernel streams int8 weight tiles from HBM
(half the bytes of bf16 — this path is HBM-bandwidth-bound at inference batch
sizes, so int8 weights ≈ 2× decode throughput), dequantizes in VMEM, and
feeds the MXU. Scale application happens once on the f32 accumulator in the
epilogue, not per K-tile, preserving accuracy (per-channel scales factor out
of the K reduction exactly).

Also provides the symmetric per-channel quantizer used by the converter and
serving layer.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rten_tpu.kernels.matmul_pallas import _ACTIVATIONS, _pad_to, pick_block

def quantize_weights_int8(w, axis: int = -1):
    """Symmetric per-channel int8 quantization of a weight matrix.

    Returns (w_int8, scales_f32) with ``w ≈ w_int8 * scales`` broadcast along
    ``axis`` (the output-channel axis keeps its own scale)."""
    w = np.asarray(w, dtype=np.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    absmax = np.abs(w).max(axis=reduce_axes, keepdims=True)
    scales = np.where(absmax == 0, 1.0, absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(w / scales), -127, 127).astype(np.int8)
    return q, np.squeeze(scales, axis=reduce_axes).astype(np.float32)


def gemv_weight_kn(w_q):
    """Logical (K, N) of an int8 weight in either storage layout: 2-D
    row-major ``[K, N]`` or contiguous-tiled ``[S, K, bn]`` (N = S*bn)."""
    if w_q.ndim == 3:
        return w_q.shape[1], w_q.shape[0] * w_q.shape[2]
    return w_q.shape


def tile_gemv_weights(w_q, block_n: int = 2048):
    """Re-lay a row-major ``[K, N]`` int8 matrix as contiguous N-stripes
    ``[S, K, bn]`` (stripe j = columns ``j*bn:(j+1)*bn``, contiguous in HBM).

    Why: the GEMV weight stream is the decode step's dominant cost, and a
    ``[K, bn]`` stripe of a row-major matrix DMAs as K separate bn-byte
    reads at an N-byte stride — measured ~570-600 GB/s on v5e for the
    lm_head geometry (768×51200, bn 1024-4096) vs ~830 GB/s for linear
    reads. Pre-tiling makes every stripe one linear read. N is zero-padded
    up to a ``block_n`` multiple (callers already slice padding off via
    the logical-N return slice / ``out_dim``)."""
    k, n = w_q.shape
    w = np.asarray(w_q)
    pad = -n % block_n
    if pad:
        w = np.pad(w, ((0, 0), (0, pad)))
    s_tiles = w.shape[1] // block_n
    return jnp.asarray(
        np.ascontiguousarray(
            w.reshape(k, s_tiles, block_n).transpose(1, 0, 2)
        )
    )


def tile_gemv_pack(pack: dict, block_n: int = 2048) -> dict:
    """Tile a quantized ``{"q": [K, N] int8, "s": [1, N] f32}`` pack to the
    contiguous-stripe layout, keeping the scales exactly as wide as the
    padded N (the matmul kernel's stripe specs index scales by stripe)."""
    wt = tile_gemv_weights(pack["q"], block_n)
    n_pad = wt.shape[0] * wt.shape[2]
    s = jnp.asarray(pack["s"]).reshape(-1)
    if s.shape[0] < n_pad:
        s = jnp.pad(s, (0, n_pad - s.shape[0]))
    return {"q": wt, "s": s.reshape(1, -1)}


def untile_gemv_weights(w_tiled, n: int | None = None):
    """Inverse of tile_gemv_weights: ``[S, K, bn] → [K, N]`` (sliced to n)."""
    s, k, bn = w_tiled.shape
    out = jnp.transpose(w_tiled, (1, 0, 2)).reshape(k, s * bn)
    return out if n is None else out[:, :n]


def _normalize_rows(x, norm, norm_eps, ns_ref, nb_ref):
    """Fused pre-norm on the full [M, K] activation rows (f32)."""
    if norm == "rmsnorm":
        x = x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + norm_eps)
    else:
        mean = jnp.mean(x, -1, keepdims=True)
        xc = x - mean
        x = xc * jax.lax.rsqrt(jnp.mean(xc * xc, -1, keepdims=True) + norm_eps)
    x = x * ns_ref[...].astype(jnp.float32)
    if nb_ref is not None:
        x = x + nb_ref[...].astype(jnp.float32)
    return x


# Decode-kernel convert-hop default, snapshotted ONCE at import (same
# contract as RTEN_BATCHED_ATTN): "direct" = one-hop int8→bf16,
# "f32" = staged through f32. A/B-able per process via RTEN_W_CONVERT.
_W_CONVERT_DEFAULT = os.environ.get("RTEN_W_CONVERT", "direct")


def _wconv(w_blk, dot_dtype, mode):
    """int8 weight → MXU dtype. "direct" is one hop; "f32" staged through
    f32 first — Mosaic has historically lowered the two variants with very
    different VPU cost (123 vs 87 TF/s on the prefill kernel when first
    measured), and the decode kernels are convert-bound once MSA has staged
    their weights in VMEM (r05 XPlane trace), so both stay A/B-able."""
    if mode == "f32" and dot_dtype != jnp.float32:
        return w_blk.astype(jnp.float32).astype(dot_dtype)
    return w_blk.astype(dot_dtype)


def _act_quantize(x):
    """Per-row symmetric int8 quantization of an f32 activation block.

    Returns (q, sx): q f32-valued integers in [-127, 127] (f32 so it can
    live in the kernels' existing f32 scratch; a free .astype(int8) at the
    dot feeds the MXU), sx [M, 1] f32 with x ≈ q * sx. Mirrors the
    reference's DynamicQuantizeLinear semantics
    (/root/reference/src/ops/quantize.rs DynamicQuantizeLinear), symmetric
    variant."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.where(absmax == 0.0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(x / sx), -127.0, 127.0)
    return q, sx


def _qdot(x, w_blk, dd, mode):
    """One fused-kernel matmul hop: f32 activations × int8 weight block.

    mode "w8a8": dynamic per-row int8 activations, s8 × s8 → s32 on the
    v5e int8 MXU path (measured 275-336 TOPS vs 197 bf16 TF/s, w8a8probe)
    — the VPU weight convert that bounds the staged decode kernels
    disappears entirely. Returns f32 ≈ x @ w_blk (activation scales folded
    back in). Other modes: the weight-only convert-then-bf16-dot path."""
    if mode == "w8a8":
        q, sx = _act_quantize(x)
        acc = jax.lax.dot_general(
            q.astype(jnp.int8), w_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * sx
    return jnp.dot(
        x.astype(dd), _wconv(w_blk, dd, mode), preferred_element_type=jnp.float32
    )


def _gemv_epilogue(
    out, j, b_ref, r_ref, o_ref, amax_scr, aarg_scr, *, activation, argmax_n
):
    """Shared stripe epilogue: bias/activation/residual writeback, or the
    fused running-argmax reduction (see quant_gemv_int8 docstring)."""
    if b_ref is not None:
        out = out + b_ref[...].astype(jnp.float32)
    out = _ACTIVATIONS[activation](out)
    if r_ref is not None:
        out = out + r_ref[...].astype(jnp.float32)
    if argmax_n is None:
        o_ref[...] = out.astype(o_ref.dtype)
        return
    mp, bn = out.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (mp, bn), 1) + j * bn
    outm = jnp.where(col < argmax_n, out, -3.389e38)  # mask pad + tail cols
    bmax = jnp.max(outm, axis=1, keepdims=True)  # [M, 1]
    barg = jnp.min(
        jnp.where(outm == bmax, col, jnp.int32(2147483647)),
        axis=1,
        keepdims=True,
    )
    bmax_b = jnp.broadcast_to(bmax, amax_scr.shape)
    barg_b = jnp.broadcast_to(barg, aarg_scr.shape)

    @pl.when(j == 0)
    def _seed():
        amax_scr[...] = bmax_b
        aarg_scr[...] = barg_b

    @pl.when(j > 0)
    def _update():
        prev_max = amax_scr[...]
        upd = bmax_b > prev_max  # strict: earlier stripe wins ties
        amax_scr[...] = jnp.where(upd, bmax_b, prev_max)
        aarg_scr[...] = jnp.where(upd, barg_b, aarg_scr[...])

    @pl.when(j == pl.num_programs(0) - 1)
    def _emit():
        o_ref[...] = aarg_scr[...]


def _gemv_kernel(
    x_ref,
    w_ref,
    s_ref,
    b_ref,
    ns_ref,
    nb_ref,
    r_ref,
    o_ref,
    xn_scr,
    amax_scr=None,  # [M, 128] f32 — running max (argmax mode)
    aarg_scr=None,  # [M, 128] int32 — running argmax
    *,
    activation,
    norm,
    norm_eps,
    argmax_n=None,
    w_convert="direct",
    sx_scr=None,  # [M, 128] f32 — per-row activation scales (w8a8 mode)
):
    # Whole-K tile: no accumulator loop. The int8→f32 conversion feeds the
    # MXU directly; at M=8 the matmul is trivially cheap and the kernel is
    # bound by the int8 weight stream from HBM.
    w8a8 = w_convert == "w8a8"
    if norm is not None or w8a8:
        # Fused pre-norm (and, in w8a8 mode, the dynamic per-row activation
        # quantization): the cross-lane row statistics are computed ONCE on
        # the first N-stripe and cached in VMEM scratch (lane reductions are
        # the slow VPU direction — recomputing per stripe serializes with the
        # weight stream). Saves an entire XLA kernel + HBM round trip of the
        # normalized activations. Requires sequential grid ("arbitrary").
        @pl.when(pl.program_id(0) == 0)
        def _compute_norm():
            x0 = x_ref[...].astype(jnp.float32)
            if norm is not None:
                x0 = _normalize_rows(x0, norm, norm_eps, ns_ref, nb_ref)
            if w8a8:
                q, sx = _act_quantize(x0)
                xn_scr[...] = q
                sx_scr[...] = jnp.broadcast_to(sx, sx_scr.shape)
            else:
                xn_scr[...] = x0

        x = xn_scr[...]
    else:
        x = x_ref[...].astype(jnp.float32)
    # MXU dtype: when the model's activations are bf16 anyway, run the dot
    # in bf16 (int8 weight values are exactly representable in bf16, so
    # only x's rounding is at stake — information the bf16 model never had).
    # f32 dots run the MXU at 1/6 rate and stop hiding under the weight DMA
    # on wide stripes.
    dot_dtype = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    w_blk = w_ref[0] if w_ref.ndim == 3 else w_ref[...]
    if w8a8:
        # s8 × s8 → s32 on the int8 MXU path: no weight convert at all (the
        # cached activation row converts int8 once per stripe — [M, K],
        # ~1000× fewer elements than the weight tile it replaces).
        acc = jax.lax.dot_general(
            x.astype(jnp.int8), w_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * sx_scr[:, 0:1]
    else:
        w = _wconv(w_blk, dot_dtype, w_convert)
        acc = jnp.dot(x.astype(dot_dtype), w, preferred_element_type=jnp.float32)
    out = acc * s_ref[...]
    _gemv_epilogue(
        out, pl.program_id(0), b_ref, r_ref, o_ref, amax_scr, aarg_scr,
        activation=activation, argmax_n=argmax_n,
    )


def _gemv_kernel_kblocked(
    x_ref,   # [M, K] full (norm stats + tile cache source)
    w_ref,   # [BK, BN] weight tile
    s_ref,   # [1, BN]
    b_ref,
    ns_ref,  # [1, K] full or None
    nb_ref,
    r_ref,   # [M, BN] or None
    o_ref,   # [M, BN] (or [M, 128] int32 in argmax mode)
    xn_scr,  # [n_k, M, BK] f32 — x cached per K-tile on the first step
    acc_ref,  # [M, BN] f32
    amax_scr=None,
    aarg_scr=None,
    *,
    activation,
    norm,
    norm_eps,
    argmax_n=None,
    n_k,
    bk,
    w_convert="f32",
):
    """K-blocked GEMV: streams the int8 matrix in [block_k, block_n] tiles.
    The DMA rate through a BlockSpec pipeline is geometry-dependent
    (measured ~830 GB/s at 256-row × 4096-wide int8 stripes vs ~720-750
    for tall whole-K stripes — CLAUDE.md measurement notes), so shorter,
    wider tiles lift the weight stream this kernel is bound by. x is
    normalized once and cached per K-tile ([n_k, M, BK] scratch, static
    lane slices in, traced leading-dim index out)."""
    j = pl.program_id(0)
    kk = pl.program_id(1)

    @pl.when(jnp.logical_and(j == 0, kk == 0))
    def _prep():
        x = x_ref[...].astype(jnp.float32)
        if norm is not None:
            x = _normalize_rows(x, norm, norm_eps, ns_ref, nb_ref)
        for t in range(n_k):  # static lane slices → per-tile scratch rows
            xn_scr[t] = x[:, t * bk : (t + 1) * bk]

    @pl.when(kk == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dot_dtype = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    w_blk = w_ref[0] if w_ref.ndim == 3 else w_ref[...]
    w = _wconv(w_blk, dot_dtype, w_convert)
    acc_ref[...] += jnp.dot(
        xn_scr[kk].astype(dot_dtype), w, preferred_element_type=jnp.float32
    )

    @pl.when(kk == n_k - 1)
    def _finish():
        out = acc_ref[...] * s_ref[...]
        _gemv_epilogue(
            out, j, b_ref, r_ref, o_ref, amax_scr, aarg_scr,
            activation=activation, argmax_n=argmax_n,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "activation", "norm", "norm_eps", "block_n", "block_k", "out_dtype",
        "argmax_n", "interpret", "w_convert",
    ),
)
def quant_gemv_int8(
    x,
    w_q,
    scales,
    bias=None,
    *,
    activation: str | None = None,
    norm: str | None = None,  # "layernorm" | "rmsnorm" fused prologue
    norm_scale=None,
    norm_bias=None,
    norm_eps: float = 1e-5,
    residual=None,  # [M, N] added after activation (fused epilogue)
    block_n: int = 1024,  # same-process A/B: bf16@1024 ≈ 748 GB/s beats 2048
    block_k: int | None = None,  # [block_k, block_n] weight tiles; None = whole K
    out_dtype=None,
    argmax_n: int | None = None,  # fused greedy sampler: return int32 [M]
    interpret: bool = False,
    w_convert: str | None = None,  # int8→MXU-dtype hops; None → RTEN_W_CONVERT
):
    """Decode-path GEMV for tiny M (≤8):

        out = activation((norm(x) @ w_q) * scales + bias) + residual

    Batch-1 decode is the reference's per-token Model::run hot loop
    (rten-generate/src/generator.rs:511); on TPU it is HBM-bandwidth-bound —
    every token reads all weights — so this kernel streams the int8 matrix in
    [K, block_n] stripes with the full K in VMEM and no M/K grid at all.
    The pre-norm prologue and bias/activation/residual epilogue fold the
    surrounding elementwise ops of a transformer block into the weight
    stream, eliminating their kernel launches and HBM round trips.
    M is padded to the f32 sublane minimum (8); x is promoted to f32 so the
    8-row tile is legal and the norm/epilogue math stays exact.

    ``w_q`` may be 2-D row-major ``[K, N]`` or contiguous-tiled
    ``[S, K, bn]`` (tile_gemv_weights): tiled stripes DMA as ONE linear
    HBM read instead of K strided row reads (~830 vs ~570-600 GB/s
    measured on the lm_head geometry)."""
    m, k = x.shape
    w3d = w_q.ndim == 3
    k2, n = gemv_weight_kn(w_q)
    assert k == k2 and m <= 8, (x.shape, w_q.shape)
    out_dtype = out_dtype or x.dtype
    w_convert = w_convert or _W_CONVERT_DEFAULT

    # No M padding: Mosaic handles sub-tile row blocks, and the explicit
    # pad+f32-convert used to cost one XLA fusion launch per call (the
    # conversion now happens in VMEM inside the kernel).
    mp = m
    xp = x
    bn = w_q.shape[2] if w3d else pick_block(n, block_n)
    wp = w_q if w3d else _pad_to(w_q, bn, 1)
    sp = _pad_to(scales.reshape(1, -1), bn, 1)
    np_ = n if w3d else wp.shape[1]
    assert not w3d or sp.shape[1] == np_, (sp.shape, wp.shape)

    # K-blocking: [block_k, block_n] weight tiles when block_k divides K
    # (shorter, wider DMA stripes run closer to the HBM ceiling — see
    # _gemv_kernel_kblocked). Whole-K otherwise. The w8a8 path is whole-K
    # only (gemvgeom measured whole-K fastest anyway; the K-blocked int32
    # accumulation would also need its own scratch story).
    if w_convert == "w8a8":
        block_k = None
    kb = block_k if (block_k and k % block_k == 0 and k > block_k) else None
    n_k = (k // kb) if kb else 1
    if kb:
        in_specs = [
            pl.BlockSpec((mp, k), lambda j, kk: (0, 0)),
            pl.BlockSpec((1, kb, bn), lambda j, kk: (j, kk, 0))
            if w3d
            else pl.BlockSpec((kb, bn), lambda j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda j, kk: (0, j)),
        ]
    else:
        in_specs = [
            pl.BlockSpec((mp, k), lambda j: (0, 0)),
            pl.BlockSpec((1, k, bn), lambda j: (j, 0, 0))
            if w3d
            else pl.BlockSpec((k, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ]

    def _stripe(shape):  # a [.., bn] operand indexed by the N stripe
        if kb:
            return pl.BlockSpec(shape, lambda j, kk: (0, j))
        return pl.BlockSpec(shape, lambda j: (0, j))

    def _whole(shape):  # a full operand, same block every step
        if kb:
            return pl.BlockSpec(shape, lambda j, kk: (0, 0))
        return pl.BlockSpec(shape, lambda j: (0, 0))

    args = [xp, wp, sp]
    have = {"b_ref": False, "ns_ref": False, "nb_ref": False, "r_ref": False}
    if bias is not None:
        args.append(_pad_to(bias.reshape(1, -1), bn, 1))
        in_specs.append(_stripe((1, bn)))
        have["b_ref"] = True
    if norm is not None:
        assert norm_scale is not None
        args.append(norm_scale.reshape(1, -1))
        in_specs.append(_whole((1, k)))
        have["ns_ref"] = True
        if norm_bias is not None:
            args.append(norm_bias.reshape(1, -1))
            in_specs.append(_whole((1, k)))
            have["nb_ref"] = True
    if residual is not None:
        assert residual.shape == (m, n), (residual.shape, (m, n))
        rp = _pad_to(jnp.pad(residual, ((0, mp - m), (0, 0))), bn, 1)
        args.append(rp)
        in_specs.append(_stripe((mp, bn)))
        have["r_ref"] = True

    order = [k_ for k_ in ("b_ref", "ns_ref", "nb_ref", "r_ref") if have[k_]]

    n_opt = len(order)

    w8a8 = w_convert == "w8a8"

    def kernel(x_ref, w_ref, s_ref, *rest):
        if w8a8:  # sx scratch rides at the end of the scratch list
            rest, sx_scr = rest[:-1], rest[-1]
        else:
            sx_scr = None
        opt = dict(zip(order, rest[:n_opt]))
        named = (
            opt.get("b_ref"), opt.get("ns_ref"), opt.get("nb_ref"),
            opt.get("r_ref"),
        )
        if kb:
            _gemv_kernel_kblocked(
                x_ref, w_ref, s_ref, *named, *rest[n_opt:],
                activation=activation, norm=norm, norm_eps=norm_eps,
                argmax_n=argmax_n, n_k=n_k, bk=kb, w_convert=w_convert,
            )
        else:
            _gemv_kernel(
                x_ref, w_ref, s_ref, *named, *rest[n_opt:],
                activation=activation, norm=norm, norm_eps=norm_eps,
                argmax_n=argmax_n, w_convert=w_convert, sx_scr=sx_scr,
            )

    xn_shape = (n_k, mp, kb) if kb else (mp, k)
    if argmax_n is not None:
        assert activation is None and residual is None, "argmax excludes epilogues"
        out_shape = jax.ShapeDtypeStruct((mp, 128), jnp.int32)
        out_specs = _whole((mp, 128))
        scratch = [pltpu.VMEM(xn_shape, jnp.float32)]
        if kb:
            scratch.append(pltpu.VMEM((mp, bn), jnp.float32))
        scratch += [
            pltpu.VMEM((mp, 128), jnp.float32),
            pltpu.VMEM((mp, 128), jnp.int32),
        ]
    else:
        out_shape = jax.ShapeDtypeStruct((mp, np_), out_dtype)
        out_specs = _stripe((mp, bn))
        scratch = [pltpu.VMEM(xn_shape, jnp.float32)]
        if kb:
            scratch.append(pltpu.VMEM((mp, bn), jnp.float32))
    if w8a8:
        scratch.append(pltpu.VMEM((mp, 128), jnp.float32))

    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(np_ // bn, n_k) if kb else (np_ // bn,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # "arbitrary": the norm/argmax/acc scratch is written on one step
            # and read by later steps — execution must stay in grid order.
            dimension_semantics=("arbitrary", "arbitrary")
            if kb
            else (
                ("arbitrary",)
                if (norm is not None or argmax_n is not None)
                else ("parallel",)
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=k * np_ + mp * k * 4 + mp * np_ * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if argmax_n is not None:
        return out[:m, 0]
    return out[:m, :n]


def _q_epilogue(acc_ref, s_ref, b_ref, o_ref, *, activation):
    """Scale/bias/activation epilogue, chunked over columns.

    A [512, 3072] f32 chain of scale·acc (+bias, +gelu) materializes several
    full-block f32 temporaries on Mosaic's scoped-VMEM stack — at batch-8
    prefill shapes that overflowed the ~16 MB limit (37 MB observed) and
    failed compilation. Sequential 512-lane chunks cap the live temps at
    ~1 MB each; small blocks keep the single-pass path."""
    bm, bn = acc_ref.shape
    chunk = 512
    if bm * bn * 4 <= (2 << 20) or bn <= chunk:
        out = acc_ref[...] * s_ref[...].astype(jnp.float32)
        if b_ref is not None:
            out = out + b_ref[...].astype(jnp.float32)
        o_ref[...] = _ACTIVATIONS[activation](out).astype(o_ref.dtype)
        return
    for c in range(0, bn, chunk):
        sl = slice(c, min(c + chunk, bn))
        out = acc_ref[:, sl] * s_ref[:, sl].astype(jnp.float32)
        if b_ref is not None:
            out = out + b_ref[:, sl].astype(jnp.float32)
        o_ref[:, sl] = _ACTIVATIONS[activation](out).astype(o_ref.dtype)


def _q_kernel(
    x_ref, w_ref, s_ref, b_ref, o_ref, acc_ref, *, activation, n_k,
    w_convert="f32",
):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Dequantize the int8 tile right before the MXU; accumulate raw (scale
    # applied once in the epilogue). The int8→f32→bf16 double conversion is
    # the measured default: Mosaic lowers it faster than a direct int8→bf16
    # retile (123 vs 87 TF/s at 1024³ on v5e when first measured;
    # w_convert="direct" keeps the one-hop variant A/B-able as Mosaic ages).
    w_blk = w_ref[0] if w_ref.ndim == 3 else w_ref[...]
    if w_convert == "direct":
        w_tile = w_blk.astype(x_ref.dtype)
    else:
        w_tile = w_blk.astype(jnp.float32).astype(x_ref.dtype)
    acc_ref[...] += jnp.dot(
        x_ref[...], w_tile, preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        _q_epilogue(acc_ref, s_ref, b_ref, o_ref, activation=activation)


@functools.partial(
    jax.jit,
    static_argnames=(
        "activation", "block_m", "block_n", "block_k", "out_dtype",
        "interpret", "w_convert",
    ),
)
def quant_matmul_int8(
    x,
    w_q,
    scales,
    bias=None,
    *,
    activation: str | None = None,
    block_m: int = 1024,
    block_n: int = 3072,
    block_k: int = 512,
    out_dtype=None,
    interpret: bool = False,
    w_convert: str = "f32",  # "f32" (int8->f32->bf16) | "direct" (int8->bf16)
):
    """out = activation((x @ w_q) * scales + bias).

    x: [M, K] f32/bf16; w_q: [K, N] int8; scales: [N] f32 (per out-channel);
    bias: [N] optional.

    Block defaults are tuned on v5e (robust 64/512-step slope timing): WIDE
    N stripes dominate — (512, 2048+, 512) sustains 174-181 TF/s at
    1024³-4096³ vs 142-148 for the old 512³ blocks, because each int8 W tile
    is converted once per M-pass and the VPU dequant pipelines under a
    longer MXU dot. block_m=1024 (r05 sweep): each W tile converts half as
    often at M=2048 — 177.1 TF/s (0.899 of nominal peak) vs 171.2 at
    bm=512, tight reps. pick_block clamps per shape (divisor rule), so the
    wide preference degrades gracefully for small N/M.
    """
    m, k = x.shape
    w3d = w_q.ndim == 3
    k2, n = gemv_weight_kn(w_q)
    assert k == k2
    out_dtype = out_dtype or x.dtype

    if m <= 8:
        # Decode hot path: one token (or a tiny batch) against the full
        # weight matrix — the GEMV kernel streams int8 at HBM speed instead
        # of padding M to an MXU tile.
        return quant_gemv_int8(
            x,
            w_q,
            scales,
            bias,
            activation=activation,
            out_dtype=out_dtype,
            interpret=interpret,
        )

    block_m = min(block_m, max(128, -(-m // 128) * 128))
    bn_t = w_q.shape[2] if w3d else None
    block_n = pick_block(bn_t if w3d else n, block_n)
    # int8 min tile is (32, 128); divisor blocks avoid re-padding weights
    # inside a traced decode step (a full-matrix copy per step otherwise).
    block_k = pick_block(k, block_k)
    if w3d:
        # Tiled weights can't be re-padded in-trace; the tile layout
        # guarantees 128-multiple K and bn (tile_gemv_weights operates on
        # already-padded quantized matrices).
        assert k % block_k == 0 and bn_t % block_n == 0, (w_q.shape, block_k, block_n)

    xp = _pad_to(_pad_to(x, block_m, 0), block_k, 1)
    wp = w_q if w3d else _pad_to(_pad_to(w_q, block_k, 0), block_n, 1)
    sp = _pad_to(scales.reshape(1, -1), block_n, 1)
    mp, kp = xp.shape
    np_ = n if w3d else wp.shape[1]
    n_k = kp // block_k

    # (A K-pipelined dequant variant — explicit double-buffered tile
    # conversion overlapping the previous MXU dot — was built and A/B'd on
    # v5e: 160.4 TF/s vs 176.1 for this kernel at 2048^3, BATTERY_r04 phase
    # `prefill`. Mosaic's static scheduler already overlaps the VPU convert
    # with the MXU dot across grid steps; the manual pipeline only added a
    # fill bubble per (i, j) pass. Deleted as a measured loser.)
    r_n = (bn_t // block_n) if w3d else 1
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
        pl.BlockSpec(
            (1, block_k, block_n), lambda i, j, kk: (j // r_n, kk, j % r_n)
        )
        if w3d
        else pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
        pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
    ]
    base_kernel, grid_k = _q_kernel, n_k
    scratch = [pltpu.VMEM((block_m, block_n), jnp.float32)]
    args = [xp, wp, sp]
    if bias is not None:
        bp = _pad_to(bias.reshape(1, -1), block_n, 1)
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)))
        args.append(bp)
        kernel = functools.partial(
            base_kernel, activation=activation, n_k=n_k, w_convert=w_convert
        )
    else:
        kernel = functools.partial(
            lambda x_ref, w_ref, s_ref, o_ref, *scr, _bk=base_kernel, **kw: _bk(
                x_ref, w_ref, s_ref, None, o_ref, *scr, **kw
            ),
            activation=activation,
            n_k=n_k,
            w_convert=w_convert,
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid=(mp // block_m, np_ // block_n, grid_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(
                mp * kp * xp.dtype.itemsize + kp * np_ + mp * np_ * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m, :n]


def _q8_kernel(
    x_ref,   # [BM, BK] int8 (dynamically quantized activations)
    sx_ref,  # [BM, 1] f32 per-row activation scales
    w_ref,   # [BK, BN] int8
    s_ref,   # [1, BN] f32 per-channel weight scales
    b_ref,   # [1, BN] or None
    o_ref,   # [BM, BN]
    acc_ref,  # [BM, BN] int32
    *,
    activation,
    n_k,
):
    """W8A8 tile: s8 × s8 → s32 on the MXU (v5e int8 path, nominal 2× the
    bf16 rate) — no weight convert at all. Both scales apply once on the
    f32-cast accumulator in the epilogue (per-row × per-channel factor out
    of the K reduction exactly, same argument as the weight-only kernel)."""

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        bm, bn = acc_ref.shape
        sx = sx_ref[...].astype(jnp.float32)  # [BM, 1]
        chunk = 512
        for c in range(0, bn, chunk):  # chunked like _q_epilogue (VMEM cap)
            sl = slice(c, min(c + chunk, bn))
            out = acc_ref[:, sl].astype(jnp.float32) * sx * s_ref[:, sl]
            if b_ref is not None:
                out = out + b_ref[:, sl].astype(jnp.float32)
            o_ref[:, sl] = _ACTIVATIONS[activation](out).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "activation", "block_m", "block_n", "block_k", "out_dtype", "interpret",
    ),
)
def quant_matmul_w8a8(
    x,
    w_q,
    scales,
    bias=None,
    *,
    activation: str | None = None,
    block_m: int = 1024,
    block_n: int = 1024,
    block_k: int = 512,
    out_dtype=None,
    interpret: bool = False,
):
    """out = activation((x @ w_q) * sx * scales + bias) with x dynamically
    quantized to symmetric per-row int8 — full W8A8: the MXU consumes int8
    directly (s8 × s8 → s32, nominal 394 TOPS on v5e vs 197 bf16 TF/s) and
    the weight-only kernels' in-kernel VPU int8→bf16 convert disappears.

    Numerics: activations get per-row symmetric int8 (≤~0.8% RMS rounding
    error on unit-scale rows); this is the opt-in contract the reference
    exposes as DynamicQuantizeLinear → QLinearMatMul
    (/root/reference/src/ops/quantize.rs:210 DynamicQuantizeLinear,
    /root/reference/src/ops/matmul.rs MatMulInteger path), not a drop-in
    replacement for the weight-only default.

    x: [M, K] f32/bf16; w_q: [K, N] int8; scales: [N] f32; bias: [N] opt.
    """
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2, (x.shape, w_q.shape)
    out_dtype = out_dtype or x.dtype

    # Dynamic per-row quantization (XLA, fuses into one pass over x).
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sx = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    x_q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    block_m = min(block_m, max(128, -(-m // 128) * 128))
    block_n = pick_block(n, block_n)
    block_k = pick_block(k, block_k)

    xp = _pad_to(_pad_to(x_q, block_m, 0), block_k, 1)
    sxp = _pad_to(sx, block_m, 0)
    wp = _pad_to(_pad_to(w_q, block_k, 0), block_n, 1)
    sp = _pad_to(scales.reshape(1, -1), block_n, 1)
    mp, kp = xp.shape
    np_ = wp.shape[1]
    n_k = kp // block_k

    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0)),
        pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
        pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
    ]
    args = [xp, sxp, wp, sp]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)))
        args.append(_pad_to(bias.reshape(1, -1), block_n, 1))
        kernel = functools.partial(_q8_kernel, activation=activation, n_k=n_k)
    else:
        kernel = functools.partial(
            lambda x_ref, sx_ref, w_ref, s_ref, o_ref, acc_ref, **kw: _q8_kernel(
                x_ref, sx_ref, w_ref, s_ref, None, o_ref, acc_ref, **kw
            ),
            activation=activation,
            n_k=n_k,
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid=(mp // block_m, np_ // block_n, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m, :n]


def _norm_rows(x, kind, eps, scale_ref, bias_ref):
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


def _mlp_kernel(
    x_ref,  # [M, D]
    wu_ref,  # [D, FF] int8 (whole matrix in VMEM)
    su_ref,  # [1, FF]
    wd_ref,  # [FF, D] int8
    sd_ref,  # [1, D]
    bu_ref,  # [1, FF] or None
    bd_ref,  # [1, D] or None
    ns_ref,  # [1, D] norm scale or None
    nb_ref,  # [1, D] norm bias or None
    r_ref,  # [M, D] residual or None
    wq_ref,  # [D, Nq] int8 — NEXT layer's fused qkv projection, or None
    sq_ref,  # [1, Nq]
    bq_ref,  # [1, Nq] or None
    qns_ref,  # [1, D] next layer's pre-norm scale or None
    qnb_ref,  # [1, D]
    o_ref,  # [M, D]
    oq_ref,  # [M, Nq] or None
    *,
    activation,
    norm,
    norm_eps,
    w_convert="direct",
):
    x = x_ref[...].astype(jnp.float32)
    if norm is not None:
        x = _norm_rows(x, norm, norm_eps, ns_ref, nb_ref)
    # bf16 dots when the model runs bf16 activations (see _gemv_kernel note):
    # this kernel's whole-matrix DMA has no grid to overlap compute under,
    # so f32's 6×-slower MXU rate is fully exposed (~2 µs/layer on
    # GPT-2-small). Scale/bias/activation math stays f32.
    dd = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    # w_convert="w8a8" routes every hop through _qdot's s8 × s8 MXU dots
    # (per-row dynamic activation quant; the FF-wide intermediate re-
    # quantizes per row) — the whole-matrix VPU converts this kernel is
    # bound by once MSA has staged its weights (r05 XPlane) drop out.
    up = _qdot(x, wu_ref[...], dd, w_convert) * su_ref[...]
    if bu_ref is not None:
        up = up + bu_ref[...].astype(jnp.float32)
    up = _ACTIVATIONS[activation](up)
    down = _qdot(up, wd_ref[...], dd, w_convert) * sd_ref[...]
    if bd_ref is not None:
        down = down + bd_ref[...].astype(jnp.float32)
    if r_ref is not None:
        down = down + r_ref[...].astype(jnp.float32)
    o_ref[...] = down.astype(o_ref.dtype)
    if wq_ref is not None:
        # The NEXT transformer layer's pre-norm + fused qkv projection rides
        # in the same kernel: the block output never leaves VMEM before its
        # qkv is computed, and a whole kernel launch + weight-staging round
        # drops out of the per-layer decode path.
        xq = _norm_rows(down, norm, norm_eps, qns_ref, qnb_ref)
        qkv = _qdot(xq, wq_ref[...], dd, w_convert) * sq_ref[...]
        if bq_ref is not None:
            qkv = qkv + bq_ref[...].astype(jnp.float32)
        oq_ref[...] = qkv.astype(oq_ref.dtype)


# Whole-matrix VMEM budget for the fused MLP (both weight matrices resident).
MLP_FUSED_VMEM_LIMIT = 8 << 20


def mlp_fused_supported(d: int, ff: int, n_qkv: int = 0) -> bool:
    return d * ff * 2 + d * n_qkv <= MLP_FUSED_VMEM_LIMIT


@functools.partial(
    jax.jit,
    static_argnames=(
        "activation", "norm", "norm_eps", "out_dtype", "interpret", "w_convert",
    ),
)
def quant_mlp_int8(
    x,  # [M, D], M ≤ 8
    w_up_q,
    up_scales,
    w_down_q,
    down_scales,
    b_up=None,
    b_down=None,
    *,
    activation: str | None = "gelu",
    norm: str | None = None,
    norm_scale=None,
    norm_bias=None,
    norm_eps: float = 1e-5,
    residual=None,
    next_qkv=None,  # (w_qkv int8 [D, Nq], scales [Nq], bias [Nq]|None,
    #                 next_norm_scale [D], next_norm_bias [D]|None)
    out_dtype=None,
    interpret: bool = False,
    w_convert: str | None = None,  # int8→MXU-dtype hops; None → RTEN_W_CONVERT
):
    """Whole transformer-MLP decode step in ONE kernel:

        out = norm(x) @ W_up (+b) → activation → @ W_down (+b) + residual

    Both int8 weight matrices live in VMEM for the kernel's duration (gate
    with mlp_fused_supported); the FF-wide intermediate never touches HBM
    and two kernel launches + their staging fusions collapse into one.

    With ``next_qkv`` the kernel ALSO returns the next layer's fused qkv
    projection of the block output (pre-norm included) — returns
    (out, qkv)."""
    m, d = x.shape
    ff = w_up_q.shape[1]
    assert m <= 8 and w_up_q.shape == (d, ff) and w_down_q.shape == (ff, d)
    assert next_qkv is None or norm is not None, "next_qkv requires fused norms"
    out_dtype = out_dtype or x.dtype
    w_convert = w_convert or _W_CONVERT_DEFAULT

    in_specs = [
        pl.BlockSpec((m, d), lambda: (0, 0)),
        pl.BlockSpec((d, ff), lambda: (0, 0)),
        pl.BlockSpec((1, ff), lambda: (0, 0)),
        pl.BlockSpec((ff, d), lambda: (0, 0)),
        pl.BlockSpec((1, d), lambda: (0, 0)),
    ]
    args = [x, w_up_q, up_scales.reshape(1, -1), w_down_q, down_scales.reshape(1, -1)]
    have = []
    for name, val, width in (
        ("bu_ref", b_up, ff),
        ("bd_ref", b_down, d),
        ("ns_ref", norm_scale if norm is not None else None, d),
        ("nb_ref", norm_bias if norm is not None else None, d),
    ):
        if val is not None:
            args.append(val.reshape(1, -1))
            in_specs.append(pl.BlockSpec((1, width), lambda: (0, 0)))
            have.append(name)
    if residual is not None:
        args.append(residual)
        in_specs.append(pl.BlockSpec((m, d), lambda: (0, 0)))
        have.append("r_ref")
    n_q = 0
    if next_qkv is not None:
        w_qkv, qkv_scales, qkv_bias, nns, nnb = next_qkv
        n_q = w_qkv.shape[1]
        assert w_qkv.shape == (d, n_q)
        args.append(w_qkv)
        in_specs.append(pl.BlockSpec((d, n_q), lambda: (0, 0)))
        have.append("wq_ref")
        args.append(qkv_scales.reshape(1, -1))
        in_specs.append(pl.BlockSpec((1, n_q), lambda: (0, 0)))
        have.append("sq_ref")
        if qkv_bias is not None:
            args.append(qkv_bias.reshape(1, -1))
            in_specs.append(pl.BlockSpec((1, n_q), lambda: (0, 0)))
            have.append("bq_ref")
        args.append(nns.reshape(1, -1))
        in_specs.append(pl.BlockSpec((1, d), lambda: (0, 0)))
        have.append("qns_ref")
        if nnb is not None:
            args.append(nnb.reshape(1, -1))
            in_specs.append(pl.BlockSpec((1, d), lambda: (0, 0)))
            have.append("qnb_ref")

    n_outs = 2 if next_qkv is not None else 1

    def kernel(x_ref, wu_ref, su_ref, wd_ref, sd_ref, *rest):
        opt = dict(zip(have, rest[:-n_outs]))
        outs = rest[-n_outs:]
        _mlp_kernel(
            x_ref, wu_ref, su_ref, wd_ref, sd_ref,
            opt.get("bu_ref"), opt.get("bd_ref"),
            opt.get("ns_ref"), opt.get("nb_ref"), opt.get("r_ref"),
            opt.get("wq_ref"), opt.get("sq_ref"), opt.get("bq_ref"),
            opt.get("qns_ref"), opt.get("qnb_ref"),
            outs[0], outs[1] if n_outs == 2 else None,
            activation=activation, norm=norm, norm_eps=norm_eps,
            w_convert=w_convert,
        )

    out_shape = jax.ShapeDtypeStruct((m, d), out_dtype)
    out_specs = pl.BlockSpec((m, d), lambda: (0, 0))
    if next_qkv is not None:
        out_shape = (out_shape, jax.ShapeDtypeStruct((m, n_q), out_dtype))
        out_specs = (out_specs, pl.BlockSpec((m, n_q), lambda: (0, 0)))

    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * ff + 2 * m * d * n_q,
            bytes_accessed=2 * d * ff + d * n_q,
            transcendentals=m * ff,
        ),
        interpret=interpret,
    )(*args)
