"""Blocked MXU matmul with fused bias + activation (Pallas).

The TPU replacement for the reference's BLIS-style prepacked GEMM with fused
bias/alpha/beta (src/gemm.rs:492 gemm_bias, microkernels in
src/gemm/kernels/). Design maps the BLIS ideas onto the MXU:

- MR×NR register microkernel        → 128×128 MXU tile per inner dot
- 3-level cache blocking            → grid over (M/bm, N/bn, K/bk) with a
                                      VMEM f32 accumulator persisting across K
- prepacked A/B panels              → BlockSpec-driven HBM→VMEM pipeline
                                      (Mosaic double-buffers automatically)
- fused bias + activation epilogue  → applied in-kernel on the last K step,
                                      saving one HBM round trip of the output

Grid iteration order puts K innermost ("arbitrary"), M/N parallel for
megacore splitting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7) — Mosaic has
    no erf/erfc lowering, and 1.5e-7 is far inside the 1e-3 parity budget."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return sign * y


def _gelu_erf(x):
    # 0.5·x·(1+erf(x/√2)) — the reference's exact (non-tanh) GELU
    # (src/optimize.rs:456 fuse_gelu).
    return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865475))


_ACTIVATIONS = {
    None: lambda x: x,
    "relu": jax.nn.relu,
    "gelu": _gelu_erf,
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def _matmul_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, activation, n_k):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _epilogue():
        out = acc_ref[...]
        if b_ref is not None:
            out = out + b_ref[...].astype(jnp.float32)
        out = _ACTIVATIONS[activation](out)
        o_ref[...] = out.astype(o_ref.dtype)


def _pad_to(x, multiple, axis):
    size = x.shape[axis]
    pad = -size % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def pick_block(dim: int, preferred: int) -> int:
    """Largest 128-multiple ≤ preferred that divides ``dim``; falls back to
    preferred (caller pads). Padding a WEIGHT inside a traced step copies the
    whole matrix every step — divisor blocks avoid that entirely."""
    if dim % 128 != 0:
        return min(preferred, max(128, -(-dim // 128) * 128))
    for cand in range(min(preferred, dim), 127, -128):
        if dim % cand == 0:
            return cand
    return preferred


@functools.partial(
    jax.jit,
    static_argnames=("activation", "block_m", "block_n", "block_k", "out_dtype", "interpret"),
)
def matmul_fused(
    x,
    w,
    bias=None,
    *,
    activation: str | None = None,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
    interpret: bool = False,
):
    """out = activation(x @ w + bias). x: [M, K], w: [K, N], bias: [N].

    Shapes are padded to block multiples (XLA removes the pads from the
    caller's view); accumulation is always f32 on the MXU.
    """
    if x.ndim != 2 or w.ndim != 2:
        raise ValueError("matmul_fused expects 2-D operands")
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, (x.shape, w.shape)
    out_dtype = out_dtype or x.dtype

    block_m = min(block_m, max(128, -(-m // 128) * 128))
    block_n = pick_block(n, block_n)
    block_k = pick_block(k, block_k)

    xp = _pad_to(_pad_to(x, block_m, 0), block_k, 1)
    wp = _pad_to(_pad_to(w, block_k, 0), block_n, 1)
    mp, kp = xp.shape
    np_ = wp.shape[1]
    n_k = kp // block_k

    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
    ]
    args = [xp, wp]
    if bias is not None:
        bp = _pad_to(bias.reshape(1, -1), block_n, 1)
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)))
        args.append(bp)
        kernel = functools.partial(_matmul_kernel, activation=activation, n_k=n_k)
    else:
        kernel = functools.partial(
            lambda x_ref, w_ref, o_ref, acc_ref, **kw: _matmul_kernel(
                x_ref, w_ref, None, o_ref, acc_ref, **kw
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
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=(
                mp * kp * xp.dtype.itemsize
                + kp * np_ * wp.dtype.itemsize
                + mp * np_ * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=mp * np_ if activation in ("gelu", "silu", "sigmoid", "tanh") else 0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m, :n]
