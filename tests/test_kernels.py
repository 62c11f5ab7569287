"""Pallas kernel tests (interpret mode on CPU; the driver benches the
compiled kernels on real TPU). Parity bar: fp32 logits <= 1e-3
(BASELINE.json accuracy target)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rten_tpu.kernels.attention import attention_reference, flash_attention
from rten_tpu.kernels.matmul_pallas import matmul_fused
from rten_tpu.kernels.quant_matmul import quant_matmul_int8, quantize_weights_int8


def test_matmul_fused_basic(rng):
    x = rng.standard_normal((64, 96)).astype(np.float32)
    w = rng.standard_normal((96, 80)).astype(np.float32)
    out = matmul_fused(x, w, block_m=128, block_n=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), x @ w, rtol=1e-5, atol=1e-4)


def test_matmul_fused_bias_activation(rng):
    x = rng.standard_normal((32, 48)).astype(np.float32)
    w = rng.standard_normal((48, 40)).astype(np.float32)
    b = rng.standard_normal((40,)).astype(np.float32)
    out = matmul_fused(
        x, w, b, activation="relu",
        block_m=128, block_n=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.maximum(x @ w + b, 0), rtol=1e-5, atol=1e-4
    )


def test_matmul_fused_multi_k_blocks(rng):
    x = rng.standard_normal((128, 384)).astype(np.float32)
    w = rng.standard_normal((384, 128)).astype(np.float32)
    out = matmul_fused(x, w, block_m=128, block_n=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), x @ w, rtol=1e-4, atol=1e-3)


def test_quantize_weights_round_trip(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    q, s = quantize_weights_int8(w, axis=-1)
    assert q.dtype == np.int8 and s.shape == (32,)
    np.testing.assert_allclose(q.astype(np.float32) * s, w, atol=np.abs(w).max() / 127)


def test_quant_matmul_int8(rng):
    x = rng.standard_normal((32, 256)).astype(np.float32)
    w = rng.standard_normal((256, 64)).astype(np.float32)
    w_q, s = quantize_weights_int8(w, axis=-1)
    out = quant_matmul_int8(
        x, w_q, s, block_m=128, block_n=128, block_k=256, interpret=True
    )
    ref = x @ (w_q.astype(np.float32) * s)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)
    # and close to the unquantized product at int8 fidelity
    err = np.abs(np.asarray(out) - x @ w).max()
    assert err < 0.5, err


def test_quant_matmul_bias_act(rng):
    x = rng.standard_normal((16, 128)).astype(np.float32)
    w = rng.standard_normal((128, 32)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    w_q, s = quantize_weights_int8(w)
    out = quant_matmul_int8(
        x, w_q, s, b, activation="gelu",
        block_m=128, block_n=128, block_k=128, interpret=True,
    )
    h = x @ (w_q.astype(np.float32) * s) + b
    ref = np.asarray(jax.nn.gelu(h, approximate=False))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)


def test_quant_matmul_w8a8_parity(rng):
    """W8A8 kernel vs an exact jnp reference of its own quantized semantics
    (s8 × s8 → s32, per-row × per-channel rescale), plus fidelity vs the
    float product at int8-activation tolerance."""
    from rten_tpu.kernels.quant_matmul import quant_matmul_w8a8

    x = rng.standard_normal((48, 320)).astype(np.float32)  # odd M/K → pads
    w = rng.standard_normal((320, 96)).astype(np.float32)
    w_q, s = quantize_weights_int8(w, axis=-1)
    out = quant_matmul_w8a8(
        x, w_q, s, block_m=128, block_n=128, block_k=128, interpret=True
    )
    absmax = np.abs(x).max(axis=1, keepdims=True)
    sx = np.where(absmax == 0, 1.0, absmax / 127.0)
    x_q = np.clip(np.round(x / sx), -127, 127).astype(np.int8)
    ref = (
        x_q.astype(np.int32) @ w_q.astype(np.int32)
    ).astype(np.float32) * sx * s
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)
    # int8 activations cost ~<1% RMS vs the float product
    f = x @ (w_q.astype(np.float32) * s)
    rms = np.sqrt(((np.asarray(out) - f) ** 2).mean()) / np.sqrt((f**2).mean())
    assert rms < 0.02, rms


def test_quant_matmul_w8a8_bias_act(rng):
    from rten_tpu.kernels.quant_matmul import quant_matmul_w8a8

    x = rng.standard_normal((16, 128)).astype(np.float32)
    w = rng.standard_normal((128, 32)).astype(np.float32)
    b = rng.standard_normal((32,)).astype(np.float32)
    w_q, s = quantize_weights_int8(w)
    out = quant_matmul_w8a8(
        x, w_q, s, b, activation="gelu",
        block_m=128, block_n=128, block_k=128, interpret=True,
    )
    absmax = np.abs(x).max(axis=1, keepdims=True)
    sx = np.where(absmax == 0, 1.0, absmax / 127.0)
    x_q = np.clip(np.round(x / sx), -127, 127).astype(np.int8)
    h = (x_q.astype(np.int32) @ w_q.astype(np.int32)).astype(np.float32) * sx * s + b
    ref = np.asarray(jax.nn.gelu(h, approximate=False))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)


def test_quant_matmul_w8a8_multiblock_chunked_epilogue(rng):
    """Multi-tile grid (K-accumulation across steps) + >512-lane N blocks
    exercising the chunked epilogue; bf16 activations in, bf16 out."""
    import jax.numpy as jnp

    from rten_tpu.kernels.quant_matmul import quant_matmul_w8a8

    x = rng.standard_normal((64, 512)).astype(np.float32)
    w = rng.standard_normal((512, 1024)).astype(np.float32)
    w_q, s = quantize_weights_int8(w, axis=-1)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    out = quant_matmul_w8a8(
        xb, w_q, s, block_m=128, block_n=1024, block_k=256, interpret=True
    )
    assert out.dtype == jnp.bfloat16
    xf = np.asarray(xb.astype(jnp.float32))
    absmax = np.abs(xf).max(axis=1, keepdims=True)
    sx = np.where(absmax == 0, 1.0, absmax / 127.0)
    x_q = np.clip(np.round(xf / sx), -127, 127).astype(np.int8)
    ref = (x_q.astype(np.int32) @ w_q.astype(np.int32)).astype(np.float32) * sx * s
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)), ref, rtol=0.02, atol=0.3
    )


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_reference(causal, rng):
    b, h, sq, skv, d = 2, 3, 128, 256, 64
    q = rng.standard_normal((b, h, sq, d)).astype(np.float32) * 0.5
    k = rng.standard_normal((b, h, skv, d)).astype(np.float32) * 0.5
    v = rng.standard_normal((b, h, skv, d)).astype(np.float32)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    ref = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


def test_flash_attention_gqa(rng):
    b, qh, kvh, sq, d = 1, 4, 2, 128, 32
    q = rng.standard_normal((b, qh, sq, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, kvh, sq, d)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, kvh, sq, d)).astype(np.float32)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


def test_flash_attention_kv_len_mask(rng):
    """Preallocated cache: only the first kv_len slots are valid."""
    b, h, skv, d = 2, 2, 256, 32
    q = rng.standard_normal((b, h, 8, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, h, skv, d)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, h, skv, d)).astype(np.float32)
    kv_len = np.array([100, 37], np.int32)
    q_offset = kv_len - 8  # decoding the last 8 positions
    out = flash_attention(
        q, k, v, causal=True, q_offset=q_offset, kv_len=kv_len, interpret=True
    )
    ref = attention_reference(
        q, k, v, causal=True, q_offset=q_offset, kv_len=kv_len
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


def test_flash_attention_decode_single_token(rng):
    b, h, skv, d = 2, 4, 128, 64
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, h, skv, d)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, h, skv, d)).astype(np.float32)
    kv_len = np.array([64, 128], np.int32)
    out = flash_attention(
        q, k, v, causal=True, q_offset=kv_len - 1, kv_len=kv_len, interpret=True
    )
    ref = attention_reference(q, k, v, causal=True, q_offset=kv_len - 1, kv_len=kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# Decode-path kernels: int8 GEMV + prefix-bounded decode attention
# ---------------------------------------------------------------------------


def test_quant_gemv_matches_dequant(rng):
    from rten_tpu.kernels.quant_matmul import quant_gemv_int8, quantize_weights_int8

    k, n = 256, 640
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, s = quantize_weights_int8(w)
    x = rng.standard_normal((1, k)).astype(np.float32)
    out = quant_gemv_int8(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), interpret=True)
    ref = x @ (q.astype(np.float32) * s)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=5e-2, atol=5e-2)


def test_quant_gemv_w_convert_hops_match(rng):
    """The convert-hop variants ("direct" one-hop vs "f32" staged) are a
    pure lowering A/B — outputs must agree bit-for-bit in interpret mode
    (int8 values are exact in both f32 and bf16)."""
    from rten_tpu.kernels.quant_matmul import quant_gemv_int8, quantize_weights_int8

    k, n = 256, 640
    q, s = quantize_weights_int8(rng.standard_normal((k, n)).astype(np.float32))
    x = jnp.asarray(
        rng.standard_normal((1, k)).astype(np.float32), jnp.bfloat16
    )
    outs = [
        quant_gemv_int8(
            x, jnp.asarray(q), jnp.asarray(s), interpret=True, w_convert=m
        )
        for m in ("direct", "f32")
    ]
    np.testing.assert_array_equal(
        np.asarray(outs[0], np.float32), np.asarray(outs[1], np.float32)
    )


def test_quant_mlp_fused_with_next_qkv(rng):
    """The whole-MLP decode kernel, including the fused NEXT-layer qkv
    projection (pre-norm → up → GELU → down → +residual, then next pre-norm
    → qkv), vs plain-numpy reference math."""
    from rten_tpu.kernels.quant_matmul import quant_mlp_int8, quantize_weights_int8

    d, ff, nq = 128, 256, 384
    wu = rng.standard_normal((d, ff)).astype(np.float32) * 0.2
    wd = rng.standard_normal((ff, d)).astype(np.float32) * 0.2
    wq = rng.standard_normal((d, nq)).astype(np.float32) * 0.2
    qu, su = quantize_weights_int8(wu)
    qd_, sd_ = quantize_weights_int8(wd)
    qq, sq = quantize_weights_int8(wq)
    bu = rng.standard_normal(ff).astype(np.float32) * 0.1
    bd = rng.standard_normal(d).astype(np.float32) * 0.1
    bq = rng.standard_normal(nq).astype(np.float32) * 0.1
    ns = rng.uniform(0.5, 1.5, d).astype(np.float32)
    nb = rng.standard_normal(d).astype(np.float32) * 0.1
    qns = rng.uniform(0.5, 1.5, d).astype(np.float32)
    qnb = rng.standard_normal(d).astype(np.float32) * 0.1
    x = rng.standard_normal((1, d)).astype(np.float32)
    resid = rng.standard_normal((1, d)).astype(np.float32)

    out, qkv = quant_mlp_int8(
        jnp.asarray(x), jnp.asarray(qu), jnp.asarray(su),
        jnp.asarray(qd_), jnp.asarray(sd_),
        jnp.asarray(bu), jnp.asarray(bd),
        activation="gelu", norm="layernorm",
        norm_scale=jnp.asarray(ns), norm_bias=jnp.asarray(nb),
        residual=jnp.asarray(resid),
        next_qkv=(jnp.asarray(qq), jnp.asarray(sq), jnp.asarray(bq),
                  jnp.asarray(qns), jnp.asarray(qnb)),
        interpret=True,
    )

    def ln(v, s, b):
        mu, var = v.mean(-1, keepdims=True), v.var(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-5) * s + b

    def gelu(v):
        from math import erf
        return 0.5 * v * (1 + np.vectorize(erf)(v / np.sqrt(2)))

    xn = ln(x, ns, nb)
    up = gelu(xn @ (qu.astype(np.float32) * su) + bu)
    ref_out = up @ (qd_.astype(np.float32) * sd_) + bd + resid
    ref_qkv = ln(ref_out, qns, qnb) @ (qq.astype(np.float32) * sq) + bq
    np.testing.assert_allclose(np.asarray(out, np.float32), ref_out, rtol=5e-2, atol=8e-2)
    np.testing.assert_allclose(np.asarray(qkv, np.float32), ref_qkv, rtol=5e-2, atol=1.5e-1)


def test_quant_gemv_fused_norm_bias_act_residual(rng):
    from rten_tpu.kernels.quant_matmul import quant_gemv_int8, quantize_weights_int8

    k, n = 128, 384
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, s = quantize_weights_int8(w)
    x = rng.standard_normal((2, k)).astype(np.float32)
    bias = rng.standard_normal(n).astype(np.float32) * 0.1
    ns = 1.0 + 0.1 * rng.standard_normal(k).astype(np.float32)
    nb = 0.1 * rng.standard_normal(k).astype(np.float32)
    resid = rng.standard_normal((2, n)).astype(np.float32)

    out = quant_gemv_int8(
        jnp.asarray(x),
        jnp.asarray(q),
        jnp.asarray(s),
        jnp.asarray(bias),
        norm="layernorm",
        norm_scale=jnp.asarray(ns),
        norm_bias=jnp.asarray(nb),
        residual=jnp.asarray(resid),
        activation="relu",
        interpret=True,
    )
    xn = (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + 1e-5)
    xn = xn * ns + nb
    ref = np.maximum(xn @ (q.astype(np.float32) * s) + bias, 0.0) + resid
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=5e-2, atol=5e-2)


def test_quant_gemv_rmsnorm(rng):
    from rten_tpu.kernels.quant_matmul import quant_gemv_int8, quantize_weights_int8

    k, n = 128, 256
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, s = quantize_weights_int8(w)
    x = rng.standard_normal((1, k)).astype(np.float32)
    ns = 1.0 + 0.1 * rng.standard_normal(k).astype(np.float32)
    out = quant_gemv_int8(
        jnp.asarray(x),
        jnp.asarray(q),
        jnp.asarray(s),
        norm="rmsnorm",
        norm_scale=jnp.asarray(ns),
        norm_eps=1e-6,
        interpret=True,
    )
    xn = x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-6) * ns
    ref = xn @ (q.astype(np.float32) * s)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=5e-2, atol=5e-2)


def test_decode_attention_matches_reference(rng):
    from rten_tpu.kernels.decode_attention import decode_attention

    b, h, s, d = 2, 4, 256, 64
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    kc = rng.standard_normal((b, h, s, d)).astype(np.float32) * 0.3
    vc = rng.standard_normal((b, h, s, d)).astype(np.float32)
    kv_len = np.array([100, 256], np.int32)
    out = decode_attention(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(kv_len),
        interpret=True,
    )
    ref = attention_reference(
        q, kc, vc, causal=True, q_offset=kv_len - 1, kv_len=kv_len
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


def test_decode_attention_gqa_and_len1(rng):
    from rten_tpu.kernels.decode_attention import decode_attention

    b, h, hk, s, d = 1, 8, 2, 128, 64
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    kc = rng.standard_normal((b, hk, s, d)).astype(np.float32) * 0.3
    vc = rng.standard_normal((b, hk, s, d)).astype(np.float32)
    for length in (1, 127, 128):
        kv_len = np.array([length], np.int32)
        out = decode_attention(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(kv_len),
            block_s=128, interpret=True,
        )
        ref = attention_reference(
            q, kc, vc, causal=True, q_offset=kv_len - 1, kv_len=kv_len
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3
        )


def test_decode_attention_fused_cache_write(rng):
    from rten_tpu.kernels.decode_attention import decode_attention

    b, h, hk, s, d = 2, 4, 2, 128, 64
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    kc = rng.standard_normal((b, hk, s, d)).astype(np.float32) * 0.3
    vc = rng.standard_normal((b, hk, s, d)).astype(np.float32)
    kn = rng.standard_normal((b, hk, 1, d)).astype(np.float32) * 0.3
    vn = rng.standard_normal((b, hk, 1, d)).astype(np.float32)
    lens = np.array([0, 77], np.int32)

    out, k2, v2 = decode_attention(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(lens),
        jnp.asarray(kn), jnp.asarray(vn), block_s=128, interpret=True,
    )
    kc_ref, vc_ref = kc.copy(), vc.copy()
    for bi in range(b):
        kc_ref[bi, :, lens[bi]] = kn[bi, :, 0]
        vc_ref[bi, :, lens[bi]] = vn[bi, :, 0]
    np.testing.assert_array_equal(np.asarray(k2), kc_ref)
    np.testing.assert_array_equal(np.asarray(v2), vc_ref)
    ref = attention_reference(
        q, kc_ref, vc_ref, causal=True, q_offset=lens, kv_len=lens + 1
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


def test_decode_attention_int8_kv(rng):
    from rten_tpu.kernels.decode_attention import (
        decode_attention_int8,
        pack_kv_scales,
        unpack_kv_scales,
    )

    b, h, hk, s, d = 1, 4, 4, 256, 64
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    kfp = rng.standard_normal((b, hk, s, d)).astype(np.float32) * 0.3
    vfp = rng.standard_normal((b, hk, s, d)).astype(np.float32)

    def quant(x):
        absmax = np.abs(x).max(-1, keepdims=True)
        sc = np.where(absmax == 0, 1.0, absmax / 127.0)
        return np.clip(np.round(x / sc), -127, 127).astype(np.int8), sc.astype(
            np.float32
        )

    kq, ks = quant(kfp)
    vq, vs = quant(vfp)
    ksp = pack_kv_scales(jnp.asarray(ks), d)
    # pack/unpack round-trip
    np.testing.assert_allclose(np.asarray(unpack_kv_scales(ksp, d)), ks)
    vsp = pack_kv_scales(jnp.asarray(vs), d)
    kn = rng.standard_normal((b, hk, 1, d)).astype(np.float32) * 0.3
    vn = rng.standard_normal((b, hk, 1, d)).astype(np.float32)
    lens = np.array([100], np.int32)

    out, k2, v2, ks2, vs2 = decode_attention_int8(
        jnp.asarray(q), jnp.asarray(kq), jnp.asarray(vq), ksp, vsp,
        jnp.asarray(lens), jnp.asarray(kn), jnp.asarray(vn), interpret=True,
    )
    # reference over the dequantized cache with the token appended
    kd = kq.astype(np.float32) * ks
    vd = vq.astype(np.float32) * vs
    for arrs, new in ((kd, kn), (vd, vn)):
        nb = new[0, :, 0]
        am = np.abs(nb).max(-1, keepdims=True)
        sc = np.where(am == 0, 1.0, am / 127.0)
        arrs[0, :, lens[0]] = np.clip(np.round(nb / sc), -127, 127) * sc
    ref = attention_reference(
        q, kd, vd, causal=True, q_offset=lens, kv_len=lens + 1
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=2e-3)
    # cache contents dequantize exactly to the reference splice
    k2d = np.asarray(k2).astype(np.float32) * np.asarray(unpack_kv_scales(ks2, d))
    np.testing.assert_allclose(k2d, kd, atol=1e-6)


def test_paged_decode_attention_matches_reference(rng):
    """Pages gathered via a shuffled page table must reproduce contiguous
    decode attention (interpret mode)."""
    from rten_tpu.kernels.paged_attention import paged_decode_attention

    b, h, d, psz, npages = 2, 4, 64, 128, 6
    rows = psz * d // 128
    kc = rng.standard_normal((b, h, 2 * psz, d)).astype(np.float32) * 0.3
    vc = rng.standard_normal((b, h, 2 * psz, d)).astype(np.float32)
    lens = np.array([psz + 17, 40], np.int32)
    # scatter the two logical pages of each row into a shuffled pool
    table = np.array([[1, 4], [3, 0]], np.int32)
    kp = np.zeros((h, npages, rows, 128), np.float32)
    vp = np.zeros((h, npages, rows, 128), np.float32)
    for bi in range(b):
        for blk in range(2):
            kp[:, table[bi, blk]] = kc[bi, :, blk * psz : (blk + 1) * psz].reshape(h, rows, 128)
            vp[:, table[bi, blk]] = vc[bi, :, blk * psz : (blk + 1) * psz].reshape(h, rows, 128)
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    out = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(table), jnp.asarray(lens), interpret=True,
    )
    ref = attention_reference(
        q, kc, vc, causal=True, q_offset=lens - 1, kv_len=lens
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


def test_paged_decode_attention_int8_matches_dequant_reference(rng):
    """INT8 page pool + per-token/head scales + fused quantized append vs
    the dequantized contiguous reference."""
    from rten_tpu.kernels.paged_attention import paged_decode_attention_int8

    b, h, d, psz, npages = 2, 4, 64, 128, 6
    rows = psz * d // 128
    f = 128 // d
    S = 2 * psz
    kc = rng.standard_normal((b, h, S, d)).astype(np.float32) * 0.5
    vc = rng.standard_normal((b, h, S, d)).astype(np.float32)
    lens = np.array([psz + 9, 31], np.int32)
    table = np.array([[2, 5], [1, 0]], np.int32)

    # per-(token, head) absmax quantization of the prefix
    absmax = np.abs(kc).max(-1, keepdims=True)
    ks = np.where(absmax == 0, 1.0, absmax / 127.0).astype(np.float32)
    kq = np.clip(np.round(kc / ks), -127, 127).astype(np.int8)
    absmax = np.abs(vc).max(-1, keepdims=True)
    vs = np.where(absmax == 0, 1.0, absmax / 127.0).astype(np.float32)
    vq = np.clip(np.round(vc / vs), -127, 127).astype(np.int8)

    kp = np.zeros((h, npages, rows, 128), np.int8)
    vp = np.zeros((h, npages, rows, 128), np.int8)
    ksp = np.zeros((h, npages, 8, 128), np.float32)
    vsp = np.zeros((h, npages, 8, 128), np.float32)
    for bi in range(b):
        for blk in range(2):
            pg = table[bi, blk]
            kp[:, pg] = kq[bi, :, blk * psz : (blk + 1) * psz].reshape(h, rows, 128)
            vp[:, pg] = vq[bi, :, blk * psz : (blk + 1) * psz].reshape(h, rows, 128)
            for t in range(psz):
                tok = blk * psz + t
                ksp[:, pg, t % f, (t * d) // 128] = ks[bi, :, tok, 0]
                vsp[:, pg, t % f, (t * d) // 128] = vs[bi, :, tok, 0]

    q = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    kn = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.5
    vn = rng.standard_normal((b, h, 1, d)).astype(np.float32)

    out, kp2, vp2, ksp2, vsp2 = paged_decode_attention_int8(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(ksp), jnp.asarray(vsp),
        jnp.asarray(table), jnp.asarray(lens),
        jnp.asarray(kn), jnp.asarray(vn), interpret=True,
    )

    # Reference: dequantized prefix + per-HEAD-quantized new token appended.
    kc_ref, vc_ref = (kq.astype(np.float32) * ks), (vq.astype(np.float32) * vs)
    for bi in range(b):
        am = np.abs(kn[bi]).max(axis=(1, 2))
        sc = np.where(am == 0, 1.0, am / 127.0)
        kc_ref[bi, :, lens[bi]] = (
            np.clip(np.round(kn[bi, :, 0] / sc[:, None]), -127, 127) * sc[:, None]
        )
        am = np.abs(vn[bi]).max(axis=(1, 2))
        sc = np.where(am == 0, 1.0, am / 127.0)
        vc_ref[bi, :, lens[bi]] = (
            np.clip(np.round(vn[bi, :, 0] / sc[:, None]), -127, 127) * sc[:, None]
        )
    ref = attention_reference(
        q, kc_ref, vc_ref, causal=True, q_offset=lens, kv_len=lens + 1
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)

    # The appended token must be readable back from its page + scale tile.
    for bi in range(b):
        pg = table[bi, lens[bi] // psz]
        t = lens[bi] % psz
        row = (t * d) // 128
        stored = np.asarray(kp2)[:, pg, row, (t % f) * d : (t % f) * d + d]
        scale = np.asarray(ksp2)[:, pg, t % f, row]
        np.testing.assert_allclose(
            stored.astype(np.float32) * scale[:, None],
            kc_ref[bi, :, lens[bi]],
            rtol=2e-2, atol=2e-2,
        )


def test_decode_attention_packed_qkv_matches_separate(rng):
    """The packed single-operand q|k_new|v_new path (MHA + fused wo) must
    match the separate-operand call exactly."""
    from rten_tpu.kernels.decode_attention import decode_attention
    from rten_tpu.kernels.quant_matmul import quantize_weights_int8

    b, h, s, d, dm = 2, 4, 128, 64, 256
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    kc = rng.standard_normal((b, h, s, d)).astype(np.float32) * 0.3
    vc = rng.standard_normal((b, h, s, d)).astype(np.float32)
    kn = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    vn = rng.standard_normal((b, h, 1, d)).astype(np.float32)
    lens = np.array([13, 77], np.int32)
    wo_q, wo_s = quantize_weights_int8(rng.standard_normal((h * d, dm)).astype(np.float32))
    resid = rng.standard_normal((b, dm)).astype(np.float32)

    ref_out, ref_k, ref_v = decode_attention(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(lens),
        jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(wo_q), jnp.asarray(wo_s), None, jnp.asarray(resid),
        block_s=128, interpret=True,
    )

    # Pack exactly as decoder.forward does: flat [B, 3*H*D] → [B,3,H,1,D] pad.
    flat = np.concatenate(
        [q.reshape(b, -1), kn.reshape(b, -1), vn.reshape(b, -1)], axis=1
    )
    pk = jnp.pad(
        jnp.asarray(flat).reshape(b, 3, h, 1, d),
        ((0, 0), (0, 0), (0, 0), (0, 7), (0, 0)),
    )
    out, k2, v2 = decode_attention(
        None, jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(lens),
        None, None,
        jnp.asarray(wo_q), jnp.asarray(wo_s), None, jnp.asarray(resid),
        packed_qkv=pk, block_s=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(ref_v))


def test_decode_attention_mega_block_fusion(rng):
    """Whole-transformer-block fusion (attention + wo + MLP + next-layer qkv
    in ONE kernel, weights streamed under the attention loop) must match the
    two-kernel composition decode_attention(fused wo) → quant_mlp_int8."""
    from rten_tpu.kernels.decode_attention import decode_attention
    from rten_tpu.kernels.quant_matmul import quant_mlp_int8, quantize_weights_int8

    b, h, s, d, dm, ff, nq = 1, 4, 128, 64, 256, 512, 3 * 256
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    kc = rng.standard_normal((b, h, s, d)).astype(np.float32) * 0.3
    vc = rng.standard_normal((b, h, s, d)).astype(np.float32)
    kn = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    vn = rng.standard_normal((b, h, 1, d)).astype(np.float32)
    lens = np.array([77], np.int32)
    wo_q, wo_s = quantize_weights_int8(
        rng.standard_normal((h * d, dm)).astype(np.float32)
    )
    wo_b = rng.standard_normal((dm,)).astype(np.float32) * 0.1
    resid = rng.standard_normal((b, dm)).astype(np.float32)
    wu_q, wu_s = quantize_weights_int8(
        rng.standard_normal((dm, ff)).astype(np.float32)
    )
    wd_q, wd_s = quantize_weights_int8(
        rng.standard_normal((ff, dm)).astype(np.float32)
    )
    b_up = rng.standard_normal((ff,)).astype(np.float32) * 0.1
    b_down = rng.standard_normal((dm,)).astype(np.float32) * 0.1
    ns = 1.0 + rng.standard_normal((dm,)).astype(np.float32) * 0.1
    nb = rng.standard_normal((dm,)).astype(np.float32) * 0.1
    wq_q, wq_s = quantize_weights_int8(
        rng.standard_normal((dm, nq)).astype(np.float32)
    )
    bq = rng.standard_normal((nq,)).astype(np.float32) * 0.1
    qns = 1.0 + rng.standard_normal((dm,)).astype(np.float32) * 0.1
    qnb = rng.standard_normal((dm,)).astype(np.float32) * 0.1
    J = jnp.asarray

    # Reference: the existing two-kernel composition.
    attn_out, ref_k, ref_v = decode_attention(
        J(q), J(kc), J(vc), J(lens), J(kn), J(vn),
        J(wo_q), J(wo_s), J(wo_b), J(resid),
        block_s=128, interpret=True,
    )
    ref_x, ref_qkv = quant_mlp_int8(
        attn_out, J(wu_q), J(wu_s), J(wd_q), J(wd_s), J(b_up), J(b_down),
        activation="gelu", norm="layernorm", norm_scale=J(ns), norm_bias=J(nb),
        norm_eps=1e-5, residual=attn_out,
        next_qkv=(J(wq_q), J(wq_s), J(bq), J(qns), J(qnb)),
        interpret=True,
    )

    x, qkv, k2, v2 = decode_attention(
        J(q), J(kc), J(vc), J(lens), J(kn), J(vn),
        J(wo_q), J(wo_s), J(wo_b), J(resid),
        mlp=(J(wu_q), J(wu_s), J(wd_q), J(wd_s), J(b_up), J(b_down), J(ns), J(nb)),
        next_qkv=(J(wq_q), J(wq_s), J(bq), J(qns), J(qnb)),
        activation="gelu", norm="layernorm", norm_eps=1e-5,
        block_s=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(qkv), np.asarray(ref_qkv), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(ref_v))

    # Without next_qkv: (x, k, v) and the same block output.
    x2, k3, v3 = decode_attention(
        J(q), J(kc), J(vc), J(lens), J(kn), J(vn),
        J(wo_q), J(wo_s), J(wo_b), J(resid),
        mlp=(J(wu_q), J(wu_s), J(wd_q), J(wd_s), J(b_up), J(b_down), J(ns), J(nb)),
        activation="gelu", norm="layernorm", norm_eps=1e-5,
        block_s=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x2), np.asarray(ref_x), rtol=1e-5, atol=1e-5)

    # Whole-stack [L, K, N] weight slabs + layer_idx (the production layout:
    # big enough that XLA memory-space assignment can't prefetch them) must
    # match the per-layer matrices exactly. Real weights live at layer 1;
    # layer 0 is garbage that must NOT be read.
    garbage = (rng.integers(-127, 127, wu_q.shape)).astype(np.int8)
    wu_slab = np.stack([garbage, wu_q])
    wd_slab = np.stack([rng.integers(-127, 127, wd_q.shape).astype(np.int8), wd_q])
    wq_slab = np.stack([rng.integers(-127, 127, wq_q.shape).astype(np.int8), wq_q])
    xs, qkvs, k4, v4 = decode_attention(
        J(q), J(kc), J(vc), J(lens), J(kn), J(vn),
        J(wo_q), J(wo_s), J(wo_b), J(resid),
        mlp=(J(wu_slab), J(wu_s), J(wd_slab), J(wd_s), J(b_up), J(b_down), J(ns), J(nb)),
        next_qkv=(J(wq_slab), J(wq_s), J(bq), J(qns), J(qnb)),
        activation="gelu", norm="layernorm", norm_eps=1e-5,
        block_s=128, interpret=True, layer_idx=1,
    )
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(qkvs), np.asarray(ref_qkv), rtol=1e-5, atol=1e-5
    )


def test_quant_matmul_int8_multiblock_bias_act(rng):
    """Multi-K-block accumulation with bias/activation epilogue (the
    chunked-epilogue path is covered at wide N in
    test_quant_matmul_chunked_epilogue)."""
    x = rng.standard_normal((32, 512)).astype(np.float32)
    w = rng.standard_normal((512, 64)).astype(np.float32)
    b = rng.standard_normal((64,)).astype(np.float32)
    w_q, s = quantize_weights_int8(w, axis=-1)
    out = quant_matmul_int8(
        x, w_q, s, block_m=128, block_n=128, block_k=128, interpret=True,
    )
    ref = x @ (w_q.astype(np.float32) * s)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)
    out_b = quant_matmul_int8(
        x, w_q, s, b, activation="gelu",
        block_m=128, block_n=128, block_k=128, interpret=True,
    )
    ref_b = np.asarray(jax.nn.gelu(ref + b, approximate=False))
    np.testing.assert_allclose(np.asarray(out_b), ref_b, rtol=1e-4, atol=1e-3)


def test_quant_matmul_chunked_epilogue(rng):
    """Wide-N blocks route the scale/bias/activation epilogue through
    512-lane chunks (Mosaic scoped-VMEM stack cap — the batch-8 prefill
    OOM); parity vs the dequantized reference at the exact failing shape."""
    x = rng.standard_normal((512, 768)).astype(np.float32)
    w = rng.standard_normal((768, 3072)).astype(np.float32)
    b = rng.standard_normal((3072,)).astype(np.float32)
    w_q, s = quantize_weights_int8(w, axis=-1)
    out = quant_matmul_int8(x, w_q, s, b, activation="gelu", interpret=True)
    ref = x @ (w_q.astype(np.float32) * s) + b
    ref = np.asarray(jax.nn.gelu(ref, approximate=False))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=5e-3)


def test_quant_gemv_argmax_fused(rng):
    """argmax_n fuses the greedy sampler into the GEMV epilogue: int32
    argmax over the valid columns, first occurrence on ties, padded and
    beyond-vocab columns masked."""
    from rten_tpu.kernels.quant_matmul import quant_gemv_int8

    x = rng.standard_normal((1, 256)).astype(np.float32)
    w = rng.standard_normal((256, 512)).astype(np.float32)
    w_q, s = quantize_weights_int8(w, axis=-1)
    vocab = 300  # < N: the tail columns must never win
    ref_logits = x @ (w_q.astype(np.float32) * s)
    ref = ref_logits[:, :vocab].argmax(-1)
    out = quant_gemv_int8(
        x, w_q, s, argmax_n=vocab, block_n=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert np.asarray(out).dtype == np.int32

    # with the fused pre-norm prologue (the lm_head configuration)
    ns = rng.uniform(0.5, 1.5, 256).astype(np.float32)
    nb = rng.standard_normal(256).astype(np.float32) * 0.1
    xn = (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + 1e-5)
    xn = xn * ns + nb
    ref_n = (xn @ (w_q.astype(np.float32) * s))[:, :vocab].argmax(-1)
    out_n = quant_gemv_int8(
        x, w_q, s, norm="layernorm", norm_scale=ns, norm_bias=nb,
        argmax_n=vocab, block_n=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out_n), ref_n)

    # batch rows act independently
    xb = rng.standard_normal((4, 256)).astype(np.float32)
    refb = (xb @ (w_q.astype(np.float32) * s))[:, :vocab].argmax(-1)
    outb = quant_gemv_int8(xb, w_q, s, argmax_n=vocab, block_n=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(outb), refb)


def test_decode_attention_batched_matches_per_cell(rng):
    """batched=True processes every batch row in ONE grid cell
    (strided DMAs, (b·h)-batched online softmax); outputs and in-place
    cache writes must match the per-cell grid kernel exactly — unequal
    per-row lengths included."""
    from rten_tpu.kernels.decode_attention import decode_attention

    b, h, hk, s, d = 4, 4, 2, 512, 64
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    kc = rng.standard_normal((b, hk, s, d)).astype(np.float32) * 0.3
    vc = rng.standard_normal((b, hk, s, d)).astype(np.float32)
    kn = rng.standard_normal((b, hk, 1, d)).astype(np.float32) * 0.3
    vn = rng.standard_normal((b, hk, 1, d)).astype(np.float32)
    lens = np.array([0, 77, 256, 511], np.int32)

    def run(flag):
        return decode_attention(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(lens), jnp.asarray(kn), jnp.asarray(vn),
            block_s=128, interpret=True, batched=flag,
        )

    o0, k0, v0 = run(False)
    o1, k1, v1 = run(True)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k0))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=1e-5, atol=1e-5)


def test_decode_attention_batched_packed_wo(rng):
    """Batched mode composes with the packed-qkv operand + fused W_o
    (the serving decode configuration)."""
    from rten_tpu.kernels.decode_attention import decode_attention
    from rten_tpu.kernels.quant_matmul import quantize_weights_int8

    b, h, s, d, dm = 8, 2, 256, 64, 128
    hk = h
    qkv = rng.standard_normal((b, 3, hk, 1, d)).astype(np.float32) * 0.3
    kc = rng.standard_normal((b, hk, s, d)).astype(np.float32) * 0.3
    vc = rng.standard_normal((b, hk, s, d)).astype(np.float32)
    lens = (rng.integers(0, s - 1, b)).astype(np.int32)
    wo = rng.standard_normal((h * d, dm)).astype(np.float32) * 0.1
    wo_q, wo_s = quantize_weights_int8(wo, axis=-1)
    bias = rng.standard_normal(dm).astype(np.float32) * 0.1
    resid = rng.standard_normal((b, dm)).astype(np.float32)

    def run(flag):
        return decode_attention(
            None, jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(lens),
            None, None, jnp.asarray(wo_q), jnp.asarray(wo_s),
            jnp.asarray(bias), jnp.asarray(resid),
            packed_qkv=jnp.asarray(qkv), block_s=128, interpret=True,
            batched=flag,
        )

    o0, k0, v0 = run(False)
    o1, k1, v1 = run(True)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k0))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=1e-4, atol=1e-4)


def test_quant_gemv_kblocked_parity(rng):
    """block_k streams [block_k, block_n] weight tiles (the wide-stripe DMA
    geometry); results must match the whole-K kernel across every fused
    feature: norm prologue, bias, activation, residual, and the argmax
    epilogue."""
    from rten_tpu.kernels.quant_matmul import quant_gemv_int8

    k, n = 512, 384
    x = rng.standard_normal((2, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_q, s = quantize_weights_int8(w, axis=-1)
    b = rng.standard_normal(n).astype(np.float32) * 0.1
    r = rng.standard_normal((2, n)).astype(np.float32)
    ns = rng.uniform(0.5, 1.5, k).astype(np.float32)
    nb = rng.standard_normal(k).astype(np.float32) * 0.1

    base = dict(block_n=128, interpret=True)
    for kwargs in (
        dict(),
        dict(bias=b, activation="gelu"),
        dict(norm="layernorm", norm_scale=ns, norm_bias=nb),
        dict(norm="rmsnorm", norm_scale=ns, bias=b, residual=r),
    ):
        ref = quant_gemv_int8(x, w_q, s, **kwargs, **base)
        got = quant_gemv_int8(x, w_q, s, block_k=128, **kwargs, **base)
        # per-K-tile partial sums reassociate the f32 accumulation
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-4
        ), kwargs

    # fused argmax through the K-blocked path (the lm-head configuration)
    vocab = 300
    ref_am = quant_gemv_int8(x, w_q, s, argmax_n=vocab, **base)
    got_am = quant_gemv_int8(x, w_q, s, argmax_n=vocab, block_k=128, **base)
    np.testing.assert_array_equal(np.asarray(got_am), np.asarray(ref_am))
    # block_k not dividing K falls back to whole-K silently
    got_nd = quant_gemv_int8(x, w_q, s, block_k=200, **base)
    np.testing.assert_allclose(
        np.asarray(got_nd), np.asarray(quant_gemv_int8(x, w_q, s, **base)),
        rtol=1e-6, atol=1e-6,
    )


def test_decode_attention_int8_batched_matches_per_cell(rng):
    """Int8-KV twin of the batched single-cell mode: outputs, in-place int8
    cache writes, and spliced scales must match the per-cell grid kernel."""
    from rten_tpu.kernels.decode_attention import (
        decode_attention_int8,
        pack_kv_scales,
    )

    b, h, hk, s, d = 4, 2, 2, 512, 64
    q = rng.standard_normal((b, h, 1, d)).astype(np.float32) * 0.3
    kfp = rng.standard_normal((b, hk, s, d)).astype(np.float32) * 0.3
    vfp = rng.standard_normal((b, hk, s, d)).astype(np.float32)

    def quant(x):
        absmax = np.abs(x).max(-1, keepdims=True)
        sc = np.where(absmax == 0, 1.0, absmax / 127.0)
        return np.clip(np.round(x / sc), -127, 127).astype(np.int8), sc.astype(np.float32)

    kq, ks = quant(kfp)
    vq, vs = quant(vfp)
    ksp = pack_kv_scales(jnp.asarray(ks), d)
    vsp = pack_kv_scales(jnp.asarray(vs), d)
    kn = rng.standard_normal((b, hk, 1, d)).astype(np.float32) * 0.3
    vn = rng.standard_normal((b, hk, 1, d)).astype(np.float32)
    lens = np.array([0, 63, 130, 511], np.int32)

    def run(flag):
        return decode_attention_int8(
            jnp.asarray(q), jnp.asarray(kq), jnp.asarray(vq), ksp, vsp,
            jnp.asarray(lens), jnp.asarray(kn), jnp.asarray(vn),
            block_s=256, interpret=True, batched=flag,
        )

    o0, k0, v0, ks0, vs0 = run(False)
    o1, k1, v1, ks1, vs1 = run(True)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k0))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(ks1), np.asarray(ks0))
    np.testing.assert_array_equal(np.asarray(vs1), np.asarray(vs0))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), rtol=1e-5, atol=1e-5)


def test_quant_gemv_tiled_layout_parity(rng):
    """Contiguous-tiled [S, K, bn] weights (tile_gemv_weights) must match
    the row-major layout bit-for-bit through every GEMV mode — plain,
    fused norm/bias/act/residual, argmax epilogue, and K-blocked — since
    the tile is the same [K, bn] stripe, just stored linear in HBM."""
    from rten_tpu.kernels.quant_matmul import (
        gemv_weight_kn,
        quant_gemv_int8,
        tile_gemv_pack,
        tile_gemv_weights,
        untile_gemv_weights,
    )

    k, n = 512, 384
    x = rng.standard_normal((3, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_q, s = quantize_weights_int8(w, axis=-1)
    wt = tile_gemv_weights(w_q, 128)  # [3, 512, 128]
    assert wt.shape == (3, k, 128)
    assert gemv_weight_kn(wt) == (k, n)
    np.testing.assert_array_equal(np.asarray(untile_gemv_weights(wt, n)), w_q)

    b = rng.standard_normal(n).astype(np.float32) * 0.1
    r = rng.standard_normal((3, n)).astype(np.float32)
    ns = rng.uniform(0.5, 1.5, k).astype(np.float32)

    for kwargs in (
        dict(),
        dict(bias=b, activation="gelu"),
        dict(norm="rmsnorm", norm_scale=ns, bias=b, residual=r),
        dict(block_k=128),
    ):
        ref = quant_gemv_int8(x, w_q, s, block_n=128, interpret=True, **kwargs)
        got = quant_gemv_int8(x, wt, s, interpret=True, **kwargs)
        np.testing.assert_array_equal(np.asarray(got)[:, :n], np.asarray(ref))

    # argmax epilogue (the greedy lm-head configuration)
    ref_am = quant_gemv_int8(x, w_q, s, argmax_n=300, block_n=128, interpret=True)
    got_am = quant_gemv_int8(x, wt, s, argmax_n=300, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_am), np.asarray(ref_am))

    # tile padding: bn that does NOT divide N zero-pads the tail stripe
    wt2 = tile_gemv_weights(w_q, 256)  # N 384 -> padded 512, S=2
    pack = tile_gemv_pack({"q": w_q, "s": s.reshape(1, -1)}, 256)
    assert pack["q"].shape == (2, k, 256) and pack["s"].shape == (1, 512)
    got2 = quant_gemv_int8(x, wt2, pack["s"], interpret=True)
    np.testing.assert_array_equal(np.asarray(got2)[:, :n], np.asarray(
        quant_gemv_int8(x, w_q, s, block_n=128, interpret=True)))


def test_quant_matmul_tiled_layout_parity(rng):
    """Prefill-shape (M > 8) matmul through tiled weights: the (j // r, kk,
    j % r) stripe indexing must reproduce the row-major result exactly."""
    from rten_tpu.kernels.quant_matmul import quant_matmul_int8, tile_gemv_weights

    k, n, m = 256, 512, 64
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_q, s = quantize_weights_int8(w, axis=-1)
    ref = quant_matmul_int8(
        x, w_q, s, block_m=128, block_n=128, block_k=128, interpret=True
    )
    for bn_tile in (256, 512):
        wt = tile_gemv_weights(w_q, bn_tile)
        got = quant_matmul_int8(
            x, wt, s, block_m=128, block_n=128, block_k=128, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got)[:, :n], np.asarray(ref))


def test_quantize_params_tiled_lm_head_decode_parity(rng):
    """quantize_params_int8(tile_bn=...) must leave every decode
    surface token-exact: logits path, fused-argmax path, and prefill."""
    from rten_tpu.models import decoder

    cfg = decoder.DecoderConfig(
        vocab_size=1000, n_layers=2, d_model=128, n_heads=2, max_seq=64
    )
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    qp = decoder.quantize_params_int8(params, tile_bn=None)
    qt = decoder.quantize_params_int8(params, tile_bn=256)
    assert qt["lm_head_q"]["q"].ndim == 3

    prompt = jnp.asarray(np.arange(8, dtype=np.int32)[None])
    c0 = decoder.init_cache(cfg, 1, 64)
    l0, c0 = decoder.prefill(qp, cfg, prompt, c0)
    c1 = decoder.init_cache(cfg, 1, 64)
    l1, c1 = decoder.prefill(qt, cfg, prompt, c1)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-5, atol=1e-5)

    t0, _ = decoder.generate_scan(
        qp, cfg, c0, prompt[:, -1:], jax.random.PRNGKey(1), n_steps=8
    )
    t1, _ = decoder.generate_scan(
        qt, cfg, c1, prompt[:, -1:], jax.random.PRNGKey(1), n_steps=8
    )
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_quantize_params_tiled_llama_class_parity(rng):
    """Llama-class (SwiGLU + GQA + RoPE): tiling covers wqkv, w_gu, and the
    lm_head (big layers stream every projection via GEMV stripes); decode
    must stay token-exact and prefill logits must match."""
    from rten_tpu.models import decoder

    cfg = decoder.DecoderConfig(
        vocab_size=512, n_layers=2, d_model=256, n_heads=4, n_kv_heads=2,
        d_ff=512, max_seq=64, pos_encoding="rope", norm="rmsnorm",
        activation="swiglu", tie_embeddings=False,
    )
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    qp = decoder.quantize_params_int8(params, tile_bn=None)
    qt = decoder.quantize_params_int8(params, tile_bn=128)
    # tiling hit the SwiGLU gate|up pack and the qkv pack
    assert qt["layers"][0]["w_gu"]["q"].ndim == 3
    assert qt["layers"][0]["wqkv"]["q"].ndim == 3
    # wo stays 2-D (fused-wo decode attention consumes it directly)
    assert qt["layers"][0]["wo"]["q"].ndim == 2

    prompt = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    c0 = decoder.init_cache(cfg, 1, 64)
    l0, c0 = decoder.prefill(qp, cfg, prompt, c0)
    c1 = decoder.init_cache(cfg, 1, 64)
    l1, c1 = decoder.prefill(qt, cfg, prompt, c1)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-5, atol=1e-5)

    t0, _ = decoder.generate_scan(
        qp, cfg, c0, prompt[:, -1:], jax.random.PRNGKey(1), n_steps=6
    )
    t1, _ = decoder.generate_scan(
        qt, cfg, c1, prompt[:, -1:], jax.random.PRNGKey(1), n_steps=6
    )
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_quant_matmul_w_convert_direct_parity(rng):
    """w_convert="direct" (int8->bf16 one-hop dequant) must match the default
    double-conversion numerically (int8 values are exact in bf16)."""
    from rten_tpu.kernels.quant_matmul import quant_matmul_int8, quantize_weights_int8

    x = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    qw, qs = quantize_weights_int8(rng.standard_normal((256, 512)).astype(np.float32))
    a = quant_matmul_int8(x, jnp.asarray(qw), jnp.asarray(qs), interpret=True)
    b = quant_matmul_int8(
        x, jnp.asarray(qw), jnp.asarray(qs), interpret=True, w_convert="direct"
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def _w8a8_ref_dot(v, w_q, s):
    """Exact reference for the kernels' w8a8 hop: per-row symmetric dynamic
    int8 activations, s8 × s8 → s32, per-row × per-channel rescale."""
    absmax = np.abs(v).max(axis=-1, keepdims=True)
    sx = np.where(absmax == 0, 1.0, absmax / 127.0)
    q = np.clip(np.round(v / sx), -127, 127)
    return (q.astype(np.int32) @ w_q.astype(np.int32)).astype(np.float32) * sx * s


def test_quant_gemv_w8a8_parity(rng):
    """Decode GEMV in w8a8 mode (s8 × s8 MXU dots, dynamic per-row
    activation quant cached across N stripes) vs the exact quantized
    reference — fused norm prologue and bias/act epilogue included."""
    from rten_tpu.kernels.quant_matmul import quant_gemv_int8, quantize_weights_int8

    k, n = 128, 384
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, s = quantize_weights_int8(w)
    x = rng.standard_normal((2, k)).astype(np.float32)
    bias = rng.standard_normal(n).astype(np.float32) * 0.1
    ns = rng.uniform(0.5, 1.5, k).astype(np.float32)
    nb = 0.1 * rng.standard_normal(k).astype(np.float32)

    out = quant_gemv_int8(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), jnp.asarray(bias),
        norm="layernorm", norm_scale=jnp.asarray(ns), norm_bias=jnp.asarray(nb),
        activation="relu", block_n=128, w_convert="w8a8", interpret=True,
    )
    xn = (x - x.mean(-1, keepdims=True)) / np.sqrt(x.var(-1, keepdims=True) + 1e-5)
    xn = xn * ns + nb
    ref = np.maximum(_w8a8_ref_dot(xn, q, s) + bias, 0.0)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=1e-4, atol=1e-4)
    # ...and the int8-activation error vs the weight-only product is small
    f = np.maximum(xn @ (q.astype(np.float32) * s) + bias, 0.0)
    rms = np.sqrt(((np.asarray(out, np.float32) - f) ** 2).mean())
    assert rms < 0.05 * np.sqrt((f**2).mean()) + 1e-3, rms


def test_quant_gemv_w8a8_tiled_argmax(rng):
    """w8a8 through the lm_head configuration: contiguous-tiled [S, K, bn]
    weights + the fused greedy-argmax epilogue."""
    from rten_tpu.kernels.quant_matmul import (
        quant_gemv_int8, quantize_weights_int8, tile_gemv_weights)

    k, n, vocab = 128, 512, 300
    w = rng.standard_normal((k, n)).astype(np.float32)
    q, s = quantize_weights_int8(w)
    x = rng.standard_normal((1, k)).astype(np.float32)
    wt = tile_gemv_weights(jnp.asarray(q), 128)
    out = quant_gemv_int8(
        x, wt, s, argmax_n=vocab, w_convert="w8a8", interpret=True
    )
    ref = _w8a8_ref_dot(x, q, s)[:, :vocab].argmax(-1)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_quant_mlp_w8a8_parity(rng):
    """Whole-MLP kernel in w8a8 mode: every hop (up, down, next-layer qkv)
    re-quantizes its f32 activations per row and runs s8 dots; exact vs the
    quantized-domain reference."""
    from rten_tpu.kernels.quant_matmul import quant_mlp_int8, quantize_weights_int8

    d, ff, nq = 128, 256, 384
    qu, su = quantize_weights_int8(rng.standard_normal((d, ff)).astype(np.float32) * 0.2)
    qd_, sd_ = quantize_weights_int8(rng.standard_normal((ff, d)).astype(np.float32) * 0.2)
    qq, sq = quantize_weights_int8(rng.standard_normal((d, nq)).astype(np.float32) * 0.2)
    ns = rng.uniform(0.5, 1.5, d).astype(np.float32)
    nb = rng.standard_normal(d).astype(np.float32) * 0.1
    qns = rng.uniform(0.5, 1.5, d).astype(np.float32)
    qnb = rng.standard_normal(d).astype(np.float32) * 0.1
    x = rng.standard_normal((1, d)).astype(np.float32)
    resid = rng.standard_normal((1, d)).astype(np.float32)

    out, qkv = quant_mlp_int8(
        jnp.asarray(x), jnp.asarray(qu), jnp.asarray(su),
        jnp.asarray(qd_), jnp.asarray(sd_),
        activation="relu", norm="layernorm",
        norm_scale=jnp.asarray(ns), norm_bias=jnp.asarray(nb),
        residual=jnp.asarray(resid),
        next_qkv=(jnp.asarray(qq), jnp.asarray(sq), None,
                  jnp.asarray(qns), jnp.asarray(qnb)),
        w_convert="w8a8", interpret=True,
    )

    def ln(v, sc, b):
        mu, var = v.mean(-1, keepdims=True), v.var(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-5) * sc + b

    xn = ln(x, ns, nb)
    up = np.maximum(_w8a8_ref_dot(xn, qu, su), 0.0)
    ref_out = _w8a8_ref_dot(up, qd_, sd_) + resid
    ref_qkv = _w8a8_ref_dot(ln(ref_out, qns, qnb), qq, sq)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref_out, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(qkv, np.float32), ref_qkv, rtol=1e-3, atol=2e-3)
