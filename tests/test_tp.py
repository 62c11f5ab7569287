"""Explicit shard_map tensor parallelism (parallel/tp.py) on the virtual
8-device CPU mesh: the sharded forward must match the single-chip forward
bit-for-bit (dense f32) or within int8 tolerance, INCLUDING when it runs the
real Pallas decode kernels (interpret mode) per shard — TP + Pallas
interplay is the config-5 correctness unknown this pins down."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rten_tpu.models import decoder
from rten_tpu.parallel import make_mesh, shard_cache, shard_decoder_params
from rten_tpu.parallel.tp import tp_decode_step, tp_prefill

CFG = decoder.DecoderConfig(
    vocab_size=96,
    n_layers=2,
    n_heads=8,
    n_kv_heads=4,
    d_model=64,
    d_ff=128,
    max_seq=64,
    pos_encoding="rope",
    norm="rmsnorm",
    activation="swiglu",
    tie_embeddings=False,
    dtype=jnp.float32,
)

GPT2ISH = decoder.DecoderConfig(
    vocab_size=96,
    n_layers=2,
    n_heads=4,
    d_model=64,
    d_ff=256,
    max_seq=64,
    dtype=jnp.float32,
)


def _ref_run(params, cfg, prompt, n_steps):
    cache = decoder.init_cache(cfg, prompt.shape[0], 64)
    logits, cache = decoder.forward(params, cfg, prompt, cache, use_flash=False)
    outs = [logits]
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    for _ in range(n_steps):
        logits, cache = decoder.forward(params, cfg, tok, cache, use_flash=False)
        outs.append(logits)
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    return outs


def _tp_run(params, cfg, prompt, n_steps, mesh, **kw):
    params = shard_decoder_params(params, mesh)
    cache = shard_cache(decoder.init_cache(cfg, prompt.shape[0], 64), mesh)
    logits, cache = tp_prefill(params, cfg, prompt, cache, mesh=mesh, **kw)
    outs = [logits]
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    for _ in range(n_steps):
        logits, cache = tp_decode_step(params, cfg, tok, cache, mesh=mesh, **kw)
        outs.append(logits)
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    return outs


@pytest.mark.parametrize("mesh_shape", [(1, 4), (2, 2), (1, 2)])
def test_tp_dense_matches_single_chip(mesh_shape, rng):
    params = decoder.init_params(jax.random.PRNGKey(0), CFG)
    prompt = jnp.asarray(rng.integers(0, 96, (2, 6)).astype(np.int32))
    ref = _ref_run(params, CFG, prompt, 3)
    mesh = make_mesh(*mesh_shape)
    got = _tp_run(params, CFG, prompt, 3, mesh, use_flash=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)


def test_tp_learned_pos_gpt2_layout(rng):
    params = decoder.init_params(jax.random.PRNGKey(1), GPT2ISH)
    prompt = jnp.asarray(rng.integers(0, 96, (2, 5)).astype(np.int32))
    ref = _ref_run(params, GPT2ISH, prompt, 3)
    mesh = make_mesh(2, 2)
    got = _tp_run(params, GPT2ISH, prompt, 3, mesh, use_flash=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)


def test_tp_pallas_decode_kernel_under_mesh(rng):
    """The decode step runs the REAL Pallas decode-attention kernel
    (interpret mode) per shard under shard_map — sharded in-kernel cache
    append + local-GQA attention must match the single-chip XLA path."""
    cfg = dataclasses.replace(CFG, max_seq=64)
    params = decoder.init_params(jax.random.PRNGKey(2), cfg)
    prompt = jnp.asarray(rng.integers(0, 96, (2, 6)).astype(np.int32))
    ref = _ref_run(params, cfg, prompt, 3)
    mesh = make_mesh(2, 2)
    got = _tp_run(
        params, cfg, prompt, 3, mesh, use_flash=False, interpret_kernels=True
    )
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=3e-4)


def test_tp_overlapped_collectives_match(rng):
    """overlap=True routes row-parallel projections through the explicit
    ring (matmul_reducescatter + all-gather) — numerics identical."""
    params = decoder.init_params(jax.random.PRNGKey(3), CFG)
    prompt = jnp.asarray(rng.integers(0, 96, (2, 6)).astype(np.int32))
    mesh = make_mesh(1, 4)
    a = _tp_run(params, CFG, prompt, 3, mesh, use_flash=False)
    b = _tp_run(params, CFG, prompt, 3, mesh, use_flash=False, overlap=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=2e-4, atol=2e-4)


def test_tp_int8_matches_single_chip_int8(rng):
    """INT8 weight-only packs (unfused layout) through the TP path vs the
    single-chip int8 eager path."""
    params = decoder.init_params(jax.random.PRNGKey(4), CFG)
    qparams = decoder.quantize_params_int8(params, fuse=False)
    prompt = jnp.asarray(rng.integers(0, 96, (1, 6)).astype(np.int32))
    ref = _ref_run(qparams, CFG, prompt, 3)
    mesh = make_mesh(1, 4)
    got = _tp_run(qparams, CFG, prompt, 3, mesh, use_flash=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-3)


def test_sp_prefill_ring_attention_matches_forward(rng):
    """Sequence-parallel prefill (ring attention over the mesh axis) must
    reproduce the single-chip full-causal forward — this is the path that
    makes kernels/ring_attention.py a served configuration, not shelf-ware."""
    from rten_tpu.parallel.tp import sp_prefill

    mesh = make_mesh(1, 4)
    params = decoder.init_params(jax.random.PRNGKey(7), CFG)
    prompt = jnp.asarray(rng.integers(0, 96, (2, 16)).astype(np.int32))  # T=16 ÷ 4

    ref_logits, _ = decoder.forward(params, CFG, prompt, None, use_flash=False)
    logits, ks, vs = sp_prefill(params, CFG, prompt, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )
    # The returned K/V seed a decode cache: shapes [B, Hk, T, D].
    assert len(ks) == CFG.n_layers
    assert ks[0].shape == (2, CFG.kv_heads, 16, CFG.head_dim)


def test_sp_prefill_gpt2_layout(rng):
    from rten_tpu.parallel.tp import sp_prefill

    mesh = make_mesh(1, 2)
    params = decoder.init_params(jax.random.PRNGKey(8), GPT2ISH)
    prompt = jnp.asarray(rng.integers(0, 96, (1, 8)).astype(np.int32))
    ref_logits, _ = decoder.forward(params, GPT2ISH, prompt, None, use_flash=False)
    logits, _, _ = sp_prefill(params, GPT2ISH, prompt, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_pp_forward_matches_single_chip(rng):
    """GPipe-style pipeline parallelism: layers staged over a 'pipe' mesh
    axis, microbatched activations hopping via ppermute — logits must equal
    the single-chip forward."""
    from jax.sharding import Mesh
    from rten_tpu.parallel.pp import pp_forward, stack_layer_params

    cfg = dataclasses.replace(CFG, n_layers=4)
    params = decoder.init_params(jax.random.PRNGKey(9), cfg)
    stacked = stack_layer_params(params)
    prompt = jnp.asarray(rng.integers(0, 96, (4, 8)).astype(np.int32))

    ref, _ = decoder.forward(params, cfg, prompt, None, use_flash=False)

    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    for m in (1, 2, 4):
        got = pp_forward(stacked, cfg, prompt, mesh=mesh, n_microbatches=m)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_pp_forward_gpt2_layout(rng):
    from jax.sharding import Mesh
    from rten_tpu.parallel.pp import pp_forward, stack_layer_params

    cfg = dataclasses.replace(GPT2ISH, n_layers=2)
    params = decoder.init_params(jax.random.PRNGKey(10), cfg)
    stacked = stack_layer_params(params)
    prompt = jnp.asarray(rng.integers(0, 96, (2, 6)).astype(np.int32))
    ref, _ = decoder.forward(params, cfg, prompt, None, use_flash=False)
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    got = pp_forward(stacked, cfg, prompt, mesh=mesh, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_quantized_tiled_params_shard_on_mesh(rng):
    """ADVICE r4 (medium): tiled int8 packs ([S, K, bn]) must survive
    shard_decoder_params when the stripe count S is NOT divisible by the
    model axis — the spec falls back to bn-axis sharding (or replication)
    instead of raising, and the pjit forward still matches unsharded."""
    cfg = decoder.DecoderConfig(
        vocab_size=640,
        n_layers=1,
        n_heads=2,
        d_model=128,
        d_ff=256,
        max_seq=32,
        dtype=jnp.float32,
    )
    params = decoder.init_params(jax.random.PRNGKey(11), cfg)
    qp = decoder.quantize_params_int8(params, tile_bn=128)
    assert qp["lm_head_q"]["q"].shape == (5, 128, 128)  # S=5: odd stripe count

    prompt = jnp.asarray(rng.integers(0, 640, (2, 6)).astype(np.int32))
    ref, _ = decoder.forward(qp, cfg, prompt, None, use_flash=False)

    for mesh_shape in [(1, 2), (1, 4), (2, 2)]:
        mesh = make_mesh(*mesh_shape)  # 5 % model_axis != 0 for all of these
        sp = shard_decoder_params(qp, mesh)  # previously raised here
        got = jax.jit(
            lambda p, t: decoder.forward(p, cfg, t, None, use_flash=False)[0]
        )(sp, prompt)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


def test_lm_head_single_stripe_not_tiled():
    """ADVICE r4 (low): vocab ≤ tile_bn yields a single stripe — tiling is
    skipped (no zero-pad streaming, keeps the pack 2-D and shardable)."""
    cfg = decoder.DecoderConfig(
        vocab_size=640,
        n_layers=1,
        n_heads=2,
        d_model=128,
        d_ff=256,
        max_seq=32,
        dtype=jnp.float32,
    )
    params = decoder.init_params(jax.random.PRNGKey(12), cfg)
    qp = decoder.quantize_params_int8(params, tile_bn=1024)
    assert qp["lm_head_q"]["q"].ndim == 2


def test_tile_gemv_env_parse_defensive():
    """ADVICE r4 (low): RTEN_TILE_GEMV parses defensively."""
    import warnings

    from rten_tpu.models.decoder import _parse_tile_gemv

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert _parse_tile_gemv("1024") == 1024
        assert _parse_tile_gemv("0") is None
        assert _parse_tile_gemv("-3") is None
    with pytest.warns(UserWarning, match="not an integer"):
        assert _parse_tile_gemv("off") == 1024
    with pytest.warns(UserWarning, match="multiple of 128"):
        assert _parse_tile_gemv("300") == 256
    with pytest.warns(UserWarning, match="multiple of 128"):
        assert _parse_tile_gemv("64") == 128
