"""Whisper-class encoder-decoder tests (BASELINE config 4): cache
consistency, cross-attention KV reuse, INT8 KV fidelity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rten_tpu.models import encoder_decoder as ed

TINY = ed.EncDecConfig(
    n_mels=8,
    vocab_size=64,
    d_model=32,
    n_heads=2,
    n_audio_layers=2,
    n_text_layers=2,
    d_ff=64,
    max_text_ctx=32,
    dtype=np.float32,
)


@pytest.fixture(scope="module")
def setup():
    params = ed.init_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 8, 40)).astype(np.float32)
    enc = ed.encode(params, TINY, mel)
    return params, mel, enc


def test_encoder_shape(setup):
    params, mel, enc = setup
    # conv2 stride 2: T 40 → 20
    assert np.asarray(enc).shape == (1, 20, 32)
    assert np.isfinite(np.asarray(enc)).all()


def test_decode_incremental_matches_batch(setup):
    """Feeding tokens one-by-one through the self-KV cache must equal feeding
    them all at once."""
    params, mel, enc = setup
    tokens = np.array([[5, 9, 2, 7]], np.int32)

    state_a = ed.init_decoder_state(params, TINY, enc)
    logits_all, _ = ed.decode(params, TINY, tokens, state_a, use_flash=False)

    state_b = ed.init_decoder_state(params, TINY, enc)
    outs = []
    for i in range(4):
        step_logits, state_b = ed.decode(
            params, TINY, tokens[:, i : i + 1], state_b, use_flash=False
        )
        outs.append(np.asarray(step_logits[:, 0]))
    np.testing.assert_allclose(
        np.stack(outs, axis=1), np.asarray(logits_all), rtol=2e-3, atol=2e-4
    )


def test_cross_attention_depends_on_audio(setup):
    params, mel, enc = setup
    rng = np.random.default_rng(7)
    mel2 = rng.standard_normal(mel.shape).astype(np.float32)
    enc2 = ed.encode(params, TINY, mel2)
    tokens = np.array([[1, 2]], np.int32)
    s1 = ed.init_decoder_state(params, TINY, enc)
    s2 = ed.init_decoder_state(params, TINY, enc2)
    l1, _ = ed.decode(params, TINY, tokens, s1, use_flash=False)
    l2, _ = ed.decode(params, TINY, tokens, s2, use_flash=False)
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_int8_kv_close_to_fp(setup):
    params, mel, enc = setup
    cfg_q = dataclasses.replace(TINY, int8_kv=True)
    tokens = np.array([[5, 9, 2, 7, 1, 3]], np.int32)

    s_fp = ed.init_decoder_state(params, TINY, enc)
    l_fp, _ = ed.decode(params, TINY, tokens, s_fp, use_flash=False)

    s_q = ed.init_decoder_state(params, cfg_q, enc)
    assert s_q["self_k"][0].dtype == np.int8
    l_q, s_q = ed.decode(params, cfg_q, tokens, s_q, use_flash=False)

    # INT8 KV fidelity: logits close, argmax identical
    np.testing.assert_allclose(np.asarray(l_q), np.asarray(l_fp), rtol=0.05, atol=0.05)
    np.testing.assert_array_equal(
        np.asarray(l_q).argmax(-1), np.asarray(l_fp).argmax(-1)
    )


def test_int8_kv_incremental_consistency(setup):
    params, mel, enc = setup
    cfg_q = dataclasses.replace(TINY, int8_kv=True)
    tokens = np.array([[5, 9, 2]], np.int32)
    s_all = ed.init_decoder_state(params, cfg_q, enc)
    l_all, _ = ed.decode(params, cfg_q, tokens, s_all, use_flash=False)
    s_inc = ed.init_decoder_state(params, cfg_q, enc)
    outs = []
    for i in range(3):
        l, s_inc = ed.decode(params, cfg_q, tokens[:, i : i + 1], s_inc, use_flash=False)
        outs.append(np.asarray(l[:, 0]))
    np.testing.assert_allclose(
        np.stack(outs, 1), np.asarray(l_all), rtol=2e-3, atol=2e-3
    )


def test_quantize_dequantize_kv_round_trip(rng):
    x = np.asarray(rng.standard_normal((1, 2, 4, 8)), np.float32)
    q, s = ed.quantize_kv(x)
    assert np.asarray(q).dtype == np.int8
    back = np.asarray(ed.dequantize_kv(q, s, np.float32))
    np.testing.assert_allclose(back, x, atol=np.abs(x).max() / 127 + 1e-6)


def test_generation_loop_with_generator(setup):
    """Full transcription-style loop through the Generator API."""
    from rten_tpu.generate import Generator, GeneratorConfig

    params, mel, enc = setup

    class EncDecBackend:
        def __init__(self):
            self.state = ed.init_decoder_state(params, TINY, enc)

        def prefill(self, tokens):
            logits, self.state = ed.decode(params, TINY, tokens, self.state, use_flash=False)
            return logits[:, -1, :]

        decode = prefill

    gen = Generator(EncDecBackend(), GeneratorConfig(max_tokens=5)).with_prompt([1])
    toks = [int(t[0]) for t in gen]
    assert len(toks) == 5


def test_matches_huggingface_whisper():
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig, WhisperModel

    torch.manual_seed(0)
    hf_cfg = WhisperConfig(
        vocab_size=96, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=16,
        max_source_positions=32, max_target_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, dropout=0.0, attn_implementation="eager",
    )
    hf = WhisperModel(hf_cfg).eval()

    cfg = ed.EncDecConfig(
        n_mels=16, n_audio_ctx=32, vocab_size=96, d_model=64, n_heads=4,
        n_audio_layers=2, n_text_layers=2, d_ff=128, max_text_ctx=32,
        dtype=jnp.float32,
    )
    params = ed.from_hf_whisper(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 16, 64)).astype(np.float32)  # 2x source positions
    dec_ids = rng.integers(0, 96, (1, 5)).astype(np.int64)

    with torch.no_grad():
        out = hf(
            input_features=torch.tensor(mel),
            decoder_input_ids=torch.tensor(dec_ids),
        )
        enc_ref = out.encoder_last_hidden_state.numpy()
        dec_ref = out.last_hidden_state.numpy()

    enc = ed.encode(params, cfg, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(enc), enc_ref, rtol=2e-3, atol=3e-4)

    state = ed.init_decoder_state(params, cfg, enc)
    logits, _ = ed.decode(params, cfg, jnp.asarray(dec_ids, jnp.int32), state, use_flash=False)
    # our decode returns logits = hidden @ tok_emb.T; compare hidden via HF's
    # last_hidden_state @ tok_emb.T for a like-for-like check
    ref_logits = dec_ref @ np.asarray(params["tok_emb"], np.float32).T
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=2e-3, atol=3e-4)


def test_int8_weights_close_to_fp():
    """Config 4's INT8-weight path: quantized encoder-decoder stays close to
    the fp forward on CPU (fused kernel path exercised on TPU)."""
    cfg = ed.EncDecConfig(
        n_mels=16, n_audio_ctx=32, vocab_size=64, d_model=256, n_heads=2,
        n_audio_layers=1, n_text_layers=1, d_ff=512, max_text_ctx=32,
        dtype=jnp.float32,
    )
    params = ed.init_params(jax.random.PRNGKey(0), cfg)
    qparams = ed.quantize_params_int8(params)
    # Decoder self-attention q|k|v are fused into one int8 matrix.
    a0 = qparams["dec_layers"][0]["self_attn"]
    assert isinstance(a0["wqkv"], dict) and "wq" not in a0

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 16, 64)).astype(np.float32))
    enc_fp = ed.encode(params, cfg, mel)
    enc_q = ed.encode(qparams, cfg, mel)
    rel = np.abs(np.asarray(enc_q) - np.asarray(enc_fp)).max() / (
        np.abs(np.asarray(enc_fp)).max() + 1e-9
    )
    assert rel < 0.05, rel

    ids = jnp.asarray(rng.integers(0, 64, (1, 4)).astype(np.int32))
    st_fp = ed.init_decoder_state(params, cfg, enc_fp)
    lg_fp, _ = ed.decode(params, cfg, ids, st_fp, use_flash=False)
    st_q = ed.init_decoder_state(qparams, cfg, enc_q)
    lg_q, _ = ed.decode(qparams, cfg, ids, st_q, use_flash=False)
    rel2 = np.abs(np.asarray(lg_q) - np.asarray(lg_fp)).max() / (
        np.abs(np.asarray(lg_fp)).max() + 1e-9
    )
    assert rel2 < 0.08, rel2


def test_encdec_generator_backend():
    """Whisper-style transcription through the Generator pipeline."""
    import itertools

    from rten_tpu.generate import EncDecBackend, Generator, GeneratorConfig

    cfg = ed.EncDecConfig(
        n_mels=16, n_audio_ctx=32, vocab_size=64, d_model=64, n_heads=2,
        n_audio_layers=1, n_text_layers=1, d_ff=128, max_text_ctx=32,
        dtype=jnp.float32,
    )
    params = ed.init_params(jax.random.PRNGKey(0), cfg)
    mel = np.random.default_rng(0).standard_normal((1, 16, 64)).astype(np.float32)

    backend = EncDecBackend(params, cfg, mel)
    gen = Generator(backend, GeneratorConfig(max_tokens=6)).with_prompt([1])
    toks = [int(t[0]) for t in itertools.islice(gen, 6)]
    assert len(toks) == 6

    # deterministic: same prompt after reset produces the same tokens
    backend.reset()
    gen2 = Generator(backend, GeneratorConfig(max_tokens=6)).with_prompt([1])
    toks2 = [int(t[0]) for t in itertools.islice(gen2, 6)]
    assert toks == toks2


def test_fused_decode_matches_eager():
    """fused=True routes the t==1 int8 decode through the fused
    GEMV/whole-MLP Pallas kernels (interpret mode on CPU); logits must match
    the eager int8 path step by step."""
    cfg = ed.EncDecConfig(
        n_mels=16, n_audio_ctx=32, vocab_size=64, d_model=256, n_heads=2,
        n_audio_layers=1, n_text_layers=2, d_ff=512, max_text_ctx=32,
        dtype=jnp.float32,
    )
    params = ed.init_params(jax.random.PRNGKey(1), cfg)
    qparams = ed.quantize_params_int8(params)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, 16, 64)).astype(np.float32))
    enc = ed.encode(qparams, cfg, mel)
    ids = rng.integers(0, 64, (1, 4)).astype(np.int32)

    def run(fuse):
        st = ed.init_decoder_state(qparams, cfg, enc)
        outs = []
        for i in range(ids.shape[1]):
            lg, st = ed.decode(
                qparams, cfg, jnp.asarray(ids[:, i : i + 1]), st,
                use_flash=False, fused=fuse,
            )
            outs.append(np.asarray(lg))
        return np.concatenate(outs, axis=1)

    eager = run(False)
    fused = run(True)
    rel = np.abs(fused - eager).max() / (np.abs(eager).max() + 1e-9)
    assert rel < 2e-2, rel


def test_fused_decode_int8_kv():
    """Fused projections compose with the int8-KV decode attention kernel."""
    cfg = ed.EncDecConfig(
        n_mels=16, n_audio_ctx=32, vocab_size=64, d_model=256, n_heads=2,
        n_audio_layers=1, n_text_layers=1, d_ff=512, max_text_ctx=64,
        dtype=jnp.float32, int8_kv=True,
    )
    params = ed.init_params(jax.random.PRNGKey(2), cfg)
    qparams = ed.quantize_params_int8(params)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, 16, 64)).astype(np.float32))
    enc = ed.encode(qparams, cfg, mel)
    ids = rng.integers(0, 64, (1, 3)).astype(np.int32)

    def run(fuse, use_flash):
        st = ed.init_decoder_state(qparams, cfg, enc)
        outs = []
        for i in range(ids.shape[1]):
            lg, st = ed.decode(
                qparams, cfg, jnp.asarray(ids[:, i : i + 1]), st,
                use_flash=use_flash, fused=fuse,
            )
            outs.append(np.asarray(lg))
        return np.concatenate(outs, axis=1)

    eager = run(False, False)
    # use_flash=True engages the int8_fast decode-attention kernel
    # (interpret mode on CPU) alongside the fused projections.
    fused = run(True, True)
    rel = np.abs(fused - eager).max() / (np.abs(eager).max() + 1e-9)
    assert rel < 3e-2, rel


def test_encdec_tiled_gemv_parity():
    """tile_bn re-lays lm_head_q / fused wqkv as contiguous [S, K, bn]
    stripes; fused and eager decode must match the row-major layout
    bit-for-bit (same stripe math, linear storage)."""
    cfg = ed.EncDecConfig(
        n_mels=16, n_audio_ctx=32, vocab_size=512, d_model=256, n_heads=2,
        n_audio_layers=1, n_text_layers=2, d_ff=512, max_text_ctx=32,
        dtype=jnp.float32,
    )
    params = ed.init_params(jax.random.PRNGKey(0), cfg)
    q0 = ed.quantize_params_int8(params, tile_bn=None)
    qt = ed.quantize_params_int8(params, tile_bn=128)
    assert qt["lm_head_q"]["q"].ndim == 3
    assert qt["dec_layers"][0]["self_attn"]["wqkv"]["q"].ndim == 3
    # small MLP rides the whole-matrix kernel: stays 2-D
    assert qt["dec_layers"][0]["mlp"]["w_up"]["q"].ndim == 2

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 16, 64)).astype(np.float32))
    enc0 = ed.encode(q0, cfg, mel)
    enct = ed.encode(qt, cfg, mel)
    np.testing.assert_allclose(
        np.asarray(enct), np.asarray(enc0), rtol=1e-5, atol=1e-5
    )

    ids = rng.integers(0, 512, (1, 4)).astype(np.int32)
    for fuse in (False, True):
        st0 = ed.init_decoder_state(q0, cfg, enc0)
        stt = ed.init_decoder_state(qt, cfg, enct)
        for i in range(ids.shape[1]):
            tok = jnp.asarray(ids[:, i : i + 1])
            lg0, st0 = ed.decode(q0, cfg, tok, st0, use_flash=False, fused=fuse)
            lgt, stt = ed.decode(qt, cfg, tok, stt, use_flash=False, fused=fuse)
            np.testing.assert_allclose(
                np.asarray(lgt), np.asarray(lg0), rtol=1e-5, atol=1e-5,
            ), (fuse, i)
