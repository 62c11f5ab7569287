"""Audio I/O (rten_tpu.audio ≙ the reference's hound-based .wav paths,
rten-examples/src/wav2vec2.rs:25-40) and the wav2vec2 model family's parity
against HuggingFace ``Wav2Vec2ForCTC`` (seeded-tiny-upstream-model strategy,
SURVEY.md §4)."""

import numpy as np
import pytest

from rten_tpu.audio import read_wav, resample, write_wav


def test_wav_roundtrip_mono(tmp_path):
    rng = np.random.default_rng(0)
    wav = np.clip(rng.standard_normal(1600).astype(np.float32) * 0.3, -1, 1)
    path = str(tmp_path / "m.wav")
    write_wav(path, wav, 16000)
    got, sr = read_wav(path)
    assert sr == 16000
    assert got.shape == (1600,)
    np.testing.assert_allclose(got, wav, atol=1.0 / 32767)


def test_wav_roundtrip_stereo_and_downmix(tmp_path):
    rng = np.random.default_rng(1)
    wav = np.clip(rng.standard_normal((2, 800)).astype(np.float32) * 0.3, -1, 1)
    path = str(tmp_path / "s.wav")
    write_wav(path, wav, 8000)
    got, sr = read_wav(path, mono=False)
    assert got.shape == (2, 800) and sr == 8000
    np.testing.assert_allclose(got, wav, atol=1.0 / 32767)
    mono, _ = read_wav(path)
    np.testing.assert_allclose(mono, wav.mean(0), atol=2.0 / 32767)


def test_wav_8bit_and_24bit(tmp_path):
    import wave

    t = np.arange(400) / 8000.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    p8 = str(tmp_path / "w8.wav")
    with wave.open(p8, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes((np.clip(wav, -1, 1) * 127 + 128).astype(np.uint8).tobytes())
    got, sr = read_wav(p8)
    assert sr == 8000
    np.testing.assert_allclose(got, wav, atol=1.5 / 127)

    p24 = str(tmp_path / "w24.wav")
    i32 = np.clip(np.round(wav * (1 << 23)), -(1 << 23), (1 << 23) - 1).astype(np.int64)
    b = np.zeros((len(wav), 3), np.uint8)
    u = np.where(i32 < 0, i32 + (1 << 24), i32)
    b[:, 0] = u & 0xFF
    b[:, 1] = (u >> 8) & 0xFF
    b[:, 2] = (u >> 16) & 0xFF
    with wave.open(p24, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(b.tobytes())
    got24, _ = read_wav(p24)
    np.testing.assert_allclose(got24, wav, atol=1e-4)


def test_resample():
    t = np.arange(1600) / 16000.0
    wav = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    down = resample(wav, 16000, 8000)
    assert down.shape == (800,)
    t8 = np.arange(800) / 8000.0
    # interior samples track the continuous signal
    np.testing.assert_allclose(down[10:-10], np.sin(2 * np.pi * 100 * t8)[10:-10], atol=5e-3)
    assert resample(wav, 16000, 16000) is wav


def test_wav2vec2_parity_hf():
    torch = pytest.importorskip("torch")
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2ForCTC

    import jax

    from rten_tpu.models import wav2vec2 as w2v

    hf_cfg = HFConfig(
        vocab_size=30,
        conv_dim=(16, 16),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        conv_bias=False,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    hf = Wav2Vec2ForCTC(hf_cfg).eval()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = w2v.infer_config(state, n_heads=2, conv_stride=(5, 2))
    assert (cfg.d_model, cfg.n_layers, cfg.d_ff, cfg.vocab_size) == (32, 2, 64, 30)
    assert cfg.conv_dim == (16, 16) and cfg.conv_kernel == (10, 3)
    assert cfg.num_conv_pos_embeddings == 16 and cfg.num_conv_pos_groups == 4

    params = w2v.from_hf_wav2vec2(state, cfg)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 800)).astype(np.float32) * 0.5

    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).logits.numpy()

    got = np.asarray(
        w2v.ctc_logits(params, cfg, __import__("jax.numpy", fromlist=["jnp"]).asarray(wav), use_flash=False)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)

    # flash path agrees with the reference attention path
    got_flash = np.asarray(w2v.ctc_logits(params, cfg, wav, use_flash=True))
    np.testing.assert_allclose(got_flash, got, rtol=1e-3, atol=1e-3)


def test_wav2vec2_frame_lengths():
    from rten_tpu.models import wav2vec2 as w2v

    cfg = w2v.Wav2Vec2Config(conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2))
    assert w2v.feat_extract_output_length(cfg, 800) == ((800 - 10) // 5 + 1 - 3) // 2 + 1
