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


def _write_raw_wav(path, fmt_tag, n_ch, sr, bits, payload: bytes,
                   extensible=False):
    """Hand-rolled RIFF writer (stdlib wave can't write float or extensible
    files, which is exactly why read_wav parses RIFF itself)."""
    import struct

    if extensible:
        # WAVE_FORMAT_EXTENSIBLE: cbSize=22, SubFormat GUID head = real tag
        sub = struct.pack("<H", fmt_tag) + b"\x00\x00" + bytes(
            [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
             0x00, 0x38, 0x9B, 0x71]
        )
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, n_ch, sr, sr * n_ch * bits // 8,
            n_ch * bits // 8, bits, 22, bits, 0x4,
        ) + sub
    else:
        fmt = struct.pack(
            "<HHIIHH", fmt_tag, n_ch, sr, sr * n_ch * bits // 8,
            n_ch * bits // 8, bits,
        )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) % 2:
        body += b"\x00"
    body += b"data" + struct.pack("<I", len(payload)) + payload
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_ieee_float32_and_float64(tmp_path):
    """Format tag 3 (IEEE float): stdlib wave raises wave.Error on these on
    every CPython version — read_wav must parse them anyway."""
    t = np.arange(400) / 8000.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    pf32 = str(tmp_path / "f32.wav")
    _write_raw_wav(pf32, 3, 1, 8000, 32, wav.astype("<f4").tobytes())
    got, sr = read_wav(pf32)
    assert sr == 8000
    np.testing.assert_allclose(got, wav, atol=0)

    pf64 = str(tmp_path / "f64.wav")
    _write_raw_wav(pf64, 3, 1, 8000, 64, wav.astype("<f8").tobytes())
    got64, _ = read_wav(pf64)
    np.testing.assert_allclose(got64, wav, atol=1e-7)


def test_wav_quiet_int32_pcm_not_misread_as_float(tmp_path):
    """Low-amplitude int32 PCM (|s| < 2^30) reinterprets to tiny finite
    floats — the old width-4 heuristic returned near-silence. The format
    tag disambiguates: int32 PCM decodes to the real waveform."""
    t = np.arange(400) / 8000.0
    wav = (0.01 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)  # quiet
    i32 = np.round(wav * (1 << 31)).astype("<i4")

    p = str(tmp_path / "i32.wav")
    _write_raw_wav(p, 1, 1, 8000, 32, i32.tobytes())
    got, _ = read_wav(p)
    np.testing.assert_allclose(got, wav, atol=1e-6)
    assert np.abs(got).max() > 0.009  # NOT near-silent garbage


def test_wav_extensible_wrapper(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE) wrapping float32: the real tag
    lives in the SubFormat GUID."""
    t = np.arange(200) / 8000.0
    wav = (0.25 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    p = str(tmp_path / "ext.wav")
    _write_raw_wav(p, 3, 1, 8000, 32, wav.astype("<f4").tobytes(),
                   extensible=True)
    got, sr = read_wav(p)
    assert sr == 8000
    np.testing.assert_allclose(got, wav, atol=0)


def test_wav_non_riff_rejected(tmp_path):
    p = str(tmp_path / "bogus.wav")
    with open(p, "wb") as f:
        f.write(b"NOT A WAV FILE AT ALL, JUST BYTES")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF"):
        read_wav(p)
