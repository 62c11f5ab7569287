"""Speech examples on REAL files (VERDICT r3 item 6): wav2vec2 takes a .wav
plus an HF checkpoint .npz; silero and piper take a .wav / emit a .wav and
run exported .rten models through Model.run — exactly the reference's shape
(rten-examples/src/wav2vec2.rs:25-40 hound-read CLI arg, silero.rs/piper.rs
exported-model loads)."""

import numpy as np
import pytest

from rten_tpu.audio import read_wav, write_wav


def _speech_wav(path, seconds=0.6, sr=16000, seed=0):
    import sys

    sys.path.insert(0, "/root/repo")
    from examples import common

    wav, _ = common.synthetic_audio(seconds, sr=sr, seed=seed)
    write_wav(str(path), wav, sr)
    return str(path)


def test_wav2vec2_example_real_wav_and_npz(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2ForCTC

    torch.manual_seed(0)
    hf = Wav2Vec2ForCTC(
        HFConfig(
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
        )
    ).eval()
    ckpt = tmp_path / "w2v_tiny.npz"
    np.savez(ckpt, **{k: v.numpy() for k, v in hf.state_dict().items()})
    wav_path = _speech_wav(tmp_path / "in.wav", sr=8000)  # exercises resample

    from examples import wav2vec2 as app

    rc = app.main(
        ["--audio", wav_path, "--model", str(ckpt), "--heads", "2", "--beam", "4"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "resampled 8000 Hz -> 16000 Hz" in out
    assert "loaded wav2vec2: 2 layers" in out
    assert "beam" in out and "greedy" in out


def _build_vad_rten(path, d_in=9, d_h=16, seed=0):
    """Tiny GRU→MatMul→Sigmoid VAD graph saved as .rten."""
    from rten_tpu import Graph
    from rten_tpu.format import save_rten

    rng = np.random.default_rng(seed)
    g = Graph()
    x = g.add_value("feats", shape=["T", 1, d_in])
    w = g.add_constant("w", (rng.standard_normal((1, 3 * d_h, d_in)) * 0.5).astype(np.float32))
    r = g.add_constant("r", (rng.standard_normal((1, 3 * d_h, d_h)) * 0.5).astype(np.float32))
    b = g.add_constant("b", np.zeros((1, 6 * d_h), np.float32))
    gru = g.add_simple_op(
        "GRU", [x, w, r, b],
        attrs={"direction": "forward", "hidden_size": d_h},
        n_outputs=2,
    )
    shape_th = g.add_constant("sh", np.asarray([-1, d_h], np.int32))
    flat = g.add_simple_op("Reshape", [gru, shape_th])
    w_cls = g.add_constant("w_cls", (rng.standard_normal((d_h, 1)) * 0.8).astype(np.float32))
    logit = g.add_simple_op("MatMul", [flat, w_cls])
    prob = g.add_simple_op("Sigmoid", [logit])
    g.inputs = [x]
    g.outputs = [prob]
    with open(path, "wb") as f:
        f.write(save_rten(g))
    return str(path)


def test_silero_example_real_wav_and_rten(tmp_path, capsys):
    wav_path = _speech_wav(tmp_path / "rec.wav", seconds=1.0)
    model_path = _build_vad_rten(tmp_path / "vad.rten")

    from examples import silero as app

    rc = app.main(["--audio", wav_path, "--model", model_path, "--on", "0.5", "--off", "0.4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "through Model.run" in out
    assert "speech segment(s):" in out


def test_silero_feature_dim_mismatch_errors(tmp_path):
    wav_path = _speech_wav(tmp_path / "rec.wav", seconds=0.5)
    model_path = _build_vad_rten(tmp_path / "vad.rten", d_in=13)

    from examples import silero as app

    with pytest.raises(SystemExit, match="feature dim 13"):
        app.main(["--audio", wav_path, "--model", model_path])


def _build_tts_rten(path, vocab=27, feat=160, seed=0):
    """Tiny Gather→Reshape→Tanh TTS graph: [1, N] ids → waveform."""
    from rten_tpu import Graph
    from rten_tpu.format import save_rten

    rng = np.random.default_rng(seed)
    g = Graph()
    ids = g.add_value("ids", shape=[1, "N"], dtype="int32")
    emb = g.add_constant(
        "emb", (rng.standard_normal((vocab, feat)) * 0.7).astype(np.float32)
    )
    gathered = g.add_simple_op("Gather", [emb, ids], attrs={"axis": 0})
    sh = g.add_constant("sh", np.asarray([-1], np.int32))
    flat = g.add_simple_op("Reshape", [gathered, sh])
    wavn = g.add_simple_op("Tanh", [flat])
    g.inputs = [ids]
    g.outputs = [wavn]
    with open(path, "wb") as f:
        f.write(save_rten(g))
    return str(path)


def test_piper_example_rten_writes_wav(tmp_path, capsys):
    model_path = _build_tts_rten(tmp_path / "tts.rten")
    out_path = tmp_path / "out.wav"

    from examples import piper as app

    rc = app.main(["--model", model_path, "--text", "hello", "--out", str(out_path)])
    assert rc == 0
    assert "through Model.run" in capsys.readouterr().out
    wav, sr = read_wav(str(out_path))
    assert sr == 16000
    assert wav.shape[0] == 5 * 160  # 5 phonemes x 160 samples
    assert np.abs(wav).max() <= 1.0
