"""trocr / distilvit / jina_similarity on REAL files (VERDICT r3 item 7
tail): trocr and distilvit run the reference's exported-graph-PAIR workflow
(rten-examples/src/trocr.rs, distilvit.rs: encoder model + decoder model
driven by the generate loop) through GraphBackend; jina takes a BERT-family
.npz + HF tokenizer.json (jina_similarity.rs loads an exported embedding
model)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rten_tpu import Graph
from rten_tpu.format import save_rten
from rten_tpu.image.io import write_image


def _save(graph, path):
    with open(path, "wb") as f:
        f.write(save_rten(graph))
    return str(path)


def _patch_encoder_graph(h, w, d):
    """[1, 3, h, w] image → Conv(3→d, 8x8/8) → [1, N, d] memory."""
    rng = np.random.default_rng(1)
    g = Graph()
    x = g.add_value("image", shape=[1, 3, h, w])
    wconv = g.add_constant(
        "wconv", (rng.standard_normal((d, 3, 8, 8)) * 0.2).astype(np.float32)
    )
    conv = g.add_simple_op("Conv", [x, wconv], attrs={"strides": [8, 8]})
    n = (h // 8) * (w // 8)
    sh = g.add_constant("sh", np.asarray([1, d, n], np.int32))
    r = g.add_simple_op("Reshape", [conv, sh])
    t = g.add_simple_op("Transpose", [r], attrs={"perm": [0, 2, 1]})
    g.inputs = [x]
    g.outputs = [t]
    return g, n


def test_trocr_example_encoder_decoder_rten(tmp_path, capsys):
    from test_graph_backend import build_encdec_decoder_graph

    h, w, d, v = 16, 64, 16, 32
    enc_g, n = _patch_encoder_graph(h, w, d)
    enc_path = _save(enc_g, tmp_path / "enc.rten")
    dec_path = _save(
        build_encdec_decoder_graph(np.random.default_rng(2), enc_n=n, d=d, v=v),
        tmp_path / "dec.rten",
    )
    img = tmp_path / "line.png"
    rng = np.random.default_rng(3)
    line = np.clip(0.9 - 0.8 * (rng.random((3, h, w)) < 0.2), 0, 1).astype(np.float32)
    write_image(str(img), line)

    from examples import trocr as app

    rc = app.main(
        ["--image", str(img), "--encoder", enc_path, "--decoder", dec_path, "-n", "6"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert f"memory (1, {n}, {d})" in out
    assert "decoder mode compiled" in out  # the graph pair runs COMPILED
    assert "recognized:" in out


def test_distilvit_example_encoder_decoder_rten(tmp_path, capsys):
    from test_graph_backend import build_encdec_decoder_graph

    size, d, v = 32, 16, 32
    enc_g, n = _patch_encoder_graph(size, size, d)
    enc_path = _save(enc_g, tmp_path / "enc.rten")
    dec_path = _save(
        build_encdec_decoder_graph(np.random.default_rng(2), enc_n=n, d=d, v=v),
        tmp_path / "dec.rten",
    )
    img = tmp_path / "photo.png"
    from examples import common

    write_image(str(img), common.synthetic_image(size, size, seed=5))

    from examples import distilvit as app

    rc = app.main(
        ["--image", str(img), "--encoder", enc_path, "--decoder", dec_path, "-n", "5"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "decoder mode compiled" in out
    assert "caption tokens:" in out


def _bert_tokenizer_json(words):
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
    for wd in words:
        vocab.setdefault(wd, len(vocab))
    return json.dumps(
        {
            "normalizer": {"type": "BertNormalizer", "lowercase": True},
            "pre_tokenizer": {"type": "BertPreTokenizer"},
            "model": {
                "type": "WordPiece",
                "vocab": vocab,
                "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
            },
            "added_tokens": [
                {"id": 0, "content": "[PAD]", "special": True},
                {"id": 1, "content": "[UNK]", "special": True},
            ],
        }
    ), vocab


def test_jina_example_real_npz(tmp_path, capsys):
    pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig, BertModel

    docs = ["the cat sleeps", "markets rallied on tuesday", "dogs chase balls"]
    words = sorted({w for t in ["sleeping cats", *docs] for w in t.lower().split()})
    tok_json, vocab = _bert_tokenizer_json(words)
    tok_path = tmp_path / "tokenizer.json"
    tok_path.write_text(tok_json)
    docs_path = tmp_path / "docs.txt"
    docs_path.write_text("\n".join(docs))

    hf = BertModel(
        HFConfig(
            vocab_size=len(vocab) + 4,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=128,
            max_position_embeddings=64,
        )
    ).eval()
    ckpt = tmp_path / "jina_tiny.npz"
    np.savez(ckpt, **{k: v.numpy() for k, v in hf.state_dict().items()})

    from examples import jina_similarity as app

    rc = app.main(
        [
            "--model", str(ckpt), "--tokenizer", str(tok_path),
            "--docs", str(docs_path), "--heads", "2",
            "--query", "sleeping cats",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "loaded" in out and "2 layers" in out
    assert out.count("sim=") == 3


def test_jina_model_without_tokenizer_errors(tmp_path):
    from examples import jina_similarity as app

    with pytest.raises(SystemExit, match="needs --tokenizer"):
        app.main(["--model", str(tmp_path / "x.npz")])
