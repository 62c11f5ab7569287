"""BERT-class and ViT-class encoder model families.

Parity strategy mirrors the reference's PyTorch reference fixtures
(pytorch-ref-tests/rnn.py, SURVEY.md §4): instantiate a tiny upstream
HuggingFace model with fixed seeds, import its weights, compare outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rten_tpu.models import bert, vit


def test_bert_shapes_and_padding_invariance(rng):
    cfg = bert.BertConfig(
        vocab_size=100, n_layers=2, n_heads=4, d_model=64, d_ff=128, max_seq=32
    )
    params = bert.init_params(jax.random.PRNGKey(0), cfg)
    ids = rng.integers(0, 100, (2, 10)).astype(np.int32)
    lengths = np.array([10, 7], np.int32)

    h = bert.encode(params, cfg, jnp.asarray(ids), lengths=jnp.asarray(lengths), use_flash=False)
    assert h.shape == (2, 10, 64)

    # Extending the padded region must not change valid-token outputs.
    ids_padded = np.concatenate([ids, rng.integers(0, 100, (2, 6)).astype(np.int32)], 1)
    h2 = bert.encode(
        params, cfg, jnp.asarray(ids_padded), lengths=jnp.asarray(lengths), use_flash=False
    )
    np.testing.assert_allclose(
        np.asarray(h2[0, :10]), np.asarray(h[0, :10]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h2[1, :7]), np.asarray(h[1, :7]), rtol=1e-5, atol=1e-5
    )


def test_bert_pool_and_qa_head(rng):
    cfg = bert.BertConfig(
        vocab_size=50, n_layers=1, n_heads=2, d_model=32, d_ff=64, max_seq=16
    )
    params = bert.init_params(jax.random.PRNGKey(1), cfg)
    ids = rng.integers(0, 50, (3, 12)).astype(np.int32)
    lengths = jnp.asarray([12, 5, 1], jnp.int32)
    h = bert.encode(params, cfg, jnp.asarray(ids), lengths=lengths, use_flash=False)

    emb = bert.pool(h, lengths, mode="mean")
    assert emb.shape == (3, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb, np.float32), axis=-1), 1.0, rtol=1e-4
    )
    cls = bert.pool(h, lengths, mode="cls")
    assert cls.shape == (3, 32)

    qa_head = {
        "w": jnp.asarray(rng.standard_normal((32, 2)).astype(np.float32)),
        "b": jnp.zeros((2,), jnp.float32),
    }
    start, end = bert.qa_logits(h, qa_head, lengths)
    assert start.shape == (3, 12)
    # Padding positions must never win an argmax.
    assert np.asarray(start)[1, 5:].max() < -1e29
    assert np.asarray(end)[2, 1:].max() < -1e29


def test_bert_matches_huggingface():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig, BertModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=120,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=32,
        type_vocab_size=2,
        hidden_act="gelu",
        layer_norm_eps=1e-12,
        attn_implementation="eager",
    )
    hf = BertModel(hf_cfg).eval()

    cfg = bert.BertConfig(
        vocab_size=120, n_layers=2, n_heads=4, d_model=64, d_ff=128, max_seq=32
    )
    params = bert.from_hf_bert(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 120, (2, 9)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(
        bert.encode(params, cfg, jnp.asarray(ids, jnp.int32), use_flash=False),
        np.float32,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_bert_int8_close_to_fp(rng):
    cfg = bert.BertConfig(
        vocab_size=64, n_layers=2, n_heads=2, d_model=128, d_ff=512, max_seq=16
    )
    params = bert.init_params(jax.random.PRNGKey(2), cfg)
    qparams = bert.quantize_params_int8(params)
    ids = jnp.asarray(rng.integers(0, 64, (1, 8)).astype(np.int32))
    h_fp = np.asarray(bert.encode(params, cfg, ids, use_flash=False), np.float32)
    h_q = np.asarray(bert.encode(qparams, cfg, ids, use_flash=False), np.float32)
    rel = np.abs(h_q - h_fp).max() / (np.abs(h_fp).max() + 1e-9)
    assert rel < 0.05, rel


def test_vit_classify_and_feature_map(rng):
    cfg = vit.ViTConfig(
        image_size=32,
        patch_size=8,
        n_layers=2,
        n_heads=2,
        d_model=64,
        d_ff=128,
        n_classes=10,
    )
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    logits = vit.classify(params, cfg, imgs)
    assert logits.shape == (2, 10)

    h = vit.encode(params, cfg, imgs, use_flash=False)
    assert h.shape == (2, 1 + 16, 64)
    fm = vit.feature_map(h, cfg)
    assert fm.shape == (2, 64, 4, 4)


def test_vit_patchify_round_trip(rng):
    imgs = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    patches = np.asarray(vit.patchify(jnp.asarray(imgs), 4))
    assert patches.shape == (1, 4, 48)
    # First patch = top-left 4x4 block of each channel, channel-major.
    expect = imgs[0, :, :4, :4].reshape(-1)
    np.testing.assert_allclose(patches[0, 0], expect)


def test_mobilenet_forward_and_int8(rng):
    from rten_tpu.models import mobilenet

    cfg = mobilenet.MOBILENET_TINY
    params = mobilenet.init_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    logits = mobilenet.forward(params, cfg, imgs)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()

    qparams = mobilenet.quantize_params_int8(params)
    logits_q = mobilenet.forward(qparams, cfg, imgs)
    rel = np.abs(np.asarray(logits_q) - np.asarray(logits)).max() / (
        np.abs(np.asarray(logits)).max() + 1e-9
    )
    assert rel < 0.1, rel

    # jitted entry compiles and matches eager
    logits_j = mobilenet.predict(params, cfg, imgs)
    np.testing.assert_allclose(
        np.asarray(logits_j), np.asarray(logits), rtol=1e-4, atol=1e-4
    )
