"""Real-weight example paths (VERDICT r2 item 4/7): the examples accept a
checkpoint file and run the exact demo pipeline on it, routed through the
existing importers (models/decoder.from_hf_gpt2, models/bert.from_hf_bert,
models/resnet.load_torchvision_state_dict). Fixtures are tiny seeded
upstream-format checkpoints written to tmp_path as .npz — the same
"seeded tiny upstream model" strategy the parity tests use (SURVEY.md §4,
reference pytorch-ref-tests/rnn.py)."""

import numpy as np
import pytest


def _bn_state(c, rng):
    return {
        "weight": rng.uniform(0.5, 1.5, c).astype(np.float32),
        "bias": rng.standard_normal(c).astype(np.float32) * 0.1,
        "running_mean": rng.standard_normal(c).astype(np.float32) * 0.1,
        "running_var": rng.uniform(0.5, 1.5, c).astype(np.float32),
    }


def test_gpt2_example_real_npz(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    hf = GPT2LMHeadModel(
        GPT2Config(
            vocab_size=257,
            n_positions=64,
            n_embd=128,
            n_layer=2,
            n_head=2,
            n_inner=256,
        )
    ).eval()
    path = tmp_path / "gpt2_tiny.npz"
    np.savez(path, **{k: v.numpy() for k, v in hf.state_dict().items()})

    from examples import gpt2

    rc = gpt2.main(["--model", str(path), "--heads", "2", "-n", "4", "--prompt", "hi"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "loaded" in out and "generated:" in out

    # And the inferred config matches the checkpoint.
    from examples.common import load_state_npz
    from rten_tpu.models import decoder

    cfg = gpt2.infer_gpt2_config(load_state_npz(str(path)), decoder, 2)
    assert (cfg.n_layers, cfg.d_model, cfg.vocab_size, cfg.d_ff) == (2, 128, 257, 256)


def test_gpt2_example_real_npz_int8(tmp_path, capsys):
    pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    hf = GPT2LMHeadModel(
        GPT2Config(
            vocab_size=257, n_positions=64, n_embd=128, n_layer=1, n_head=2, n_inner=256
        )
    ).eval()
    path = tmp_path / "gpt2_tiny.npz"
    np.savez(path, **{k: v.numpy() for k, v in hf.state_dict().items()})

    from examples import gpt2

    rc = gpt2.main(["--model", str(path), "--heads", "2", "-n", "3", "--int8"])
    assert rc == 0
    assert "generated:" in capsys.readouterr().out


def test_imagenet_example_real_npz(tmp_path, capsys):
    """Full resnet18-shaped random state dict (stem + 4 stages x 2 basic
    blocks + downsample projections + fc) through the BN-folding importer."""
    rng = np.random.default_rng(0)
    state = {
        "conv1.weight": rng.standard_normal((64, 3, 7, 7)).astype(np.float32) * 0.05,
        **{f"bn1.{k}": v for k, v in _bn_state(64, rng).items()},
        "fc.weight": rng.standard_normal((1000, 512)).astype(np.float32) * 0.02,
        "fc.bias": np.zeros(1000, np.float32),
    }
    widths = [64, 128, 256, 512]
    c_prev = 64
    for si, w in enumerate(widths):
        for bi in range(2):
            p = f"layer{si + 1}.{bi}"
            c_in = c_prev if bi == 0 else w
            state[f"{p}.conv1.weight"] = (
                rng.standard_normal((w, c_in, 3, 3)).astype(np.float32) * 0.05
            )
            state[f"{p}.conv2.weight"] = (
                rng.standard_normal((w, w, 3, 3)).astype(np.float32) * 0.05
            )
            for bn in ("bn1", "bn2"):
                for k, v in _bn_state(w, rng).items():
                    state[f"{p}.{bn}.{k}"] = v
            if bi == 0 and (si > 0 or c_in != w):
                state[f"{p}.downsample.0.weight"] = (
                    rng.standard_normal((w, c_in, 1, 1)).astype(np.float32) * 0.05
                )
                for k, v in _bn_state(w, rng).items():
                    state[f"{p}.downsample.1.{k}"] = v
        c_prev = w
    path = tmp_path / "resnet18_tiny.npz"
    np.savez(path, **state)

    from examples import imagenet

    rc = imagenet.main(["--model", str(path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "basic blocks, 1000 classes" in out and "top-1:" in out


def test_bert_qa_example_real_npz(tmp_path, capsys):
    pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig, BertModel

    hf = BertModel(
        HFConfig(
            vocab_size=200,
            hidden_size=128,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=256,
            max_position_embeddings=64,
        )
    ).eval()
    rng = np.random.default_rng(1)
    state = {f"bert.{k}": v.numpy() for k, v in hf.state_dict().items()}
    # BertForQuestionAnswering span head.
    state["qa_outputs.weight"] = rng.standard_normal((2, 128)).astype(np.float32) * 0.1
    state["qa_outputs.bias"] = np.zeros(2, np.float32)
    path = tmp_path / "bert_tiny.npz"
    np.savez(path, **state)

    from examples import bert_qa

    rc = bert_qa.main(["--model", str(path), "--heads", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "loaded" in out and "A: " in out


def test_qwen2_chat_example_real_npz(tmp_path, capsys):
    """Llama/Qwen2-family real-weight path: .npz state dict (with Qwen2
    attention biases) through examples/qwen2_chat.py --model."""
    rng = np.random.default_rng(3)
    D, FF, V, L, KV = 64, 128, 96, 2, 32  # kv_dim 32 → 2 kv heads at hd=16
    state = {"embed_tokens.weight": rng.standard_normal((V, D)).astype(np.float32) * 0.05,
             "norm.weight": np.ones(D, np.float32),
             "lm_head.weight": rng.standard_normal((V, D)).astype(np.float32) * 0.05}
    for i in range(L):
        p = f"layers.{i}."
        state[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        state[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        state[p + "self_attn.q_proj.weight"] = rng.standard_normal((D, D)).astype(np.float32) * 0.05
        state[p + "self_attn.q_proj.bias"] = rng.standard_normal(D).astype(np.float32) * 0.02
        state[p + "self_attn.k_proj.weight"] = rng.standard_normal((KV, D)).astype(np.float32) * 0.05
        state[p + "self_attn.k_proj.bias"] = rng.standard_normal(KV).astype(np.float32) * 0.02
        state[p + "self_attn.v_proj.weight"] = rng.standard_normal((KV, D)).astype(np.float32) * 0.05
        state[p + "self_attn.v_proj.bias"] = rng.standard_normal(KV).astype(np.float32) * 0.02
        state[p + "self_attn.o_proj.weight"] = rng.standard_normal((D, D)).astype(np.float32) * 0.05
        state[p + "mlp.gate_proj.weight"] = rng.standard_normal((FF, D)).astype(np.float32) * 0.05
        state[p + "mlp.up_proj.weight"] = rng.standard_normal((FF, D)).astype(np.float32) * 0.05
        state[p + "mlp.down_proj.weight"] = rng.standard_normal((D, FF)).astype(np.float32) * 0.05
    path = tmp_path / "qwen2_tiny.npz"
    np.savez(path, **state)

    from examples import qwen2_chat
    from rten_tpu.models import decoder

    cfg = qwen2_chat.infer_llama_config(
        __import__("examples.common", fromlist=["common"]).load_state_npz(str(path)),
        decoder,
        n_heads=4,
    )
    assert (cfg.n_layers, cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.d_ff) == (
        2, 64, 4, 2, 128,
    )
    rc = qwen2_chat.main(
        ["--model", str(path), "--heads", "4", "-n", "3", "--turns", "1"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "loaded" in out and "assistant" in out
