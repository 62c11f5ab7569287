"""Native decoder + generation loop tests (reference behavior:
rten-generate/src/generator.rs tests; cache-consistency is our equivalent of
the reference's KV-cache ownership tests)."""

import itertools

import jax.numpy as jnp

import jax
import numpy as np
import pytest

from rten_tpu.generate import (
    ArgMaxSampler,
    Generator,
    GeneratorConfig,
    Metrics,
    TopKSampler,
    TopPSampler,
)
from rten_tpu.generate.generator import NativeBackend
from rten_tpu.models import decoder

TINY_GPT = decoder.DecoderConfig(
    vocab_size=64,
    n_layers=2,
    n_heads=2,
    d_model=32,
    d_ff=64,
    max_seq=64,
    dtype=np.float32,
)
TINY_LLAMA = decoder.DecoderConfig(
    vocab_size=64,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    d_model=32,
    d_ff=48,
    max_seq=64,
    pos_encoding="rope",
    norm="rmsnorm",
    activation="swiglu",
    tie_embeddings=False,
    dtype=np.float32,
)


@pytest.fixture(params=[TINY_GPT, TINY_LLAMA], ids=["gpt2", "llama"])
def model(request):
    cfg = request.param
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_cache_matches_full_forward(model):
    """Prefill+decode through the preallocated cache must equal a plain
    full-sequence forward — the correctness bar for cache indexing, RoPE
    offsets and attention masks."""
    params, cfg = model
    tokens = np.array([[3, 14, 15, 9, 2, 6]], np.int32)

    full_logits, _ = decoder.forward(params, cfg, tokens, None, use_flash=False)

    cache = decoder.init_cache(cfg, 1, 32)
    pre_logits, cache = decoder.forward(
        params, cfg, tokens[:, :4], cache, use_flash=False
    )
    np.testing.assert_allclose(
        np.asarray(pre_logits), np.asarray(full_logits[:, :4]), rtol=2e-3, atol=2e-4
    )
    for i in range(4, 6):
        step_logits, cache = decoder.forward(
            params, cfg, tokens[:, i : i + 1], cache, use_flash=False
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, i]),
            rtol=2e-3,
            atol=2e-4,
        )
    assert int(cache["len"][0]) == 6


def test_cache_batch_with_different_lengths(model):
    """Rows of a batch can sit at different cache lengths (continuous
    batching prerequisite)."""
    params, cfg = model
    cache = decoder.init_cache(cfg, 2, 32)
    # Row 0 gets 5 prompt tokens, row 1 gets 2 (padded prefill, then fix len).
    t0 = np.array([[5, 6, 7, 8, 9]], np.int32)
    t1 = np.array([[11, 12]], np.int32)

    c0 = decoder.init_cache(cfg, 1, 32)
    _, c0 = decoder.forward(params, cfg, t0, c0, use_flash=False)
    c1 = decoder.init_cache(cfg, 1, 32)
    _, c1 = decoder.forward(params, cfg, t1, c1, use_flash=False)
    merged = {
        "k": [
            np.concatenate([np.asarray(a), np.asarray(b)], axis=0)
            for a, b in zip(c0["k"], c1["k"])
        ],
        "v": [
            np.concatenate([np.asarray(a), np.asarray(b)], axis=0)
            for a, b in zip(c0["v"], c1["v"])
        ],
        "len": np.array([5, 2], np.int32),
    }
    step = np.array([[20], [21]], np.int32)
    logits, new_cache = decoder.forward(params, cfg, step, merged, use_flash=False)
    # Per-row independent checks
    l0, _ = decoder.forward(params, cfg, np.array([[20]], np.int32), c0, use_flash=False)
    l1, _ = decoder.forward(params, cfg, np.array([[21]], np.int32), c1, use_flash=False)
    np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(l0[0]), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(l1[0]), rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(new_cache["len"]), [6, 3])


def test_int8_quantized_params_run():
    cfg = decoder.DecoderConfig(
        vocab_size=512, n_layers=1, n_heads=2, d_model=256, d_ff=512,
        max_seq=32, dtype=np.float32,
    )
    params = decoder.init_params(jax.random.PRNGKey(1), cfg)
    qparams = decoder.quantize_params_int8(params)
    # at least the big projections got quantized
    assert isinstance(qparams["layers"][0]["w_up"], dict)
    tokens = np.array([[1, 2, 3]], np.int32)
    lf, _ = decoder.forward(params, cfg, tokens, None, use_flash=False)
    lq, _ = decoder.forward(qparams, cfg, tokens, None, use_flash=False)
    # int8 fidelity: logits close but not identical
    assert np.abs(np.asarray(lf) - np.asarray(lq)).max() < 1.0
    assert not np.allclose(np.asarray(lf), np.asarray(lq))


def test_generator_argmax_deterministic(model):
    params, cfg = model
    backend = NativeBackend(params, cfg, batch=1, max_len=64)
    gen = Generator(backend, GeneratorConfig(max_tokens=8)).with_prompt([1, 2, 3])
    toks = [int(t[0]) for t in gen]
    assert len(toks) == 8

    backend2 = NativeBackend(params, cfg, batch=1, max_len=64)
    gen2 = Generator(backend2, GeneratorConfig(max_tokens=8)).with_prompt([1, 2, 3])
    toks2 = [int(t[0]) for t in gen2]
    assert toks == toks2

    # Manual argmax rollout must match.
    cache = decoder.init_cache(cfg, 1, 64)
    logits, cache = decoder.forward(
        params, cfg, np.array([[1, 2, 3]], np.int32), cache
    )
    manual = []
    tok = int(np.argmax(np.asarray(logits[:, -1]), -1)[0])
    manual.append(tok)
    for _ in range(7):
        logits, cache = decoder.forward(
            params, cfg, np.array([[tok]], np.int32), cache
        )
        tok = int(np.argmax(np.asarray(logits[:, -1]), -1)[0])
        manual.append(tok)
    assert toks == manual


def test_generator_eos_stops(model):
    params, cfg = model
    backend = NativeBackend(params, cfg, batch=1, max_len=64)
    gen = Generator(backend, GeneratorConfig(max_tokens=50)).with_prompt([1, 2])
    first = next(gen)
    # Rig EOS to the first emitted token: the next iteration should stop after it.
    gen.config = GeneratorConfig(max_tokens=50, eos_tokens=(int(first[0]),))
    remaining = [int(t[0]) for t in gen]
    # generation stops as soon as an eos token is produced
    assert len(remaining) < 49


def test_generator_append_prompt(model):
    """Multi-turn: feed more prompt tokens after some generation
    (reference: generator.rs:474 append_prompt)."""
    params, cfg = model
    backend = NativeBackend(params, cfg, batch=1, max_len=64)
    gen = Generator(backend, GeneratorConfig(max_tokens=100)).with_prompt([1, 2, 3])
    t1 = next(gen)
    gen.append_prompt([7, 8])
    t2 = next(gen)
    assert t1.shape == t2.shape
    # prefill 3, then [last_tok, 7, 8] fed together before t2 was sampled
    assert int(backend.cache["len"][0]) == 6


def test_metrics(model):
    params, cfg = model
    backend = NativeBackend(params, cfg, batch=1, max_len=64)
    m = Metrics()
    gen = (
        Generator(backend, GeneratorConfig(max_tokens=4))
        .with_prompt([1, 2, 3])
        .profile(m)
    )
    list(gen)
    assert len(m.step_times_s) == 4
    assert m.tokens_per_second() > 0
    assert "tokens/s" in m.summary()


def test_samplers_shapes(rng):
    import jax.numpy as jnp

    logits = jnp.asarray(rng.standard_normal((2, 100)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    assert ArgMaxSampler().sample(None, logits).shape == (2,)
    assert TopKSampler(k=10).sample(key, logits).shape == (2,)
    assert TopPSampler(p=0.9).sample(key, logits).shape == (2,)
    # argmax = topk with k=1
    np.testing.assert_array_equal(
        np.asarray(ArgMaxSampler().sample(None, logits)),
        np.asarray(TopKSampler(k=1).sample(key, logits)),
    )


def test_top_p_respects_nucleus():
    import jax.numpy as jnp

    # One dominant token: top-p with small p must always pick it.
    logits = jnp.asarray(np.array([[10.0, 0.0, 0.0, 0.0]], np.float32))
    for i in range(10):
        tok = TopPSampler(p=0.5).sample(jax.random.PRNGKey(i), logits)
        assert int(tok[0]) == 0


def test_decoder_matches_huggingface_gpt2():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    hf_cfg = GPT2Config(
        vocab_size=96,
        n_positions=32,
        n_embd=64,
        n_layer=2,
        n_head=4,
        activation_function="gelu",  # exact erf gelu, like our kernel
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        layer_norm_epsilon=1e-5,
    )
    hf = GPT2LMHeadModel(hf_cfg).eval()

    cfg = decoder.DecoderConfig(
        vocab_size=96, n_layers=2, n_heads=4, d_model=64, d_ff=256, max_seq=32,
        dtype=jnp.float32,
    )
    params = decoder.from_hf_gpt2(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, (2, 7)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    got, _ = decoder.forward(params, cfg, jnp.asarray(ids, jnp.int32), None, use_flash=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-4)


def test_decoder_matches_huggingface_llama():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,  # GQA
        max_position_embeddings=32,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        attention_bias=False,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = decoder.DecoderConfig(
        vocab_size=96, n_layers=2, n_heads=4, n_kv_heads=2, d_model=64,
        d_ff=128, max_seq=32, pos_encoding="rope", norm="rmsnorm",
        activation="swiglu", tie_embeddings=False, layer_norm_eps=1e-6,
        dtype=jnp.float32,
    )
    params = decoder.from_hf_llama(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, (2, 9)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    got, _ = decoder.forward(params, cfg, jnp.asarray(ids, jnp.int32), None, use_flash=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=3e-4)


def test_decoder_int8_kv_cache():
    """INT8 KV cache: prefill+decode chain stays close to the bf16-KV chain
    and continuation is self-consistent (SURVEY.md §7 INT8 KV path)."""
    cfg_fp = decoder.DecoderConfig(
        vocab_size=64, n_layers=2, n_heads=2, d_model=64, d_ff=128, max_seq=256,
        dtype=jnp.float32,
    )
    cfg_q = decoder.DecoderConfig(
        vocab_size=64, n_layers=2, n_heads=2, d_model=64, d_ff=128, max_seq=256,
        dtype=jnp.float32, int8_kv=True,
    )
    params = decoder.init_params(jax.random.PRNGKey(0), cfg_fp)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 64, (1, 6)).astype(np.int32))

    cache_fp = decoder.init_cache(cfg_fp, 1, 256)
    lg_fp, cache_fp = decoder.prefill(params, cfg_fp, prompt, cache_fp, use_flash=False)

    cache_q = decoder.init_cache(cfg_q, 1, 256)
    assert cache_q["k"][0].dtype == jnp.int8
    lg_q, cache_q = decoder.prefill(params, cfg_q, prompt, cache_q, use_flash=False)
    rel = np.abs(np.asarray(lg_q) - np.asarray(lg_fp)).max() / (
        np.abs(np.asarray(lg_fp)).max() + 1e-9
    )
    assert rel < 0.05, rel

    # decode continuation stays close too
    nxt = jnp.argmax(lg_fp[:, -1:], -1).astype(jnp.int32)
    lg_fp2, _ = decoder.decode_step(params, cfg_fp, nxt, cache_fp, use_flash=False)
    lg_q2, cache_q2 = decoder.decode_step(params, cfg_q, nxt, cache_q, use_flash=False)
    rel2 = np.abs(np.asarray(lg_q2) - np.asarray(lg_fp2)).max() / (
        np.abs(np.asarray(lg_fp2)).max() + 1e-9
    )
    assert rel2 < 0.05, rel2
    assert int(np.asarray(cache_q2["len"])[0]) == 7


def test_decoder_matches_huggingface_qwen2_biases():
    """Qwen2-class checkpoints carry q/k/v attention biases — the llama
    importer must pick them up (attention_bias=True is the wire difference
    from plain Llama; reference analog rten-examples/src/qwen2_chat.rs)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    hf_cfg = LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32, rms_norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=True,  # the Qwen2 convention
        tie_word_embeddings=False, attn_implementation="eager",
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    # give the biases real values (init is zeros)
    with torch.no_grad():
        for layer in hf.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0, 0.1)

    cfg = decoder.DecoderConfig(
        vocab_size=96, n_layers=2, n_heads=4, n_kv_heads=2, d_model=64,
        d_ff=128, max_seq=32, pos_encoding="rope", norm="rmsnorm",
        activation="swiglu", tie_embeddings=False, layer_norm_eps=1e-6,
        dtype=jnp.float32,
    )
    params = decoder.from_hf_llama(hf.state_dict(), cfg)
    assert "bq" in params["layers"][0] and "bk" in params["layers"][0]

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 96, (1, 7)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    got, _ = decoder.forward(params, cfg, jnp.asarray(ids, jnp.int32), None, use_flash=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=3e-4)


def test_decoder_matches_huggingface_opt():
    """OPT family (ReLU MLP, learned positions with the 2-row table offset):
    from_hf_opt + forward match OPTForCausalLM exactly — the lift target for
    maskless OPT exports (VERDICT r4 #8; reference runs any such graph at
    native speed via Graph::run, src/graph.rs:820)."""
    torch = pytest.importorskip("torch")
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(0)
    hf_cfg = OPTConfig(
        vocab_size=96,
        hidden_size=64,
        ffn_dim=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=32,
        do_layer_norm_before=True,
        dropout=0.0,
        attention_dropout=0.0,
        activation_function="relu",
        word_embed_proj_dim=64,
    )
    hf = OPTForCausalLM(hf_cfg).eval()

    cfg = decoder.DecoderConfig(
        vocab_size=96, n_layers=2, n_heads=4, d_model=64, d_ff=256, max_seq=32,
        pos_offset=2, activation="relu", dtype=jnp.float32,
    )
    params = decoder.from_hf_opt(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, (2, 7)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    got, _ = decoder.forward(params, cfg, jnp.asarray(ids, jnp.int32), None, use_flash=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=3e-4)

    # Decode continuation with a cache matches the full-sequence forward.
    cache = decoder.init_cache(cfg, 2, 16)
    lg, cache = decoder.prefill(params, cfg, jnp.asarray(ids[:, :5], jnp.int32), cache)
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(got)[:, :5], rtol=2e-3, atol=3e-4
    )
    step, cache = decoder.decode_step(
        params, cfg, jnp.asarray(ids[:, 5:6], jnp.int32), cache
    )
    np.testing.assert_allclose(
        np.asarray(step)[:, 0], np.asarray(got)[:, 5], rtol=2e-3, atol=3e-4
    )


def test_decode_fuse_mega_matches_plain(monkeypatch):
    """RTEN_DECODE_FUSE=mega (whole-block megakernel: attention + wo + MLP +
    next qkv in one Pallas kernel, decoder.py wiring) must produce the same
    decode step as the default two-kernel fused path. CPU: on_tpu is forced
    and every decode kernel runs in interpret mode."""
    import functools as ft

    import rten_tpu.kernels.decode_attention as da_mod
    import rten_tpu.kernels.dispatch as dispatch
    import rten_tpu.kernels.quant_matmul as qm_mod

    monkeypatch.setattr(dispatch, "on_tpu", lambda: True)
    mega_calls = []
    orig_da = da_mod.decode_attention

    def da_spy(*a, **kw):
        if kw.get("mlp") is not None:
            mega_calls.append(kw)
        return orig_da(*a, interpret=True, **kw)

    monkeypatch.setattr(da_mod, "decode_attention", da_spy)
    for mod, name in (
        (qm_mod, "quant_gemv_int8"),
        (qm_mod, "quant_mlp_int8"),
        (qm_mod, "quant_matmul_int8"),
    ):
        monkeypatch.setattr(mod, name, ft.partial(getattr(mod, name), interpret=True))

    cfg = decoder.DecoderConfig(
        vocab_size=256,
        n_layers=2,
        n_heads=4,
        d_model=256,  # big enough that quantize_params_int8's >=64KiB
        d_ff=512,  # threshold quantizes every projection into {"q","s"}
        max_seq=128,
        dtype=np.float32,
    )
    params = decoder.quantize_params_int8(
        decoder.init_params(jax.random.PRNGKey(3), cfg)
    )
    tok = np.array([[7]], np.int32)

    def one_step(fuse_mode):
        monkeypatch.setenv("RTEN_DECODE_FUSE", fuse_mode)
        cache = decoder.init_cache(cfg, 1, 128)
        cache["len"] = jnp.array([5], jnp.int32)
        logits, new_cache = decoder.forward(params, cfg, tok, cache)
        return np.asarray(logits), new_cache

    l_plain, c_plain = one_step("1")
    assert not mega_calls  # default path never passes mlp=
    l_mega, c_mega = one_step("mega")
    assert len(mega_calls) == cfg.n_layers  # megakernel engaged every layer
    # ... and through the whole-stack [L, K, N] slab layout with per-call
    # layer_idx (build_decode_slabs default packing).
    assert mega_calls[0]["mlp"][0].ndim == 3
    assert [kw["layer_idx"] for kw in mega_calls] == list(range(cfg.n_layers))
    assert mega_calls[0]["next_qkv"][0].ndim == 3  # shifted wqkv_next slab
    np.testing.assert_allclose(l_mega, l_plain, rtol=2e-4, atol=2e-4)
    for a, b in zip(c_plain["k"], c_mega["k"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    for a, b in zip(c_plain["v"], c_mega["v"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # argmax head mode (the generate_scan path) agrees too
    monkeypatch.setenv("RTEN_DECODE_FUSE", "mega")
    cache = decoder.init_cache(cfg, 1, 128)
    cache["len"] = jnp.array([5], jnp.int32)
    nxt, _ = decoder.forward(params, cfg, tok, cache, lm_head_mode="argmax")
    assert int(np.asarray(nxt)[0, -1]) == int(np.argmax(l_plain[0, -1]))
