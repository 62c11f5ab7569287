"""Speculative decoding (generate/speculative.py): greedy acceptance must
be TOKEN-EXACT vs plain greedy decoding of the target model — every emitted
token is a target argmax given exactly the tokens before it — across
acceptance regimes (random draft ≈ low acceptance, draft == target ≈ full
acceptance) and per-row divergence in a batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rten_tpu.generate.speculative import speculative_generate, speculative_scan
from rten_tpu.models import decoder


def _cfg(layers=2, seed_dim=64, vocab=97, max_seq=256):
    return decoder.DecoderConfig(
        vocab_size=vocab, d_model=seed_dim, n_layers=layers, n_heads=2,
        d_ff=seed_dim * 2, max_seq=max_seq, dtype=jnp.float32,
    )


def _greedy_reference(params, cfg, prompt, n):
    """Plain greedy: prefill + one decode_step per token."""
    b, p = prompt.shape
    cache = decoder.init_cache(cfg, b, p + n + 4)
    logits, cache = decoder.prefill(params, cfg, jnp.asarray(prompt), cache)
    tok = jnp.argmax(logits[:, -1:, :], -1).astype(jnp.int32)
    out = [np.asarray(tok)[:, 0]]
    for _ in range(n - 1):
        logits, cache = decoder.forward(params, cfg, tok, cache)
        tok = jnp.argmax(logits[:, -1:, :], -1).astype(jnp.int32)
        out.append(np.asarray(tok)[:, 0])
    return np.stack(out, axis=1)  # [B, n]


@pytest.mark.parametrize("k", [1, 3, 4])
def test_speculative_matches_greedy_random_draft(k):
    """A draft with DIFFERENT random weights (low acceptance): output must
    still equal plain target greedy, token for token."""
    cfg_t = _cfg(layers=2)
    cfg_d = _cfg(layers=1)
    params_t = decoder.init_params(jax.random.PRNGKey(0), cfg_t)
    params_d = decoder.init_params(jax.random.PRNGKey(9), cfg_d)
    prompt = np.asarray([[5, 17, 3, 42, 8]], np.int32)
    n = 24

    ref = _greedy_reference(params_t, cfg_t, prompt, n)
    got = speculative_generate(
        params_t, cfg_t, params_d, cfg_d, prompt, k=k, max_new_tokens=n,
        rounds_per_call=4,
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_speculative_full_acceptance_when_draft_is_target():
    """draft == target → every round accepts all K drafts + bonus: counts
    are K+1 every round and output matches greedy."""
    cfg = _cfg(layers=2)
    params = decoder.init_params(jax.random.PRNGKey(1), cfg)
    prompt = np.asarray([[7, 1, 23]], np.int32)
    k, n_rounds = 3, 4

    cache_t = decoder.init_cache(cfg, 1, 128)
    cache_d = decoder.init_cache(cfg, 1, 128)
    logits, cache_t = decoder.prefill(params, cfg, jnp.asarray(prompt), cache_t)
    _, cache_d = decoder.prefill(params, cfg, jnp.asarray(prompt), cache_d)
    last = jnp.argmax(logits[:, -1:, :], -1).astype(jnp.int32)

    toks, counts, cache_t, cache_d, _ = speculative_scan(
        params, cfg, cache_t, params, cfg, cache_d, last,
        k=k, n_rounds=n_rounds,
    )
    counts = np.asarray(counts)
    assert (counts == k + 1).all(), counts
    # caches stay aligned
    np.testing.assert_array_equal(
        np.asarray(cache_t["len"]), np.asarray(cache_d["len"])
    )

    n = 1 + n_rounds * (k + 1)
    ref = _greedy_reference(params, cfg, prompt, n)
    got = np.concatenate(
        [np.asarray(toks)[r, 0, : counts[r, 0]] for r in range(n_rounds)]
    )
    np.testing.assert_array_equal(got, ref[0, 1:])  # ref[0,0] is `last`


def test_speculative_batch_rows_diverge():
    """Batch rows accept at different rates (per-row len bookkeeping);
    every row must match its own greedy reference."""
    cfg_t = _cfg(layers=2)
    cfg_d = _cfg(layers=1)
    params_t = decoder.init_params(jax.random.PRNGKey(2), cfg_t)
    params_d = decoder.init_params(jax.random.PRNGKey(5), cfg_d)
    prompt = np.asarray([[5, 17, 3], [60, 2, 11], [9, 9, 9]], np.int32)
    n = 16

    ref = _greedy_reference(params_t, cfg_t, prompt, n)
    got = speculative_generate(
        params_t, cfg_t, params_d, cfg_d, prompt, k=3, max_new_tokens=n,
        rounds_per_call=3,
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_speculative_eos_stops_row():
    cfg_t = _cfg(layers=1, vocab=13)
    cfg_d = _cfg(layers=1, vocab=13)
    params_t = decoder.init_params(jax.random.PRNGKey(3), cfg_t)
    params_d = decoder.init_params(jax.random.PRNGKey(4), cfg_d)
    prompt = np.asarray([[1, 2]], np.int32)
    ref = _greedy_reference(params_t, cfg_t, prompt, 32)[0]
    # Expected stop = the FIRST occurrence of the chosen EOS token (greedy
    # sequences cycle in a 13-token vocab, so pick by first occurrence).
    eos = int(ref[min(5, len(ref) - 1)])
    pos = next(i for i in range(32) if ref[i] == eos)
    got = speculative_generate(
        params_t, cfg_t, params_d, cfg_d, prompt, k=2, max_new_tokens=32,
        eos_token=eos,
    )[0]
    assert got == list(ref[: pos + 1])
    assert got[-1] == eos


# ---------------------------------------------------------------------------
# Speculative SAMPLING (accept/reject): distribution exactness
# ---------------------------------------------------------------------------

from rten_tpu.generate.speculative import (  # noqa: E402
    speculative_sample_generate,
    speculative_sample_scan,
)


def test_sample_full_acceptance_when_draft_is_target():
    """draft == target → p == q → accept prob min(1, p/q) = 1: every round
    must accept all K drafts + bonus, and caches stay aligned."""
    cfg = _cfg(layers=2)
    params = decoder.init_params(jax.random.PRNGKey(1), cfg)
    prompt = jnp.asarray([[7, 1, 23]], jnp.int32)
    k, n_rounds = 3, 4

    cache_t = decoder.init_cache(cfg, 1, 128)
    cache_d = decoder.init_cache(cfg, 1, 128)
    logits, cache_t = decoder.prefill(params, cfg, prompt, cache_t)
    _, cache_d = decoder.prefill(params, cfg, prompt, cache_d)
    last = jnp.argmax(logits[:, -1:, :], -1).astype(jnp.int32)

    toks, counts, cache_t, cache_d, _, _ = speculative_sample_scan(
        params, cfg, cache_t, params, cfg, cache_d, last,
        jax.random.PRNGKey(0), jnp.float32(0.8), k=k, n_rounds=n_rounds,
    )
    assert (np.asarray(counts) == k + 1).all(), np.asarray(counts)
    np.testing.assert_array_equal(
        np.asarray(cache_t["len"]), np.asarray(cache_d["len"])
    )


def test_sample_marginal_matches_target_distribution():
    """The Leviathan guarantee: the first emitted token of an accept/reject
    round is distributed EXACTLY as temperature sampling of the target
    alone. Empirical check: replicate one prompt across B=2048 i.i.d. rows,
    run ONE round against a DIFFERENT draft model, and compare the
    first-token histogram to the target's analytic softmax (TV distance;
    the naive q-histogram of the draft fails the same bound)."""
    vocab, b, temp = 13, 2048, 0.3
    cfg_t = _cfg(layers=2, vocab=vocab)
    cfg_d = _cfg(layers=1, vocab=vocab)
    params_t = decoder.init_params(jax.random.PRNGKey(0), cfg_t)
    params_d = decoder.init_params(jax.random.PRNGKey(9), cfg_d)
    prompt = jnp.tile(jnp.asarray([[5, 12, 3, 8]], jnp.int32), (b, 1))

    cache_t = decoder.init_cache(cfg_t, b, 32)
    cache_d = decoder.init_cache(cfg_d, b, 32)
    logits_t, cache_t = decoder.prefill(params_t, cfg_t, prompt, cache_t)
    _, cache_d = decoder.prefill(params_d, cfg_d, prompt, cache_d)
    last = jnp.argmax(logits_t[:, -1:, :], -1).astype(jnp.int32)  # same ∀ rows

    # Analytic target marginal for the token after [prompt, last], plus the
    # draft's marginal for the power check (these forwards consume the
    # caches — fresh ones are built below for the actual run).
    lg, _ = decoder.forward(params_t, cfg_t, last, cache_t)
    p_ref = np.asarray(
        jax.nn.softmax(lg[0, -1, :].astype(jnp.float32) / temp)
    )
    lg_d, _ = decoder.forward(params_d, cfg_d, last, cache_d)
    q_ref = np.asarray(
        jax.nn.softmax(lg_d[0, -1, :].astype(jnp.float32) / temp)
    )

    # Fresh caches for the actual run (forward above advanced cache_t).
    cache_t = decoder.init_cache(cfg_t, b, 32)
    cache_d = decoder.init_cache(cfg_d, b, 32)
    _, cache_t = decoder.prefill(params_t, cfg_t, prompt, cache_t)
    _, cache_d = decoder.prefill(params_d, cfg_d, prompt, cache_d)

    toks, counts, *_ = speculative_sample_scan(
        params_t, cfg_t, cache_t, params_d, cfg_d, cache_d, last,
        jax.random.PRNGKey(42), jnp.float32(temp), k=3, n_rounds=1,
    )
    first = np.asarray(toks)[0, :, 0]  # [B] — first emitted token per row
    hist = np.bincount(first, minlength=vocab) / b
    tv = 0.5 * np.abs(hist - p_ref).sum()
    # 2048 samples over 13 bins: TV noise floor ≈ 0.03; draft-vs-target TV
    # for independently-seeded models is ≈ 0.4+ (checked below).
    assert tv < 0.08, (tv, hist, p_ref)

    # Sanity: the test has power — sampling from the DRAFT distribution
    # would NOT pass the bound (the two models genuinely disagree).
    assert 0.5 * np.abs(q_ref - p_ref).sum() > 0.2


def test_sample_generate_near_zero_temperature_is_greedy():
    """temperature → 0 collapses categorical to argmax: the sampling driver
    must reproduce the greedy reference token-for-token."""
    cfg_t = _cfg(layers=2)
    cfg_d = _cfg(layers=1)
    params_t = decoder.init_params(jax.random.PRNGKey(2), cfg_t)
    params_d = decoder.init_params(jax.random.PRNGKey(5), cfg_d)
    prompt = np.asarray([[5, 17, 3], [60, 2, 11]], np.int32)
    n = 16

    ref = _greedy_reference(params_t, cfg_t, prompt, n)
    got = speculative_sample_generate(
        params_t, cfg_t, params_d, cfg_d, prompt,
        rng=jax.random.PRNGKey(7), k=3, max_new_tokens=n,
        temperature=1e-4, rounds_per_call=3,
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_sample_generate_eos_and_shapes():
    """Driver plumbing: eos stops a row, rows are capped at max_new_tokens."""
    cfg = _cfg(layers=1, vocab=13)
    params_t = decoder.init_params(jax.random.PRNGKey(3), cfg)
    params_d = decoder.init_params(jax.random.PRNGKey(4), cfg)
    prompt = np.asarray([[1, 2], [3, 4]], np.int32)
    out = speculative_sample_generate(
        params_t, cfg, params_d, cfg, prompt,
        rng=jax.random.PRNGKey(0), k=2, max_new_tokens=12,
        temperature=1.0, eos_token=7,
    )
    for row in out:
        assert 1 <= len(row) <= 12
        if 7 in row:
            assert row[-1] == 7 and row.count(7) == 1


# ---------------------------------------------------------------------------
# Generator.with_draft: speculative decoding behind the iterator API
# ---------------------------------------------------------------------------

import itertools  # noqa: E402

from rten_tpu.generate import (  # noqa: E402
    Generator,
    GeneratorConfig,
    NativeBackend,
    TemperatureSampler,
    TopKSampler,
)


def _mk_backends(seed_t=2, seed_d=5, batch=1, vocab=97):
    cfg_t = _cfg(layers=2, vocab=vocab)
    cfg_d = _cfg(layers=1, vocab=vocab)
    params_t = decoder.init_params(jax.random.PRNGKey(seed_t), cfg_t)
    params_d = decoder.init_params(jax.random.PRNGKey(seed_d), cfg_d)
    return (
        NativeBackend(params_t, cfg_t, batch=batch, max_len=128),
        NativeBackend(params_d, cfg_d, batch=batch, max_len=128),
        params_t, cfg_t,
    )


def test_generator_with_draft_token_exact_greedy():
    """Generator(with_draft) under ArgMaxSampler must emit exactly the
    plain Generator's tokens, one per __next__."""
    bk, dk, params_t, cfg_t = _mk_backends()
    prompt = [5, 17, 3, 42]
    n = 20

    plain = Generator(
        NativeBackend(params_t, cfg_t, batch=1, max_len=128)
    ).with_prompt(prompt)
    ref = [int(t[0]) for t in itertools.islice(plain, n)]

    gen = Generator(bk).with_prompt(prompt).with_draft(dk, k=3, rounds_per_call=2)
    got = [int(t[0]) for t in itertools.islice(gen, n)]
    assert got == ref


def test_generator_with_draft_append_prompt_mid_stream():
    """append_prompt with un-emitted buffered tokens must roll the caches
    back so the continuation matches a plain Generator doing the same
    two-turn conversation."""
    bk, dk, params_t, cfg_t = _mk_backends(seed_t=3, seed_d=7)
    first_turn, second_turn = [5, 17, 3], [8, 2]

    plain = Generator(
        NativeBackend(params_t, cfg_t, batch=1, max_len=128)
    ).with_prompt(first_turn)
    ref = [int(t[0]) for t in itertools.islice(plain, 6)]
    plain.append_prompt(second_turn)
    ref += [int(t[0]) for t in itertools.islice(plain, 8)]

    gen = Generator(bk).with_prompt(first_turn).with_draft(
        dk, k=4, rounds_per_call=3
    )  # big rounds → buffers certainly non-empty at the append
    got = [int(t[0]) for t in itertools.islice(gen, 6)]
    gen.append_prompt(second_turn)
    got += [int(t[0]) for t in itertools.islice(gen, 8)]
    assert got == ref


def test_generator_with_draft_temperature_near_zero_is_greedy():
    bk, dk, params_t, cfg_t = _mk_backends()
    prompt = [5, 17, 3, 42]
    n = 16
    plain = Generator(
        NativeBackend(params_t, cfg_t, batch=1, max_len=128)
    ).with_prompt(prompt)
    ref = [int(t[0]) for t in itertools.islice(plain, n)]

    gen = (
        Generator(bk)
        .with_prompt(prompt)
        .with_sampler(TemperatureSampler(1e-4))
        .with_draft(dk, k=3)
    )
    got = [int(t[0]) for t in itertools.islice(gen, n)]
    assert got == ref


def test_generator_with_draft_rejects_unsupported():
    bk, dk, *_ = _mk_backends()
    gen = Generator(bk).with_prompt([1, 2]).with_draft(dk, k=2)
    gen.with_sampler(TopKSampler(5))
    with pytest.raises(ValueError, match="speculative"):
        for _ in itertools.islice(gen, 4):
            pass
    with pytest.raises(TypeError, match="NativeBackend"):
        Generator(object()).with_draft(dk)


def test_generator_with_draft_batch_and_eos():
    bk, dk, params_t, cfg_t = _mk_backends(batch=2, vocab=13)
    prompt = np.asarray([[1, 2, 3], [4, 5, 6]], np.int32)
    plain = Generator(
        NativeBackend(params_t, cfg_t, batch=2, max_len=128)
    ).with_prompt(prompt)
    ref = np.stack([t for t in itertools.islice(plain, 10)], 1)  # [B, n]

    gen = Generator(
        bk, GeneratorConfig(max_tokens=10)
    ).with_prompt(prompt).with_draft(dk, k=2, rounds_per_call=2)
    got = np.stack(list(gen), 1)
    np.testing.assert_array_equal(got, ref)


def test_generator_with_draft_tight_max_len_stays_exact():
    """A backend sized exactly prompt+max_tokens (correct for PLAIN
    decoding) must not let the speculative clamp corrupt the stream: the
    draft path grows the caches up front and stays token-exact."""
    cfg_t = _cfg(layers=2)
    cfg_d = _cfg(layers=1)
    params_t = decoder.init_params(jax.random.PRNGKey(2), cfg_t)
    params_d = decoder.init_params(jax.random.PRNGKey(5), cfg_d)
    prompt = [5, 17, 3, 42]
    n = 20

    plain = Generator(
        NativeBackend(params_t, cfg_t, max_len=128)
    ).with_prompt(prompt)
    ref = [int(t[0]) for t in itertools.islice(plain, n)]

    tight = len(prompt) + n  # no speculative headroom at all
    gen = (
        Generator(
            NativeBackend(params_t, cfg_t, max_len=tight),
            GeneratorConfig(max_tokens=n),
        )
        .with_prompt(prompt)
        .with_draft(NativeBackend(params_d, cfg_d, max_len=tight), k=3,
                    rounds_per_call=2)
    )
    got = [int(t[0]) for t in itertools.islice(gen, n)]
    assert got == ref
