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
