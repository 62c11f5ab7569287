"""Speculative decoding (greedy): a small draft model proposes K tokens per
round, the target model verifies them in ONE chunked forward, and every
accepted draft costs the target a K-fold-amortized weight stream.

The reference has no speculative path (its generate loop is strictly
one-Model::run-per-token, rten-generate/src/generator.rs:511-651); this is
beyond-parity serving performance enabled by this framework's cache design:
the decoder cache carries a per-row valid length (models/decoder.py
init_cache) and attention is prefix-bounded, so REJECTING draft tokens is
just writing a smaller ``len`` — the stale entries are never read and the
next round's append overwrites them. No copies, no rollback buffers, and
every round is a fixed-shape program (K draft steps + one (K+1)-token
verify), so the whole generation runs as lax.scan on device.

Greedy acceptance makes the output TOKEN-EXACT vs plain greedy decoding of
the target model (tested): accepted position i emits the target's own
argmax t_{i-1} (== draft d_i when accepted), and the first rejected
position emits the target's correction — so every emitted token is a
target argmax given exactly the tokens before it.

Per round the batch rows advance independently (per-row n_acc); the device
emits a fixed [K+1]-token slab + a valid count per row, and the host
unpacks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rten_tpu.models import decoder


@functools.partial(
    jax.jit,
    static_argnames=("cfg_t", "cfg_d", "k", "n_rounds", "use_flash"),
    donate_argnums=(2, 5),
)
def speculative_scan(
    params_t,
    cfg_t: "decoder.DecoderConfig",
    cache_t,
    params_d,
    cfg_d: "decoder.DecoderConfig",
    cache_d,
    last_tokens,  # [B, 1] int32 — emitted but not yet consumed
    *,
    k: int,
    n_rounds: int,
    use_flash: bool | None = None,
):
    """``n_rounds`` speculative rounds as one device program.

    Returns (tokens [R, B, K+1], counts [R, B], cache_t, cache_d,
    last_tokens): per round and row, the first ``counts[r, b]`` entries of
    ``tokens[r, b]`` are emitted tokens (1 ≤ count ≤ K+1).

    Both caches must hold identical prefixes (same ``len``) for tokens
    consumed so far. Draft cache bookkeeping: each round appends K+1 draft
    entries (K drafting steps + one fill step for d_K, whose logits are
    discarded) so a fully-accepted round leaves the draft aligned.
    """

    # Rows that finished (host stopped collecting them) keep running on
    # device; saturate their length so appends never walk past the cache —
    # a saturated row's tail entries self-overwrite and its tokens are
    # garbage, but the host has already stopped reading them, and rows still
    # being collected never reach the clamp (len ≤ prompt + max_new + 1).
    s_limit = (
        decoder.cache_seq_len(cache_t["k"][0], cfg_t.head_dim) - (k + 2)
    )

    def round_fn(carry, _):
        cache_t, cache_d, last = carry
        len0 = cache_t["len"]

        # Draft K tokens greedily (fused-argmax lm_head path at B ≤ 8).
        def draft_step(c, _):
            cache_d, tok = c
            nxt, cache_d = decoder.forward(
                params_d, cfg_d, tok, cache_d,
                use_flash=use_flash, lm_head_mode="argmax",
            )
            return (cache_d, nxt), nxt

        (cache_d, _), drafts = jax.lax.scan(
            draft_step, (cache_d, last), None, length=k
        )
        d = jnp.swapaxes(drafts[:, :, 0], 0, 1)  # [B, K]
        # Fill step: append d_K's KV entry so a full accept stays aligned.
        _, cache_d = decoder.forward(
            params_d, cfg_d, d[:, -1:], cache_d,
            use_flash=use_flash, lm_head_mode="argmax",
        )

        # Target verify: one (K+1)-token chunk [last, d_1..d_K].
        chunk = jnp.concatenate([last, d], axis=1)
        logits, cache_t = decoder.forward(
            params_t, cfg_t, chunk, cache_t, use_flash=use_flash
        )
        t = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, K+1]

        # acc_i = all_{j<=i} d_j == t_{j-1}; emit t_0..t_{n_acc}.
        match = (d == t[:, :k]).astype(jnp.int32)
        n_acc = jnp.cumprod(match, axis=1).sum(axis=1)  # [B]
        m = n_acc + 1  # tokens emitted this round

        # Rollback = write the smaller valid length; stale entries beyond it
        # are never read (prefix-bounded attention) and get overwritten.
        new_len = jnp.minimum(len0 + m, s_limit)
        cache_t = dict(cache_t)
        cache_t["len"] = new_len
        cache_d = dict(cache_d)
        cache_d["len"] = new_len
        last_new = jnp.take_along_axis(t, n_acc[:, None], axis=1)  # t_{n_acc}
        return (cache_t, cache_d, last_new), (t, m)

    (cache_t, cache_d, last_tokens), (toks, counts) = jax.lax.scan(
        round_fn, (cache_t, cache_d, last_tokens), None, length=n_rounds
    )
    return toks, counts, cache_t, cache_d, last_tokens


@functools.partial(
    jax.jit,
    static_argnames=("cfg_t", "cfg_d", "k", "n_rounds", "use_flash"),
    donate_argnums=(2, 5),
)
def speculative_sample_scan(
    params_t,
    cfg_t: "decoder.DecoderConfig",
    cache_t,
    params_d,
    cfg_d: "decoder.DecoderConfig",
    cache_d,
    last_tokens,  # [B, 1] int32
    rng,
    temperature,
    *,
    k: int,
    n_rounds: int,
    use_flash: bool | None = None,
):
    """Speculative SAMPLING (Leviathan-style accept/reject): draft tokens are
    sampled from the draft distribution q, each is accepted with probability
    min(1, p/q) against the target distribution p, and the first rejection
    resamples from the residual ``normalize(max(p - q, 0))`` — so every
    emitted token is marginally distributed EXACTLY as temperature sampling
    of the target model alone (tested empirically in
    tests/test_speculative.py). All-K acceptance emits a bonus token sampled
    from p_K. Same fixed-shape per-round program and rollback-by-length
    trick as :func:`speculative_scan`; ``temperature`` is a traced scalar
    (no recompile per value).

    Returns (tokens [R, B, K+1], counts [R, B], cache_t, cache_d,
    last_tokens, rng).
    """
    eps = 1e-20
    s_limit = (
        decoder.cache_seq_len(cache_t["k"][0], cfg_t.head_dim) - (k + 2)
    )
    inv_t = 1.0 / jnp.maximum(temperature, 1e-6)

    def round_fn(carry, _):
        cache_t, cache_d, last, rng = carry
        len0 = cache_t["len"]

        def draft_step(c, _):
            cache_d, tok, rng = c
            rng, sub = jax.random.split(rng)
            logits, cache_d = decoder.forward(
                params_d, cfg_d, tok, cache_d, use_flash=use_flash
            )
            lg = logits[:, -1, :].astype(jnp.float32) * inv_t  # [B, V]
            nxt = jax.random.categorical(sub, lg, axis=-1).astype(jnp.int32)
            return (cache_d, nxt[:, None], rng), (nxt, lg)

        (cache_d, _, rng), (drafts, q_logits) = jax.lax.scan(
            draft_step, (cache_d, last, rng), None, length=k
        )
        d = jnp.swapaxes(drafts, 0, 1)  # [B, K]
        q = jax.nn.softmax(jnp.swapaxes(q_logits, 0, 1), axis=-1)  # [B, K, V]
        # Fill step: append d_K's KV entry so a full accept stays aligned.
        _, cache_d = decoder.forward(
            params_d, cfg_d, d[:, -1:], cache_d,
            use_flash=use_flash, lm_head_mode="argmax",
        )

        # Target verify: p_j is the target distribution for the token after
        # chunk[0..j], i.e. p_j pairs with draft d_{j+1}; p_K is the bonus.
        chunk = jnp.concatenate([last, d], axis=1)
        logits, cache_t = decoder.forward(
            params_t, cfg_t, chunk, cache_t, use_flash=use_flash
        )
        p = jax.nn.softmax(
            logits.astype(jnp.float32) * inv_t, axis=-1
        )  # [B, K+1, V]

        rng, r_acc, r_res = jax.random.split(rng, 3)
        p_d = jnp.take_along_axis(p[:, :k, :], d[:, :, None], axis=2)[..., 0]
        q_d = jnp.take_along_axis(q, d[:, :, None], axis=2)[..., 0]
        u = jax.random.uniform(r_acc, d.shape, jnp.float32)
        accept = (u * jnp.maximum(q_d, eps) < p_d).astype(jnp.int32)
        n_acc = jnp.cumprod(accept, axis=1).sum(axis=1)  # [B]

        # Residual at the first rejected position (q padded with a zero row
        # at index K, so a full accept resamples from the bonus p_K itself).
        q_pad = jnp.concatenate([q, jnp.zeros_like(q[:, :1])], axis=1)
        idx = n_acc[:, None, None]
        p_row = jnp.take_along_axis(p, idx, axis=1)[:, 0]  # [B, V]
        q_row = jnp.take_along_axis(q_pad, idx, axis=1)[:, 0]
        res = jnp.maximum(p_row - q_row, 0.0)
        # Degenerate all-zero residual (numerical): fall back to p_row.
        res = jnp.where(
            (res.sum(-1, keepdims=True) > eps), res, p_row
        )
        extra = jax.random.categorical(
            r_res, jnp.log(jnp.maximum(res, eps)), axis=-1
        ).astype(jnp.int32)  # [B]

        m = n_acc + 1
        d_pad = jnp.concatenate([d, d[:, -1:]], axis=1)  # [B, K+1]
        pos = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
        toks = jnp.where(pos < n_acc[:, None], d_pad, extra[:, None])

        new_len = jnp.minimum(len0 + m, s_limit)
        cache_t = dict(cache_t)
        cache_t["len"] = new_len
        cache_d = dict(cache_d)
        cache_d["len"] = new_len
        return (cache_t, cache_d, extra[:, None], rng), (toks, m)

    (cache_t, cache_d, last_tokens, rng), (toks, counts) = jax.lax.scan(
        round_fn, (cache_t, cache_d, last_tokens, rng), None, length=n_rounds
    )
    return toks, counts, cache_t, cache_d, last_tokens, rng


def speculative_sample_generate(
    params_t,
    cfg_t: "decoder.DecoderConfig",
    params_d,
    cfg_d: "decoder.DecoderConfig",
    prompt,  # [B, P] int32
    *,
    rng,
    k: int = 4,
    max_new_tokens: int = 64,
    temperature: float = 1.0,
    rounds_per_call: int = 8,
    eos_token: int | None = None,
    max_len: int | None = None,
    use_flash: bool | None = None,
) -> list[list[int]]:
    """Host driver for :func:`speculative_sample_scan`: prefill both models,
    sample the first token from the target at ``temperature``, then run
    accept/reject rounds in ``rounds_per_call`` chunks. Every emitted token
    is marginally distributed exactly as temperature sampling of the target
    alone (distribution-tested in tests/test_speculative.py)."""
    prompt = jnp.asarray(prompt, jnp.int32)
    b, p = prompt.shape
    need = p + max_new_tokens + k + 2
    max_len = max(max_len or 0, need)
    temp = jnp.asarray(temperature, jnp.float32)

    cache_t = decoder.init_cache(cfg_t, b, max_len)
    cache_d = decoder.init_cache(cfg_d, b, max_len)
    logits_t, cache_t = decoder.prefill(
        params_t, cfg_t, prompt, cache_t, use_flash=use_flash
    )
    _, cache_d = decoder.prefill(
        params_d, cfg_d, prompt, cache_d, use_flash=use_flash
    )
    rng, sub = jax.random.split(jnp.asarray(rng))
    lg0 = logits_t[:, -1, :].astype(jnp.float32) / jnp.maximum(temp, 1e-6)
    last = jax.random.categorical(sub, lg0, axis=-1).astype(jnp.int32)[:, None]

    out: list[list[int]] = [[int(np.asarray(last)[i, 0])] for i in range(b)]
    done = [
        eos_token is not None and out[i][0] == eos_token for i in range(b)
    ]
    while any(
        len(out[i]) < max_new_tokens and not done[i] for i in range(b)
    ):
        toks, counts, cache_t, cache_d, last, rng = speculative_sample_scan(
            params_t, cfg_t, cache_t, params_d, cfg_d, cache_d, last,
            rng, temp, k=k, n_rounds=rounds_per_call, use_flash=use_flash,
        )
        _unpack_rounds(out, done, toks, counts, eos_token, max_new_tokens)
    return [row[:max_new_tokens] for row in out]


def _unpack_rounds(out, done, toks, counts, eos_token, max_new_tokens):
    """Append each round's valid tokens to per-row host lists in place."""
    toks_np = np.asarray(toks)  # [R, B, K+1]
    counts_np = np.asarray(counts)  # [R, B]
    b = toks_np.shape[1]
    for r in range(toks_np.shape[0]):
        for i in range(b):
            if done[i] or len(out[i]) >= max_new_tokens:
                continue
            for j in range(int(counts_np[r, i])):
                tok = int(toks_np[r, i, j])
                out[i].append(tok)
                if eos_token is not None and tok == eos_token:
                    done[i] = True
                    break
                if len(out[i]) >= max_new_tokens:
                    break


def speculative_generate(
    params_t,
    cfg_t: "decoder.DecoderConfig",
    params_d,
    cfg_d: "decoder.DecoderConfig",
    prompt,  # [B, P] int32
    *,
    k: int = 4,
    max_new_tokens: int = 64,
    rounds_per_call: int = 8,
    eos_token: int | None = None,
    max_len: int | None = None,
    use_flash: bool | None = None,
) -> list[list[int]]:
    """Host driver: prefill both models, run ``speculative_scan`` in
    ``rounds_per_call`` chunks until every row has ``max_new_tokens`` (or
    EOS), unpack per-row tokens. Output is token-exact vs greedy decoding
    of the target alone."""
    prompt = jnp.asarray(prompt, jnp.int32)
    b, p = prompt.shape
    need = p + max_new_tokens + k + 2
    max_len = max(max_len or 0, need)

    cache_t = decoder.init_cache(cfg_t, b, max_len)
    cache_d = decoder.init_cache(cfg_d, b, max_len)
    logits_t, cache_t = decoder.prefill(
        params_t, cfg_t, prompt, cache_t, use_flash=use_flash
    )
    _, cache_d = decoder.prefill(
        params_d, cfg_d, prompt, cache_d, use_flash=use_flash
    )
    last = jnp.argmax(logits_t[:, -1:, :], axis=-1).astype(jnp.int32)  # [B, 1]

    out: list[list[int]] = [[int(np.asarray(last)[i, 0])] for i in range(b)]
    done = [
        eos_token is not None and out[i][0] == eos_token for i in range(b)
    ]
    while any(
        len(out[i]) < max_new_tokens and not done[i] for i in range(b)
    ):
        toks, counts, cache_t, cache_d, last = speculative_scan(
            params_t, cfg_t, cache_t, params_d, cfg_d, cache_d, last,
            k=k, n_rounds=rounds_per_call, use_flash=use_flash,
        )
        _unpack_rounds(out, done, toks, counts, eos_token, max_new_tokens)
    return [row[:max_new_tokens] for row in out]
