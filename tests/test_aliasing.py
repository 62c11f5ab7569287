"""Donation / aliasing safety suite — the TPU analog of the reference's
Miri runs over its unsafe tensor code (/root/reference/Makefile:27-31,
SURVEY.md §5 "race detection"). In a value-semantic JAX program the risk
moves to (a) buffers aliased input→output through Pallas
``input_output_aliases`` and (b) jit donation: a stale read of a donated or
aliased buffer is the use-after-free class these tests pin down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rten_tpu.models import decoder

CFG = decoder.DecoderConfig(
    vocab_size=64,
    n_layers=2,
    n_heads=2,
    d_model=32,
    d_ff=64,
    max_seq=128,
    dtype=np.float32,
)


def test_scan_carried_cache_matches_per_step_calls(rng):
    """The SAME cache buffers threaded as lax.scan carries (generate_scan)
    vs fresh decode_step calls per token: tokens must agree exactly. This is
    the aliasing regression that catches incoherent in-place kernel writes
    under scan (XLA relocates carried buffers; side-effect writes to
    non-aliased operands silently corrupt — the class of bug interpret-mode
    parity tests can't see)."""
    params = decoder.init_params(jax.random.PRNGKey(0), CFG)
    prompt = jnp.asarray(rng.integers(0, 64, (1, 5)).astype(np.int32))

    cache = decoder.init_cache(CFG, 1, 128)
    logits, cache = decoder.prefill(params, CFG, prompt, cache)
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    scanned, _ = decoder.generate_scan(
        params, CFG, cache, tok, jax.random.PRNGKey(0), n_steps=12
    )

    cache = decoder.init_cache(CFG, 1, 128)
    logits, cache = decoder.prefill(params, CFG, prompt, cache)
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    stepped = []
    for _ in range(12):
        logits, cache = decoder.decode_step(params, CFG, tok, cache)
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        stepped.append(int(tok[0, 0]))
    assert [int(t) for t in np.asarray(scanned)[0]] == stepped


def test_donated_cache_buffer_is_consumed_and_not_reusable(rng):
    """decode_step donates its cache: the old leaves must be invalidated
    (double-spending a donated buffer is the use-after-free this guards)."""
    params = decoder.init_params(jax.random.PRNGKey(0), CFG)
    cache = decoder.init_cache(CFG, 1, 128)
    leaf_before = cache["k"][0]
    tok = jnp.zeros((1, 1), jnp.int32)
    _, cache2 = decoder.decode_step(params, CFG, tok, cache)
    assert leaf_before.is_deleted()
    with pytest.raises(RuntimeError):
        _ = np.asarray(leaf_before)
    # The returned cache is fully usable for the next step.
    _, cache3 = decoder.decode_step(params, CFG, tok, cache2)
    assert int(np.asarray(cache3["len"])[0]) == 2


def test_paged_pool_aliased_append_preserves_unrelated_pages(rng):
    """The paged kernel's in-kernel append (input→output aliased pages) must
    only touch the appended row's window; every other page byte-identical."""
    from rten_tpu.kernels.paged_attention import paged_decode_attention

    h, d, psz, npages = 2, 64, 128, 5
    rows = psz * d // 128
    kp = jnp.asarray(rng.standard_normal((h, npages, rows, 128)).astype(np.float32))
    vp = jnp.asarray(rng.standard_normal((h, npages, rows, 128)).astype(np.float32))
    kp_before, vp_before = np.asarray(kp), np.asarray(vp)
    table = jnp.asarray(np.array([[3, 1]], np.int32))
    q = jnp.asarray(rng.standard_normal((1, h, 1, d)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((1, h, 1, d)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((1, h, 1, d)).astype(np.float32))
    lens = jnp.asarray(np.array([130], np.int32))  # append lands in page 1

    _, kp2, vp2 = paged_decode_attention(
        q, kp, vp, table, lens, kn, vn, interpret=True
    )
    kp2, vp2 = np.asarray(kp2), np.asarray(vp2)
    # Pages 0, 2, 3, 4 untouched (page 3 is read-only prefix, 1 gets the
    # append); within page 1 only the 8-row window holding token 2 changes.
    for pg in (0, 2, 4):
        np.testing.assert_array_equal(kp2[:, pg], kp_before[:, pg])
        np.testing.assert_array_equal(vp2[:, pg], vp_before[:, pg])
    np.testing.assert_array_equal(kp2[:, 3], kp_before[:, 3])
    inpage = 130 - 128
    row8 = ((inpage * d) // 128 // 8) * 8
    mask = np.ones(rows, bool)
    mask[row8 : row8 + 8] = False
    np.testing.assert_array_equal(kp2[:, 1][:, mask], kp_before[:, 1][:, mask])


def test_splice_slot_donation_leaves_other_slots_intact(rng):
    """The engine's donated dynamic_update_slice admission splice must not
    disturb other slots' KV."""
    from rten_tpu.serve.engine import _splice_slot

    cache_leaf = jnp.asarray(rng.standard_normal((4, 2, 16, 32)).astype(np.float32))
    before = np.asarray(cache_leaf)
    src = jnp.asarray(rng.standard_normal((1, 2, 16, 32)).astype(np.float32))
    out = _splice_slot(cache_leaf, src, jnp.int32(2))
    out = np.asarray(out)
    np.testing.assert_array_equal(out[[0, 1, 3]], before[[0, 1, 3]])
    np.testing.assert_array_equal(out[2], np.asarray(src)[0])
