"""Continuous-batching engine tests. The correctness bar: a request served
concurrently with others must produce EXACTLY the same tokens as the same
prompt generated alone (greedy) — batching must be invisible."""

import jax
import numpy as np

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.generate.generator import NativeBackend
from rten_tpu.models import decoder
from rten_tpu.serve import Request, ServingEngine

CFG = decoder.DecoderConfig(
    vocab_size=64,
    n_layers=2,
    n_heads=2,
    d_model=32,
    d_ff=64,
    max_seq=128,
    dtype=np.float32,
)
PARAMS = decoder.init_params(jax.random.PRNGKey(0), CFG)


def solo_generate(prompt, n):
    backend = NativeBackend(PARAMS, CFG, batch=1, max_len=128)
    gen = Generator(backend, GeneratorConfig(max_tokens=n)).with_prompt(prompt)
    return [int(t[0]) for t in gen]


def test_single_request_matches_solo():
    prompt = [3, 14, 15]
    engine = ServingEngine(PARAMS, CFG, max_batch=4, max_len=128)
    req = engine.submit(Request(prompt=prompt, max_new_tokens=6))
    engine.run()
    assert req.finished
    assert req.output == solo_generate(prompt, 6)


def test_concurrent_requests_match_solo():
    prompts = [[1, 2, 3], [7, 8], [11, 12, 13, 14], [5]]
    engine = ServingEngine(PARAMS, CFG, max_batch=4, max_len=128)
    reqs = [engine.submit(Request(prompt=p, max_new_tokens=5)) for p in prompts]
    engine.run()
    for p, r in zip(prompts, reqs):
        assert r.output == solo_generate(p, 5), f"prompt {p}"


def test_more_requests_than_slots():
    """Queued requests are admitted as slots free up (continuous batching)."""
    prompts = [[i + 1, i + 2] for i in range(6)]
    engine = ServingEngine(PARAMS, CFG, max_batch=2, max_len=128)
    reqs = [
        engine.submit(Request(prompt=p, max_new_tokens=3 + (i % 3)))
        for i, p in enumerate(prompts)
    ]
    done = engine.run()
    assert len(done) == 6
    for i, (p, r) in enumerate(zip(prompts, reqs)):
        assert r.output == solo_generate(p, 3 + (i % 3)), f"prompt {p}"


def test_eos_stops_request():
    prompt = [1, 2, 3]
    solo = solo_generate(prompt, 8)
    eos = solo[2]
    engine = ServingEngine(PARAMS, CFG, max_batch=2, max_len=128)
    req = engine.submit(Request(prompt=prompt, max_new_tokens=8, eos_tokens=(eos,)))
    engine.run()
    # Generation stops at the FIRST occurrence of the eos token.
    expected = solo[: solo.index(eos) + 1]
    assert req.output == expected
    assert req.finished


def test_streaming_callback():
    seen = []
    engine = ServingEngine(PARAMS, CFG, max_batch=2, max_len=128)
    req = engine.submit(
        Request(prompt=[1, 2], max_new_tokens=4, on_token=seen.append)
    )
    engine.run()
    assert seen == req.output


def test_slot_reuse_no_leakage():
    """A slot freed by one request must not contaminate the next request
    that lands in it."""
    engine = ServingEngine(PARAMS, CFG, max_batch=1, max_len=128)
    r1 = engine.submit(Request(prompt=[9, 9, 9, 9, 9], max_new_tokens=4))
    engine.run()
    r2 = engine.submit(Request(prompt=[1, 2], max_new_tokens=4))
    engine.run()
    assert r2.output == solo_generate([1, 2], 4)
    assert r1.output == solo_generate([9, 9, 9, 9, 9], 4)


def test_engine_sharded_matches_unsharded():
    """Continuous batching over a (data, model) mesh (BASELINE config 5 shape,
    virtual 8-device CPU mesh): same requests, same tokens as single-device."""
    import jax
    from rten_tpu.parallel import make_mesh

    cfg = decoder.DecoderConfig(
        vocab_size=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=4,
        d_model=64,
        d_ff=128,
        max_seq=64,
        pos_encoding="rope",
        norm="rmsnorm",
        activation="swiglu",
        tie_embeddings=False,
    )
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    prompts = [[1, 2, 3, 4], [9, 8, 7]]

    ref = ServingEngine(params, cfg, max_batch=2, seed=0)
    for prompt in prompts:
        ref.submit(Request(prompt=prompt, max_new_tokens=6))
    ref_out = {tuple(r.prompt): r.output for r in ref.run()}

    mesh = make_mesh(data=2, model=4)
    eng = ServingEngine(params, cfg, max_batch=2, seed=0, mesh=mesh)
    for prompt in prompts:
        eng.submit(Request(prompt=prompt, max_new_tokens=6))
    out = {tuple(r.prompt): r.output for r in eng.run()}
    assert out == ref_out


def test_engine_shard_map_tp_matches_unsharded():
    """tp_mode="shard_map" routes every decode step through the explicit
    tensor-parallel path (parallel/tp.py, overlapped ring collectives):
    same requests, same tokens as the single-device engine."""
    import jax
    from rten_tpu.parallel import make_mesh

    cfg = decoder.DecoderConfig(
        vocab_size=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=4,
        d_model=64,
        d_ff=128,
        max_seq=64,
        pos_encoding="rope",
        norm="rmsnorm",
        activation="swiglu",
        tie_embeddings=False,
    )
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    prompts = [[1, 2, 3, 4], [9, 8, 7]]

    ref = ServingEngine(params, cfg, max_batch=2, seed=0)
    for prompt in prompts:
        ref.submit(Request(prompt=prompt, max_new_tokens=6))
    ref_out = {tuple(r.prompt): r.output for r in ref.run()}

    mesh = make_mesh(data=2, model=4)
    eng = ServingEngine(
        params, cfg, max_batch=2, seed=0, mesh=mesh, tp_mode="shard_map"
    )
    for prompt in prompts:
        eng.submit(Request(prompt=prompt, max_new_tokens=6))
    out = {tuple(r.prompt): r.output for r in eng.run()}
    assert out == ref_out


def test_paged_engine_matches_slot_engine():
    """Paged KV pool serving produces the same tokens as the slot engine
    (SURVEY.md §7 "paged KV cache" — the vLLM-style allocator)."""
    import jax
    from rten_tpu.serve.paged import PagedServingEngine

    cfg = decoder.DecoderConfig(
        vocab_size=128, n_layers=2, n_heads=4, d_model=64, d_ff=128, max_seq=512
    )
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [11, 12]]

    ref = ServingEngine(params, cfg, max_batch=3, seed=0)
    for p in prompts:
        ref.submit(Request(prompt=p, max_new_tokens=6))
    ref_out = {tuple(r.prompt): r.output for r in ref.run()}

    eng = PagedServingEngine(
        params, cfg, max_batch=3, n_pages=12, page_size=128, seed=0
    )
    for p in prompts:
        eng.submit(Request(prompt=p, max_new_tokens=6))
    out = {tuple(r.prompt): r.output for r in eng.run()}
    assert out == ref_out

    # All pages returned to the pool after retirement.
    assert eng.pool.n_free == eng.pool.n_pages


def test_paged_multipage_prompt_matches_slot_engine():
    """A prompt spanning more than one page must prefill correctly — the
    folded-storage slice in admission works in row units, not token units
    (regression: token-unit slicing crashed any >1-page prompt)."""
    import jax
    from rten_tpu.serve.paged import PagedServingEngine

    cfg = decoder.DecoderConfig(
        vocab_size=128, n_layers=2, n_heads=2, d_model=32, d_ff=64, max_seq=512
    )
    params = decoder.init_params(jax.random.PRNGKey(2), cfg)
    prompt = [(i * 7 + 3) % 128 for i in range(150)]  # 150 > page_size

    ref = ServingEngine(params, cfg, max_batch=1, max_len=256, seed=0)
    ref.submit(Request(prompt=prompt, max_new_tokens=6))
    (ref_done,) = ref.run()

    eng = PagedServingEngine(params, cfg, max_batch=1, n_pages=4, page_size=128, seed=0)
    req = eng.submit(Request(prompt=prompt, max_new_tokens=6))
    eng.run()
    assert req.output == ref_done.output


def test_paged_inactive_row_does_not_corrupt_live_pages():
    """When one sequence retires, the surviving row must keep producing the
    solo tokens — the retired row's (inactive) table entry points at the
    scratch page so the kernel's fused append can't clobber live page 0."""
    import jax
    from rten_tpu.serve.paged import PagedServingEngine

    cfg = decoder.DecoderConfig(
        vocab_size=128, n_layers=2, n_heads=2, d_model=32, d_ff=64, max_seq=512
    )
    params = decoder.init_params(jax.random.PRNGKey(3), cfg)

    ref = ServingEngine(params, cfg, max_batch=1, max_len=256, seed=0)
    ref.submit(Request(prompt=[1, 2, 3, 4], max_new_tokens=10))
    (ref_done,) = ref.run()

    # Request A (submitted first → owns page 0) outlives request B by 8
    # steps; those steps run with row 1 inactive.
    eng = PagedServingEngine(params, cfg, max_batch=2, n_pages=6, page_size=128, seed=0)
    req_a = eng.submit(Request(prompt=[1, 2, 3, 4], max_new_tokens=10))
    eng.submit(Request(prompt=[9, 8], max_new_tokens=2))
    eng.run()
    assert req_a.output == ref_done.output


def test_paged_preemption_on_pool_exhaustion():
    """Pool exhaustion during page growth preempts the sequence (release +
    requeue + re-prefill of prompt+output) instead of raising MemoryError;
    every request still finishes with the solo tokens."""
    import jax
    from rten_tpu.serve.paged import PagedServingEngine

    cfg = decoder.DecoderConfig(
        vocab_size=128, n_layers=2, n_heads=2, d_model=32, d_ff=64, max_seq=512
    )
    params = decoder.init_params(jax.random.PRNGKey(4), cfg)
    prompts = [
        [(i * 5 + 1) % 128 for i in range(120)],
        [(i * 11 + 2) % 128 for i in range(120)],
    ]

    ref_out = {}
    for p in prompts:
        ref = ServingEngine(params, cfg, max_batch=1, max_len=256, seed=0)
        ref.submit(Request(prompt=p, max_new_tokens=20))
        (d,) = ref.run()
        ref_out[tuple(p)] = d.output

    # 3 pages for two sequences that each need 2 → one must be preempted.
    eng = PagedServingEngine(params, cfg, max_batch=2, n_pages=3, page_size=128, seed=0)
    reqs = [eng.submit(Request(prompt=p, max_new_tokens=20)) for p in prompts]
    done = eng.run()
    assert len(done) == 2
    for p, r in zip(prompts, reqs):
        assert r.output == ref_out[tuple(p)], f"prompt head {p[:3]}"
    assert eng.pool.n_free == 3


def test_paged_int8_engine_matches_slot_int8_engine():
    """INT8 page pool (int8 payload + per-token/head scale pages, fused
    quantized append) vs the slot engine with int8_kv — both use the same
    per-(token, head) absmax quantization, so tokens must match."""
    import jax
    from rten_tpu.serve.paged import PagedServingEngine

    cfg = decoder.DecoderConfig(
        vocab_size=128, n_layers=2, n_heads=2, d_model=64, d_ff=64, max_seq=512,
        dtype=np.float32,
    )
    cfg8 = decoder.DecoderConfig(
        vocab_size=128, n_layers=2, n_heads=2, d_model=64, d_ff=64, max_seq=512,
        int8_kv=True, dtype=np.float32,
    )
    params = decoder.init_params(jax.random.PRNGKey(5), cfg)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]

    ref = ServingEngine(params, cfg8, max_batch=2, max_len=256, seed=0)
    for p in prompts:
        ref.submit(Request(prompt=p, max_new_tokens=6))
    ref_out = {tuple(r.prompt): r.output for r in ref.run()}

    eng = PagedServingEngine(
        params, cfg, max_batch=2, n_pages=8, page_size=128, seed=0, int8_kv=True
    )
    for p in prompts:
        eng.submit(Request(prompt=p, max_new_tokens=6))
    out = {tuple(r.prompt): r.output for r in eng.run()}
    assert out == ref_out
    assert eng.pool.n_free == eng.pool.n_pages


def test_paged_engine_page_pressure():
    """More requests than the pool can hold at once: admission waits for
    freed pages and every request still completes."""
    import jax
    from rten_tpu.serve.paged import PagedServingEngine

    cfg = decoder.DecoderConfig(
        vocab_size=64, n_layers=1, n_heads=2, d_model=32, d_ff=64, max_seq=512
    )
    params = decoder.init_params(jax.random.PRNGKey(1), cfg)
    eng = PagedServingEngine(params, cfg, max_batch=2, n_pages=4, page_size=128, seed=0)
    reqs = [eng.submit(Request(prompt=[i + 1, i + 2], max_new_tokens=4)) for i in range(5)]
    done = eng.run()
    assert len(done) == 5
    assert all(len(r.output) == 4 for r in reqs)
    assert eng.pool.n_free == 4


def test_paged_engine_sharded_matches_unsharded():
    """Paged pool sharded on KV heads over a model-axis mesh, decode via the
    explicit TP path with the paged Pallas kernel per shard — tokens equal
    to the single-device paged engine."""
    import jax
    from rten_tpu.parallel import make_mesh
    from rten_tpu.serve.paged import PagedServingEngine

    cfg = decoder.DecoderConfig(
        vocab_size=128, n_layers=2, n_heads=4, n_kv_heads=4, d_model=64,
        d_ff=128, max_seq=512, dtype=np.float32,
    )
    params = decoder.init_params(jax.random.PRNGKey(6), cfg)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]

    ref = PagedServingEngine(params, cfg, max_batch=2, n_pages=8, page_size=128, seed=0)
    for p in prompts:
        ref.submit(Request(prompt=p, max_new_tokens=6))
    ref_out = {tuple(r.prompt): r.output for r in ref.run()}

    mesh = make_mesh(data=1, model=4)
    eng = PagedServingEngine(
        params, cfg, max_batch=2, n_pages=8, page_size=128, seed=0, mesh=mesh
    )
    for p in prompts:
        eng.submit(Request(prompt=p, max_new_tokens=6))
    out = {tuple(r.prompt): r.output for r in eng.run()}
    assert out == ref_out


def test_engine_shard_map_tp_int8kv_matches_unsharded():
    """int8-KV through the explicit shard_map TP path (VERDICT r2 item 3:
    the serve/engine fence is gone): the int8 cache payload AND the
    per-(token, head) scale arrays shard on heads, every decode step runs
    parallel/tp.tp_forward's int8 branch, and the tokens match the
    single-device int8_kv engine exactly."""
    import jax
    from rten_tpu.parallel import make_mesh

    cfg = decoder.DecoderConfig(
        vocab_size=128,
        n_layers=2,
        n_heads=4,
        n_kv_heads=4,
        d_model=64,
        d_ff=128,
        max_seq=64,
        pos_encoding="rope",
        norm="rmsnorm",
        activation="swiglu",
        tie_embeddings=False,
        int8_kv=True,
    )
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    prompts = [[1, 2, 3, 4], [9, 8, 7]]

    ref = ServingEngine(params, cfg, max_batch=2, seed=0)
    for prompt in prompts:
        ref.submit(Request(prompt=prompt, max_new_tokens=6))
    ref_out = {tuple(r.prompt): r.output for r in ref.run()}

    mesh = make_mesh(data=2, model=4)
    eng = ServingEngine(
        params, cfg, max_batch=2, seed=0, mesh=mesh, tp_mode="shard_map"
    )
    for prompt in prompts:
        eng.submit(Request(prompt=prompt, max_new_tokens=6))
    out = {tuple(r.prompt): r.output for r in eng.run()}
    assert out == ref_out


def test_paged_int8_engine_sharded_matches_unsharded():
    """INT8 page pool under model-axis TP (VERDICT r2 item 3: the paged-mesh
    fence is gone): int8 payload pages AND scale pages shard on KV heads,
    decode runs the int8 paged Pallas kernel per shard through
    tp_paged_decode — tokens equal to the single-device int8 paged engine."""
    import jax
    from rten_tpu.parallel import make_mesh
    from rten_tpu.serve.paged import PagedServingEngine

    cfg = decoder.DecoderConfig(
        vocab_size=128, n_layers=2, n_heads=4, n_kv_heads=4, d_model=128,
        d_ff=128, max_seq=512, dtype=np.float32,
    )
    params = decoder.init_params(jax.random.PRNGKey(6), cfg)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]

    ref = PagedServingEngine(
        params, cfg, max_batch=2, n_pages=8, page_size=128, seed=0, int8_kv=True
    )
    for p in prompts:
        ref.submit(Request(prompt=p, max_new_tokens=6))
    ref_out = {tuple(r.prompt): r.output for r in ref.run()}

    mesh = make_mesh(data=1, model=4)
    eng = PagedServingEngine(
        params, cfg, max_batch=2, n_pages=8, page_size=128, seed=0,
        int8_kv=True, mesh=mesh,
    )
    for p in prompts:
        eng.submit(Request(prompt=p, max_new_tokens=6))
    out = {tuple(r.prompt): r.output for r in eng.run()}
    assert out == ref_out
    assert eng.pool.n_free == eng.pool.n_pages


def test_engine_multi_step_tick_matches_single_step():
    """steps_per_tick=4 runs 4 decode iterations per device program
    (on-device sampling + per-slot EOS/budget masking in the scan) and must
    produce exactly the single-step engine's outputs — including a request
    that stops early on EOS mid-tick and one whose budget isn't a multiple
    of the tick size (VERDICT r2 item 4: no per-token host loop)."""
    import jax

    cfg = decoder.DecoderConfig(
        vocab_size=64, n_layers=2, n_heads=2, d_model=32, d_ff=64, max_seq=64
    )
    params = decoder.init_params(jax.random.PRNGKey(2), cfg)
    prompts = [[1, 2, 3], [9, 8], [11, 12, 13, 14]]

    ref = ServingEngine(params, cfg, max_batch=2, seed=0)
    reqs = []
    for i, p in enumerate(prompts):
        reqs.append(ref.submit(Request(prompt=p, max_new_tokens=5 + i)))
    ref_out = {tuple(r.prompt): r.output for r in ref.run()}

    eng = ServingEngine(params, cfg, max_batch=2, seed=0, steps_per_tick=4)
    for i, p in enumerate(prompts):
        eng.submit(Request(prompt=p, max_new_tokens=5 + i))
    out = {tuple(r.prompt): r.output for r in eng.run()}
    assert out == ref_out

    # EOS stop mid-tick: pick the 2nd token the reference generated as EOS.
    target = prompts[0]
    eos_tok = ref_out[tuple(target)][1]
    ref2 = ServingEngine(params, cfg, max_batch=2, seed=0)
    r_ref = ref2.submit(
        Request(prompt=target, max_new_tokens=8, eos_tokens=(eos_tok,))
    )
    ref2.run()
    eng2 = ServingEngine(params, cfg, max_batch=2, seed=0, steps_per_tick=4)
    r_new = eng2.submit(
        Request(prompt=target, max_new_tokens=8, eos_tokens=(eos_tok,))
    )
    eng2.run()
    assert r_new.output == r_ref.output
    assert r_new.output[-1] == eos_tok and len(r_new.output) < 8


def test_engine_multi_step_tick_shard_map():
    """K-step device ticks compose with the explicit shard_map TP path."""
    import jax
    from rten_tpu.parallel import make_mesh

    cfg = decoder.DecoderConfig(
        vocab_size=128, n_layers=2, n_heads=4, n_kv_heads=4, d_model=64,
        d_ff=128, max_seq=64, pos_encoding="rope", norm="rmsnorm",
        activation="swiglu", tie_embeddings=False,
    )
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    prompts = [[1, 2, 3, 4], [9, 8, 7]]

    ref = ServingEngine(params, cfg, max_batch=2, seed=0)
    for p in prompts:
        ref.submit(Request(prompt=p, max_new_tokens=6))
    ref_out = {tuple(r.prompt): r.output for r in ref.run()}

    mesh = make_mesh(data=2, model=4)
    eng = ServingEngine(
        params, cfg, max_batch=2, seed=0, mesh=mesh, tp_mode="shard_map",
        steps_per_tick=3,
    )
    for p in prompts:
        eng.submit(Request(prompt=p, max_new_tokens=6))
    out = {tuple(r.prompt): r.output for r in eng.run()}
    assert out == ref_out


def test_engine_pipelined_matches_sync():
    """run_pipelined dispatches tick t+1 from the DEVICE-side carry before
    pulling tick t's tokens to the host; with the deterministic ArgMax
    sampler it must reproduce run()'s outputs exactly across continuous-
    batching churn (queue > slots), mid-tick EOS, and budgets that aren't
    tick multiples."""
    import jax

    cfg = decoder.DecoderConfig(
        vocab_size=64, n_layers=2, n_heads=2, d_model=32, d_ff=64, max_seq=64
    )
    params = decoder.init_params(jax.random.PRNGKey(2), cfg)
    prompts = [[1, 2, 3], [9, 8], [11, 12, 13, 14], [5], [21, 22]]

    ref = ServingEngine(params, cfg, max_batch=2, seed=0, steps_per_tick=3)
    for i, p in enumerate(prompts):
        ref.submit(Request(prompt=p, max_new_tokens=4 + i))
    ref_out = {tuple(r.prompt): r.output for r in ref.run()}

    eng = ServingEngine(params, cfg, max_batch=2, seed=0, steps_per_tick=3)
    for i, p in enumerate(prompts):
        eng.submit(Request(prompt=p, max_new_tokens=4 + i))
    done = eng.run_pipelined()
    out = {tuple(r.prompt): r.output for r in done}
    assert len(done) == len(prompts)
    assert out == ref_out
    assert all(s is None for s in eng.slots)

    # mid-tick EOS through the pipelined path
    target = prompts[0]
    eos_tok = ref_out[tuple(target)][1]
    ref2 = ServingEngine(params, cfg, max_batch=2, seed=0, steps_per_tick=4)
    r_ref = ref2.submit(
        Request(prompt=target, max_new_tokens=8, eos_tokens=(eos_tok,))
    )
    ref2.run()
    eng2 = ServingEngine(params, cfg, max_batch=2, seed=0, steps_per_tick=4)
    r_new = eng2.submit(
        Request(prompt=target, max_new_tokens=8, eos_tokens=(eos_tok,))
    )
    eng2.run_pipelined()
    assert r_new.output == r_ref.output
    assert r_new.finished and r_new.output[-1] == eos_tok

    # streaming callbacks fire for every token, in order
    seen = []
    eng3 = ServingEngine(params, cfg, max_batch=1, seed=0, steps_per_tick=3)
    r3 = eng3.submit(
        Request(prompt=target, max_new_tokens=7, on_token=seen.append)
    )
    eng3.run_pipelined()
    assert seen == r3.output and len(seen) == 7
