"""GraphBackend compiled-decode tests.

The reference generates through arbitrary ONNX decoder graphs one
`Model::run` per token with a concat-grown cache
(/root/reference/rten-generate/src/generator.rs:511-651). The TPU redesign
must do the same for graphs that DON'T lift onto the native decoder — but
compiled: bucketed prefill + preallocated padded KV buffer + one XLA
program per bucket. These tests build a small HF-Optimum-convention decoder
graph from primitive ops (Gather/MatMul/Concat/Softmax, mask-honoring
attention) and check the compiled path is token-exact vs the legacy
exact-shape interpret path, compiles O(buckets) programs, and hoists
loop-invariant subgraphs via partial_run (generator.rs:533-544).
"""

import numpy as np
import pytest

from rten_tpu.generate import Generator, GeneratorConfig
from rten_tpu.generate.generator import GraphBackend
from rten_tpu.graph import Graph
from rten_tpu.runtime.session import Model, ModelOptions

V, D = 32, 16
MAXPOS = 256


def build_decoder_graph(rng, with_bias_input=False):
    """input_ids/attention_mask/position_ids/past_key_values.0.* → logits +
    present.0.* — single-head attention with 3-D [B, S, D] KV (the
    reference's 3-D KvCacheData layout, generator.rs:59-66). Validity and
    causality both derive from attention_mask + position_ids, so bucketed
    padding is exact."""
    g = Graph()
    ids = g.add_value("input_ids", ["batch", None])
    mask = g.add_value("attention_mask", ["batch", None])
    pos = g.add_value("position_ids", ["batch", None])
    pk_in = g.add_value("past_key_values.0.key", ["batch", None, D])
    pv_in = g.add_value("past_key_values.0.value", ["batch", None, D])
    g.inputs = [ids, mask, pos, pk_in, pv_in]

    def c(name, arr):
        return g.add_constant(name, np.asarray(arr))

    wte = c("wte", rng.standard_normal((V, D)).astype(np.float32) * 0.5)
    wpe = c("wpe", rng.standard_normal((MAXPOS, D)).astype(np.float32) * 0.1)
    wq = c("wq", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wk = c("wk", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wv = c("wv", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wo = c("wo", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wlm = c("wlm", rng.standard_normal((D, V)).astype(np.float32) * 0.5)

    emb = g.add_simple_op("Gather", [wte, ids], {"axis": 0}, name="emb")
    pemb = g.add_simple_op("Gather", [wpe, pos], {"axis": 0}, name="pemb")
    x = g.add_simple_op("Add", [emb, pemb], name="x")

    q = g.add_simple_op("MatMul", [x, wq], name="q")
    k = g.add_simple_op("MatMul", [x, wk], name="k")
    v = g.add_simple_op("MatMul", [x, wv], name="v")

    # Output value nodes carry the exact HF-Optimum names the backend maps.
    pk = g.add_value("present.0.key")
    g.add_operator("concat_k", "Concat", {"axis": 1}, [pk_in, k], [pk])
    pv = g.add_value("present.0.value")
    g.add_operator("concat_v", "Concat", {"axis": 1}, [pv_in, v], [pv])

    pk_t = g.add_simple_op("Transpose", [pk], {"perm": [0, 2, 1]}, name="pk_t")
    raw = g.add_simple_op("MatMul", [q, pk_t], name="scores_raw")
    scale = c("scale", np.float32(1.0 / np.sqrt(D)))
    scores = g.add_simple_op("Mul", [raw, scale], name="scores")

    # kpos = cumsum(mask) - 1 (true position of each cache column, pads
    # repeat the previous value and are separately masked off)
    mf = g.add_simple_op("Cast", [mask], {"to": "float"}, name="mf")
    one_ax = c("one_ax", np.int32(1))
    csum = g.add_simple_op("CumSum", [mf, one_ax], name="csum")
    onef = c("onef", np.float32(1.0))
    kpos = g.add_simple_op("Sub", [csum, onef], name="kpos")
    qposf = g.add_simple_op("Cast", [pos], {"to": "float"}, name="qposf")
    ax1 = c("ax1", np.int32([1]))
    ax2 = c("ax2", np.int32([2]))
    kpos_b = g.add_simple_op("Unsqueeze", [kpos, ax1], name="kpos_b")  # [B,1,S]
    qpos_b = g.add_simple_op("Unsqueeze", [qposf, ax2], name="qpos_b")  # [B,T,1]
    causal = g.add_simple_op("LessOrEqual", [kpos_b, qpos_b], name="causal")
    mask_b = g.add_simple_op("Unsqueeze", [mask, ax1], name="mask_b")  # [B,1,S]
    valid = g.add_simple_op("Mul", [causal, mask_b], name="valid")
    validf = g.add_simple_op("Cast", [valid], {"to": "float"}, name="validf")
    vm1 = g.add_simple_op("Sub", [validf, onef], name="vm1")
    big = c("big", np.float32(1e9))
    bias = g.add_simple_op("Mul", [vm1, big], name="bias")
    masked = g.add_simple_op("Add", [scores, bias], name="masked")

    probs = g.add_simple_op("Softmax", [masked], {"axis": -1}, name="probs")
    ctx = g.add_simple_op("MatMul", [probs, pv], name="ctx")
    proj = g.add_simple_op("MatMul", [ctx, wo], name="proj")
    h = g.add_simple_op("Add", [proj, x], name="h")
    logits = g.add_value("logits")
    g.add_operator("lm", "MatMul", {}, [h, wlm], [logits])

    if with_bias_input:
        # A loop-invariant subgraph hanging off an extra input: bias_in → ×2
        # → added to logits. partial_run should hoist the Mul.
        bias_in = g.add_value("logit_bias_in", [V])
        g.inputs.append(bias_in)
        two = c("two", np.float32(2.0))
        scaled_bias = g.add_simple_op("Mul", [bias_in, two], name="scaled_bias")
        biased = g.add_value("logits_biased")
        g.add_operator("add_bias", "Add", {}, [logits, scaled_bias], [biased])
        logits = biased

    g.outputs = [logits, pk, pv]
    return g


def _generate(backend, prompt, n):
    gen = Generator(backend, GeneratorConfig(max_tokens=n)).with_prompt(prompt)
    return [int(t[0]) for t in gen]


@pytest.fixture
def model():
    rng = np.random.default_rng(0)
    return Model(
        build_decoder_graph(rng),
        options=ModelOptions(enable_optimization=False),
    )


def test_backend_auto_selects_compiled(model):
    be = GraphBackend(model)
    assert be.mode == "compiled"


def test_compiled_matches_legacy_interpret(model):
    prompt = [3, 7, 1, 9]
    legacy = _generate(GraphBackend(model, mode="interpret"), prompt, 12)
    compiled = _generate(GraphBackend(model), prompt, 12)
    assert compiled == legacy


def test_compiled_bucket_growth_matches_legacy(model):
    """Crossing a cache bucket boundary (32 → 64) must stay token-exact."""
    prompt = [5, 2]
    legacy = _generate(GraphBackend(model, mode="interpret"), prompt, 40)
    compiled = _generate(GraphBackend(model), prompt, 40)
    assert compiled == legacy


def test_compiled_program_count_is_per_bucket(model):
    """40 decode steps must compile O(buckets) XLA programs, not O(steps) —
    the whole point vs the reference's per-shape replanning."""
    be = GraphBackend(model)
    _generate(be, [5, 2], 40)
    # prefill (bucket 32) + decode at bucket 32 + decode at bucket 64
    assert len(model._compiled) <= 3


def test_multi_turn_append_prompt(model):
    """append_prompt feeds a >1-token chunk through the decode path (the
    reference's multi-turn chat flow, generator.rs:474)."""
    be_a = GraphBackend(model)
    gen = Generator(be_a, GeneratorConfig(max_tokens=4)).with_prompt([3, 7])
    first = [int(t[0]) for t in gen]
    gen.append_prompt([11, 4])
    gen.config = GeneratorConfig(max_tokens=4)
    gen._emitted = 0
    second = [int(t[0]) for t in gen]

    be_b = GraphBackend(model, mode="interpret")
    gen_b = Generator(be_b, GeneratorConfig(max_tokens=4)).with_prompt([3, 7])
    first_b = [int(t[0]) for t in gen_b]
    gen_b.append_prompt([11, 4])
    gen_b.config = GeneratorConfig(max_tokens=4)
    gen_b._emitted = 0
    second_b = [int(t[0]) for t in gen_b]
    assert (first, second) == (first_b, second_b)


def test_partial_run_returns_frontier_values():
    rng = np.random.default_rng(1)
    model = Model(
        build_decoder_graph(rng, with_bias_input=True),
        options=ModelOptions(enable_optimization=False),
    )
    bias = np.linspace(-1, 1, V).astype(np.float32)
    resolved = model.partial_run({"logit_bias_in": bias}, ["logits_biased"])
    vals = {model.graph.node_name(nid): v for nid, v in resolved}
    assert "scaled_bias_out" in vals  # the hoisted frontier value
    np.testing.assert_allclose(np.asarray(vals["scaled_bias_out"]), bias * 2.0)


def test_hoisting_reduces_per_step_ops_and_stays_exact():
    rng = np.random.default_rng(1)
    model = Model(
        build_decoder_graph(rng, with_bias_input=True),
        options=ModelOptions(enable_optimization=False),
    )
    bias = np.linspace(-1, 1, V).astype(np.float32)

    hoisted_be = GraphBackend(model, constant_inputs={"logit_bias_in": bias})
    toks = _generate(hoisted_be, [3, 7, 1], 8)
    assert hoisted_be._hoisted  # the invariant subgraph was hoisted

    # Un-hoisted reference: bias fed per step as a plain input.
    plain_be = GraphBackend(model, mode="interpret")
    plain_be.constant_inputs = {"logit_bias_in": bias}
    plain_be._hoisted = {}  # disable the hoist, keep the input
    toks_plain = _generate(plain_be, [3, 7, 1], 8)
    assert toks == toks_plain

    # Fewer ops per step once the frontier value arrives as an input.
    g = model.graph
    out_id = model.node_id("logits_biased")
    full_plan = g.create_plan(model.input_ids, [out_id])
    hoist_id = model.node_id("scaled_bias_out")
    hoisted_plan = g.create_plan(model.input_ids + [hoist_id], [out_id])
    assert len(hoisted_plan) < len(full_plan)


def build_decoder_graph_no_posids(rng, kv_shape_positions=False):
    """HF-Optimum no-position-ids export pattern: the graph takes only
    input_ids/attention_mask/past_* and derives every position from
    cumsum(attention_mask)-1 — query positions via shape-math Slice of the
    cumsum tail (Shape ops fold at trace time). With ``kv_shape_positions``
    a Shape op reads the past-KV input instead (bucket-length-sensitive),
    which must keep the backend on the interpret path."""
    g = Graph()
    ids = g.add_value("input_ids", ["batch", None])
    mask = g.add_value("attention_mask", ["batch", None])
    pk_in = g.add_value("past_key_values.0.key", ["batch", None, D])
    pv_in = g.add_value("past_key_values.0.value", ["batch", None, D])
    g.inputs = [ids, mask, pk_in, pv_in]

    def c(name, arr):
        return g.add_constant(name, np.asarray(arr))

    wte = c("wte", rng.standard_normal((V, D)).astype(np.float32) * 0.5)
    wpe = c("wpe", rng.standard_normal((MAXPOS, D)).astype(np.float32) * 0.1)
    wq = c("wq", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wk = c("wk", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wv = c("wv", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wo = c("wo", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wlm = c("wlm", rng.standard_normal((D, V)).astype(np.float32) * 0.5)

    # kpos = cumsum(mask) - 1 over the full (padded) column axis.
    mf = g.add_simple_op("Cast", [mask], {"to": "float"}, name="mf")
    one_ax = c("one_ax", np.int32(1))
    csum = g.add_simple_op("CumSum", [mf, one_ax], name="csum")
    onef = c("onef", np.float32(1.0))
    kpos = g.add_simple_op("Sub", [csum, onef], name="kpos")

    # Query positions = the cumsum tail at the t new columns, via shape math:
    # Slice(kpos, S - t, S, axis 1) with S/t read from Shape ops.
    shp_src = pk_in if kv_shape_positions else ids
    shp_ids = g.add_simple_op("Shape", [shp_src], name="shp_ids")
    idx1 = c("idx1", np.int32(1))
    t_dim = g.add_simple_op("Gather", [shp_ids, idx1], {"axis": 0}, name="t_dim")
    shp_mask = g.add_simple_op("Shape", [mask], name="shp_mask")
    s_dim = g.add_simple_op("Gather", [shp_mask, idx1], {"axis": 0}, name="s_dim")
    start0 = g.add_simple_op("Sub", [s_dim, t_dim], name="start0")
    ax0 = c("ax0", np.int32([0]))
    start = g.add_simple_op("Unsqueeze", [start0, ax0], name="start")
    end = g.add_simple_op("Unsqueeze", [s_dim, ax0], name="end")
    ax_seq = c("ax_seq", np.int32([1]))
    qposf = g.add_simple_op("Slice", [kpos, start, end, ax_seq], name="qposf")
    qpos_i = g.add_simple_op("Cast", [qposf], {"to": "int32"}, name="qpos_i")

    emb = g.add_simple_op("Gather", [wte, ids], {"axis": 0}, name="emb")
    pemb = g.add_simple_op("Gather", [wpe, qpos_i], {"axis": 0}, name="pemb")
    x = g.add_simple_op("Add", [emb, pemb], name="x")

    q = g.add_simple_op("MatMul", [x, wq], name="q")
    k = g.add_simple_op("MatMul", [x, wk], name="k")
    v = g.add_simple_op("MatMul", [x, wv], name="v")

    pk = g.add_value("present.0.key")
    g.add_operator("concat_k", "Concat", {"axis": 1}, [pk_in, k], [pk])
    pv = g.add_value("present.0.value")
    g.add_operator("concat_v", "Concat", {"axis": 1}, [pv_in, v], [pv])

    pk_t = g.add_simple_op("Transpose", [pk], {"perm": [0, 2, 1]}, name="pk_t")
    raw = g.add_simple_op("MatMul", [q, pk_t], name="scores_raw")
    scale = c("scale", np.float32(1.0 / np.sqrt(D)))
    scores = g.add_simple_op("Mul", [raw, scale], name="scores")

    ax1 = c("ax1", np.int32([1]))
    ax2 = c("ax2", np.int32([2]))
    kpos_b = g.add_simple_op("Unsqueeze", [kpos, ax1], name="kpos_b")  # [B,1,S]
    qpos_b = g.add_simple_op("Unsqueeze", [qposf, ax2], name="qpos_b")  # [B,T,1]
    causal = g.add_simple_op("LessOrEqual", [kpos_b, qpos_b], name="causal")
    mask_b = g.add_simple_op("Unsqueeze", [mask, ax1], name="mask_b")  # [B,1,S]
    valid = g.add_simple_op("Mul", [causal, mask_b], name="valid")
    validf = g.add_simple_op("Cast", [valid], {"to": "float"}, name="validf")
    vm1 = g.add_simple_op("Sub", [validf, onef], name="vm1")
    big = c("big", np.float32(1e9))
    bias = g.add_simple_op("Mul", [vm1, big], name="bias")
    masked = g.add_simple_op("Add", [scores, bias], name="masked")

    probs = g.add_simple_op("Softmax", [masked], {"axis": -1}, name="probs")
    ctx = g.add_simple_op("MatMul", [probs, pv], name="ctx")
    proj = g.add_simple_op("MatMul", [ctx, wo], name="proj")
    h = g.add_simple_op("Add", [proj, x], name="h")
    logits = g.add_value("logits")
    g.add_operator("lm", "MatMul", {}, [h, wlm], [logits])

    g.outputs = [logits, pk, pv]
    return g


def test_no_posids_cumsum_graph_auto_compiles():
    """VERDICT r3 item 9: a mask-honoring graph WITHOUT a position_ids input
    (positions from cumsum(attention_mask)) — previously an interpret-only
    fallback — now auto-selects the compiled bucketed path and stays
    token-exact across a bucket boundary."""
    rng = np.random.default_rng(4)
    model = Model(
        build_decoder_graph_no_posids(rng),
        options=ModelOptions(enable_optimization=False),
    )
    be = GraphBackend(model)
    assert be.mode == "compiled"
    prompt = [3, 7, 1, 9]
    compiled = _generate(be, prompt, 40)
    legacy = _generate(GraphBackend(model, mode="interpret"), prompt, 40)
    assert compiled == legacy


def test_kv_shape_positions_stay_interpret_and_warn():
    """A graph whose shape math reads the past-KV input is bucket-length-
    sensitive: auto mode must stay on interpret and say so loudly."""
    rng = np.random.default_rng(4)
    model = Model(
        build_decoder_graph_no_posids(rng, kv_shape_positions=True),
        options=ModelOptions(enable_optimization=False),
    )
    with pytest.warns(UserWarning, match="EXACT-SHAPE INTERPRET"):
        be = GraphBackend(model)
    assert be.mode == "interpret"


def test_maskless_graph_warns_with_reason():
    rng = np.random.default_rng(5)
    g = Graph()
    ids = g.add_value("input_ids", ["batch", None])
    pk_in = g.add_value("past_key_values.0.key", ["batch", None, D])
    pv_in = g.add_value("past_key_values.0.value", ["batch", None, D])
    g.inputs = [ids, pk_in, pv_in]
    wte = g.add_constant("wte", rng.standard_normal((V, D)).astype(np.float32))
    wlm = g.add_constant("wlm", rng.standard_normal((D, V)).astype(np.float32))
    emb = g.add_simple_op("Gather", [wte, ids], {"axis": 0}, name="emb")
    pk = g.add_value("present.0.key")
    g.add_operator("concat_k", "Concat", {"axis": 1}, [pk_in, emb], [pk])
    pv = g.add_value("present.0.value")
    g.add_operator("concat_v", "Concat", {"axis": 1}, [pv_in, emb], [pv])
    logits = g.add_value("logits")
    g.add_operator("lm", "MatMul", {}, [emb, wlm], [logits])
    g.outputs = [logits, pk, pv]
    model = Model(g, options=ModelOptions(enable_optimization=False))
    with pytest.warns(UserWarning, match="no attention_mask input"):
        be = GraphBackend(model)
    assert be.mode == "interpret"
    # explicit modes never warn
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("error")
        GraphBackend(model, mode="interpret")


ENC_N = 6  # encoder memory length


def build_encdec_decoder_graph(rng, enc_n=None, d=None, v=None):
    """Whisper/TrOCR-class DECODER graph (HF-Optimum conventions): masked
    self-attention over growing past_key_values.0.decoder.* + cross-attention
    recomputed from the encoder_hidden_states input each call — the cross-KV
    projections hang entirely off a loop-invariant input, so GraphBackend's
    partial_run hoist (≙ generator.rs:533-544) removes them from the
    per-step program."""
    ENC_N, D, V = enc_n or globals()["ENC_N"], d or globals()["D"], v or globals()["V"]
    g = Graph()
    ids = g.add_value("input_ids", ["batch", None])
    mask = g.add_value("attention_mask", ["batch", None])
    pos = g.add_value("position_ids", ["batch", None])
    enc = g.add_value("encoder_hidden_states", ["batch", ENC_N, D])
    pk_in = g.add_value("past_key_values.0.decoder.key", ["batch", None, D])
    pv_in = g.add_value("past_key_values.0.decoder.value", ["batch", None, D])
    g.inputs = [ids, mask, pos, enc, pk_in, pv_in]

    def c(name, arr):
        return g.add_constant(name, np.asarray(arr))

    wte = c("wte", rng.standard_normal((V, D)).astype(np.float32) * 0.5)
    wpe = c("wpe", rng.standard_normal((MAXPOS, D)).astype(np.float32) * 0.1)
    wq = c("wq", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wk = c("wk", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wv = c("wv", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wq2 = c("wq2", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wk2 = c("wk2", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wv2 = c("wv2", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wlm = c("wlm", rng.standard_normal((D, V)).astype(np.float32) * 0.5)

    emb = g.add_simple_op("Gather", [wte, ids], {"axis": 0}, name="emb")
    pemb = g.add_simple_op("Gather", [wpe, pos], {"axis": 0}, name="pemb")
    x = g.add_simple_op("Add", [emb, pemb], name="x")

    # masked self-attention over the growing decoder cache
    q = g.add_simple_op("MatMul", [x, wq], name="q")
    k = g.add_simple_op("MatMul", [x, wk], name="k")
    v = g.add_simple_op("MatMul", [x, wv], name="v")
    pk = g.add_value("present.0.decoder.key")
    g.add_operator("concat_k", "Concat", {"axis": 1}, [pk_in, k], [pk])
    pv = g.add_value("present.0.decoder.value")
    g.add_operator("concat_v", "Concat", {"axis": 1}, [pv_in, v], [pv])
    pk_t = g.add_simple_op("Transpose", [pk], {"perm": [0, 2, 1]}, name="pk_t")
    raw = g.add_simple_op("MatMul", [q, pk_t], name="scores_raw")
    scale = c("scale", np.float32(1.0 / np.sqrt(D)))
    scores = g.add_simple_op("Mul", [raw, scale], name="scores")
    mf = g.add_simple_op("Cast", [mask], {"to": "float"}, name="mf")
    one_ax = c("one_ax", np.int32(1))
    csum = g.add_simple_op("CumSum", [mf, one_ax], name="csum")
    onef = c("onef", np.float32(1.0))
    kpos = g.add_simple_op("Sub", [csum, onef], name="kpos")
    qposf = g.add_simple_op("Cast", [pos], {"to": "float"}, name="qposf")
    ax1 = c("ax1", np.int32([1]))
    ax2 = c("ax2", np.int32([2]))
    kpos_b = g.add_simple_op("Unsqueeze", [kpos, ax1], name="kpos_b")
    qpos_b = g.add_simple_op("Unsqueeze", [qposf, ax2], name="qpos_b")
    causal = g.add_simple_op("LessOrEqual", [kpos_b, qpos_b], name="causal")
    mask_b = g.add_simple_op("Unsqueeze", [mask, ax1], name="mask_b")
    valid = g.add_simple_op("Mul", [causal, mask_b], name="valid")
    validf = g.add_simple_op("Cast", [valid], {"to": "float"}, name="validf")
    vm1 = g.add_simple_op("Sub", [validf, onef], name="vm1")
    big = c("big", np.float32(1e9))
    sbias = g.add_simple_op("Mul", [vm1, big], name="sbias")
    masked = g.add_simple_op("Add", [scores, sbias], name="masked")
    probs = g.add_simple_op("Softmax", [masked], {"axis": -1}, name="probs")
    ctx = g.add_simple_op("MatMul", [probs, pv], name="ctx")
    h1 = g.add_simple_op("Add", [ctx, x], name="h1")

    # cross-attention: K/V from the loop-invariant encoder states (hoisted)
    q2 = g.add_simple_op("MatMul", [h1, wq2], name="q2")
    k_enc = g.add_simple_op("MatMul", [enc, wk2], name="k_enc")
    v_enc = g.add_simple_op("MatMul", [enc, wv2], name="v_enc")
    k_enc_t = g.add_simple_op("Transpose", [k_enc], {"perm": [0, 2, 1]}, name="k_enc_t")
    raw2 = g.add_simple_op("MatMul", [q2, k_enc_t], name="raw2")
    scores2 = g.add_simple_op("Mul", [raw2, scale], name="scores2")
    probs2 = g.add_simple_op("Softmax", [scores2], {"axis": -1}, name="probs2")
    ctx2 = g.add_simple_op("MatMul", [probs2, v_enc], name="ctx2")
    h2 = g.add_simple_op("Add", [ctx2, h1], name="h2")

    logits = g.add_value("logits")
    g.add_operator("lm", "MatMul", {}, [h2, wlm], [logits])
    g.outputs = [logits, pk, pv]
    return g


def _encdec_generate(model, enc_states, prompt, n, mode=None):
    be = GraphBackend(
        model, mode=mode, constant_inputs={"encoder_hidden_states": enc_states}
    )
    return _generate(be, prompt, n), be


def test_encdec_decoder_compiled_matches_interpret():
    """Enc-dec decoder graphs (growing self-KV + constant encoder memory)
    run the COMPILED bucketed path token-exactly, with the cross-attention
    projections hoisted out of the per-step program."""
    rng = np.random.default_rng(7)
    model = Model(
        build_encdec_decoder_graph(rng),
        options=ModelOptions(enable_optimization=False),
    )
    enc_states = rng.standard_normal((1, ENC_N, D)).astype(np.float32) * 0.5

    compiled, be = _encdec_generate(model, enc_states, [2, 5, 1], 40)
    legacy, _ = _encdec_generate(model, enc_states, [2, 5, 1], 40, mode="interpret")
    assert be.mode == "compiled"
    assert compiled == legacy
    assert be._hoisted  # k_enc/v_enc left the per-step program
    hoisted_names = {model.graph.node_name(nid) for nid in be._hoisted}
    assert any("k_enc" in (n or "") for n in hoisted_names), hoisted_names


def build_merged_encdec_graph(rng):
    """Optimum MERGED-export pattern: static cross-attn caches
    (past_key_values.0.encoder.*) + a use_cache_branch selector choosing
    between computing them from encoder_hidden_states (first call) and
    reusing the past inputs (If op ≙ the merged models' branch,
    src/ops/control_flow.rs:30)."""
    g = Graph()
    ids = g.add_value("input_ids", ["batch", None])
    enc = g.add_value("encoder_hidden_states", ["batch", ENC_N, D])
    pek_in = g.add_value("past_key_values.0.encoder.key", ["batch", None, D])
    pev_in = g.add_value("past_key_values.0.encoder.value", ["batch", None, D])
    pdk_in = g.add_value("past_key_values.0.decoder.key", ["batch", None, D])
    pdv_in = g.add_value("past_key_values.0.decoder.value", ["batch", None, D])
    branch = g.add_value("use_cache_branch", [1])
    g.inputs = [ids, enc, pek_in, pev_in, pdk_in, pdv_in, branch]

    def c(name, arr):
        return g.add_constant(name, np.asarray(arr))

    wte = c("wte", rng.standard_normal((V, D)).astype(np.float32) * 0.5)
    wk2 = c("wk2", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wv2 = c("wv2", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wk1 = c("wk1", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wv1 = c("wv1", rng.standard_normal((D, D)).astype(np.float32) * 0.3)
    wlm = c("wlm", rng.standard_normal((D, V)).astype(np.float32) * 0.5)

    x = g.add_simple_op("Gather", [wte, ids], {"axis": 0}, name="x")

    # If(use_cache_branch): reuse past encoder KV, else compute from states.
    # Subgraphs capture outer values BY NAME (≙ CaptureEnv closure semantics).
    then_g = Graph()
    tpk = then_g.add_value("past_key_values.0.encoder.key")
    tpv = then_g.add_value("past_key_values.0.encoder.value")
    then_g.captures = [tpk, tpv]
    tk = then_g.add_simple_op("Identity", [tpk], name="idk")
    tv = then_g.add_simple_op("Identity", [tpv], name="idv")
    then_g.outputs = [tk, tv]
    else_g = Graph()
    e_enc = else_g.add_value("encoder_hidden_states")
    e_wk2 = else_g.add_value("wk2")
    e_wv2 = else_g.add_value("wv2")
    else_g.captures = [e_enc, e_wk2, e_wv2]
    ek = else_g.add_simple_op("MatMul", [e_enc, e_wk2], name="mk")
    ev = else_g.add_simple_op("MatMul", [e_enc, e_wv2], name="mv")
    else_g.outputs = [ek, ev]
    pek = g.add_value("present.0.encoder.key")
    pev = g.add_value("present.0.encoder.value")
    g.add_operator(
        "cache_if", "If", {"then_branch": then_g, "else_branch": else_g},
        [branch], [pek, pev],
    )

    # decoder self KV grows as usual
    k1 = g.add_simple_op("MatMul", [x, wk1], name="k1")
    v1 = g.add_simple_op("MatMul", [x, wv1], name="v1")
    pdk = g.add_value("present.0.decoder.key")
    g.add_operator("ck", "Concat", {"axis": 1}, [pdk_in, k1], [pdk])
    pdv = g.add_value("present.0.decoder.value")
    g.add_operator("cv", "Concat", {"axis": 1}, [pdv_in, v1], [pdv])

    # cross-attention over the (selected) encoder KV
    pek_t = g.add_simple_op("Transpose", [pek], {"perm": [0, 2, 1]}, name="pek_t")
    raw2 = g.add_simple_op("MatMul", [x, pek_t], name="raw2")
    probs2 = g.add_simple_op("Softmax", [raw2], {"axis": -1}, name="probs2")
    ctx2 = g.add_simple_op("MatMul", [probs2, pev], name="ctx2")
    h = g.add_simple_op("Add", [ctx2, x], name="h")
    logits = g.add_value("logits")
    g.add_operator("lm", "MatMul", {}, [h, wlm], [logits])
    g.outputs = [logits, pek, pev, pdk, pdv]
    return g


def test_merged_export_static_cache_interpret():
    """The merged-export family: encoder caches computed once (branch 0),
    reused thereafter (branch 1, fed automatically); the backend preserves
    .decoder/.encoder cache names instead of collapsing them."""
    rng = np.random.default_rng(8)
    import warnings as w

    model = Model(
        build_merged_encdec_graph(rng),
        options=ModelOptions(enable_optimization=False),
    )
    enc_states = rng.standard_normal((1, ENC_N, D)).astype(np.float32) * 0.5
    with w.catch_warnings():
        w.simplefilter("ignore")  # maskless → interpret warning, expected
        be = GraphBackend(
            model, constant_inputs={"encoder_hidden_states": enc_states}
        )
    assert be.mode == "interpret"
    assert be.static_cache == {
        "past_key_values.0.encoder.key",
        "past_key_values.0.encoder.value",
    }
    toks = _generate(be, [3, 1], 8)
    assert len(toks) == 8
    # the stored encoder cache equals the branch-0 projection exactly
    wk2 = None
    for node in model.graph.nodes:
        if getattr(node, "name", None) == "wk2":
            wk2 = node.value
    ref = enc_states @ wk2
    np.testing.assert_allclose(
        np.asarray(be.cache["past_key_values.0.encoder.key"]), ref, rtol=1e-5
    )
    # decoder cache grew to prompt + generated - 1 fed tokens
    assert be.cache["past_key_values.0.decoder.key"].shape[1] == 2 + 7


def build_merged_decoder_graph(rng):
    """Decoder-only MERGED-export pattern: the mask-honoring decoder graph
    plus a ``use_cache_branch`` selector consumed by an If (first call = 0
    → else branch, later calls = 1 → then branch). The branches add
    different constants to the logits, so a backend that fails to feed the
    selector crashes, and one feeding a wrong constant sequence diverges
    from the legacy path."""
    g = build_decoder_graph(rng)
    lid = g.get_node_id("logits")
    g.nodes[lid].name = "logits_pre"
    ucb = g.add_value("use_cache_branch", [1])
    g.inputs.append(ucb)

    then_g = Graph()
    tz = then_g.add_constant("tz", np.float32(0.0))
    tout = then_g.add_simple_op("Identity", [tz], name="tid")
    then_g.outputs = [tout]
    else_g = Graph()
    ez = else_g.add_constant("ez", np.float32(0.5))
    eout = else_g.add_simple_op("Identity", [ez], name="eid")
    else_g.outputs = [eout]
    sel = g.add_value("ucb_bias")
    g.add_operator(
        "ucb_if", "If", {"then_branch": then_g, "else_branch": else_g},
        [ucb], [sel],
    )
    logits = g.add_value("logits")
    g.add_operator("add_ucb", "Add", {}, [lid, sel], [logits])
    g.outputs = [logits] + g.outputs[1:]
    return g


def test_merged_decoder_use_cache_branch_compiled():
    """A merged export WITH attention_mask/position_ids must run on the
    compiled bucketed path — use_cache_branch fed 0 at prefill and 1 on
    every decode step — and match the legacy interpret path exactly."""
    rng = np.random.default_rng(11)
    model = Model(
        build_merged_decoder_graph(rng),
        options=ModelOptions(enable_optimization=False),
    )
    be = GraphBackend(model)
    assert be.mode == "compiled"
    toks_c = _generate(be, [3, 1, 4], 10)

    be_i = GraphBackend(model, mode="interpret")
    toks_i = _generate(be_i, [3, 1, 4], 10)
    assert toks_c == toks_i
