"""Optimizer pass tests (reference: src/optimize.rs tests + pattern_matcher)."""

import numpy as np
import pytest

from rten_tpu.graph import ConstantNode, Graph, OperatorNode
from rten_tpu.optimize.pattern_matcher import Const, Op, Sym, match
from rten_tpu.runtime.session import Model, ModelOptions, RunOptions


def test_pattern_matcher_basic():
    g = Graph()
    x = g.add_value("x")
    c = g.add_constant("two", np.float32(2.0))
    out = g.add_simple_op("Mul", [x, c], name="m")
    pat = Op("Mul", (Sym("a"), Const(2.0, name="two")))
    m = match(g, out, pat)
    assert m and m["a"] == x and m["two"] == c


def test_pattern_matcher_commutative():
    g = Graph()
    x = g.add_value("x")
    c = g.add_constant("two", np.float32(2.0))
    out = g.add_simple_op("Mul", [c, x], name="m")  # const first
    pat = Op("Mul", (Sym("a"), Const(2.0)))
    m = match(g, out, pat)
    assert m and m["a"] == x


def test_pattern_matcher_sym_consistency():
    g = Graph()
    x = g.add_value("x")
    y = g.add_value("y")
    out = g.add_simple_op("Add", [x, y], name="a")
    # x+y does NOT match p+p
    assert match(g, out, Op("Add", (Sym("p"), Sym("p")))) is None
    out2 = g.add_simple_op("Mul", [x, x], name="sq")
    assert match(g, out2, Op("Mul", (Sym("p"), Sym("p")))) is not None


def build_layernorm_graph(with_affine=True, square_via="pow"):
    rng = np.random.default_rng(0)
    g = Graph()
    x = g.add_value("x")
    mean = g.add_simple_op("ReduceMean", [x], {"axes": [-1], "keep_dims": True}, name="mean")
    d = g.add_simple_op("Sub", [x, mean], name="dev")
    if square_via == "pow":
        two = g.add_constant("two", np.float32(2.0))
        sq = g.add_simple_op("Pow", [d, two], name="sq")
    else:
        sq = g.add_simple_op("Mul", [d, d], name="sq")
    var = g.add_simple_op("ReduceMean", [sq], {"axes": [-1], "keep_dims": True}, name="var")
    eps = g.add_constant("eps", np.float32(1e-5))
    ve = g.add_simple_op("Add", [var, eps], name="var_eps")
    std = g.add_simple_op("Sqrt", [ve], name="std")
    norm = g.add_simple_op("Div", [d, std], name="norm")
    out = norm
    scale_v = rng.standard_normal(8).astype(np.float32)
    bias_v = rng.standard_normal(8).astype(np.float32)
    if with_affine:
        scale = g.add_constant("scale", scale_v)
        m = g.add_simple_op("Mul", [norm, scale], name="scaled")
        bias = g.add_constant("bias", bias_v)
        out = g.add_simple_op("Add", [m, bias], name="shifted")
    g.inputs, g.outputs = [x], [out]
    return g, scale_v, bias_v


@pytest.mark.parametrize("square_via", ["pow", "mul"])
def test_layer_norm_fusion(square_via):
    g, scale_v, bias_v = build_layernorm_graph(True, square_via)
    model = Model(g)
    ops = [op.op_type for _, op in model.graph.operator_nodes()]
    assert "LayerNormalization" in ops
    x = np.random.default_rng(1).standard_normal((2, 5, 8)).astype(np.float32)
    (out,) = model.run([x], opts=RunOptions(mode="interpret"))
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mean) / np.sqrt(var + 1e-5) * scale_v + bias_v
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_layer_norm_fusion_preserves_numerics_vs_unfused():
    g1, _, _ = build_layernorm_graph(True)
    g2, _, _ = build_layernorm_graph(True)
    fused = Model(g1)
    unfused = Model(g2, options=ModelOptions(enable_optimization=False))
    x = np.random.default_rng(2).standard_normal((1, 4, 8)).astype(np.float32)
    (a,) = fused.run([x], opts=RunOptions(mode="interpret"))
    (b,) = unfused.run([x], opts=RunOptions(mode="interpret"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def _op_types(graph):
    return [op.op_type for _, op in graph.operator_nodes()]


def test_transpose_absorbed_into_matmul():
    """MatMul(Transpose(a), w) → MatMul with perm_a (reference:
    src/optimize.rs:388 fuse_transpose / FusedTranspose)."""
    rng = np.random.default_rng(0)
    g = Graph()
    a = g.add_value("a")  # runtime input [8, 4]
    w = g.add_constant("w", rng.standard_normal((8, 3)).astype(np.float32))
    at = g.add_simple_op("Transpose", [a], name="at")  # default perm: reverse
    out = g.add_simple_op("MatMul", [at, w], name="mm")
    g.inputs, g.outputs = [a], [out]

    model = Model(g)
    ops = _op_types(model.graph)
    assert "Transpose" not in ops and ops.count("MatMul") == 1
    mm = next(op for _, op in model.graph.operator_nodes() if op.op_type == "MatMul")
    assert mm.attrs["perm_a"] == "reverse"

    av = rng.standard_normal((8, 4)).astype(np.float32)
    ref = av.T @ np.asarray(model.graph.nodes[w].value)
    for mode in ("interpret", "compile"):
        (got,) = model.run([av], opts=RunOptions(mode=mode))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_transpose_absorbed_explicit_perm_batched():
    rng = np.random.default_rng(1)
    g = Graph()
    a = g.add_value("a")  # [2, 3, 4]
    w = g.add_constant("w", rng.standard_normal((3, 5)).astype(np.float32))
    at = g.add_simple_op("Transpose", [a], {"perm": [0, 2, 1]}, name="at")
    out = g.add_simple_op("MatMul", [at, w], name="mm")
    g.inputs, g.outputs = [a], [out]

    model = Model(g)
    assert "Transpose" not in _op_types(model.graph)
    mm = next(op for _, op in model.graph.operator_nodes() if op.op_type == "MatMul")
    assert mm.attrs["perm_a"] == [0, 2, 1]

    av = rng.standard_normal((2, 3, 4)).astype(np.float32)
    ref = np.transpose(av, (0, 2, 1)) @ np.asarray(model.graph.nodes[w].value)
    (got,) = model.run([av], opts=RunOptions(mode="interpret"))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_transpose_with_other_consumers_not_absorbed():
    """A Transpose whose output is also consumed elsewhere (or is a graph
    output) must stay — absorption requires a sole consumer."""
    rng = np.random.default_rng(2)
    g = Graph()
    a = g.add_value("a")
    w = g.add_constant("w", rng.standard_normal((8, 3)).astype(np.float32))
    at = g.add_simple_op("Transpose", [a], name="at")
    mm = g.add_simple_op("MatMul", [at, w], name="mm")
    g.inputs, g.outputs = [a], [mm, at]  # transpose output escapes
    model = Model(g)
    assert "Transpose" in _op_types(model.graph)


def test_captured_constant_becomes_subgraph_constant():
    """An If-branch capture that resolves to a parent CONSTANT becomes a
    local constant of the branch (reference: src/optimize.rs:320), so the
    branch keeps only its runtime captures and const expressions fold."""
    then_g = Graph()
    tx = then_g.add_value("x")
    tw = then_g.add_value("w")  # capture resolving to parent constant
    then_g.captures = [tx, tw]
    t_out = then_g.add_simple_op("Mul", [tx, tw], name="then_mul")
    then_g.outputs = [t_out]

    else_g = Graph()
    ex = else_g.add_value("x")
    else_g.captures = [ex]
    e_out = else_g.add_simple_op("Neg", [ex], name="else_neg")
    else_g.outputs = [e_out]

    g = Graph()
    cond = g.add_value("cond")
    x = g.add_value("x")
    g.add_constant("w", np.array([2.0, 3.0], np.float32))
    out = g.add_value("out")
    g.add_operator(
        "if", "If", {"then_branch": then_g, "else_branch": else_g}, [cond], [out]
    )
    g.inputs, g.outputs = [cond, x], [out]

    model = Model(g)
    sub = next(op for _, op in model.graph.operator_nodes() if op.op_type == "If")
    tb = sub.attrs["then_branch"]
    # Only the runtime capture remains; "w" is now a branch-local constant.
    assert [tb.node_name(c) for c in tb.captures] == ["x"]
    assert isinstance(tb.nodes[tb.get_node_id("w")], ConstantNode)

    xv = np.array([1.0, 2.0], np.float32)
    (out_v,) = model.run({"cond": np.int32(1), "x": xv}, opts=RunOptions(mode="interpret"))
    np.testing.assert_allclose(np.asarray(out_v), xv * np.array([2.0, 3.0]))
    (out_v,) = model.run({"cond": np.int32(0), "x": xv}, opts=RunOptions(mode="interpret"))
    np.testing.assert_allclose(np.asarray(out_v), -xv)


def test_captured_constant_enables_subgraph_folding():
    """Once the capture is a constant, const-only expressions inside the
    branch fold at load time (the reason the reference runs this pass first)."""
    then_g = Graph()
    tw = then_g.add_value("w")
    then_g.captures = [tw]
    doubled = then_g.add_simple_op(
        "Add", [tw, tw], name="w2"
    )  # all-const after conversion
    then_g.outputs = [doubled]

    else_g = Graph()
    ez = else_g.add_constant("z", np.zeros(2, np.float32))
    else_g.outputs = [ez]

    g = Graph()
    cond = g.add_value("cond")
    g.add_constant("w", np.array([2.0, 3.0], np.float32))
    out = g.add_value("out")
    g.add_operator(
        "if", "If", {"then_branch": then_g, "else_branch": else_g}, [cond], [out]
    )
    g.inputs, g.outputs = [cond], [out]

    model = Model(g)
    tb = next(op for _, op in model.graph.operator_nodes() if op.op_type == "If").attrs[
        "then_branch"
    ]
    assert tb.captures == []
    assert _op_types(tb) == []  # Add folded away
    (out_v,) = model.run({"cond": np.int32(1)}, opts=RunOptions(mode="interpret"))
    np.testing.assert_allclose(np.asarray(out_v), [4.0, 6.0])


def test_quant_fusion_not_constant_folded():
    """The dequantized f32 weights must never be materialized at load time."""
    from rten_tpu.optimize.quantize import quantize_graph_int8

    rng = np.random.default_rng(0)
    g = Graph()
    x = g.add_value("x")
    w = g.add_constant("w", rng.standard_normal((256, 128)).astype(np.float32))
    out = g.add_simple_op("MatMul", [x, w], name="mm")
    g.inputs, g.outputs = [x], [out]
    g, n = quantize_graph_int8(g)
    assert n == 1
    model = Model(g)
    # No f32 constant of the weight's size should exist post-optimization.
    big_f32 = [
        nd for nd in model.graph.nodes
        if isinstance(nd, ConstantNode)
        and nd.value.dtype == np.float32
        and nd.value.size >= 256 * 128
    ]
    assert not big_f32
    ops = [op.op_type for _, op in model.graph.operator_nodes()]
    assert "QuantMatMul" in ops
