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
