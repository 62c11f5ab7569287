"""Executor + Model session tests (reference: src/graph.rs tests with mock
operators :1489+, plan caching :2256, partial_run; src/model.rs tests)."""

import numpy as np
import pytest

from rten_tpu.graph import Graph
from rten_tpu.runtime.session import Model, ModelOptions, RunOptions


def mlp_graph():
    """x @ w1 |> gelu @ w2 + b."""
    rng = np.random.default_rng(0)
    g = Graph()
    x = g.add_value("x", [1, 8])
    w1 = g.add_constant("w1", rng.standard_normal((8, 16)).astype(np.float32))
    w2 = g.add_constant("w2", rng.standard_normal((16, 4)).astype(np.float32))
    b = g.add_constant("b", rng.standard_normal((4,)).astype(np.float32))
    h = g.add_simple_op("MatMul", [x, w1], name="mm1")
    a = g.add_simple_op("Gelu", [h], name="act")
    out = g.add_simple_op("MatMul", [a, w2], name="mm2")
    out2 = g.add_simple_op("Add", [out, b], name="bias")
    g.inputs, g.outputs = [x], [out2]
    return g


def _ref_mlp(g, x):
    w1 = g.nodes[1].value
    w2 = g.nodes[2].value
    b = g.nodes[3].value
    import math

    h = x @ w1
    a = 0.5 * h * (1 + np.vectorize(math.erf)(h / math.sqrt(2)))
    return a @ w2 + b


@pytest.mark.parametrize("mode", ["interpret", "compile"])
def test_mlp_both_modes(mode, rng):
    g = mlp_graph()
    model = Model(g, options=ModelOptions(mode=mode))
    x = rng.standard_normal((1, 8)).astype(np.float32)
    (out,) = model.run([x])
    np.testing.assert_allclose(np.asarray(out), _ref_mlp(g, x), rtol=1e-4, atol=1e-5)


def test_modes_agree(rng):
    g = mlp_graph()
    model = Model(g)
    x = rng.standard_normal((1, 8)).astype(np.float32)
    (compiled,) = model.run([x], opts=RunOptions(mode="compile"))
    (interp,) = model.run([x], opts=RunOptions(mode="interpret"))
    np.testing.assert_allclose(np.asarray(compiled), np.asarray(interp), rtol=1e-5, atol=1e-6)


def test_run_one_and_named_inputs(rng):
    model = Model(mlp_graph())
    x = rng.standard_normal((1, 8)).astype(np.float32)
    out1 = model.run_one(x)
    (out2,) = model.run({"x": x})
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_intermediate_outputs(rng):
    model = Model(mlp_graph())
    x = rng.standard_normal((1, 8)).astype(np.float32)
    (h,) = model.run({"x": x}, outputs=["mm1_out"], opts=RunOptions(mode="interpret"))
    np.testing.assert_allclose(
        np.asarray(h), x @ model.graph.nodes[1].value, rtol=1e-5, atol=1e-6
    )


def test_shape_math_constant_folds_under_jit(rng):
    """Shape → Concat → Reshape chain must stay static at trace time."""
    g = Graph()
    x = g.add_value("x")
    shp = g.add_simple_op("Shape", [x], name="shape")
    minus1 = g.add_constant("m1", np.array([-1], dtype=np.int32))
    first = g.add_simple_op(
        "Slice", [shp,
                  g.add_constant("s0", np.array([0], np.int32)),
                  g.add_constant("s1", np.array([1], np.int32)),
                  g.add_constant("sa", np.array([0], np.int32))],
        name="first_dim",
    )
    newshape = g.add_simple_op("Concat", [first, minus1], {"axis": 0}, name="newshape")
    out = g.add_simple_op("Reshape", [x, newshape], name="reshape")
    g.inputs, g.outputs = [x], [out]
    model = Model(g, options=ModelOptions(mode="compile"))
    x_v = rng.standard_normal((2, 3, 4)).astype(np.float32)
    (out_v,) = model.run([x_v])
    assert np.asarray(out_v).shape == (2, 12)


def test_partial_run_hoists_invariant_subgraph(rng):
    """partial_run computes everything reachable from the provided inputs
    (reference: src/graph.rs:1237, used by rten-generate for loop-invariant
    hoisting)."""
    g = Graph()
    a = g.add_value("a")
    b = g.add_value("b")
    a2 = g.add_simple_op("Mul", [a, a], name="a_sq")
    both = g.add_simple_op("Add", [a2, b], name="sum")
    g.inputs, g.outputs = [a, b], [both]
    model = Model(g, options=ModelOptions(enable_optimization=False))
    av = np.array([2.0, 3.0], dtype=np.float32)
    resolved = model.partial_run({"a": av}, ["sum_out"])
    # Can't reach "sum" without b, but a_sq IS computable — it comes back as
    # a frontier value (reference partial_run returns the evaluation leaves
    # so generation loops can hoist them, generator.rs:533-544).
    assert [model.graph.node_name(nid) for nid, _ in resolved] == ["a_sq_out"]
    np.testing.assert_allclose(np.asarray(resolved[0][1]), av * av)
    resolved = model.partial_run({"a": av}, ["a_sq_out"])
    assert len(resolved) == 1
    np.testing.assert_allclose(np.asarray(resolved[0][1]), av * av)


def test_if_subgraph_interpret():
    then_g = Graph()
    tx = then_g.add_value("x")  # capture by name
    then_g.captures = [tx]
    t_out = then_g.add_simple_op("Mul", [tx, then_g.add_constant("two", np.float32(2.0))], name="then_mul")
    then_g.outputs = [t_out]

    else_g = Graph()
    ex = else_g.add_value("x")
    else_g.captures = [ex]
    e_out = else_g.add_simple_op("Neg", [ex], name="else_neg")
    else_g.outputs = [e_out]

    g = Graph()
    cond = g.add_value("cond")
    x = g.add_value("x")
    out = g.add_value("out")
    g.add_operator("if", "If", {"then_branch": then_g, "else_branch": else_g}, [cond], [out])
    g.inputs, g.outputs = [cond, x], [out]

    model = Model(g, options=ModelOptions(enable_optimization=False, mode="interpret"))
    xv = np.array([1.0, 2.0], dtype=np.float32)
    (out_v,) = model.run({"cond": np.int32(1), "x": xv})
    np.testing.assert_allclose(np.asarray(out_v), xv * 2)
    (out_v,) = model.run({"cond": np.int32(0), "x": xv})
    np.testing.assert_allclose(np.asarray(out_v), -xv)


def test_if_subgraph_compiled_with_traced_cond():
    then_g = Graph()
    tx = then_g.add_value("x")
    then_g.captures = [tx]
    t_out = then_g.add_simple_op("Mul", [tx, then_g.add_constant("two", np.float32(2.0))], name="then_mul")
    then_g.outputs = [t_out]

    else_g = Graph()
    ex = else_g.add_value("x")
    else_g.captures = [ex]
    e_out = else_g.add_simple_op("Neg", [ex], name="else_neg")
    else_g.outputs = [e_out]

    g = Graph()
    cond = g.add_value("cond")
    x = g.add_value("x")
    out = g.add_value("out")
    g.add_operator("if", "If", {"then_branch": then_g, "else_branch": else_g}, [cond], [out])
    g.inputs, g.outputs = [cond, x], [out]

    model = Model(g, options=ModelOptions(enable_optimization=False, mode="compile"))
    xv = np.array([1.0, 2.0], dtype=np.float32)
    (out_v,) = model.run({"cond": np.int32(1), "x": xv})
    np.testing.assert_allclose(np.asarray(out_v), xv * 2)
    (out_v,) = model.run({"cond": np.int32(0), "x": xv})
    np.testing.assert_allclose(np.asarray(out_v), -xv)


def test_constant_folding_at_load():
    g = Graph()
    x = g.add_value("x")
    c1 = g.add_constant("c1", np.array([1.0, 2.0], np.float32))
    c2 = g.add_constant("c2", np.array([3.0, 4.0], np.float32))
    folded = g.add_simple_op("Add", [c1, c2], name="c_sum")
    out = g.add_simple_op("Mul", [x, folded], name="out_mul")
    g.inputs, g.outputs = [x], [out]
    model = Model(g)  # optimization on
    from rten_tpu.graph import ConstantNode

    assert isinstance(model.graph.nodes[folded], ConstantNode)
    np.testing.assert_allclose(model.graph.nodes[folded].value, [4.0, 6.0])
    (out_v,) = model.run([np.array([2.0, 2.0], np.float32)])
    np.testing.assert_allclose(np.asarray(out_v), [8.0, 12.0])


def test_silu_fusion():
    g = Graph()
    x = g.add_value("x")
    sig = g.add_simple_op("Sigmoid", [x], name="sig")
    out = g.add_simple_op("Mul", [x, sig], name="mul")
    g.inputs, g.outputs = [x], [out]
    model = Model(g)
    ops = [op.op_type for _, op in model.graph.operator_nodes()]
    assert "Silu" in ops
    xv = np.array([-1.0, 0.5, 2.0], np.float32)
    (out_v,) = model.run([xv], opts=RunOptions(mode="interpret"))
    np.testing.assert_allclose(np.asarray(out_v), xv / (1 + np.exp(-xv)), rtol=1e-5, atol=1e-6)


def test_gelu_fusion():
    import math

    g = Graph()
    x = g.add_value("x")
    sqrt2 = g.add_constant("sqrt2", np.float32(math.sqrt(2.0)))
    one = g.add_constant("one", np.float32(1.0))
    half = g.add_constant("half", np.float32(0.5))
    d = g.add_simple_op("Div", [x, sqrt2], name="div")
    e = g.add_simple_op("Erf", [d], name="erf")
    a = g.add_simple_op("Add", [e, one], name="add1")
    m1 = g.add_simple_op("Mul", [x, a], name="mul_x")
    m2 = g.add_simple_op("Mul", [m1, half], name="mul_half")
    g.inputs, g.outputs = [x], [m2]
    model = Model(g)
    ops = [op.op_type for _, op in model.graph.operator_nodes()]
    assert "Gelu" in ops
    xv = np.linspace(-3, 3, 13).astype(np.float32)
    (out_v,) = model.run([xv], opts=RunOptions(mode="interpret"))
    ref = 0.5 * xv * (1 + np.vectorize(math.erf)(xv / math.sqrt(2)))
    np.testing.assert_allclose(np.asarray(out_v), ref, rtol=1e-4, atol=1e-6)


def test_timing_table(rng, capsys):
    model = Model(mlp_graph())
    x = rng.standard_normal((1, 8)).astype(np.float32)
    model.run([x], opts=RunOptions(timing=True))
    out = capsys.readouterr().out
    assert "MatMul" in out and "total" in out


def test_compile_cache_reused(rng):
    model = Model(mlp_graph())
    x = rng.standard_normal((1, 8)).astype(np.float32)
    model.run([x])
    assert len(model._compiled) == 1
    model.run([x])
    assert len(model._compiled) == 1
    # New shape → new entry (shape bucketing)
    model.run([rng.standard_normal((2, 8)).astype(np.float32)])
    assert len(model._compiled) == 2


def test_unregistered_op_rejected():
    g = Graph()
    x = g.add_value("x")
    out = g.add_simple_op("TotallyFakeOp", [x])
    g.inputs, g.outputs = [x], [out]
    from rten_tpu.ops.registry import OpError

    with pytest.raises(OpError):
        Model(g, options=ModelOptions(enable_optimization=False))


def test_allowed_ops_subset():
    from rten_tpu.ops.registry import OpError

    g = mlp_graph()
    with pytest.raises(OpError):
        Model(g, options=ModelOptions(allowed_ops={"MatMul"}, enable_optimization=False))


def test_total_params():
    g = mlp_graph()
    model = Model(g, options=ModelOptions(enable_optimization=False))
    assert model.total_params() == 8 * 16 + 16 * 4 + 4


def test_profiler_trace_and_step_timer(tmp_path):
    import jax.numpy as jnp

    import os

    from rten_tpu.runtime import profiler

    with profiler.trace(str(tmp_path / "trace")) as d:
        _ = jnp.ones(8) * 2
    assert os.path.isdir(d) and os.listdir(d)  # trace files written

    t = profiler.StepTimer()
    for _ in range(3):
        with t:
            pass
    assert len(t.times_s) == 3
    assert "steps" in t.summary()


def test_donated_buffer_reuse_raises():
    """The TPU-build analog of the reference's aliasing sanitizers
    (SURVEY.md §5): a donated cache buffer must not be silently readable
    after the jitted call — JAX deletes it and raises on reuse."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    @jax.jit
    def bump(c):
        return c + 1

    donated = jax.jit(lambda c: c.at[0].set(1.0), donate_argnums=(0,))
    buf = jnp.zeros(128)
    out = donated(buf)
    assert float(out[0]) == 1.0
    with _pytest.raises(Exception):
        _ = np.asarray(buf)  # deleted by donation


def test_rten_timing_env_var(monkeypatch, capsys):
    """RTEN_TIMING env turns on the per-op table (reference src/model.rs:642)."""
    import numpy as np

    from rten_tpu.graph import Graph
    from rten_tpu.format import save_rten
    from rten_tpu.runtime.session import Model

    g = Graph()
    x = g.add_value("x", shape=[2, 4], dtype="float32")
    w = g.add_constant("w", np.ones((4, 4), np.float32))
    y = g.add_simple_op("MatMul", [x, w], name="mm")
    g.inputs, g.outputs = [x], [y]
    m = Model.load(save_rten(g))

    monkeypatch.setenv("RTEN_TIMING", "sort=name")
    m.run([np.ones((2, 4), np.float32)])
    out = capsys.readouterr().out
    assert "MatMul" in out and "total" in out


def test_compile_mode_input_donation(rng):
    """RunOptions(donate_inputs=True) donates device-resident inputs to the
    compiled program (the analog of the reference's in-place input
    consumption, src/graph.rs:986-1032): results stay correct and the donated
    buffer is consumed; host (numpy) inputs are never donated."""
    import jax
    import jax.numpy as jnp

    g = Graph()
    x = g.add_value("x")
    c = g.add_constant("c", np.float32(2.0))
    out = g.add_simple_op("Mul", [x, c], name="scale")
    g.inputs, g.outputs = [x], [out]
    model = Model(g, options=ModelOptions(enable_optimization=False))

    xv = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    expected = np.asarray(xv) * 2.0
    (got,) = model.run([xv], opts=RunOptions(mode="compile", donate_inputs=True))
    np.testing.assert_allclose(np.asarray(got), expected)
    assert xv.is_deleted()  # the device buffer was donated

    # numpy inputs take the non-donating signature and still work
    xn = rng.standard_normal((8, 8)).astype(np.float32)
    (got2,) = model.run([xn], opts=RunOptions(mode="compile", donate_inputs=True))
    np.testing.assert_allclose(np.asarray(got2), xn * 2.0)
