"""Execute-every-op coverage gate.

The reference's `test_all_op_types` (/root/reference/src/model.rs:1147)
builds a model exercising EVERY registered operator, loads it and RUNS it —
the policy gate that keeps op registration, deserialization and execution in
lockstep (docs/adding-operators.md:30-34). This is the TPU-build analog, one
step stronger: every registered op gets realistic attrs/inputs, goes through
save→load (when it has a wire format), and runs in BOTH executors; interpret
and compile outputs must agree. Data-dependent ops (NonZero, NMS) assert the
documented CompileError contract under tracing instead.
"""

from __future__ import annotations

import numpy as np
import pytest

import rten_tpu.optimize.quantize  # noqa: F401 — registers QuantMatMul
from rten_tpu.format import fbs
from rten_tpu.format.rten_io import load_rten, save_rten
from rten_tpu.graph import Graph
from rten_tpu.ops.registry import CompileError, all_ops
from rten_tpu.runtime.session import Model, ModelOptions, RunOptions

_rng = np.random.default_rng(0)


def f32(*shape):
    return _rng.standard_normal(shape).astype(np.float32)


def pos(*shape):
    return (_rng.random(shape) + 0.5).astype(np.float32)


def unit(*shape):  # inside (-0.9, 0.9) for asin/acos/atanh-style domains
    return (_rng.random(shape) * 1.8 - 0.9).astype(np.float32)


def i32(arr):
    return np.asarray(arr, np.int32)


def i8(arr):
    return np.asarray(arr, np.int8)


def u8(arr):
    return np.asarray(arr, np.uint8)


def bits(*shape):  # int32 0/1 masks (logical ops; the schema has no bool)
    return (_rng.random(shape) > 0.5).astype(np.int32)


def _if_branches():
    then_g = Graph()
    tc = then_g.add_constant("one", np.float32(1.0))
    then_g.outputs = [tc]
    else_g = Graph()
    ec = else_g.add_constant("two", np.float32(2.0))
    else_g.outputs = [ec]
    return {"then_branch": then_g, "else_branch": else_g}


# Per-op spec: inputs (index < n_runtime feed as graph inputs, the rest are
# constants; None = missing optional slot), attrs, n_outputs, and flags:
# dd = data-dependent (interpret-only, CompileError under jit),
# nd = non-deterministic (shape/dtype compared, not values).
SPECS: dict[str, dict] = {
    # unary elementwise
    **{
        op: {"inputs": [f32(2, 3)]}
        for op in (
            "Abs", "Ceil", "Cos", "Elu", "Erf", "Exp", "Floor", "Gelu",
            "HardSigmoid", "HardSwish", "Identity", "LeakyRelu", "Neg",
            "Relu", "Round", "Sigmoid", "Sign", "Silu", "Sin", "Softplus",
            "Tan", "Tanh",
        )
    },
    "Acos": {"inputs": [unit(2, 3)]},
    "Asin": {"inputs": [unit(2, 3)]},
    "Atan": {"inputs": [f32(2, 3)]},
    "Log": {"inputs": [pos(2, 3)]},
    "Reciprocal": {"inputs": [pos(2, 3)]},
    "Sqrt": {"inputs": [pos(2, 3)]},
    "Not": {"inputs": [bits(2, 3)]},
    # binary / variadic
    "Add": {"inputs": [f32(2, 3), f32(2, 3)]},
    "Sub": {"inputs": [f32(2, 3), f32(1, 3)]},
    "Mul": {"inputs": [f32(2, 3), f32(2, 1)]},
    "Div": {"inputs": [f32(2, 3), pos(2, 3)]},
    "Pow": {"inputs": [pos(2, 3), f32(2, 3)]},
    "Mod": {"inputs": [i32([[7, -5, 9], [4, 6, -2]]), i32([3, 4, 5])]},
    "Max": {"inputs": [f32(2, 3), f32(2, 3)]},
    "Min": {"inputs": [f32(2, 3), f32(2, 3)]},
    "Mean": {"inputs": [f32(2, 3), f32(2, 3)]},
    "Sum": {"inputs": [f32(2, 3), f32(2, 3)]},
    "And": {"inputs": [bits(2, 3), bits(2, 3)]},
    "Or": {"inputs": [bits(2, 3), bits(2, 3)]},
    "Xor": {"inputs": [bits(2, 3), bits(2, 3)]},
    "Equal": {"inputs": [i32([[1, 2, 3]]), i32([[1, 0, 3]])]},
    "Greater": {"inputs": [f32(2, 3), f32(2, 3)]},
    "GreaterOrEqual": {"inputs": [f32(2, 3), f32(2, 3)]},
    "Less": {"inputs": [f32(2, 3), f32(2, 3)]},
    "LessOrEqual": {"inputs": [f32(2, 3), f32(2, 3)]},
    "Where": {"inputs": [bits(2, 3), f32(2, 3), f32(2, 3)]},
    # reductions / indices
    "ArgMax": {"inputs": [f32(3, 4)], "attrs": {"axis": 1, "keep_dims": False}},
    "ArgMin": {"inputs": [f32(3, 4)], "attrs": {"axis": 0, "keep_dims": True}},
    "CumSum": {"inputs": [f32(2, 4), i32(1)]},
    **{
        op: {"inputs": [f32(2, 3, 4)], "attrs": {"axes": [1], "keep_dims": True}}
        for op in (
            "ReduceL2", "ReduceMax", "ReduceMean", "ReduceMin",
            "ReduceProd", "ReduceSum", "ReduceSumSquare",
        )
    },
    "TopK": {"inputs": [f32(3, 8), i32(4)], "attrs": {"axis": -1, "largest": True},
             "n_outputs": 2},
    # matmul family
    "MatMul": {"inputs": [f32(2, 3), f32(3, 4)]},
    "Gemm": {"inputs": [f32(2, 3), f32(4, 3), f32(4)],
             "attrs": {"alpha": 0.5, "beta": 2.0, "transpose_b": True}},
    "Einsum": {"inputs": [f32(2, 3), f32(3, 4)], "attrs": {"equation": "ij,jk->ik"}},
    # conv / pool
    "Conv": {"inputs": [f32(1, 2, 8, 8), f32(4, 2, 3, 3), f32(4)],
             "attrs": {"strides": [1, 1], "pads": [1, 1, 1, 1]}},
    "ConvTranspose": {"inputs": [f32(1, 2, 4, 4), f32(2, 3, 3, 3)],
                      "attrs": {"strides": [2, 2]}},
    "AveragePool": {"inputs": [f32(1, 2, 8, 8)],
                    "attrs": {"kernel_size": [2, 2], "strides": [2, 2]}},
    "MaxPool": {"inputs": [f32(1, 2, 8, 8)],
                "attrs": {"kernel_size": [3, 3], "strides": [2, 2],
                          "pads": [1, 1, 1, 1]}},
    "GlobalAveragePool": {"inputs": [f32(1, 3, 4, 4)]},
    # norm
    "BatchNormalization": {
        "inputs": [f32(1, 3, 2, 2), pos(3), f32(3), f32(3), pos(3)],
        "attrs": {"epsilon": 1e-5},
    },
    "InstanceNormalization": {"inputs": [f32(1, 3, 4, 4), pos(3), f32(3)],
                              "attrs": {"epsilon": 1e-5}},
    "LayerNormalization": {"inputs": [f32(2, 6), pos(6), f32(6)],
                           "attrs": {"axis": -1, "epsilon": 1e-5}},
    "Softmax": {"inputs": [f32(2, 5)], "attrs": {"axis": -1}},
    "LogSoftmax": {"inputs": [f32(2, 5)], "attrs": {"axis": -1}},
    # layout
    "Cast": {"inputs": [f32(2, 3)], "attrs": {"to": "int32"}},
    "Clip": {"inputs": [f32(2, 3), np.float32(-0.5), np.float32(0.5)]},
    "Concat": {"inputs": [f32(2, 3), f32(2, 2)], "attrs": {"axis": 1}},
    "Expand": {"inputs": [f32(1, 3), i32([2, 3])]},
    "Flatten": {"inputs": [f32(2, 3, 4)], "attrs": {"axis": 1}},
    "Reshape": {"inputs": [f32(2, 6), i32([3, 4])]},
    "Shape": {"inputs": [f32(2, 3, 4)]},
    "Size": {"inputs": [f32(2, 3, 4)]},
    "Slice": {"inputs": [f32(4, 6), i32([0, 1]), i32([3, 5]), i32([0, 1]),
                         i32([1, 2])]},
    "Split": {"inputs": [f32(4, 6), i32([2, 2])], "attrs": {"axis": 0},
              "n_outputs": 2},
    "Squeeze": {"inputs": [f32(1, 3, 1, 2), i32([0, 2])]},
    "Transpose": {"inputs": [f32(2, 3, 4)], "attrs": {"perm": [2, 0, 1]}},
    "Unsqueeze": {"inputs": [f32(2, 3), i32([0])]},
    "Tile": {"inputs": [f32(2, 3), i32([2, 1])]},
    "Pad": {"inputs": [f32(2, 3), i32([1, 0, 1, 2]), np.float32(9.0)],
            "attrs": {"mode": "constant"}},
    "Trilu": {"inputs": [f32(3, 3), i32(0)], "attrs": {"upper": True}},
    # gather / scatter
    "Gather": {"inputs": [f32(4, 3), i32([0, 2])], "attrs": {"axis": 0}},
    "GatherElements": {"inputs": [f32(2, 3), i32([[0, 2, 1], [1, 0, 0]])],
                       "attrs": {"axis": 1}},
    "GatherND": {"inputs": [f32(2, 3, 4), i32([[0, 1], [1, 2]])],
                 "attrs": {"batch_dims": 0}},
    "ScatterElements": {
        "inputs": [f32(3, 3), i32([[0, 2, 1]]), f32(1, 3)],
        "attrs": {"axis": 0},
    },
    "ScatterND": {"inputs": [f32(4, 3), i32([[0], [2]]), f32(2, 3)]},
    "OneHot": {"inputs": [i32([0, 2, 4]), i32(5), f32(2)], "attrs": {"axis": -1}},
    # generation
    "ConstantOfShape": {"inputs": [i32([2, 3])], "attrs": {"value": np.float32(1.5)},
                        "n_runtime": 0},
    "Range": {"inputs": [np.float32(0.0), np.float32(10.0), np.float32(2.0)],
              "n_runtime": 0},
    "RandomNormal": {"inputs": [], "attrs": {"shape": [2, 3], "mean": 0.0,
                                             "scale": 1.0}, "nd": True},
    "RandomNormalLike": {"inputs": [f32(2, 3)], "nd": True},
    "RandomUniform": {"inputs": [], "attrs": {"shape": [2, 3], "low": -1.0,
                                              "high": 1.0}, "nd": True},
    "RandomUniformLike": {"inputs": [f32(2, 3)], "nd": True},
    # resize / rnn / control flow / misc
    "Resize": {"inputs": [f32(1, 1, 4, 4), None, np.asarray([1, 1, 2, 2],
                                                            np.float32)],
               "attrs": {"mode": "nearest"}},
    "LSTM": {"inputs": [f32(3, 2, 4), f32(1, 20, 4), f32(1, 20, 5), f32(1, 40)],
             "attrs": {"direction": "forward", "hidden_size": 5},
             "n_outputs": 3},
    "GRU": {"inputs": [f32(3, 2, 4), f32(1, 15, 4), f32(1, 15, 5), f32(1, 30)],
            "attrs": {"direction": "forward", "hidden_size": 5},
            "n_outputs": 2},
    "If": {"inputs": [i32(1)], "attrs_fn": _if_branches},
    "NonMaxSuppression": {
        "inputs": [
            np.asarray([[[0, 0, 1, 1], [0, 0.1, 1, 1.1], [0, 2, 1, 3],
                         [0.5, 0.5, 1.5, 1.5]]], np.float32),
            np.asarray([[[0.9, 0.8, 0.7, 0.6]]], np.float32),
            i32(3), np.float32(0.5), np.float32(0.0),
        ],
        "dd": True,
    },
    "NonZero": {"inputs": [np.asarray([[0, 1, 0], [2, 0, 3]], np.float32)],
                "dd": True},
    # quantization extension
    "QuantMatMul": {  # optimizer-internal fused op (optimize/quantize.py)
        "inputs": [f32(2, 8),
                   i8(_rng.integers(-127, 127, (8, 4))),
                   pos(4)],
    },
    "QuantizeLinear": {"inputs": [f32(2, 3), np.float32(0.05), i8(3)],
                       "attrs": {"axis": 1}},
    "DequantizeLinear": {"inputs": [i8([[10, -20, 30], [-40, 50, -60]]),
                                    np.float32(0.05), i8(3)],
                         "attrs": {"axis": 1}},
    "DynamicQuantizeLinear": {"inputs": [f32(2, 3)], "n_outputs": 3},
    "QLinearMatMul": {
        "inputs": [
            u8(_rng.integers(0, 255, (2, 3))), np.float32(0.02), u8(128),
            u8(_rng.integers(0, 255, (3, 4))), np.float32(0.03), u8(128),
            np.float32(0.05), u8(128),
        ],
    },
}


def build_model(op_type: str, spec: dict) -> tuple[Graph, list[np.ndarray]]:
    g = Graph()
    runtime_vals: list[np.ndarray] = []
    n_rt = spec.get("n_runtime", 1)
    in_ids: list[int | None] = []
    for idx, arr in enumerate(spec["inputs"]):
        if arr is None:
            in_ids.append(None)
        elif idx < n_rt:
            vid = g.add_value(f"in{idx}")
            g.inputs.append(vid)
            in_ids.append(vid)
            runtime_vals.append(np.asarray(arr))
        else:
            in_ids.append(g.add_constant(f"c{idx}", np.asarray(arr)))
    if not g.inputs:
        # Static-only ops (ConstantOfShape, Range, RandomNormal): the graph
        # still takes one (unused) runtime input so both executors exercise
        # their real entry path.
        vid = g.add_value("dummy")
        g.inputs.append(vid)
        runtime_vals.append(np.zeros((1,), np.float32))
    attrs = dict(spec.get("attrs", {}))
    if "attrs_fn" in spec:
        attrs.update(spec["attrs_fn"]())
    n_out = spec.get("n_outputs", 1)
    outs = [g.add_value(f"out{i}") for i in range(n_out)]
    g.add_operator(op_type.lower(), op_type, attrs, in_ids, outs)
    g.outputs = list(outs)
    return g, runtime_vals


def test_specs_cover_every_registered_op():
    """If a new op registers without a spec here, the gate fails — the same
    policy the reference enforces via test_all_op_types."""
    assert set(SPECS) == set(all_ops())


@pytest.mark.parametrize("op_type", sorted(SPECS))
def test_op_executes_in_both_executors(op_type):
    spec = SPECS[op_type]
    g, inputs = build_model(op_type, spec)

    if op_type in fbs.OPERATOR_TYPES:
        g2, _ = load_rten(save_rten(g))  # wire-format round trip first
    else:
        g2 = g  # optimizer-internal ops (Silu) have no wire format

    model = Model(g2, options=ModelOptions(enable_optimization=False))
    out_i = model.run(inputs, opts=RunOptions(mode="interpret", seed=0))
    assert len(out_i) == spec.get("n_outputs", 1)

    if spec.get("dd"):
        from rten_tpu.runtime.executor import RunError

        with pytest.raises((CompileError, RunError)) as exc:
            model.run(inputs, opts=RunOptions(mode="compile", seed=0))
        # The executor wraps op errors in RunError; the cause must be the
        # documented CompileError contract for data-dependent ops.
        err = exc.value
        assert isinstance(err, CompileError) or isinstance(
            err.__cause__, CompileError
        )
        return

    out_c = model.run(inputs, opts=RunOptions(mode="compile", seed=0))
    assert len(out_c) == len(out_i)
    for a, b in zip(out_i, out_c):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, f"{op_type}: {a.shape} vs {b.shape}"
        assert a.dtype == b.dtype, f"{op_type}: {a.dtype} vs {b.dtype}"
        if spec.get("nd"):
            continue  # random values differ; shape/dtype checked above
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        else:
            np.testing.assert_array_equal(a, b)
