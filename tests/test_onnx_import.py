"""ONNX importer tests.

The image has no `onnx` package (so torch.onnx.export is unavailable); models
are built with rten_tpu.format.onnx_builder (our own protobuf encoder) and
numerics are cross-checked against equivalent torch modules — the reference's
parity methodology (docs/debugging.md), with the serialization path exercised
end to end through our own encoder + decoder.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rten_tpu.format import onnx_builder as ob
from rten_tpu.format.onnx_reader import load_onnx
from rten_tpu.runtime.session import Model, ModelOptions


def build_mlp_onnx(lin1, lin2):
    nodes = [
        ob.make_node("Gemm", ["x", "w1", "b1"], ["h"], transB=1, alpha=1.0, beta=1.0),
        ob.make_node("Relu", ["h"], ["h_act"]),
        ob.make_node("Gemm", ["h_act", "w2", "b2"], ["logits"], transB=1, alpha=1.0, beta=1.0),
        ob.make_node("Softmax", ["logits"], ["probs"], axis=-1),
    ]
    inits = [
        ob.make_tensor("w1", lin1.weight.detach().numpy()),
        ob.make_tensor("b1", lin1.bias.detach().numpy()),
        ob.make_tensor("w2", lin2.weight.detach().numpy()),
        ob.make_tensor("b2", lin2.bias.detach().numpy()),
    ]
    graph = ob.make_graph(
        nodes,
        inputs=[ob.make_value_info("x", ["batch", 8])],
        outputs=[ob.make_value_info("probs", ["batch", 4])],
        initializers=inits,
    )
    return ob.make_model(graph)


def test_mlp_vs_torch(rng):
    lin1 = torch.nn.Linear(8, 16)
    lin2 = torch.nn.Linear(16, 4)
    data = build_mlp_onnx(lin1, lin2)
    graph, info = load_onnx(data)
    assert graph.nodes[graph.inputs[0]].shape == ["batch", 8]
    x = rng.standard_normal((3, 8)).astype(np.float32)
    model = Model(graph, options=ModelOptions(mode="interpret"))
    (out,) = model.run([x])
    with torch.no_grad():
        ref = torch.softmax(lin2(torch.relu(lin1(torch.from_numpy(x)))), -1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_mlp_compile_mode(rng):
    lin1 = torch.nn.Linear(8, 16)
    lin2 = torch.nn.Linear(16, 4)
    graph, _ = load_onnx(build_mlp_onnx(lin1, lin2))
    model = Model(graph)  # compile
    x = rng.standard_normal((2, 8)).astype(np.float32)
    (out,) = model.run([x])
    with torch.no_grad():
        ref = torch.softmax(lin2(torch.relu(lin1(torch.from_numpy(x)))), -1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_conv_pool_vs_torch(rng):
    conv = torch.nn.Conv2d(3, 8, 3, padding=1)
    nodes = [
        ob.make_node(
            "Conv", ["x", "w", "b"], ["c"],
            pads=[1, 1, 1, 1], strides=[1, 1], dilations=[1, 1], group=1,
            kernel_shape=[3, 3],
        ),
        ob.make_node("Relu", ["c"], ["r"]),
        ob.make_node("MaxPool", ["r"], ["p"], kernel_shape=[2, 2], strides=[2, 2]),
        ob.make_node("GlobalAveragePool", ["p"], ["g"]),
    ]
    inits = [
        ob.make_tensor("w", conv.weight.detach().numpy()),
        ob.make_tensor("b", conv.bias.detach().numpy()),
    ]
    graph_b = ob.make_graph(
        nodes,
        inputs=[ob.make_value_info("x", [1, 3, 8, 8])],
        outputs=[ob.make_value_info("g", [1, 8, 1, 1])],
        initializers=inits,
    )
    graph, _ = load_onnx(ob.make_model(graph_b))
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    model = Model(graph, options=ModelOptions(mode="interpret"))
    (out,) = model.run([x])
    with torch.no_grad():
        ref = torch.nn.functional.max_pool2d(torch.relu(conv(torch.from_numpy(x))), 2)
        ref = ref.mean(dim=(2, 3), keepdim=True).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_shape_reshape_chain(rng):
    """Dynamic reshape via Shape/Gather/Concat — the trace-time folding path."""
    nodes = [
        ob.make_node("Shape", ["x"], ["shp"]),
        ob.make_node("Gather", ["shp", "zero"], ["b_dim"], axis=0),
        ob.make_node("Unsqueeze", ["b_dim", "zero_axes"], ["b_vec"]),
        ob.make_node("Concat", ["b_vec", "minus1"], ["new_shape"], axis=0),
        ob.make_node("Reshape", ["x", "new_shape"], ["flat"]),
    ]
    inits = [
        ob.make_tensor("zero", np.array(0, np.int64)),
        ob.make_tensor("zero_axes", np.array([0], np.int64)),
        ob.make_tensor("minus1", np.array([-1], np.int64)),
    ]
    graph_b = ob.make_graph(
        nodes,
        inputs=[ob.make_value_info("x", ["batch", 4, 5])],
        outputs=[ob.make_value_info("flat", ["batch", 20])],
        initializers=inits,
    )
    graph, _ = load_onnx(ob.make_model(graph_b))
    model = Model(graph)  # compile mode — shape math must fold
    x = rng.standard_normal((2, 4, 5)).astype(np.float32)
    (out,) = model.run([x])
    assert np.asarray(out).shape == (2, 20)


def test_int64_initializers_clamped():
    graph_b = ob.make_graph(
        [ob.make_node("Add", ["x", "c"], ["y"])],
        inputs=[ob.make_value_info("x", [2])],
        outputs=[ob.make_value_info("y", [2])],
        initializers=[ob.make_tensor("c", np.array([1, 2**40], np.int64))],
    )
    graph, _ = load_onnx(ob.make_model(graph_b))
    const = graph.nodes[graph.get_node_id("c")]
    assert const.value.dtype == np.int32
    assert const.value[1] == 2**31 - 1  # clamped, not wrapped


def test_constant_node_becomes_constant():
    graph_b = ob.make_graph(
        [
            ob.make_node("Constant", [], ["c"], value=np.array([3.0], np.float32)),
            ob.make_node("Mul", ["x", "c"], ["y"]),
        ],
        inputs=[ob.make_value_info("x", [1])],
        outputs=[ob.make_value_info("y", [1])],
    )
    graph, _ = load_onnx(ob.make_model(graph_b))
    from rten_tpu.graph import ConstantNode

    assert isinstance(graph.nodes[graph.get_node_id("c")], ConstantNode)
    model = Model(graph, options=ModelOptions(mode="interpret"))
    (out,) = model.run([np.array([2.0], np.float32)])
    np.testing.assert_allclose(np.asarray(out), [6.0])


def test_unsupported_op_raises():
    from rten_tpu.format.onnx_reader import OnnxImportError

    graph_b = ob.make_graph(
        [ob.make_node("TotallyMadeUpOp", ["x"], ["y"])],
        inputs=[ob.make_value_info("x", [1])],
        outputs=[ob.make_value_info("y", [1])],
    )
    with pytest.raises(OnnxImportError):
        load_onnx(ob.make_model(graph_b))


def test_onnx_to_rten_round_trip(rng, tmp_path):
    """onnx → Graph → .rten file → run (the rten-convert CLI path)."""
    lin = torch.nn.Linear(8, 4)
    graph_b = ob.make_graph(
        [ob.make_node("Gemm", ["x", "w", "b"], ["y"], transB=1, alpha=1.0, beta=1.0)],
        inputs=[ob.make_value_info("x", ["batch", 8])],
        outputs=[ob.make_value_info("y", ["batch", 4])],
        initializers=[
            ob.make_tensor("w", lin.weight.detach().numpy()),
            ob.make_tensor("b", lin.bias.detach().numpy()),
        ],
    )
    onnx_path = tmp_path / "m.onnx"
    onnx_path.write_bytes(ob.make_model(graph_b))

    from rten_tpu.convert.__main__ import main as convert_main

    rten_path = tmp_path / "m.rten"
    assert convert_main([str(onnx_path), str(rten_path)]) == 0
    model = Model.load_file(rten_path, ModelOptions(mode="interpret"))
    assert "onnx_hash" in model.metadata
    x = rng.standard_normal((2, 8)).astype(np.float32)
    (out,) = model.run([x])
    with torch.no_grad():
        ref = lin(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_quantized_convert_and_fused_execution(rng, tmp_path):
    """--quantize → DequantizeLinear stored in .rten → load-time fusion to
    QuantMatMul → int8-fidelity numerics."""
    w = (rng.standard_normal((256, 128)) * 0.1).astype(np.float32)
    graph_b = ob.make_graph(
        [ob.make_node("MatMul", ["x", "w"], ["y"])],
        inputs=[ob.make_value_info("x", ["batch", 256])],
        outputs=[ob.make_value_info("y", ["batch", 128])],
        initializers=[ob.make_tensor("w", w)],
    )
    onnx_path = tmp_path / "m.onnx"
    onnx_path.write_bytes(ob.make_model(graph_b))

    from rten_tpu.convert.__main__ import main as convert_main

    rten_path = tmp_path / "mq.rten"
    assert convert_main([str(onnx_path), str(rten_path), "--quantize"]) == 0

    model = Model.load_file(rten_path, ModelOptions(mode="interpret"))
    ops = [op.op_type for _, op in model.graph.operator_nodes()]
    assert "QuantMatMul" in ops, ops
    x = rng.standard_normal((4, 256)).astype(np.float32)
    (out,) = model.run([x])
    ref = x @ w
    assert np.abs(np.asarray(out) - ref).max() < 0.05
    # and the stored file keeps int8 weights (no f32 blow-up)
    from rten_tpu.graph import ConstantNode

    int8_consts = [
        n for n in model.graph.nodes
        if isinstance(n, ConstantNode) and n.value.dtype == np.int8
    ]
    assert int8_consts


def test_if_subgraph_import(rng):
    then_b = ob.make_graph(
        [ob.make_node("Mul", ["x", "two"], ["then_out"])],
        name="then",
        outputs=[ob.make_value_info("then_out", None)],
        initializers=[ob.make_tensor("two", np.float32(2.0).reshape(()))],
    )
    else_b = ob.make_graph(
        [ob.make_node("Neg", ["x"], ["else_out"])],
        name="else",
        outputs=[ob.make_value_info("else_out", None)],
    )
    graph_b = ob.make_graph(
        [ob.make_node("If", ["cond"], ["y"], then_branch=then_b, else_branch=else_b)],
        inputs=[
            ob.make_value_info("cond", [], elem_type=9),
            ob.make_value_info("x", [2]),
        ],
        outputs=[ob.make_value_info("y", [2])],
    )
    graph, _ = load_onnx(ob.make_model(graph_b))
    model = Model(graph, options=ModelOptions(mode="interpret", enable_optimization=False))
    x = np.array([1.0, -2.0], np.float32)
    (out,) = model.run({"cond": np.int32(1), "x": x})
    np.testing.assert_allclose(np.asarray(out), x * 2)
    (out,) = model.run({"cond": np.int32(0), "x": x})
    np.testing.assert_allclose(np.asarray(out), -x)
