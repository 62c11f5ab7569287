"""`.rten` format round-trip tests (reference test model:
src/model_builder.rs + src/model.rs:1147 test_all_op_types)."""

import numpy as np
import pytest

from rten_tpu.format.header import Header, HeaderError
from rten_tpu.format.rten_io import load_rten, save_rten
from rten_tpu.graph import ConstantNode, Graph, OperatorNode, ValueNode


def make_graph():
    g = Graph()
    x = g.add_value("x", [1, "seq", 4])
    w = g.add_constant("w", np.arange(16, dtype=np.float32).reshape(4, 4))
    g.add_constant("ints", np.array([1, -2, 3], dtype=np.int32))
    g.add_constant("qweights", np.array([[1, -2], [3, 4]], dtype=np.int8))
    out = g.add_value("mm_out")
    g.add_operator("mm", "MatMul", {}, [x, w], [out])
    out2 = g.add_value("softmax_out")
    g.add_operator("sm", "Softmax", {"axis": -1}, [out], [out2])
    g.inputs = [x]
    g.outputs = [out2]
    return g


def test_header_round_trip():
    h = Header(2, 32, 100, 192)
    h2 = Header.from_buf(h.to_bytes() + b"\0" * 200)
    assert h2 == h


def test_header_rejects_bad_magic():
    with pytest.raises(HeaderError):
        Header.from_buf(b"XTEN" + b"\0" * 28)


def test_header_rejects_bad_version():
    h = Header(2, 32, 0, 0).to_bytes()
    bad = h[:4] + b"\x03\x00\x00\x00" + h[8:]
    with pytest.raises(HeaderError):
        Header.from_buf(bad)


@pytest.mark.parametrize("inline", [False, True])
def test_round_trip(inline):
    g = make_graph()
    data = save_rten(g, {"description": "test", "license": "MIT"}, inline_constants=inline)
    g2, md = load_rten(data)
    assert md["description"] == "test"
    assert md["license"] == "MIT"
    assert g2.inputs == g.inputs and g2.outputs == g.outputs
    assert len(g2.nodes) == len(g.nodes)
    assert isinstance(g2.nodes[0], ValueNode)
    assert g2.nodes[0].shape == [1, "seq", 4]
    for i in (1, 2, 3):
        assert isinstance(g2.nodes[i], ConstantNode)
        np.testing.assert_array_equal(g2.nodes[i].value, g.nodes[i].value)
        assert g2.nodes[i].value.dtype == g.nodes[i].value.dtype
    mm = g2.nodes[5]
    assert isinstance(mm, OperatorNode)
    assert mm.op_type == "MatMul"
    assert mm.inputs == [0, 1]
    assert g2.nodes[7].attrs == {"axis": -1}


def test_tensor_segment_alignment():
    g = Graph()
    g.add_constant("a", np.ones(3, dtype=np.float32))
    g.add_constant("b", np.ones(5, dtype=np.float32))
    data = save_rten(g)
    h = Header.from_buf(data)
    assert h.tensor_data_offset % 64 == 0
    g2, _ = load_rten(data)
    np.testing.assert_array_equal(g2.nodes[1].value, np.ones(5, dtype=np.float32))


def test_optional_inputs_round_trip():
    g = Graph()
    x = g.add_value("x")
    out = g.add_value("out")
    # Clip with missing min (None encodes as -1, reference schema.fbs:469)
    mx = g.add_constant("max", np.float32(1.0))
    g.add_operator("clip", "Clip", {}, [x, None, mx], [out])
    g.inputs, g.outputs = [x], [out]
    g2, _ = load_rten(save_rten(g))
    op = g2.nodes[3]
    assert op.inputs == [x, None, mx]


def test_subgraph_round_trip():
    then_g = Graph()
    c = then_g.add_constant("one", np.float32(1.0))
    then_g.outputs = [c]
    else_g = Graph()
    c2 = else_g.add_constant("two", np.float32(2.0))
    else_g.outputs = [c2]

    g = Graph()
    cond = g.add_value("cond")
    out = g.add_value("out")
    g.add_operator(
        "if", "If", {"then_branch": then_g, "else_branch": else_g}, [cond], [out]
    )
    g.inputs, g.outputs = [cond], [out]
    g2, _ = load_rten(save_rten(g))
    op = g2.nodes[2]
    assert op.op_type == "If"
    tb = op.attrs["then_branch"]
    assert isinstance(tb, Graph)
    np.testing.assert_array_equal(tb.nodes[0].value, np.float32(1.0))


def test_all_registered_ops_serialize():
    """Every registered op type (that exists in the schema) must survive a
    save/load round trip — the deserialization coverage gate, mirroring the
    reference's test_all_op_types (src/model.rs:1147)."""
    from rten_tpu.format import fbs
    from rten_tpu.ops.registry import all_ops

    g = Graph()
    x = g.add_value("x")
    ids = []
    for op_type in all_ops():
        if op_type not in fbs.OPERATOR_TYPES:
            continue  # optimizer-internal ops (Silu) have no wire format
        out = g.add_value(f"{op_type}_out")
        g.add_operator(f"op_{op_type}", op_type, {}, [x], [out])
        ids.append(op_type)
    g.inputs, g.outputs = [x], []
    g2, _ = load_rten(save_rten(g))
    round_tripped = [n.op_type for n in g2.nodes if isinstance(n, OperatorNode)]
    assert round_tripped == ids
