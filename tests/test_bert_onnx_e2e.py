"""End-to-end: transformer encoder through ONNX → optimizer fusions → jit.

BASELINE config 2's model class (DistilBERT-style encoder) exported the way
real exporters emit it — LayerNorm and GELU as PRIMITIVE op chains,
attention as MatMul/Transpose/Softmax subgraphs — then imported, optimized
and compiled. This pins the optimizer's pattern fusions (LayerNorm
recognition /root/reference/src/optimize.rs:482, GELU :456, transpose
absorption :388) against a REAL graph topology rather than hand-built
minimal patterns, with logit parity vs torch ≤1e-3.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rten_tpu.format import onnx_builder as ob
from rten_tpu.format.onnx_reader import load_onnx
from rten_tpu.format.rten_io import save_rten
from rten_tpu.runtime.session import Model, RunOptions

B, T, D, H, FF = 2, 8, 64, 4, 128
DH = D // H
NL = 2


class EncoderLayer(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.wq = torch.nn.Linear(D, D)
        self.wk = torch.nn.Linear(D, D)
        self.wv = torch.nn.Linear(D, D)
        self.wo = torch.nn.Linear(D, D)
        self.ln1 = torch.nn.LayerNorm(D)
        self.ln2 = torch.nn.LayerNorm(D)
        self.fc1 = torch.nn.Linear(D, FF)
        self.fc2 = torch.nn.Linear(FF, D)

    def forward(self, x):
        h = self.ln1(x)
        q = self.wq(h).view(B, T, H, DH).transpose(1, 2)
        k = self.wk(h).view(B, T, H, DH).transpose(1, 2)
        v = self.wv(h).view(B, T, H, DH).transpose(1, 2)
        s = (q @ k.transpose(-1, -2)) / math.sqrt(DH)
        ctx = (torch.softmax(s, -1) @ v).transpose(1, 2).reshape(B, T, D)
        x = x + self.wo(ctx)
        h = self.ln2(x)
        f = self.fc2(torch.nn.functional.gelu(self.fc1(h)))
        return x + f


class Encoder(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.layers = torch.nn.ModuleList(EncoderLayer() for _ in range(NL))
        self.final = torch.nn.LayerNorm(D)

    def forward(self, x):
        for l in self.layers:
            x = l(x)
        return self.final(x)


def export_encoder_onnx(model: Encoder) -> bytes:
    nodes, inits = [], []
    uid = iter(range(10**6))

    def init(name, arr):
        inits.append(ob.make_tensor(name, np.asarray(arr, np.float32)))
        return name

    def nd(op, ins, **attrs):
        out = f"t{next(uid)}"
        nodes.append(ob.make_node(op, ins, [out], **attrs))
        return out

    def const(val, dtype=np.float32):
        return init(f"c{next(uid)}", np.asarray(val, dtype))

    def iconst(val):
        name = f"c{next(uid)}"
        inits.append(ob.make_tensor(name, np.asarray(val, np.int64)))
        return name

    def layer_norm(x, ln: torch.nn.LayerNorm):
        # The pre-opset-17 primitive emission exporters produce.
        mean = nd("ReduceMean", [x], axes=[-1], keepdims=1)
        d = nd("Sub", [x, mean])
        sq = nd("Pow", [d, const(2.0)])
        var = nd("ReduceMean", [sq], axes=[-1], keepdims=1)
        std = nd("Sqrt", [nd("Add", [var, const(ln.eps)])])
        norm = nd("Div", [d, std])
        scaled = nd("Mul", [norm, init(f"lns{next(uid)}", ln.weight.detach())])
        return nd("Add", [scaled, init(f"lnb{next(uid)}", ln.bias.detach())])

    def gelu(x):
        # 0.5 * x * (1 + erf(x / sqrt(2)))
        e = nd("Erf", [nd("Div", [x, const(math.sqrt(2.0))])])
        return nd("Mul", [nd("Mul", [x, nd("Add", [e, const(1.0)])]), const(0.5)])

    def linear(x, lin: torch.nn.Linear):
        w = init(f"w{next(uid)}", lin.weight.detach().numpy().T)
        out = nd("MatMul", [x, w])
        return nd("Add", [out, init(f"b{next(uid)}", lin.bias.detach())])

    x = "input"
    for l in model.layers:
        h = layer_norm(x, l.ln1)

        def heads(y):
            r = nd("Reshape", [y, iconst([B, T, H, DH])])
            return nd("Transpose", [r], perm=[0, 2, 1, 3])

        q = heads(linear(h, l.wq))
        k = heads(linear(h, l.wk))
        v = heads(linear(h, l.wv))
        kt = nd("Transpose", [k], perm=[0, 1, 3, 2])
        s = nd("Div", [nd("MatMul", [q, kt]), const(math.sqrt(DH))])
        p = nd("Softmax", [s], axis=-1)
        ctx = nd("Transpose", [nd("MatMul", [p, v])], perm=[0, 2, 1, 3])
        ctx = nd("Reshape", [ctx, iconst([B, T, D])])
        x = nd("Add", [x, linear(ctx, l.wo)])

        h = layer_norm(x, l.ln2)
        f = linear(gelu(linear(h, l.fc1)), l.fc2)
        x = nd("Add", [x, f])
    out = layer_norm(x, model.final)
    nodes.append(ob.make_node("Identity", [out], ["encoded"]))

    graph = ob.make_graph(
        nodes,
        inputs=[ob.make_value_info("input", [B, T, D])],
        outputs=[ob.make_value_info("encoded", [B, T, D])],
        initializers=inits,
    )
    return ob.make_model(graph)


def test_encoder_onnx_fusions_and_parity(tmp_path):
    torch.manual_seed(0)
    model = Encoder().eval()
    graph, _ = load_onnx(export_encoder_onnx(model))

    path = tmp_path / "encoder.rten"
    path.write_bytes(save_rten(graph))
    session = Model.load_file(str(path))  # optimizer ON

    ops = [op.op_type for _, op in session.graph.operator_nodes()]
    # The primitive chains collapsed into the fused ops...
    assert ops.count("LayerNormalization") == 2 * NL + 1
    assert ops.count("Gelu") == NL
    assert "Erf" not in ops
    # ...and the attention head transposes (q into perm_a, kᵀ into perm_b,
    # v into the ctx matmul's perm_b) were absorbed into their MatMuls.
    absorbed = [
        op for _, op in session.graph.operator_nodes()
        if op.op_type == "MatMul" and ("perm_a" in op.attrs or "perm_b" in op.attrs)
    ]
    assert len(absorbed) == 2 * NL

    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    (got,) = session.run({"input": x}, ["encoded"], RunOptions(mode="compile"))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)
    (got_i,) = session.run({"input": x}, ["encoded"], RunOptions(mode="interpret"))
    np.testing.assert_allclose(np.asarray(got_i), ref, rtol=1e-3, atol=1e-3)
