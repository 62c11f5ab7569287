"""Randomized save→load round-trip fuzz for the `.rten` wire format.

The AutoPad default bug (absent attr decoded as SAME padding) showed that
hand-picked round-trip cases miss attr-default interactions; this fuzz
builds random small DAGs over a safe op subset with randomized attrs and
asserts interpret-mode outputs are IDENTICAL before and after the wire
round trip — any silently dropped/mutated attr or input surfaces as a
numeric diff.
"""

import numpy as np
import pytest

from rten_tpu.format.rten_io import load_rten, save_rten
from rten_tpu.graph import Graph
from rten_tpu.runtime.session import Model, ModelOptions, RunOptions

# (op_type, attr candidates) — unary/binary shape-preserving ops plus a few
# attr-rich ones; every op here maps [N, C, H, W] f32 → same-rank f32.
UNARY = ["Relu", "Sigmoid", "Tanh", "Erf", "Gelu", "Neg", "Abs", "Softplus"]
BINARY = ["Add", "Sub", "Mul", "Max", "Min"]


def _random_graph(rng: np.random.Generator) -> tuple[Graph, np.ndarray]:
    g = Graph()
    x = g.add_value("x", [2, 4, 8, 8])
    vals = [x]
    for i in range(int(rng.integers(4, 10))):
        roll = rng.random()
        src = vals[int(rng.integers(0, len(vals)))]
        if roll < 0.35:
            op = UNARY[int(rng.integers(0, len(UNARY)))]
            vals.append(g.add_simple_op(op, [src], name=f"u{i}"))
        elif roll < 0.6:
            op = BINARY[int(rng.integers(0, len(BINARY)))]
            other = vals[int(rng.integers(0, len(vals)))]
            vals.append(g.add_simple_op(op, [src, other], name=f"b{i}"))
        elif roll < 0.72:
            # shape-preserving convs: 1x1/pads 0 or 3x3/pads 1 (the latter is
            # exactly the case the AutoPad wire bug corrupted)
            if rng.random() < 0.5:
                w = rng.standard_normal((4, 4, 1, 1)).astype(np.float32) * 0.3
                attrs = {"strides": [1, 1], "pads": [0, 0, 0, 0]}
            else:
                w = rng.standard_normal((4, 4, 3, 3)).astype(np.float32) * 0.2
                attrs = {"strides": [1, 1], "pads": [1, 1, 1, 1]}
            c = g.add_constant(f"w{i}", w)
            vals.append(g.add_simple_op("Conv", [src, c], attrs, name=f"c{i}"))
        elif roll < 0.82:
            op = "MaxPool" if rng.random() < 0.5 else "AveragePool"
            attrs = {"kernel_size": [3, 3], "strides": [1, 1]}
            if rng.random() < 0.5:
                attrs["pads"] = [1, 1, 1, 1]
            else:
                attrs["auto_pad"] = "same"
            vals.append(g.add_simple_op(op, [src], attrs, name=f"p{i}"))
        elif roll < 0.92:
            vals.append(
                g.add_simple_op(
                    "Softmax", [src], {"axis": int(rng.integers(-2, 4))}, name=f"s{i}"
                )
            )
        else:
            axes = [int(rng.integers(1, 4))]
            vals.append(
                g.add_simple_op(
                    "ReduceMean", [src],
                    {"axes": axes, "keep_dims": True}, name=f"r{i}",
                )
            )
    g.inputs, g.outputs = [x], [vals[-1]]
    xv = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    return g, xv


@pytest.mark.parametrize("seed", range(12))
def test_round_trip_preserves_semantics(seed):
    rng = np.random.default_rng(seed)
    g, xv = _random_graph(rng)

    before = Model(g, options=ModelOptions(enable_optimization=False))
    (ref,) = before.run([xv], opts=RunOptions(mode="interpret"))

    g2, _ = load_rten(save_rten(g))
    after = Model(g2, options=ModelOptions(enable_optimization=False))
    (got,) = after.run([xv], opts=RunOptions(mode="interpret"))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
