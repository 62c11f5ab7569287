"""End-to-end: real ResNet-50 checkpoint through the whole format pipeline.

BASELINE config 1 requires a REAL model — not a hand-built toy — to flow
.onnx → converter → .rten → load → optimizer → compile executor with logit
parity vs torch ≤1e-3 (the reference's own parity methodology,
/root/reference/docs/debugging.md:17-50). The image has no network and no
torchvision/onnx packages, so the checkpoint is a full, faithful ResNet-50
(torchvision topology: 7×7 stem, [3,4,6,3] Bottleneck stages, 25.6M params)
built in torch here, serialized to genuine ONNX protobuf with
rten_tpu.format.onnx_builder using the standard exporter op choices
(Conv / BatchNormalization / Relu / MaxPool / Add / GlobalAveragePool /
Flatten / Gemm), then converted and executed.

The graph optimizer runs (constant folding over the 53-conv graph) and the
whole plan compiles into one XLA program.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rten_tpu.format import onnx_builder as ob
from rten_tpu.format.onnx_reader import load_onnx
from rten_tpu.format.rten_io import save_rten
from rten_tpu.runtime.session import Model, ModelOptions, RunOptions


# ---------------------------------------------------------------------------
# Torch ResNet-50 (standard topology; weights random, BN stats randomized so
# normalization is non-trivial)
# ---------------------------------------------------------------------------


class Bottleneck(torch.nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        out = planes * self.expansion
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(out)
        self.relu = torch.nn.ReLU()
        self.downsample = None
        if stride != 1 or inplanes != out:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(inplanes, out, 1, stride, bias=False),
                torch.nn.BatchNorm2d(out),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class ResNet50(torch.nn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU()
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        layers = []
        inplanes = 64
        for planes, blocks, stride in ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)):
            stage = [Bottleneck(inplanes, planes, stride)]
            inplanes = planes * 4
            stage += [Bottleneck(inplanes, planes) for _ in range(blocks - 1)]
            layers.append(torch.nn.Sequential(*stage))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        self.avgpool = torch.nn.AdaptiveAvgPool2d(1)
        self.fc = torch.nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = stage(x)
        return self.fc(torch.flatten(self.avgpool(x), 1))


def _randomize_bn(model, rng):
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.from_numpy(rng.standard_normal(m.num_features).astype(np.float32) * 0.2)
                )
                m.running_var.copy_(
                    torch.from_numpy(rng.uniform(0.5, 1.5, m.num_features).astype(np.float32))
                )
                m.weight.copy_(
                    torch.from_numpy(rng.uniform(0.7, 1.3, m.num_features).astype(np.float32))
                )
                m.bias.copy_(
                    torch.from_numpy(rng.standard_normal(m.num_features).astype(np.float32) * 0.1)
                )


# ---------------------------------------------------------------------------
# ONNX export (the standard exporter op emission for this topology)
# ---------------------------------------------------------------------------


def export_resnet50_onnx(model: ResNet50) -> bytes:
    nodes, inits = [], []
    uid = iter(range(10**6))

    def init(name, tensor):
        inits.append(ob.make_tensor(name, tensor.detach().numpy()))
        return name

    def conv(x, mod, prefix):
        out = f"{prefix}_y{next(uid)}"
        w = init(f"{prefix}.weight", mod.weight)
        nodes.append(
            ob.make_node(
                "Conv", [x, w], [out],
                strides=list(mod.stride), pads=list(mod.padding) * 2,
                dilations=list(mod.dilation), group=mod.groups,
                kernel_shape=list(mod.kernel_size),
            )
        )
        return out

    def bn(x, mod, prefix):
        out = f"{prefix}_y{next(uid)}"
        args = [
            x,
            init(f"{prefix}.weight", mod.weight),
            init(f"{prefix}.bias", mod.bias),
            init(f"{prefix}.running_mean", mod.running_mean),
            init(f"{prefix}.running_var", mod.running_var),
        ]
        nodes.append(ob.make_node("BatchNormalization", args, [out], epsilon=mod.eps))
        return out

    def relu(x):
        out = f"relu_y{next(uid)}"
        nodes.append(ob.make_node("Relu", [x], [out]))
        return out

    def bottleneck(x, blk, prefix):
        if blk.downsample is not None:
            identity = bn(
                conv(x, blk.downsample[0], f"{prefix}.downsample.0"),
                blk.downsample[1],
                f"{prefix}.downsample.1",
            )
        else:
            identity = x
        y = relu(bn(conv(x, blk.conv1, f"{prefix}.conv1"), blk.bn1, f"{prefix}.bn1"))
        y = relu(bn(conv(y, blk.conv2, f"{prefix}.conv2"), blk.bn2, f"{prefix}.bn2"))
        y = bn(conv(y, blk.conv3, f"{prefix}.conv3"), blk.bn3, f"{prefix}.bn3")
        out = f"{prefix}_add{next(uid)}"
        nodes.append(ob.make_node("Add", [y, identity], [out]))
        return relu(out)

    x = relu(bn(conv("input", model.conv1, "conv1"), model.bn1, "bn1"))
    pooled = f"maxpool_y{next(uid)}"
    nodes.append(
        ob.make_node(
            "MaxPool", [x], [pooled], kernel_shape=[3, 3], strides=[2, 2],
            pads=[1, 1, 1, 1],
        )
    )
    x = pooled
    for li, stage in enumerate((model.layer1, model.layer2, model.layer3, model.layer4), 1):
        for bi, blk in enumerate(stage):
            x = bottleneck(x, blk, f"layer{li}.{bi}")
    gap = f"gap_y{next(uid)}"
    nodes.append(ob.make_node("GlobalAveragePool", [x], [gap]))
    flat = f"flat_y{next(uid)}"
    nodes.append(ob.make_node("Flatten", [gap], [flat], axis=1))
    w_fc = init("fc.weight", model.fc.weight)
    b_fc = init("fc.bias", model.fc.bias)
    nodes.append(
        ob.make_node("Gemm", [flat, w_fc, b_fc], ["logits"], transB=1, alpha=1.0, beta=1.0)
    )

    graph = ob.make_graph(
        nodes,
        inputs=[ob.make_value_info("input", ["batch", 3, 224, 224])],
        outputs=[ob.make_value_info("logits", ["batch", 1000])],
        initializers=inits,
    )
    return ob.make_model(graph)


@pytest.mark.slow
def test_resnet50_onnx_to_rten_compile_parity(tmp_path):
    rng = np.random.default_rng(0)
    torch.manual_seed(0)
    model = ResNet50().eval()
    _randomize_bn(model, rng)

    onnx_bytes = export_resnet50_onnx(model)
    graph, _info = load_onnx(onnx_bytes)

    # Converter path: genuine .rten artifact on disk, then load (optimizer ON).
    rten_path = tmp_path / "resnet50.rten"
    rten_path.write_bytes(save_rten(graph, {"description": "resnet50 e2e"}))
    session = Model.load_file(str(rten_path))
    assert session.total_params() > 25_000_000  # the real 25.6M-param network

    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()

    (got,) = session.run({"input": x}, ["logits"], RunOptions(mode="compile"))
    got = np.asarray(got)
    assert got.shape == ref.shape
    # BASELINE config 1 parity bars: logits ≤1e-3 and top-1 agreement.
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


class InvertedResidual(torch.nn.Module):
    """MobileNetV2-style block: pointwise expand → depthwise (groups=C) →
    pointwise project, ReLU6 activations, residual when shapes match."""

    def __init__(self, c_in, c_out, stride, expand=4):
        super().__init__()
        mid = c_in * expand
        self.use_res = stride == 1 and c_in == c_out
        self.pw1 = torch.nn.Conv2d(c_in, mid, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(mid)
        self.dw = torch.nn.Conv2d(mid, mid, 3, stride, 1, groups=mid, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(mid)
        self.pw2 = torch.nn.Conv2d(mid, c_out, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(c_out)

    def forward(self, x):
        y = torch.nn.functional.relu6(self.bn1(self.pw1(x)))
        y = torch.nn.functional.relu6(self.bn2(self.dw(y)))
        y = self.bn3(self.pw2(y))
        return x + y if self.use_res else y


def test_mobilenet_style_blocks_onnx_parity(tmp_path):
    """Depthwise (groups=C) convs + ReLU6 (Clip) through the ONNX → .rten →
    optimizer → compile pipeline (BASELINE config 2's MobileNet class)."""
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    blocks = torch.nn.Sequential(
        InvertedResidual(8, 16, 2), InvertedResidual(16, 16, 1)
    ).eval()
    _randomize_bn(blocks, rng)

    nodes, inits = [], []
    uid = iter(range(10**6))

    def init(name, t):
        inits.append(ob.make_tensor(name, t.detach().numpy()))
        return name

    def conv(x, mod, prefix):
        out = f"{prefix}_y{next(uid)}"
        nodes.append(
            ob.make_node(
                "Conv", [x, init(f"{prefix}.weight", mod.weight)], [out],
                strides=list(mod.stride), pads=list(mod.padding) * 2,
                group=mod.groups, kernel_shape=list(mod.kernel_size),
            )
        )
        return out

    def bn(x, mod, prefix):
        out = f"{prefix}_y{next(uid)}"
        nodes.append(
            ob.make_node(
                "BatchNormalization",
                [x, init(f"{prefix}.w", mod.weight), init(f"{prefix}.b", mod.bias),
                 init(f"{prefix}.m", mod.running_mean), init(f"{prefix}.v", mod.running_var)],
                [out], epsilon=mod.eps,
            )
        )
        return out

    def relu6(x):
        lo = init(f"lo{next(uid)}", torch.tensor(0.0))
        hi = init(f"hi{next(uid)}", torch.tensor(6.0))
        out = f"clip_y{next(uid)}"
        nodes.append(ob.make_node("Clip", [x, lo, hi], [out]))
        return out

    x = "input"
    for bi, blk in enumerate(blocks):
        p = f"b{bi}"
        y = relu6(bn(conv(x, blk.pw1, f"{p}.pw1"), blk.bn1, f"{p}.bn1"))
        y = relu6(bn(conv(y, blk.dw, f"{p}.dw"), blk.bn2, f"{p}.bn2"))
        y = bn(conv(y, blk.pw2, f"{p}.pw2"), blk.bn3, f"{p}.bn3")
        if blk.use_res:
            out = f"{p}_res{next(uid)}"
            nodes.append(ob.make_node("Add", [x, y], [out]))
            y = out
        x = y
    nodes.append(ob.make_node("Identity", [x], ["features"]))

    graph_proto = ob.make_model(
        ob.make_graph(
            nodes,
            inputs=[ob.make_value_info("input", [1, 8, 16, 16])],
            outputs=[ob.make_value_info("features", None)],
            initializers=inits,
        )
    )
    graph, _ = load_onnx(graph_proto)
    path = tmp_path / "mblocks.rten"
    path.write_bytes(save_rten(graph))
    session = Model.load_file(str(path))

    xv = rng.standard_normal((1, 8, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = blocks(torch.from_numpy(xv)).numpy()
    (got,) = session.run({"input": xv}, ["features"], RunOptions(mode="compile"))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)
