"""Vision/detection examples on REAL files (VERDICT r3 item 7): yolo, detr,
deeplab, segment_anything, depth_anything accept --image (a real PNG read
through rten_tpu.image.io) and --model (an exported .rten graph run through
Model.run) — the reference's exact shape (rten-examples/src/yolo.rs,
detr.rs, deeplab.rs: all load exported models; imagenet.rs:56-100 reads a
real image)."""

import numpy as np
import pytest

from rten_tpu import Graph
from rten_tpu.format import save_rten
from rten_tpu.image.io import write_image


@pytest.fixture()
def png(tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from examples import common

    path = tmp_path / "scene.png"
    write_image(str(path), common.synthetic_image(64, 64, seed=3))
    return str(path)


def _conv_graph(tmp_path, name, out_ch, kernel, stride, extra=None):
    """input [1,3,64,64] → Conv(out_ch, kernel, stride) → optional tail ops;
    ``extra(g, conv_out) -> outputs`` builds the head; saved as .rten."""
    rng = np.random.default_rng(0)
    g = Graph()
    x = g.add_value("image", shape=[1, 3, 64, 64])
    w = g.add_constant(
        "w",
        (rng.standard_normal((out_ch, 3, kernel, kernel)) * 0.3).astype(np.float32),
    )
    conv = g.add_simple_op("Conv", [x, w], attrs={"strides": [stride, stride]})
    outs = extra(g, conv) if extra else [conv]
    g.inputs = [x]
    g.outputs = outs
    path = tmp_path / f"{name}.rten"
    with open(path, "wb") as f:
        f.write(save_rten(g))
    return str(path)


def test_yolo_example_rten(tmp_path, png, capsys):
    # Conv(3→8ch, 8x8/8) → [1,8,8,8] → Reshape [1,8,64] → Transpose [1,64,8]:
    # 64 candidates x (4 box + 1 obj + 3 classes).
    def head(g, conv):
        sh = g.add_constant("sh", np.asarray([1, 8, 64], np.int32))
        r = g.add_simple_op("Reshape", [conv, sh])
        t = g.add_simple_op("Transpose", [r], attrs={"perm": [0, 2, 1]})
        # scale box channels into pixel range via Mul
        scale = g.add_constant(
            "scale", np.asarray([32, 32, 16, 16, 1, 1, 1, 1], np.float32)
        )
        return [g.add_simple_op("Mul", [t, scale])]

    path = _conv_graph(tmp_path, "yolo", 8, 8, 8, head)
    from examples import yolo as app

    rc = app.main(
        ["--image", png, "--model", path, "--conf", "0.1", "--out", str(tmp_path / "b.png")]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "64 candidates through Model.run" in out
    assert "detections" in out
    assert (tmp_path / "b.png").exists()


def test_detr_example_rten(tmp_path, png, capsys):
    # Conv(3→9ch, 16x16/16) → [1,9,4,4] → Reshape [1,9,16] → Transpose
    # [1,16,9] → Split into logits [1,16,5] + box features [1,16,4] →
    # Sigmoid boxes. 16 queries, 4 classes + no-object.
    def head(g, conv):
        sh = g.add_constant("sh", np.asarray([1, 9, 16], np.int32))
        r = g.add_simple_op("Reshape", [conv, sh])
        t = g.add_simple_op("Transpose", [r], attrs={"perm": [0, 2, 1]})
        logits = g.add_simple_op(
            "Slice",
            [t, g.add_constant("s0", np.asarray([0], np.int32)),
             g.add_constant("e0", np.asarray([5], np.int32)),
             g.add_constant("a0", np.asarray([2], np.int32))],
        )
        boxf = g.add_simple_op(
            "Slice",
            [t, g.add_constant("s1", np.asarray([5], np.int32)),
             g.add_constant("e1", np.asarray([9], np.int32)),
             g.add_constant("a1", np.asarray([2], np.int32))],
        )
        boxes = g.add_simple_op("Sigmoid", [boxf])
        return [logits, boxes]

    path = _conv_graph(tmp_path, "detr", 9, 16, 16, head)
    from examples import detr as app

    rc = app.main(["--image", png, "--model", path, "--threshold", "0.1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "16 queries through Model.run" in out
    assert "queries above threshold" in out


def test_deeplab_example_rten(tmp_path, png, capsys):
    path = _conv_graph(tmp_path, "deeplab", 6, 8, 8)
    from examples import deeplab as app

    rc = app.main(["--image", png, "--model", path, "--out", str(tmp_path / "m.png")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "6 classes through Model.run" in out
    assert "class" in out and (tmp_path / "m.png").exists()


def test_segment_anything_example_rten(tmp_path, capsys):
    import sys

    sys.path.insert(0, "/root/repo")
    from examples import common

    png32 = tmp_path / "s32.png"
    write_image(str(png32), common.synthetic_image(32, 32, seed=3))

    # SAM-encoder-shaped: input 32x32 → Conv(3→16, 4x4/4) → [1,16,8,8].
    rng = np.random.default_rng(0)
    g = Graph()
    x = g.add_value("image", shape=[1, 3, 32, 32])
    w = g.add_constant(
        "w", (rng.standard_normal((16, 3, 4, 4)) * 0.3).astype(np.float32)
    )
    conv = g.add_simple_op("Conv", [x, w], attrs={"strides": [4, 4]})
    g.inputs = [x]
    g.outputs = [conv]
    path = tmp_path / "sam.rten"
    with open(path, "wb") as f:
        f.write(save_rten(g))

    from examples import segment_anything as app

    rc = app.main(["--image", str(png32), "--model", str(path), "--point", "20,10"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "embeddings (1, 16, 8, 8) through Model.run" in out
    assert "contour(s)" in out


def test_depth_anything_example_rten(tmp_path, capsys):
    import sys

    sys.path.insert(0, "/root/repo")
    from examples import common

    png32 = tmp_path / "d32.png"
    write_image(str(png32), common.synthetic_image(32, 32, seed=3))

    rng = np.random.default_rng(0)
    g = Graph()
    x = g.add_value("image", shape=[1, 3, 32, 32])
    w = g.add_constant(
        "w", (rng.standard_normal((1, 3, 8, 8)) * 0.3).astype(np.float32)
    )
    conv = g.add_simple_op("Conv", [x, w], attrs={"strides": [8, 8]})
    g.inputs = [x]
    g.outputs = [conv]
    path = tmp_path / "depth.rten"
    with open(path, "wb") as f:
        f.write(save_rten(g))

    from examples import depth_anything as app

    rc = app.main(
        ["--image", str(png32), "--model", str(path), "--out", str(tmp_path / "d.png")]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "depth grid" in out and "through Model.run" in out
    assert (tmp_path / "d.png").exists()
