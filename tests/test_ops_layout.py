"""Layout/shape op tests (reference: src/ops/layout.rs, slice.rs, split.rs,
pad.rs, concat.rs, gather.rs inline tests)."""

import numpy as np
import pytest

from helpers import run_op


def test_reshape_zero_and_minus_one(rng):
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    out = run_op("Reshape", x, np.array([0, -1], dtype=np.int32))
    assert out.shape == (2, 12)
    out = run_op(
        "Reshape", x, np.array([0, 12], dtype=np.int32), attrs={"allow_zero": False}
    )
    assert out.shape == (2, 12)


def test_flatten(rng):
    x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    assert run_op("Flatten", x, attrs={"axis": 2}).shape == (6, 20)
    assert run_op("Flatten", x, attrs={"axis": 0}).shape == (1, 120)
    assert run_op("Flatten", x, attrs={"axis": -1}).shape == (24, 5)


def test_transpose(rng):
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    np.testing.assert_array_equal(run_op("Transpose", x), x.T)
    np.testing.assert_array_equal(
        run_op("Transpose", x, attrs={"perm": [0, 2, 1]}), x.transpose(0, 2, 1)
    )


def test_squeeze_unsqueeze(rng):
    x = rng.standard_normal((1, 3, 1, 4)).astype(np.float32)
    assert run_op("Squeeze", x).shape == (3, 4)
    assert run_op("Squeeze", x, np.array([0], np.int32)).shape == (3, 1, 4)
    assert run_op("Unsqueeze", x, np.array([0, 5], np.int32)).shape == (1, 1, 3, 1, 4, 1)
    assert run_op("Unsqueeze", x, np.array([-1], np.int32)).shape == (1, 3, 1, 4, 1)


def test_shape_size(rng):
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    np.testing.assert_array_equal(run_op("Shape", x), [2, 3, 4])
    assert run_op("Size", x) == 24


def test_expand():
    x = np.array([[1.0], [2.0]], dtype=np.float32)
    out = run_op("Expand", x, np.array([2, 3], np.int32))
    np.testing.assert_array_equal(out, np.broadcast_to(x, (2, 3)))
    # ONNX two-way broadcast: target dim 1 keeps input size
    out = run_op("Expand", x, np.array([1, 1], np.int32))
    assert out.shape == (2, 1)


def test_concat(rng):
    a = rng.standard_normal((2, 3)).astype(np.float32)
    b = rng.standard_normal((2, 2)).astype(np.float32)
    np.testing.assert_array_equal(
        run_op("Concat", a, b, attrs={"axis": 1}), np.concatenate([a, b], axis=1)
    )


def test_tile(rng):
    x = rng.standard_normal((2, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        run_op("Tile", x, np.array([2, 3], np.int32)), np.tile(x, (2, 3))
    )


def test_slice_basic(rng):
    x = rng.standard_normal((5, 6, 7)).astype(np.float32)
    out = run_op(
        "Slice", x,
        np.array([1, 2], np.int32), np.array([4, 6], np.int32),
        np.array([0, 2], np.int32),
    )
    np.testing.assert_array_equal(out, x[1:4, :, 2:6])


def test_slice_negative_step(rng):
    x = np.arange(10, dtype=np.float32)
    out = run_op(
        "Slice", x,
        np.array([8], np.int32), np.array([2], np.int32),
        np.array([0], np.int32), np.array([-2], np.int32),
    )
    np.testing.assert_array_equal(out, x[8:2:-2])


def test_slice_int_max_sentinel():
    x = np.arange(10, dtype=np.float32)
    out = run_op(
        "Slice", x, np.array([3], np.int32),
        np.array([2**31 - 1], np.int32), np.array([0], np.int32),
    )
    np.testing.assert_array_equal(out, x[3:])


def test_split_equal_and_sizes(rng):
    x = rng.standard_normal((6, 4)).astype(np.float32)
    outs = run_op("Split", x, attrs={"axis": 0}, n_outputs=3)
    assert len(outs) == 3 and all(o.shape == (2, 4) for o in outs)
    outs = run_op("Split", x, np.array([2, 4], np.int32), attrs={"axis": 0}, n_outputs=2)
    assert outs[0].shape == (2, 4) and outs[1].shape == (4, 4)
    np.testing.assert_array_equal(np.concatenate(outs, axis=0), x)


def test_pad_constant_reflect(rng):
    x = rng.standard_normal((2, 3)).astype(np.float32)
    out = run_op("Pad", x, np.array([1, 0, 1, 2], np.int32), np.float32(7.0))
    ref = np.pad(x, [(1, 1), (0, 2)], constant_values=7.0)
    np.testing.assert_array_equal(out, ref)
    out = run_op(
        "Pad", x, np.array([1, 1, 1, 1], np.int32), attrs={"mode": "reflect"}
    )
    np.testing.assert_array_equal(out, np.pad(x, 1, mode="reflect"))


def test_pad_negative_crops(rng):
    x = rng.standard_normal((4, 4)).astype(np.float32)
    out = run_op("Pad", x, np.array([-1, 0, -1, 0], np.int32))
    np.testing.assert_array_equal(out, x[1:3, :])


def test_trilu():
    x = np.ones((4, 4), dtype=np.float32)
    np.testing.assert_array_equal(run_op("Trilu", x, attrs={"upper": True}), np.triu(x))
    np.testing.assert_array_equal(
        run_op("Trilu", x, np.int32(1), attrs={"upper": False}), np.tril(x, 1)
    )


def test_cast():
    x = np.array([1.7, -1.7], dtype=np.float32)
    out = run_op("Cast", x, attrs={"to": "int32"})
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, [1, -1])  # trunc toward zero
    out = run_op("Cast", np.array([1, 2], np.int32), attrs={"to": "float32"})
    assert out.dtype == np.float32


def test_identity(rng):
    x = rng.standard_normal((3,)).astype(np.float32)
    np.testing.assert_array_equal(run_op("Identity", x), x)


def test_gather(rng):
    x = rng.standard_normal((5, 4)).astype(np.float32)
    idx = np.array([[0, 2], [4, -1]], dtype=np.int32)
    out = run_op("Gather", x, idx, attrs={"axis": 0})
    np.testing.assert_array_equal(out, x[[[0, 2], [4, 4]]])


def test_gather_elements(rng):
    x = np.array([[1, 2], [3, 4]], dtype=np.float32)
    idx = np.array([[0, 0], [1, 0]], dtype=np.int32)
    out = run_op("GatherElements", x, idx, attrs={"axis": 1})
    np.testing.assert_array_equal(out, [[1, 1], [4, 3]])


def test_gather_nd():
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    idx = np.array([[0, 1], [1, 2]], dtype=np.int32)
    out = run_op("GatherND", x, idx)
    np.testing.assert_array_equal(out, x[[0, 1], [1, 2]])


def test_gather_nd_batch_dims():
    x = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
    idx = np.array([[[1]], [[0]]], dtype=np.int32)  # [2,1,1]
    out = run_op("GatherND", x, idx, attrs={"batch_dims": 1})
    np.testing.assert_array_equal(out, [[x[0, 1]], [x[1, 0]]])


def test_scatter_elements():
    x = np.zeros((3, 3), dtype=np.float32)
    idx = np.array([[1, 0, 2], [0, 2, 1]], dtype=np.int32)
    upd = np.array([[1.0, 1.1, 1.2], [2.0, 2.1, 2.2]], dtype=np.float32)
    out = run_op("ScatterElements", x, idx, upd, attrs={"axis": 0})
    ref = np.zeros((3, 3), dtype=np.float32)
    for i in range(2):
        for j in range(3):
            ref[idx[i, j], j] = upd[i, j]
    np.testing.assert_array_equal(out, ref)


def test_scatter_elements_add():
    x = np.ones((4,), dtype=np.float32)
    idx = np.array([1, 1, 2], dtype=np.int32)
    upd = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    out = run_op("ScatterElements", x, idx, upd, attrs={"axis": 0, "reduction": "add"})
    np.testing.assert_array_equal(out, [1, 4, 4, 1])


def test_scatter_nd():
    x = np.zeros((4, 4), dtype=np.float32)
    idx = np.array([[0, 1], [2, 3]], dtype=np.int32)
    upd = np.array([9.0, 10.0], dtype=np.float32)
    out = run_op("ScatterND", x, idx, upd)
    ref = x.copy()
    ref[0, 1] = 9.0
    ref[2, 3] = 10.0
    np.testing.assert_array_equal(out, ref)


def test_one_hot():
    idx = np.array([0, 2, -1], dtype=np.int32)
    values = np.array([0.0, 1.0], dtype=np.float32)
    out = run_op("OneHot", idx, np.int32(3), values, attrs={"axis": -1})
    np.testing.assert_array_equal(out, [[1, 0, 0], [0, 0, 1], [0, 0, 1]])
