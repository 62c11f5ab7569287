"""MatMul/Gemm/Conv/Pool tests, cross-checked against torch CPU where the
semantics are nontrivial (the reference uses PyTorch reference fixtures the
same way, SURVEY.md §4 pytorch-ref-tests)."""

import numpy as np
import pytest

from helpers import run_op

torch = pytest.importorskip("torch")


def test_matmul_2d(rng):
    a = rng.standard_normal((5, 7)).astype(np.float32)
    b = rng.standard_normal((7, 3)).astype(np.float32)
    np.testing.assert_allclose(run_op("MatMul", a, b), a @ b, rtol=1e-5, atol=1e-5)


def test_matmul_batched_broadcast(rng):
    a = rng.standard_normal((2, 4, 5, 7)).astype(np.float32)
    b = rng.standard_normal((1, 7, 3)).astype(np.float32)
    np.testing.assert_allclose(run_op("MatMul", a, b), a @ b, rtol=1e-5, atol=1e-5)


def test_matmul_1d_promotion(rng):
    a = rng.standard_normal((7,)).astype(np.float32)
    b = rng.standard_normal((7, 3)).astype(np.float32)
    np.testing.assert_allclose(run_op("MatMul", a, b), a @ b, rtol=1e-5, atol=1e-5)


def test_gemm(rng):
    a = rng.standard_normal((6, 4)).astype(np.float32)
    b = rng.standard_normal((5, 6)).astype(np.float32)
    c = rng.standard_normal((4, 5)).astype(np.float32)
    out = run_op(
        "Gemm", a, b, c,
        attrs={"alpha": 0.5, "beta": 2.0, "transpose_a": True, "transpose_b": True},
    )
    np.testing.assert_allclose(out, 0.5 * (a.T @ b.T) + 2.0 * c, rtol=1e-5, atol=1e-5)


def _torch_conv(x, w, b=None, stride=1, padding=0, dilation=1, groups=1):
    with torch.no_grad():
        return torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w),
            torch.from_numpy(b) if b is not None else None,
            stride=stride, padding=padding, dilation=dilation, groups=groups,
        ).numpy()


def test_conv2d_basic(rng):
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    out = run_op("Conv", x, w, b, attrs={})
    np.testing.assert_allclose(out, _torch_conv(x, w, b), rtol=1e-4, atol=1e-4)


def test_conv2d_stride_pad_dilation(rng):
    x = rng.standard_normal((1, 3, 9, 9)).astype(np.float32)
    w = rng.standard_normal((2, 3, 3, 3)).astype(np.float32)
    out = run_op(
        "Conv", x, w,
        attrs={"strides": [2, 2], "pads": [1, 1, 1, 1], "dilations": [2, 2]},
    )
    ref = _torch_conv(x, w, stride=2, padding=1, dilation=2)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_conv2d_groups_depthwise(rng):
    x = rng.standard_normal((1, 4, 6, 6)).astype(np.float32)
    w = rng.standard_normal((4, 1, 3, 3)).astype(np.float32)
    out = run_op("Conv", x, w, attrs={"groups": 4, "pads": [1, 1, 1, 1]})
    ref = _torch_conv(x, w, padding=1, groups=4)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_conv2d_same_padding(rng):
    x = rng.standard_normal((1, 2, 7, 7)).astype(np.float32)
    w = rng.standard_normal((3, 2, 3, 3)).astype(np.float32)
    out = run_op("Conv", x, w, attrs={"auto_pad": "same"})
    assert np.asarray(out).shape == (1, 3, 7, 7)
    ref = _torch_conv(x, w, padding=1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_conv1d(rng):
    x = rng.standard_normal((1, 3, 10)).astype(np.float32)
    w = rng.standard_normal((2, 3, 3)).astype(np.float32)
    out = run_op("Conv", x, w, attrs={"pads": [1, 1]})
    with torch.no_grad():
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), padding=1
        ).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose2d(rng):
    x = rng.standard_normal((1, 3, 5, 5)).astype(np.float32)
    w = rng.standard_normal((3, 2, 3, 3)).astype(np.float32)  # [C_in, C_out, kh, kw]
    out = run_op("ConvTranspose", x, w, attrs={"strides": [2, 2]})
    with torch.no_grad():
        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), stride=2
        ).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose2d_padding(rng):
    x = rng.standard_normal((1, 2, 4, 4)).astype(np.float32)
    w = rng.standard_normal((2, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    out = run_op(
        "ConvTranspose", x, w, b, attrs={"strides": [2, 2], "pads": [1, 1, 1, 1]}
    )
    with torch.no_grad():
        ref = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=2, padding=1,
        ).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_max_pool(rng):
    x = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    out = run_op("MaxPool", x, attrs={"kernel_size": [2, 2], "strides": [2, 2]})
    with torch.no_grad():
        ref = torch.nn.functional.max_pool2d(torch.from_numpy(x), 2, 2).numpy()
    np.testing.assert_allclose(out, ref)


def test_average_pool_pads_exclude(rng):
    x = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    out = run_op(
        "AveragePool", x,
        attrs={"kernel_size": [3, 3], "strides": [2, 2], "pads": [1, 1, 1, 1]},
    )
    with torch.no_grad():
        ref = torch.nn.functional.avg_pool2d(
            torch.from_numpy(x), 3, 2, padding=1, count_include_pad=False
        ).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_average_pool_count_include_pad(rng):
    x = rng.standard_normal((1, 1, 6, 6)).astype(np.float32)
    out = run_op(
        "AveragePool", x,
        attrs={"kernel_size": [3, 3], "strides": [2, 2], "pads": [1, 1, 1, 1],
               "count_include_pad": True},
    )
    with torch.no_grad():
        ref = torch.nn.functional.avg_pool2d(
            torch.from_numpy(x), 3, 2, padding=1, count_include_pad=True
        ).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_global_average_pool(rng):
    x = rng.standard_normal((2, 3, 5, 5)).astype(np.float32)
    out = run_op("GlobalAveragePool", x)
    np.testing.assert_allclose(
        out, x.mean(axis=(2, 3), keepdims=True), rtol=1e-5, atol=1e-6
    )
