"""Elementwise op tests (reference: src/ops/binary_elementwise.rs,
unary_elementwise.rs, variadic_elementwise.rs inline tests)."""

import numpy as np
import pytest

from helpers import run_op


def test_binary_broadcasting(rng):
    a = rng.standard_normal((2, 3, 4)).astype(np.float32)
    b = rng.standard_normal((3, 1)).astype(np.float32)
    np.testing.assert_allclose(run_op("Add", a, b), a + b, rtol=1e-6)
    np.testing.assert_allclose(run_op("Sub", a, b), a - b, rtol=1e-6)
    np.testing.assert_allclose(run_op("Mul", a, b), a * b, rtol=1e-6)
    np.testing.assert_allclose(run_op("Div", a, b), a / b, rtol=1e-5)


def test_int_div_truncates_toward_zero():
    a = np.array([7, -7, 7, -7], dtype=np.int32)
    b = np.array([2, 2, -2, -2], dtype=np.int32)
    # ONNX (C) semantics: trunc, not floor
    np.testing.assert_array_equal(run_op("Div", a, b), [3, -3, -3, 3])


def test_mod_sign_conventions():
    a = np.array([5.0, -5.0, 5.0, -5.0], dtype=np.float32)
    b = np.array([3.0, 3.0, -3.0, -3.0], dtype=np.float32)
    np.testing.assert_allclose(run_op("Mod", a, b), np.mod(a, b))
    np.testing.assert_allclose(run_op("Mod", a, b, attrs={"fmod": True}), np.fmod(a, b))


def test_pow():
    a = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    np.testing.assert_allclose(run_op("Pow", a, np.float32(2.0)), a**2, rtol=1e-5)


def test_comparisons_return_int32(rng):
    a = rng.standard_normal((4, 4)).astype(np.float32)
    b = rng.standard_normal((4, 4)).astype(np.float32)
    for name, fn in [
        ("Equal", np.equal),
        ("Greater", np.greater),
        ("GreaterOrEqual", np.greater_equal),
        ("Less", np.less),
        ("LessOrEqual", np.less_equal),
    ]:
        out = np.asarray(run_op(name, a, b))
        assert out.dtype == np.int32
        np.testing.assert_array_equal(out, fn(a, b).astype(np.int32))


def test_logical_ops():
    a = np.array([0, 1, 1, 0], dtype=np.int32)
    b = np.array([0, 0, 1, 1], dtype=np.int32)
    np.testing.assert_array_equal(run_op("And", a, b), [0, 0, 1, 0])
    np.testing.assert_array_equal(run_op("Or", a, b), [0, 1, 1, 1])
    np.testing.assert_array_equal(run_op("Xor", a, b), [0, 1, 0, 1])
    np.testing.assert_array_equal(run_op("Not", a), [1, 0, 0, 1])


def test_where(rng):
    cond = np.array([[1, 0], [0, 1]], dtype=np.int32)
    x = np.full((2, 2), 5.0, dtype=np.float32)
    y = np.zeros((2, 2), dtype=np.float32)
    np.testing.assert_array_equal(
        run_op("Where", cond, x, y), [[5.0, 0.0], [0.0, 5.0]]
    )


def test_variadic(rng):
    xs = [rng.standard_normal((3, 3)).astype(np.float32) for _ in range(3)]
    np.testing.assert_allclose(run_op("Sum", *xs), xs[0] + xs[1] + xs[2], rtol=1e-6)
    np.testing.assert_allclose(
        run_op("Mean", *xs), (xs[0] + xs[1] + xs[2]) / 3, rtol=1e-6
    )
    np.testing.assert_allclose(
        run_op("Max", *xs), np.maximum(np.maximum(xs[0], xs[1]), xs[2])
    )
    np.testing.assert_allclose(
        run_op("Min", *xs), np.minimum(np.minimum(xs[0], xs[1]), xs[2])
    )


UNARY_CASES = {
    "Abs": np.abs,
    "Ceil": np.ceil,
    "Cos": np.cos,
    "Exp": np.exp,
    "Floor": np.floor,
    "Neg": np.negative,
    "Reciprocal": np.reciprocal,
    "Relu": lambda x: np.maximum(x, 0),
    "Round": np.round,  # numpy rounds half-to-even, same as ONNX
    "Sigmoid": lambda x: 1 / (1 + np.exp(-x)),
    "Sign": np.sign,
    "Sin": np.sin,
    "Sqrt": lambda x: np.sqrt(np.abs(x)),
    "Tan": np.tan,
    "Tanh": np.tanh,
    "Softplus": lambda x: np.log1p(np.exp(x)),
}


@pytest.mark.parametrize("name", sorted(UNARY_CASES))
def test_unary(name, rng):
    x = rng.standard_normal((2, 8)).astype(np.float32)
    if name == "Sqrt":
        x = np.abs(x)
    expected = UNARY_CASES[name](x)
    np.testing.assert_allclose(run_op(name, x), expected, rtol=3e-4, atol=1e-6)


def test_trig_inverse(rng):
    x = rng.uniform(-0.99, 0.99, (8,)).astype(np.float32)
    np.testing.assert_allclose(run_op("Acos", x), np.arccos(x), rtol=1e-5)
    np.testing.assert_allclose(run_op("Asin", x), np.arcsin(x), rtol=1e-5)
    np.testing.assert_allclose(run_op("Atan", x), np.arctan(x), rtol=1e-5)


def test_erf_gelu(rng):
    import math

    x = rng.standard_normal((64,)).astype(np.float32)
    erf_ref = np.vectorize(math.erf)(x.astype(np.float64))
    np.testing.assert_allclose(run_op("Erf", x), erf_ref, atol=1e-6)
    gelu_ref = 0.5 * x * (1 + np.vectorize(math.erf)(x / math.sqrt(2)))
    np.testing.assert_allclose(run_op("Gelu", x), gelu_ref, atol=1e-5)


def test_clip(rng):
    x = rng.standard_normal((16,)).astype(np.float32) * 3
    np.testing.assert_allclose(
        run_op("Clip", x, np.float32(-1.0), np.float32(1.0)), np.clip(x, -1, 1)
    )
    np.testing.assert_allclose(run_op("Clip", x, np.float32(0.0)), np.maximum(x, 0))
    np.testing.assert_allclose(run_op("Clip", x), x)


def test_activation_family(rng):
    x = rng.standard_normal((32,)).astype(np.float32) * 4
    np.testing.assert_allclose(
        run_op("LeakyRelu", x, attrs={"alpha": 0.1}),
        np.where(x >= 0, x, 0.1 * x),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        run_op("Elu", x, attrs={"alpha": 1.0}),
        np.where(x >= 0, x, np.expm1(x)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        run_op("HardSigmoid", x, attrs={"alpha": 0.2, "beta": 0.5}),
        np.clip(0.2 * x + 0.5, 0, 1),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        run_op("HardSwish", x),
        x * np.clip(x / 6 + 0.5, 0, 1),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        run_op("Silu", x), x / (1 + np.exp(-x)), rtol=1e-5, atol=1e-6
    )
