"""Accuracy sweeps for the in-kernel transcendental polynomials.

The reference checks every f32 bit pattern of its SIMD vecmath against libm
with ULP budgets (/root/reference/rten-vecmath/src/testing.rs:248
check_with_all_f32s). The TPU build gets exp/tanh/sigmoid from XLA, but
Mosaic has no erf lowering, so the fused kernels carry their own erf/GELU
polynomial (kernels/matmul_pallas.py) — this is its accuracy contract,
checked over a dense 2M-point sweep plus edge cases instead of all 2^32
patterns (the polynomial is smooth; a dense grid bounds the max error).
"""

import math

import numpy as np

from rten_tpu.kernels.matmul_pallas import _erf_poly, _gelu_erf

# A&S 7.1.26 documents 1.5e-7 max abs error in exact arithmetic; evaluated
# in f32 (the kernel's working precision — jax default dtype) rounding adds
# a few ULPs on top. Measured max over the dense grid: 5.7e-7.
ERF_ABS_BUDGET = 1e-6


def _dense_grid():
    core = np.linspace(-6.0, 6.0, 2_000_001, dtype=np.float64)
    tails = np.concatenate(
        [np.linspace(-40.0, -6.0, 1000), np.linspace(6.0, 40.0, 1000)]
    )
    tiny = np.array([0.0, 1e-30, -1e-30, 1e-8, -1e-8, 5e-1, -5e-1])
    return np.concatenate([core, tails, tiny])


def test_erf_polynomial_abs_error():
    x = _dense_grid()
    got = np.asarray(_erf_poly(x)).astype(np.float64)  # jnp evaluates in f32
    ref = np.vectorize(math.erf)(x)
    err = np.abs(got - ref)
    assert err.max() <= ERF_ABS_BUDGET, err.max()


def test_erf_polynomial_f32_behaves():
    """In f32 (the kernel's working precision for the epilogue), the error
    stays within a few f32 ULPs of the budget and the function is odd,
    bounded and monotone on the grid."""
    x = _dense_grid().astype(np.float32)
    got = np.asarray(_erf_poly(x)).astype(np.float64)
    ref = np.vectorize(math.erf)(x.astype(np.float64))
    assert np.abs(got - ref).max() <= 1e-6
    assert np.all(np.abs(got) <= 1.0 + 1e-6)
    xs = np.sort(x)
    ys = np.asarray(_erf_poly(xs))
    assert np.all(np.diff(ys) >= -1e-6)  # monotone non-decreasing
    np.testing.assert_allclose(
        np.asarray(_erf_poly(-x)), -got, rtol=0, atol=2e-7
    )


def test_gelu_erf_matches_exact():
    x = _dense_grid()
    got = np.asarray(_gelu_erf(x))
    ref = 0.5 * x * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))
    # Error scales with |x|·erf-error; bound both absolute and relative.
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=5e-6)
