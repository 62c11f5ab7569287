"""Elementwise operators.

Reference: src/ops/binary_elementwise.rs, src/ops/unary_elementwise.rs,
src/ops/variadic_elementwise.rs. NumPy broadcasting throughout. Comparison and
logical ops return int32 0/1 (the reference has no bool dtype,
src/schema.fbs:140-143). The reference routes Erf/Exp/Gelu/Sigmoid/Silu/Tanh
to hand-written SIMD polynomials (rten-vecmath); on TPU these are single VPU
ops that XLA fuses into neighbours, so plain jnp is the speed-of-light
implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rten_tpu.ops.registry import OpError, register


def _is_int(x) -> bool:
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer)


# ---- binary ---------------------------------------------------------------


@register("Add", commutative=True)
def add(ctx, attrs, a, b):
    return jnp.add(a, b)


@register("Sub")
def sub(ctx, attrs, a, b):
    return jnp.subtract(a, b)


@register("Mul", commutative=True)
def mul(ctx, attrs, a, b):
    return jnp.multiply(a, b)


@register("Div")
def div(ctx, attrs, a, b):
    if _is_int(a) and _is_int(b):
        # ONNX integer division truncates toward zero (C semantics), unlike
        # jnp's floor division (reference: src/ops/binary_elementwise.rs:522).
        a, b = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(b))
        return jax.lax.div(a, b)
    return jnp.divide(a, b)


@register("Mod")
def mod(ctx, attrs, a, b):
    if attrs.get("fmod", False):
        return jnp.fmod(a, b)  # sign of dividend
    return jnp.mod(a, b)  # sign of divisor


@register("Pow")
def pow_(ctx, attrs, a, b):
    return jnp.power(a, b)


@register("Where")
def where(ctx, attrs, cond, x, y):
    return jnp.where(jnp.asarray(cond) != 0, x, y)


def _cmp(fn):
    def op(ctx, attrs, a, b):
        return fn(a, b).astype(jnp.int32)

    return op


register("Equal")(_cmp(jnp.equal))
register("Greater")(_cmp(jnp.greater))
register("GreaterOrEqual")(_cmp(jnp.greater_equal))
register("Less")(_cmp(jnp.less))
register("LessOrEqual")(_cmp(jnp.less_equal))


def _logical(fn):
    def op(ctx, attrs, a, b):
        return fn(jnp.asarray(a) != 0, jnp.asarray(b) != 0).astype(jnp.int32)

    return op


register("And", commutative=True)(_logical(jnp.logical_and))
register("Or", commutative=True)(_logical(jnp.logical_or))
register("Xor", commutative=True)(_logical(jnp.logical_xor))


@register("Not")
def not_(ctx, attrs, x):
    return (jnp.asarray(x) == 0).astype(jnp.int32)


# ---- variadic (reference: src/ops/variadic_elementwise.rs) -----------------


@register("Max", commutative=True)
def max_(ctx, attrs, *xs):
    if not xs:
        raise OpError("Max requires at least one input")
    out = xs[0]
    for x in xs[1:]:
        out = jnp.maximum(out, x)
    return out


@register("Min", commutative=True)
def min_(ctx, attrs, *xs):
    if not xs:
        raise OpError("Min requires at least one input")
    out = xs[0]
    for x in xs[1:]:
        out = jnp.minimum(out, x)
    return out


@register("Sum", commutative=True)
def sum_(ctx, attrs, *xs):
    if not xs:
        raise OpError("Sum requires at least one input")
    out = xs[0]
    for x in xs[1:]:
        out = jnp.add(out, x)
    return out


@register("Mean", commutative=True)
def mean_(ctx, attrs, *xs):
    return sum_(ctx, attrs, *xs) / len(xs)


# ---- unary ------------------------------------------------------------------


def _unary(name, fn, **kw):
    @register(name, **kw)
    def op(ctx, attrs, x):
        return fn(x)

    return op


_unary("Abs", jnp.abs)
_unary("Acos", jnp.arccos)
_unary("Asin", jnp.arcsin)
_unary("Atan", jnp.arctan)
_unary("Ceil", jnp.ceil)
_unary("Cos", jnp.cos)
_unary("Erf", jax.scipy.special.erf)
_unary("Exp", jnp.exp)
_unary("Floor", jnp.floor)
_unary("Log", jnp.log)
_unary("Neg", jnp.negative)
_unary("Reciprocal", jnp.reciprocal)
_unary("Relu", jax.nn.relu)
_unary("Round", jnp.round)  # round-half-to-even, matches ONNX
_unary("Sigmoid", jax.nn.sigmoid)
_unary("Sign", jnp.sign)
_unary("Sin", jnp.sin)
_unary("Softplus", jax.nn.softplus)
_unary("Sqrt", jnp.sqrt)
_unary("Tan", jnp.tan)
_unary("Tanh", jnp.tanh)
# Silu is not an ONNX/.rten op; the graph optimizer fuses x*Sigmoid(x) into it
# (reference: src/optimize.rs:435 fuse_silu).
_unary("Silu", jax.nn.silu)


@register("Clip")
def clip(ctx, attrs, x, min_=None, max_=None):
    if min_ is not None:
        x = jnp.maximum(x, min_)
    if max_ is not None:
        x = jnp.minimum(x, max_)
    return x


@register("Elu")
def elu(ctx, attrs, x):
    return jax.nn.elu(x, alpha=attrs.get("alpha", 1.0))


@register("Gelu")
def gelu(ctx, attrs, x):
    # erf-based, matching the reference's fused form 0.5x(1+erf(x/sqrt(2)))
    # (src/optimize.rs:456 fuse_gelu).
    return jax.nn.gelu(x, approximate=False)


@register("HardSigmoid")
def hard_sigmoid(ctx, attrs, x):
    alpha = attrs.get("alpha", 0.2)
    beta = attrs.get("beta", 0.5)
    return jnp.clip(alpha * x + beta, 0.0, 1.0)


@register("HardSwish")
def hard_swish(ctx, attrs, x):
    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


@register("LeakyRelu")
def leaky_relu(ctx, attrs, x):
    return jax.nn.leaky_relu(x, negative_slope=attrs.get("alpha", 0.01))
