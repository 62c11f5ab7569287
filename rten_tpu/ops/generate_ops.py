"""Value-generating ops (reference: src/ops/generate.rs, src/ops/random.rs).

Random* ops are non-deterministic and therefore excluded from partial
evaluation (reference: src/graph.rs:1308); they draw from the run's jax PRNG
key (ONNX `seed` attr wins when present, making the op reproducible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rten_tpu.ops.registry import register, static_int_list


@register("ConstantOfShape")
def constant_of_shape(ctx, attrs, shape):
    dims = static_int_list(shape, "ConstantOfShape shape")
    value = attrs.get("value", np.float32(0.0))
    value = np.asarray(value)
    return jnp.full(dims, value, dtype=value.dtype)


@register("Range")
def range_(ctx, attrs, start, limit, delta):
    from rten_tpu.ops.registry import require_static

    s = require_static(start, "Range start").item()
    l = require_static(limit, "Range limit").item()
    d = require_static(delta, "Range delta").item()
    dtype = np.result_type(np.asarray(start).dtype)
    return jnp.arange(s, l, d, dtype=dtype)


def _rng_for(ctx, attrs):
    seed = attrs.get("seed")
    if seed is not None:
        return jax.random.PRNGKey(np.float32(seed).view(np.int32).item())
    return ctx.next_rng()


@register("RandomUniform", deterministic=False)
def random_uniform(ctx, attrs, *_):
    shape = [int(s) for s in attrs.get("shape", [])]
    low = attrs.get("low", 0.0)
    high = attrs.get("high", 1.0)
    return jax.random.uniform(
        _rng_for(ctx, attrs), shape, minval=low, maxval=high, dtype=jnp.float32
    )


@register("RandomUniformLike", deterministic=False)
def random_uniform_like(ctx, attrs, x):
    x = jnp.asarray(x)
    low = attrs.get("low", 0.0)
    high = attrs.get("high", 1.0)
    return jax.random.uniform(
        _rng_for(ctx, attrs), x.shape, minval=low, maxval=high, dtype=jnp.float32
    )


@register("RandomNormal", deterministic=False)
def random_normal(ctx, attrs, *_):
    shape = [int(s) for s in attrs.get("shape", [])]
    mean = attrs.get("mean", 0.0)
    scale = attrs.get("scale", 1.0)
    return mean + scale * jax.random.normal(_rng_for(ctx, attrs), shape, dtype=jnp.float32)


@register("RandomNormalLike", deterministic=False)
def random_normal_like(ctx, attrs, x):
    x = jnp.asarray(x)
    mean = attrs.get("mean", 0.0)
    scale = attrs.get("scale", 1.0)
    return mean + scale * jax.random.normal(
        _rng_for(ctx, attrs), x.shape, dtype=jnp.float32
    )
