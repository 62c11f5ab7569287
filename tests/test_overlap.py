"""Overlapped collective matmuls: exact equivalence to the unfused
collective + matmul pair on the virtual 8-device mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from rten_tpu.parallel.overlap import (
    allgather_matmul,
    matmul_allreduce,
    matmul_reducescatter,
)


def _mesh(p=4):
    return Mesh(np.asarray(jax.devices()[:p]), axis_names=("model",))


def test_allgather_matmul_exact(rng):
    p, m, k, n = 4, 32, 16, 24
    mesh = _mesh(p)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)

    fn = shard_map(
        functools.partial(allgather_matmul, axis="model"),
        mesh=mesh,
        in_specs=(P("model", None), P(None, None)),
        out_specs=P(None, None),
        check_rep=False,
    )
    got = np.asarray(fn(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, x @ w, rtol=1e-5, atol=1e-5)


def test_matmul_reducescatter_exact(rng):
    p, m, k, n = 4, 8, 32, 16
    mesh = _mesh(p)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)

    fn = shard_map(
        functools.partial(matmul_reducescatter, axis="model"),
        mesh=mesh,
        in_specs=(P(None, "model"), P("model", None)),
        out_specs=P(None, "model"),
        check_rep=False,
    )
    got = np.asarray(fn(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, x @ w, rtol=1e-5, atol=1e-5)


def test_matmul_allreduce_exact(rng):
    p, m, k, n = 4, 8, 32, 16
    mesh = _mesh(p)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)

    fn = shard_map(
        functools.partial(matmul_allreduce, axis="model"),
        mesh=mesh,
        in_specs=(P(None, "model"), P("model", None)),
        out_specs=P(None, None),
        check_rep=False,
    )
    got = np.asarray(fn(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, x @ w, rtol=1e-5, atol=1e-5)


def test_ring_attention_matches_full(rng):
    from rten_tpu.kernels.attention import attention_reference
    from rten_tpu.kernels.ring_attention import ring_attention_sharded

    p, b, h, t, d = 4, 2, 2, 32, 16
    mesh = _mesh(p)
    q = rng.standard_normal((b, h, t, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, h, t, d)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)

    for causal in (True, False):
        got = ring_attention_sharded(
            mesh, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal
        )
        ref = attention_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
