"""Operator registry.

TPU-native counterpart of the reference's Operator trait + OpRegistry
(reference: src/ops/mod.rs:821, src/op_registry.rs:31). Instead of an object
per op with run/run_in_place methods, each op is a pure function
``fn(ctx, attrs, *inputs) -> array | tuple[array, ...]`` over jnp arrays —
in-place execution and buffer pooling are XLA's job (donation + fusion), not
ours.

Registration is selective like the reference (src/op_registry.rs:44
register_op): executors look ops up by ONNX-aligned name at run time, and a
session can restrict the allowed set.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import numpy as np


class OpError(ValueError):
    """Reference: OpError, src/ops/mod.rs:666."""


class CompileError(OpError):
    """Raised when an op cannot be lowered under jit (data-dependent shapes
    or a required-static input that is traced). Interpret mode still runs it."""


@dataclasses.dataclass
class OpSpec:
    name: str
    fn: Callable
    deterministic: bool = True
    # Data-dependent output shape → interpret-mode only (NonZero, NMS).
    data_dependent: bool = False
    commutative: bool = False


_REGISTRY: dict[str, OpSpec] = {}


def register(
    name: str,
    *,
    deterministic: bool = True,
    data_dependent: bool = False,
    commutative: bool = False,
):
    def deco(fn: Callable) -> Callable:
        _REGISTRY[name] = OpSpec(
            name=name,
            fn=fn,
            deterministic=deterministic,
            data_dependent=data_dependent,
            commutative=commutative,
        )
        return fn

    return deco


def get_op(name: str) -> OpSpec:
    _ensure_loaded()
    spec = _REGISTRY.get(name)
    if spec is None:
        raise OpError(f"operator {name!r} is not registered")
    return spec


def have_op(name: str) -> bool:
    _ensure_loaded()
    return name in _REGISTRY


def all_ops() -> list[str]:
    _ensure_loaded()
    return sorted(_REGISTRY)


def is_deterministic(name: str) -> bool:
    _ensure_loaded()
    spec = _REGISTRY.get(name)
    return spec.deterministic if spec else True


_loaded = False


def _ensure_loaded() -> None:
    """Import all op modules on first lookup (they self-register)."""
    global _loaded
    if _loaded:
        return
    _loaded = True
    from rten_tpu.ops import (  # noqa: F401
        control_flow,
        conv,
        einsum_op,
        elementwise,
        gather,
        generate_ops,
        layout,
        matmul,
        nms,
        norm,
        pool,
        quant,
        reduce,
        resize,
        rnn,
    )


class OpContext:
    """Per-run execution context handed to every op function.

    ``mode`` is "eager" (interpret executor — all values concrete) or
    "trace" (compile executor — graph-input-derived values are tracers).
    ``rng`` is a jax PRNG key for Random* ops. ``run_subgraph`` executes a
    nested Graph for control-flow ops (If), mirroring the reference's
    Operator::run_subgraph + CaptureEnv (src/ops/mod.rs:900,
    src/graph.rs:442).
    """

    def __init__(
        self,
        mode: str = "eager",
        rng=None,
        run_subgraph: Callable | None = None,
    ) -> None:
        self.mode = mode
        self.rng = rng
        self.run_subgraph = run_subgraph

    def next_rng(self):
        import jax

        if self.rng is None:
            raise OpError("random op requires an rng seed (RunOptions.seed)")
        self.rng, sub = jax.random.split(self.rng)
        return sub


def require_static(x, what: str = "input") -> np.ndarray:
    """Return a concrete numpy value for ``x`` or raise CompileError.

    Under jit tracing, values derived purely from constants stay concrete, so
    shape-math chains (Shape → Gather → Concat → Reshape) fold away at trace
    time; only truly data-dependent values are Tracers (the TPU replacement
    for the reference's native dynamic-shape execution)."""
    import jax

    if isinstance(x, jax.core.Tracer):
        raise CompileError(
            f"{what} must be statically known under jit; this graph needs "
            f"interpret mode or shape bucketing for this value"
        )
    return np.asarray(x)


def static_int_list(x, what: str = "input") -> list[int]:
    return [int(v) for v in np.atleast_1d(require_static(x, what))]
