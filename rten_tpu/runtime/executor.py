"""Graph executors.

Two strategies over the same plan (the reference has one, the op-by-op
run_plan loop with in-place execution + TensorPool, src/graph.rs:886-1032):

- ``run_plan``: eager op-by-op execution (interpret mode). Used for parity
  debugging, per-op timing tables, and data-dependent ops (NonZero, NMS).
  JAX dispatches each op asynchronously; there is no buffer pool because XLA
  owns allocation.

- ``trace_plan``: runs the same loop under jax.jit tracing so the whole plan
  becomes ONE XLA program. RTen's in-place machinery maps to XLA buffer
  assignment + donation; constant-derived values stay concrete at trace time,
  so shape-math chains (Shape→Gather→Concat→Reshape) constant-fold away.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

import jax
import numpy as np

from rten_tpu.graph import ConstantNode, Graph, OperatorNode, subgraphs_of
from rten_tpu.ops.registry import OpContext, OpError, get_op
from rten_tpu.runtime.timing import RunTiming, Timer, TimingRecord


class RunError(RuntimeError):
    """Reference: RunError, src/graph.rs:275."""


class Env:
    """Scoped name→value environment for subgraph captures
    (reference: CaptureEnv, src/graph.rs:442)."""

    def __init__(self, parent: "Env | None" = None) -> None:
        self.parent = parent
        self.by_name: dict[str, Any] = {}

    def lookup(self, name: str):
        env: Env | None = self
        while env is not None:
            if name in env.by_name:
                return env.by_name[name]
            env = env.parent
        raise RunError(f"capture {name!r} not found in enclosing scopes")


def _gather_op_inputs(
    graph: Graph, op: OperatorNode, values: dict[int, Any], env: Env | None
) -> list[Any]:
    args = []
    for inp in op.inputs:
        if inp is None:
            args.append(None)
            continue
        if inp in values:
            args.append(values[inp])
            continue
        if env is not None:
            args.append(env.lookup(graph.node_name(inp)))
            continue
        raise RunError(f"missing value for input '{graph.node_name(inp)}'")
    # Trailing omitted optional inputs
    while args and args[-1] is None:
        args.pop()
    return args


def _apply_op(
    graph: Graph,
    op: OperatorNode,
    args: list[Any],
    ctx: OpContext,
    values: dict[int, Any],
) -> None:
    spec = get_op(op.op_type)
    attrs = op.attrs
    if op.op_type == "Split":
        attrs = dict(attrs)
        attrs["_n_outputs"] = len(op.outputs)
    try:
        if (
            ctx.mode == "trace"
            and spec.deterministic
            and not subgraphs_of(op)
            and not any(isinstance(a, jax.core.Tracer) for a in args)
        ):
            # All inputs are compile-time constants: evaluate NOW so the
            # result stays concrete and downstream shape-valued consumers
            # (Reshape/Slice/...) see static values. Without this, JAX 0.9
            # turns every in-trace op into a tracer even on concrete
            # operands, breaking shape-math constant folding.
            with jax.ensure_compile_time_eval():
                result = spec.fn(ctx, attrs, *args)
        else:
            result = spec.fn(ctx, attrs, *args)
    except OpError as e:
        raise RunError(f"operator '{op.name or op.op_type}' ({op.op_type}): {e}") from e
    outs = result if isinstance(result, tuple) else (result,)
    if len(outs) < len([o for o in op.outputs if o is not None]):
        raise RunError(
            f"operator {op.op_type} produced {len(outs)} outputs, "
            f"graph expects {len(op.outputs)}"
        )
    for out_id, val in zip(op.outputs, outs):
        if out_id is not None:
            values[out_id] = val


def _make_subgraph_runner(
    graph: Graph,
    values: dict[int, Any],
    env: Env | None,
    ctx_factory: Callable[[], OpContext],
) -> Callable[[Graph], list[Any]]:
    """Build the run_subgraph callback for control-flow ops: captures resolve
    against the current values by node NAME (reference: run_subgraph +
    CaptureEnv, src/graph.rs:843,442)."""

    def run_subgraph(sub: Graph) -> list[Any]:
        child_env = Env(env)
        for node_id, val in values.items():
            name = graph.nodes[node_id].name
            if name:
                child_env.by_name[name] = val
        for i, node in enumerate(graph.nodes):
            if isinstance(node, ConstantNode) and node.name:
                child_env.by_name.setdefault(node.name, node.value)
        sub_values: dict[int, Any] = {}
        for cap in sub.captures:
            sub_values[cap] = child_env.lookup(sub.node_name(cap))
        return execute_plan(
            sub,
            sub.create_plan([], sub.outputs),
            sub_values,
            sub.outputs,
            ctx_factory(),
            env=child_env,
        )

    return run_subgraph


def execute_plan(
    graph: Graph,
    plan: Sequence[int],
    values: dict[int, Any],
    outputs: Sequence[int],
    ctx: OpContext,
    *,
    env: Env | None = None,
    timing: RunTiming | None = None,
) -> list[Any]:
    """The core loop — both executors share it; `ctx.mode` and whether we're
    under jit tracing determine behavior."""
    # Constants resolve lazily.
    for i, node in enumerate(graph.nodes):
        if isinstance(node, ConstantNode) and i not in values:
            values[i] = node.value

    ctx.run_subgraph = _make_subgraph_runner(
        graph, values, env, lambda: OpContext(ctx.mode, ctx.rng)
    )

    for op_id in plan:
        op = graph.nodes[op_id]
        assert isinstance(op, OperatorNode)
        args = _gather_op_inputs(graph, op, values, env)
        if timing is not None:
            with Timer() as t:
                _apply_op(graph, op, args, ctx, values)
                for out in op.outputs:
                    if out is not None:
                        jax.block_until_ready(values[out])
            timing.add(
                TimingRecord(
                    op.op_type,
                    op.name or "",
                    [tuple(np.shape(a)) for a in args if a is not None],
                    t.elapsed_s,
                )
            )
        else:
            _apply_op(graph, op, args, ctx, values)

    missing = [o for o in outputs if o not in values]
    if missing:
        names = ", ".join(graph.node_name(m) for m in missing)
        raise RunError(f"outputs not produced by plan: {names}")
    return [values[o] for o in outputs]


def run_plan(
    graph: Graph,
    inputs: Mapping[int, Any],
    outputs: Sequence[int],
    *,
    rng=None,
    timing: RunTiming | None = None,
) -> list[Any]:
    """Interpret-mode execution (eager)."""
    plan = graph.create_plan(list(inputs), outputs)
    values: dict[int, Any] = dict(inputs)
    ctx = OpContext("eager", rng=rng)
    return execute_plan(graph, plan, values, outputs, ctx, timing=timing)


# ---------------------------------------------------------------------------
# Compile mode
# ---------------------------------------------------------------------------

# Constants larger than this many elements are passed as jit arguments
# (device-resident weights); smaller ones are baked into the trace so that
# shape-math chains constant-fold (see module docstring).
BAKE_CONSTANT_MAX_ELEMENTS = 16384


def split_constants(graph: Graph) -> tuple[list[int], list[int]]:
    """(baked_ids, arg_ids) — int tensors and small tensors bake; large
    float tensors (weights) become function arguments."""
    baked, args = [], []
    for i, node in enumerate(graph.nodes):
        if not isinstance(node, ConstantNode):
            continue
        v = node.value
        if v.size <= BAKE_CONSTANT_MAX_ELEMENTS or np.issubdtype(v.dtype, np.integer):
            baked.append(i)
        else:
            args.append(i)
    return baked, args


def build_compiled(
    graph: Graph,
    input_ids: Sequence[int],
    output_ids: Sequence[int],
    *,
    rng_seed: int | None = None,
    donate_inputs: Sequence[bool] | None = None,
):
    """Return (jitted_fn, const_arg_ids). jitted_fn(const_args, *inputs) →
    list of outputs; the whole plan is one XLA program.

    ``donate_inputs`` (a per-input mask) donates those graph-input buffers
    to XLA — the analog of the reference's in-place input consumption
    (src/graph.rs:986-1032): callers that thread device arrays through
    repeated runs (KV-cache graph models via GraphBackend) get true
    in-place updates instead of a fresh allocation per call. Weights
    (const args) are never donated."""
    plan = graph.create_plan(list(input_ids), output_ids)
    _, const_arg_ids = split_constants(graph)
    # Only pass the large constants the plan actually uses.
    used: set[int] = set()
    for op_id in plan:
        op = graph.nodes[op_id]
        for inp in op.inputs:
            if inp is not None:
                used.add(inp)
        for sub in subgraphs_of(op):
            # Subgraph captures may reference outer constants by name.
            for cap in sub.captures:
                outer = graph.get_node_id(sub.node_name(cap))
                if outer is not None:
                    used.add(outer)
    const_arg_ids = [c for c in const_arg_ids if c in used]

    input_ids = list(input_ids)
    output_ids = list(output_ids)

    def fn(const_args: Sequence[Any], *inputs):
        values: dict[int, Any] = {}
        for cid, cval in zip(const_arg_ids, const_args):
            values[cid] = cval
        for nid, val in zip(input_ids, inputs):
            values[nid] = val
        rng = jax.random.PRNGKey(rng_seed) if rng_seed is not None else None
        ctx = OpContext("trace", rng=rng)
        return execute_plan(graph, plan, values, output_ids, ctx)

    donate = tuple(
        i + 1 for i, d in enumerate(donate_inputs or ()) if d
    )
    return jax.jit(fn, donate_argnums=donate), const_arg_ids
