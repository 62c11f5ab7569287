"""Model session: load → optimize → run.

Reference: src/model.rs (Model :102, ModelOptions :173, load_file :238,
run :635, run_one :668, partial_run :694). The TPU difference: ``run`` can
execute in *interpret* mode (eager, per-op timing) or *compile* mode (whole
plan jitted into one XLA program, cached per input/output signature —
replacing RTen's plan cache + in-place machinery, src/graph.rs:386,566).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Mapping, Sequence

import jax
import numpy as np

from rten_tpu.graph import ConstantNode, Graph, OperatorNode, ValueNode
from rten_tpu.runtime import executor
from rten_tpu.runtime.timing import RunTiming


@dataclasses.dataclass
class RunOptions:
    """Reference: RunOptions, src/graph.rs:524-540 (+ TPU-specific mode)."""

    timing: bool = False
    verbose: bool = False
    timing_sort: str = "time"
    timing_by_shape: bool = False
    mode: str | None = None  # None → session default ("compile" | "interpret")
    seed: int | None = None
    # Donate device-resident input buffers in compile mode (in-place reuse
    # across calls — KV-style graph models; host arrays are never donated).
    donate_inputs: bool = False


@dataclasses.dataclass
class ModelOptions:
    """Reference: ModelOptions, src/model.rs:173-196."""

    enable_optimization: bool = True
    mode: str = "compile"
    allowed_ops: set[str] | None = None  # selective registration equivalent


class Model:
    def __init__(
        self,
        graph: Graph,
        metadata: dict[str, Any] | None = None,
        options: ModelOptions | None = None,
    ) -> None:
        self.options = options or ModelOptions()
        self.metadata = metadata or {}
        if self.options.enable_optimization:
            from rten_tpu.optimize import optimize_graph

            graph = optimize_graph(graph)
        self.graph = graph
        self._validate_ops()
        self._compiled: dict[tuple, tuple[Any, list[int]]] = {}
        self._device_consts: dict[int, Any] = {}

    # ---- loading ----------------------------------------------------------

    @classmethod
    def load_file(cls, path: str | os.PathLike, options: ModelOptions | None = None) -> "Model":
        with open(path, "rb") as f:
            data = f.read()
        return cls.load(data, options)

    @classmethod
    def load(cls, data: bytes, options: ModelOptions | None = None) -> "Model":
        from rten_tpu.format.rten_io import load_rten

        graph, metadata = load_rten(data)
        return cls(graph, metadata, options)

    @classmethod
    def load_mmap(cls, path: str | os.PathLike, options: ModelOptions | None = None) -> "Model":
        """Zero-copy load via mmap (reference: src/model.rs:255-295 load_mmap;
        constants become views into the mapping)."""
        import mmap

        with open(path, "rb") as f:
            mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        return cls.load(mm, options)  # type: ignore[arg-type]

    def _validate_ops(self) -> None:
        from rten_tpu.ops.registry import OpError, have_op

        allowed = self.options.allowed_ops
        for _, op in self.graph.operator_nodes():
            if not have_op(op.op_type):
                raise OpError(f"model uses unregistered operator {op.op_type!r}")
            if allowed is not None and op.op_type not in allowed:
                raise OpError(f"operator {op.op_type!r} is not in the allowed set")

    # ---- introspection ------------------------------------------------------

    @property
    def input_ids(self) -> list[int]:
        return list(self.graph.inputs)

    @property
    def output_ids(self) -> list[int]:
        return list(self.graph.outputs)

    def input_names(self) -> list[str]:
        return [self.graph.node_name(i) for i in self.graph.inputs]

    def output_names(self) -> list[str]:
        return [self.graph.node_name(o) for o in self.graph.outputs]

    def node_id(self, name: str) -> int:
        nid = self.graph.get_node_id(name)
        if nid is None:
            raise KeyError(f"no node named {name!r}")
        return nid

    def input_shape(self, node_id: int) -> list[int | str | None] | None:
        node = self.graph.nodes[node_id]
        return node.shape if isinstance(node, ValueNode) else None

    def total_params(self) -> int:
        return self.graph.total_params()

    # ---- running ------------------------------------------------------------

    def _resolve_ids(self, keys) -> list[int]:
        out = []
        for k in keys:
            out.append(k if isinstance(k, int) else self.node_id(k))
        return out

    def run(
        self,
        inputs: Mapping[str | int, Any] | Sequence[Any],
        outputs: Sequence[str | int] | None = None,
        opts: RunOptions | None = None,
    ) -> list[Any]:
        opts = opts or RunOptions()
        opts = _apply_timing_env(opts)
        if isinstance(inputs, Mapping):
            in_ids = self._resolve_ids(inputs.keys())
            in_vals = list(inputs.values())
        else:
            in_ids = self.input_ids
            in_vals = list(inputs)
            if len(in_vals) != len(in_ids):
                raise ValueError(
                    f"model expects {len(in_ids)} inputs, got {len(in_vals)}"
                )
        out_ids = (
            self._resolve_ids(outputs) if outputs is not None else self.output_ids
        )
        mode = opts.mode or self.options.mode
        if opts.timing:
            mode = "interpret"  # per-op timing only meaningful eagerly

        if mode == "interpret":
            rng = jax.random.PRNGKey(opts.seed) if opts.seed is not None else None
            timing = RunTiming() if opts.timing else None
            result = executor.run_plan(
                self.graph,
                dict(zip(in_ids, in_vals)),
                out_ids,
                rng=rng,
                timing=timing,
            )
            if timing is not None:
                print(timing.summary(opts.timing_sort, opts.timing_by_shape))
            return result

        # compile mode
        donate_mask = (
            tuple(isinstance(v, jax.Array) for v in in_vals)
            if opts.donate_inputs
            else None
        )
        sig = (
            tuple(in_ids),
            tuple(out_ids),
            tuple((tuple(np.shape(v)), str(np.result_type(v))) for v in in_vals),
            opts.seed,
            donate_mask,
        )
        entry = self._compiled.get(sig)
        if entry is None:
            fn, const_arg_ids = executor.build_compiled(
                self.graph,
                in_ids,
                out_ids,
                rng_seed=opts.seed,
                donate_inputs=donate_mask,
            )
            entry = (fn, const_arg_ids)
            self._compiled[sig] = entry
        fn, const_arg_ids = entry
        const_args = [self._device_const(c) for c in const_arg_ids]
        return fn(const_args, *in_vals)

    def _device_const(self, node_id: int):
        val = self._device_consts.get(node_id)
        if val is None:
            node = self.graph.nodes[node_id]
            assert isinstance(node, ConstantNode)
            val = jax.device_put(node.value)
            self._device_consts[node_id] = val
        return val

    def run_one(self, input_value: Any, opts: RunOptions | None = None) -> Any:
        """Single-input single-output convenience (reference: src/model.rs:668)."""
        outs = self.run([input_value], opts=opts)
        return outs[0]

    def run_n(
        self,
        inputs: Mapping[str | int, Any],
        outputs: Sequence[str | int],
        opts: RunOptions | None = None,
    ) -> list[Any]:
        return self.run(inputs, outputs, opts)

    def partial_run(
        self,
        inputs: Mapping[str | int, Any],
        outputs: Sequence[str | int],
        opts: RunOptions | None = None,
    ) -> list[tuple[int, Any]]:
        """Evaluate as much of the graph as possible given only ``inputs``
        (reference: src/model.rs:694 → src/graph.rs:1237). Returns the
        resolved requested outputs PLUS the evaluation frontier — computed
        values consumed by operators that could NOT run (reference
        partial_run returns these leaves so the generation loop can hoist
        loop-invariant subgraphs, generator.rs:533-544, and feed them back
        as extra inputs on every step). Always eager."""
        del opts
        in_ids = self._resolve_ids(inputs.keys())
        out_ids = self._resolve_ids(outputs)
        # Plan as if every graph input were present, then prune to what the
        # provided subset can actually compute (reference: src/graph.rs:1276).
        plan_inputs = sorted(set(self.graph.inputs) | set(in_ids))
        plan = self.graph.create_plan(plan_inputs, out_ids)
        pruned, resolved = self.graph.prune_plan(plan, set(in_ids), out_ids)
        values: dict[int, Any] = dict(zip(in_ids, inputs.values()))
        from rten_tpu.ops.registry import OpContext

        executor.execute_plan(
            self.graph, pruned, values, resolved, OpContext("eager")
        )
        from rten_tpu.graph import operator_dependencies

        executed = set(pruned)
        computed = {
            o
            for op_id in pruned
            for o in self.graph.nodes[op_id].outputs
            if o is not None
        }
        frontier: list[int] = []
        for op_id in plan:
            if op_id in executed:
                continue
            for dep in operator_dependencies(self.graph, self.graph.nodes[op_id]):
                if dep in computed and dep not in resolved and dep not in frontier:
                    frontier.append(dep)
        return [(o, values[o]) for o in list(resolved) + frontier]


def _apply_timing_env(opts: RunOptions) -> RunOptions:
    """RTEN_TIMING env var (reference: src/model.rs:130-160,642): "1" or an
    option string like "sort=name by-shape=1" turns on the per-op timing
    table without touching call sites."""
    import dataclasses
    import os

    spec = os.environ.get("RTEN_TIMING")
    if not spec or opts.timing:
        return opts
    sort = opts.timing_sort
    by_shape = opts.timing_by_shape
    for tokens in spec.split():
        key, _, val = tokens.partition("=")
        if key == "sort" and val:
            sort = val
        elif key in ("by-shape", "by_shape"):
            by_shape = val in ("1", "true", "yes", "")
    return dataclasses.replace(
        opts, timing=True, timing_sort=sort, timing_by_shape=by_shape
    )
