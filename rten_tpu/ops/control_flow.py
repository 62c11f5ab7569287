"""Control flow: If (reference: src/ops/control_flow.rs:30).

The only control-flow op in the schema (no Loop/Scan). In interpret mode (and
whenever the condition folds to a constant at trace time) only the taken
branch runs — matching the reference, which executes one subgraph via
run_subgraph + CaptureEnv. With a traced condition we lower to lax.cond,
which requires both branches to produce matching shapes/dtypes.
"""

from __future__ import annotations

import jax
import numpy as np

from rten_tpu.ops.registry import OpError, register


@register("If")
def if_(ctx, attrs, cond):
    then_branch = attrs.get("then_branch")
    else_branch = attrs.get("else_branch")
    if then_branch is None or else_branch is None:
        raise OpError("If requires then/else subgraphs")
    if ctx.run_subgraph is None:
        raise OpError("If requires a subgraph-capable executor")

    if not isinstance(cond, jax.core.Tracer):
        taken = then_branch if np.asarray(cond).reshape(()).item() else else_branch
        return tuple(ctx.run_subgraph(taken))

    outs = jax.lax.cond(
        cond.reshape(()) != 0,
        lambda: tuple(ctx.run_subgraph(then_branch)),
        lambda: tuple(ctx.run_subgraph(else_branch)),
    )
    return tuple(outs)
