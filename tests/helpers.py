"""Shared test helpers (reference analog: run_op, src/ops/mod.rs:1151, and
expect_equal, rten-tensor/src/test_util.rs)."""

from __future__ import annotations

import numpy as np

from rten_tpu.ops.registry import OpContext, get_op


def run_op(name: str, *inputs, attrs: dict | None = None, n_outputs: int | None = None):
    """Run a registered op eagerly; returns numpy (first output unless the op
    is multi-output)."""
    ctx = OpContext("eager")
    a = dict(attrs or {})
    if n_outputs is not None:
        a["_n_outputs"] = n_outputs
    result = get_op(name).fn(ctx, a, *inputs)
    if isinstance(result, tuple):
        return tuple(np.asarray(r) for r in result)
    return np.asarray(result)
