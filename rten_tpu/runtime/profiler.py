"""Hardware-level tracing helpers (SURVEY.md §5: the TPU equivalent of the
reference's per-op wall timing + external samply profiling,
docs/performance.md:86-105 there).

Two levels exist in this framework:
1. the interpret executor's per-op timing table (RunOptions(timing=True),
   runtime/timing.py) — the reference's RunTiming equivalent;
2. this module — device-level XPlane traces via jax.profiler for compiled
   programs, viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rten_tpu_trace"):
    """Capture a device trace around a block:

        with profiler.trace("/tmp/trace"):
            model.run(inputs)

    Open the directory in TensorBoard (profile plugin) / xprof."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Host-side per-step wall times with warmup split — the generation
    Metrics pattern generalized to any stepped workload (serving engine
    steps, training-style loops)."""

    def __init__(self) -> None:
        self.times_s: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times_s.append(time.perf_counter() - self._t0)
        self._t0 = None
        return False

    @property
    def steady_s(self) -> list[float]:
        return self.times_s[1:] if len(self.times_s) > 1 else self.times_s

    def mean_ms(self) -> float:
        ts = self.steady_s
        return 1e3 * sum(ts) / len(ts) if ts else 0.0

    def summary(self) -> str:
        return (
            f"{len(self.times_s)} steps; warmup "
            f"{(self.times_s[0] * 1e3 if self.times_s else 0):.1f} ms; "
            f"steady mean {self.mean_ms():.2f} ms"
        )
