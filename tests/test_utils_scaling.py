"""utils (bench stats, env flags) + the scaling benchmark harness."""

import json
import os
import sys

import numpy as np

from rten_tpu.utils import BenchStats, env_flag, env_int, run_bench
from rten_tpu.utils.bench import marginal_step_time


def test_run_bench_stats():
    stats = run_bench(5, "noop", lambda: np.zeros(4))
    assert len(stats.times_s) == 5
    assert stats.min <= stats.median <= stats.max
    assert "noop" in str(stats)


def test_marginal_step_time_linear():
    import time

    def run_at(n):
        time.sleep(0.001 * n)

    t = marginal_step_time(run_at, 1, 10, trials=2)
    assert 0.0005 < t < 0.005


def test_env_flags(monkeypatch):
    monkeypatch.setenv("X_FLAG", "true")
    assert env_flag("X_FLAG") is True
    monkeypatch.setenv("X_FLAG", "0")
    assert env_flag("X_FLAG", default=True) is False
    monkeypatch.delenv("X_FLAG")
    assert env_flag("X_FLAG", default=True) is True
    monkeypatch.setenv("X_INT", "7")
    assert env_int("X_INT", 3) == 7
    monkeypatch.setenv("X_INT", "junk")
    assert env_int("X_INT", 3) == 3


def test_scaling_harness_runs(capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from benchmarks import scaling

    rc = scaling.main(["--meshes", "1x1,1x2", "--steps", "8", "--layers", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rows = out["results"]
    assert [r["mesh"] for r in rows] == ["1x1", "1x2"]
    assert all(r["tokens_per_s"] > 0 for r in rows)
    assert all("fixed_silicon_efficiency" in r for r in rows)
    assert "efficiency_basis" in out
