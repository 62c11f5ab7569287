"""bench.py outage behavior: the parent retries a hung device init in fresh
subprocesses and degrades to the last mid-round opportunistic capture rather
than a 0.0 artifact (VERDICT r3 item 2; reference analog: the CLI bench loop
always produces a number, rten-cli/src/main.rs:117-123)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(stale_path, attempts="2"):
    env = dict(os.environ)
    env.pop("RTEN_BENCH_CHILD", None)
    env.update(
        {
            "RTEN_BENCH_FAKE_HANG": "1",  # child sleeps through its watchdog
            "RTEN_BENCH_INIT_TIMEOUT_S": "2",
            "RTEN_BENCH_INIT_ATTEMPTS": attempts,
            "RTEN_BENCH_RETRY_BACKOFF_S": "0",
            "RTEN_BENCH_BUDGET_S": "5",
            "RTEN_BENCH_STALE_PATH": str(stale_path),
            "JAX_PLATFORMS": "cpu",  # never touch the tunnel from tests
        }
    )
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line; stdout={proc.stdout!r} stderr={proc.stderr[-500:]!r}"
    return json.loads(lines[-1])


def test_init_hang_retries_then_honest_zero(tmp_path):
    rec = _run_bench(tmp_path / "stale.json")
    assert rec["value"] == 0.0
    err = rec["detail"]["error"]
    assert "2 init attempts failed" in err
    assert "attempt 1" in err and "attempt 2" in err


def test_init_hang_degrades_to_midround_capture(tmp_path):
    stale = tmp_path / "stale.json"
    captured = {
        "metric": "tokens/sec/chip (GPT-2-small-class 124M, INT8 weights, batch 1 decode)",
        "value": 4321.0,
        "unit": "tokens/s",
        "vs_baseline": 0.77,
        "detail": {"mean_step_ms": 0.23},
    }
    stale.write_text(json.dumps(captured))
    rec = _run_bench(stale)
    assert rec["value"] == 4321.0
    assert rec["vs_baseline"] == 0.77
    assert rec["detail"]["stale"] is True
    assert "fresh capture failed" in rec["detail"]["stale_reason"]


def test_write_stale_roundtrip(tmp_path, monkeypatch):
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setattr(bench, "STALE_PATH", str(tmp_path / "s.json"))
    bench.write_stale({"metric": "m", "value": 1.5, "unit": "u", "vs_baseline": 0.5})
    got = bench._read_stale()
    assert got["value"] == 1.5
    assert got["detail"]["captured_unix"] > 0
    # zero-valued records are never used as fallback
    bench.write_stale({"metric": "m", "value": 0.0, "unit": "u", "vs_baseline": 0.0})
    assert bench._read_stale() is None


def test_stream_bytes_exclude_slabs_and_sig_fencing():
    """Roofline accounting: the mega-path slab DUPLICATES must not count as
    streamed bytes (they deflated the roofline to vs_baseline > 1 on
    2026-08-19), and pre-fix captures must not provenance-match post-fix
    ones in best-of-round selection."""
    import importlib.util

    import numpy as np

    spec = importlib.util.spec_from_file_location("bench_mod", BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    pack = {"q": np.zeros((4, 8), np.int8), "s": np.zeros((8,), np.float32)}
    params = {"lm_head_q": pack, "slabs": {"w_up": np.zeros((2, 4, 8), np.int8)}}
    assert bench._quant_stream_bytes(params) == 4 * 8 + 8 * 4

    old = {"detail": {"provenance": {"lm_head_q_shape": [1], "flags": {}}}}
    new = {
        "detail": {
            "provenance": {"lm_head_q_shape": [1], "flags": {}, "roofline_v": 2}
        }
    }
    assert bench._prov_sig(old) != bench._prov_sig(new)
