"""Opportunistic headline capture loop (VERDICT r4 #2).

Runs ``bench.py`` every RTEN_CAPTURE_PERIOD_S seconds (default 40 min).
bench.py itself appends each successful fresh capture to
``BENCH_CAPTURES_r05.jsonl`` and keeps ``BENCH_midround.json`` at the best
provenance-matched capture, so this loop only has to invoke it — one capture
per ~2h was round 4's evidence bottleneck (VERDICT r4 weak #8).

Coordination: skips a cycle while ``/tmp/rten_chip_lock`` exists (manual
experiments hold it) and holds the lock itself during a capture so
experiments don't start mid-capture.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCK = "/tmp/rten_chip_lock"
PERIOD = float(os.environ.get("RTEN_CAPTURE_PERIOD_S", "2400"))


def one_capture() -> str:
    env = dict(
        os.environ,
        RTEN_BENCH_INIT_ATTEMPTS="1",
        RTEN_BENCH_INIT_TIMEOUT_S="150",
        RTEN_BENCH_BUDGET_S="300",
        RTEN_BENCH_WHISPER_BUDGET_S="180",
    )
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            timeout=1500,
            cwd=REPO,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return "hard-timeout"
    for cand in reversed(proc.stdout.strip().splitlines()):
        try:
            rec = json.loads(cand)
        except ValueError:
            continue
        if isinstance(rec, dict) and "metric" in rec:
            d = rec.get("detail", {})
            if rec.get("value", 0) <= 0:
                return f"failed: {d.get('error', '?')[:120]}"
            if d.get("stale"):
                return "fresh failed (stale fallback reported)"
            return (
                f"ok: {rec['value']} tok/s, vs_baseline {rec['vs_baseline']}"
                f" (fresh {d.get('fresh', {}).get('vs_baseline', rec['vs_baseline'])})"
            )
    return f"no JSON line (rc {proc.returncode})"


def main() -> None:
    while True:
        if os.path.exists(LOCK):
            print(f"[capture_loop] chip lock held; retry in 180s", flush=True)
            time.sleep(180)
            continue
        try:
            with open(LOCK, "w") as f:
                f.write(f"capture_loop pid {os.getpid()}")
            t0 = time.time()
            status = one_capture()
            print(
                f"[capture_loop] {time.strftime('%H:%M:%S')} "
                f"({time.time() - t0:.0f}s): {status}",
                flush=True,
            )
        finally:
            try:
                os.remove(LOCK)
            except OSError:
                pass
        time.sleep(PERIOD)


if __name__ == "__main__":
    main()
