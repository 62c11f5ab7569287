"""Multi-host runtime, failure detection, checkpoint/resume, HTTP serving.

SURVEY.md §5: the reference has none of these (single-process inference);
they are required TPU-build additions. Tests run on localhost / the virtual
CPU mesh.
"""

import json
import threading
import time
import urllib.request

import jax
import numpy as np
import pytest

from rten_tpu.models import decoder
from rten_tpu.parallel.multihost import (
    HeartbeatMonitor,
    ServingSupervisor,
    init_distributed,
)
from rten_tpu.serve import checkpoint
from rten_tpu.serve.engine import Request, ServingEngine

TINY = decoder.DecoderConfig(
    vocab_size=64, n_layers=2, n_heads=2, d_model=32, d_ff=64, max_seq=64
)


def _make_engine(seed=0, **kw):
    params = decoder.init_params(jax.random.PRNGKey(0), TINY)
    return ServingEngine(params, TINY, max_batch=2, seed=seed, **kw)


def test_init_distributed_single_process():
    info = init_distributed()
    assert info["num_processes"] == 1
    assert info["global_devices"] >= 1


def test_heartbeat_detects_dead_peer():
    dead: list[int] = []
    # Host 0 listens; host 1 beats to it, then stops.
    m0 = HeartbeatMonitor(0, 0, {}, interval=0.1, timeout=0.5)
    m0.start()
    m1 = HeartbeatMonitor(
        1, 0, {0: ("127.0.0.1", m0.port)}, interval=0.1, timeout=0.5
    )
    # monitor 0 watches peer 1 at monitor 1's port
    from rten_tpu.parallel.multihost import PeerState

    m0.peers[1] = PeerState(("127.0.0.1", m1.port), last_seen=time.monotonic())
    m0.on_peer_dead = dead.append
    m1.start()
    time.sleep(0.4)
    assert m0.alive_peers() == [1]
    m1.stop()  # peer goes silent
    deadline = time.monotonic() + 3
    while not dead and time.monotonic() < deadline:
        time.sleep(0.05)
    assert dead == [1]
    assert m0.dead_peers() == [1]
    m0.stop()


def test_engine_snapshot_restore_identical_continuation():
    # Run A: straight through. Run B: snapshot mid-flight, restore into a
    # fresh engine, continue. Outputs must match exactly (ArgMax sampler).
    prompts = [[1, 2, 3], [4, 5]]

    eng_a = _make_engine()
    for prompt in prompts:
        eng_a.submit(Request(prompt=prompt, max_new_tokens=8))
    done_a = eng_a.run()

    eng_b = _make_engine()
    for prompt in prompts:
        eng_b.submit(Request(prompt=prompt, max_new_tokens=8))
    for _ in range(3):
        eng_b.step()
    snap = checkpoint.snapshot_engine(eng_b)

    eng_c = _make_engine()
    checkpoint.restore_engine(eng_c, snap)
    done_c = list(eng_c.run())
    # collect all finished including those that finished pre-snapshot
    outs_a = {tuple(r.prompt): r.output for r in done_a}
    outs_c = {tuple(r.prompt): r.output for r in done_c}
    for key, out in outs_c.items():
        assert outs_a[key] == out


def test_engine_snapshot_restore_int8_kv():
    """An int8_kv engine has k_scale/v_scale cache leaves; snapshot/restore
    must carry them (regression: they were silently dropped, breaking
    supervisor recovery for the INT8-KV configuration)."""
    cfg = decoder.DecoderConfig(
        vocab_size=64,
        n_layers=2,
        n_heads=2,
        d_model=32,
        d_ff=64,
        max_seq=64,
        int8_kv=True,
    )
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)

    eng_a = ServingEngine(params, cfg, max_batch=2, seed=0)
    eng_a.submit(Request(prompt=[1, 2, 3], max_new_tokens=8))
    (done_a,) = eng_a.run()

    eng_b = ServingEngine(params, cfg, max_batch=2, seed=0)
    eng_b.submit(Request(prompt=[1, 2, 3], max_new_tokens=8))
    for _ in range(3):
        eng_b.step()
    snap = checkpoint.snapshot_engine(eng_b)
    assert any(k.startswith("k_scale") for k in snap["arrays"])

    eng_c = ServingEngine(params, cfg, max_batch=2, seed=0)
    checkpoint.restore_engine(eng_c, snap)
    (done_c,) = eng_c.run()
    assert done_c.output == done_a.output


def test_snapshot_save_load_roundtrip(tmp_path):
    eng = _make_engine()
    eng.submit(Request(prompt=[1, 2], max_new_tokens=4))
    eng.step()
    snap = checkpoint.snapshot_engine(eng)
    path = str(tmp_path / "sess.npz")
    checkpoint.save_snapshot(snap, path)
    loaded = checkpoint.load_snapshot(path)
    assert loaded["meta"]["steps"] == snap["meta"]["steps"]
    np.testing.assert_array_equal(loaded["arrays"]["len"], snap["arrays"]["len"])


def test_supervisor_recovers_from_crash():
    crash_once = {"armed": True}

    class CrashyEngine(ServingEngine):
        def step(self):
            if crash_once["armed"] and self.steps >= 3:
                crash_once["armed"] = False
                raise RuntimeError("injected failure")
            return super().step()

    def factory():
        params = decoder.init_params(jax.random.PRNGKey(0), TINY)
        return CrashyEngine(params, TINY, max_batch=2, seed=0)

    sup = ServingSupervisor(factory, snapshot_every=1, max_restarts=2)
    sup.submit(Request(prompt=[1, 2, 3], max_new_tokens=10))
    done = sup.run()
    assert sup.restarts == 1
    assert len(done) == 1 and len(done[0].output) == 10

    # Reference run without crash must produce the same tokens.
    ref = _make_engine()
    ref.submit(Request(prompt=[1, 2, 3], max_new_tokens=10))
    (ref_done,) = ref.run()
    assert done[0].output == ref_done.output


def test_http_server_generate_and_health():
    from rten_tpu.serve.http import ServingServer

    server = ServingServer(_make_engine())
    server.start()
    try:
        url = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(f"{url}/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        body = json.dumps({"prompt": [1, 2, 3], "max_new_tokens": 5}).encode()
        req = urllib.request.Request(
            f"{url}/generate", data=body, headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["finished"] and len(out["tokens"]) == 5

        # The JS client (js/rten_client.js) and docs/http_api.md pin this
        # exact schema — field renames must fail here, not in a browser.
        assert set(out) == {"request_id", "tokens", "finished"}
        assert {"status", "active", "queued", "steps"} <= set(health)
        assert all(isinstance(t, int) for t in out["tokens"])
    finally:
        server.stop()


def test_js_client_contract_files():
    """The JS binding artifact exists and encodes the same endpoints and
    fields the server implements (no node in the CI image — the contract is
    pinned textually here and behaviorally above)."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    js = open(os.path.join(root, "js", "rten_client.js"), encoding="utf-8").read()
    for needle in (
        "/generate",
        "/healthz",
        "/stats",
        "max_new_tokens",
        "maxNewTokens",
        "request_id",
        "RtenServerError",
    ):
        assert needle in js, needle
    doc = open(os.path.join(root, "docs", "http_api.md"), encoding="utf-8").read()
    assert "/generate" in doc and "max_new_tokens" in doc
