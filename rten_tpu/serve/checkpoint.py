"""Serving-session checkpoint/resume.

The reference has no checkpointing (SURVEY.md §5 — inference-only; its
nearest analogs are the immutable .rten weight file and the Generator's
in-memory KV state). For restartable multi-host serving we snapshot the
MUTABLE session state only — KV caches, slot table, queue, RNG, per-request
progress — never the weights (those reload from the immutable model file,
exactly the reference's durability model).

A snapshot is a plain dict: {"arrays": {name: np.ndarray}, "meta": {...}}.
``save_snapshot`` writes one .npz + the metadata JSON inside it.
"""

from __future__ import annotations

import dataclasses
import io
import json
from collections import deque

import jax
import numpy as np


def snapshot_engine(engine) -> dict:
    """Capture a ServingEngine's session state (device → host copy)."""
    arrays: dict[str, np.ndarray] = {}
    for li, (k, v) in enumerate(zip(engine.cache["k"], engine.cache["v"])):
        arrays[f"k{li}"] = np.asarray(jax.device_get(k))
        arrays[f"v{li}"] = np.asarray(jax.device_get(v))
    arrays["len"] = np.asarray(jax.device_get(engine.cache["len"]))
    arrays["last_tokens"] = engine._last_tokens.copy()
    arrays["rng"] = np.asarray(jax.device_get(engine._rng))

    def req_meta(req):
        return {
            "prompt": list(map(int, req.prompt)),
            "max_new_tokens": req.max_new_tokens,
            "eos_tokens": list(map(int, req.eos_tokens)),
            "request_id": req.request_id,
            "output": list(map(int, req.output)),
            "finished": req.finished,
        }

    meta = {
        "slots": [None if r is None else req_meta(r) for r in engine.slots],
        "queue": [req_meta(r) for r in engine.queue],
        "steps": engine.steps,
    }
    return {"arrays": arrays, "meta": meta}


def restore_engine(engine, snapshot: dict) -> None:
    """Load a snapshot into a freshly constructed engine (same cfg/max_batch).
    Weights are NOT touched — the engine was built with them already."""
    from rten_tpu.serve.engine import Request

    arrays, meta = snapshot["arrays"], snapshot["meta"]
    import jax.numpy as jnp

    n_layers = len(engine.cache["k"])
    engine.cache = {
        "k": [jnp.asarray(arrays[f"k{li}"]) for li in range(n_layers)],
        "v": [jnp.asarray(arrays[f"v{li}"]) for li in range(n_layers)],
        "len": jnp.asarray(arrays["len"]),
    }
    engine._last_tokens = np.asarray(arrays["last_tokens"]).copy()
    engine._rng = jnp.asarray(arrays["rng"])
    engine.steps = int(meta["steps"])

    def mk_req(m):
        if m is None:
            return None
        r = Request(
            prompt=m["prompt"],
            max_new_tokens=m["max_new_tokens"],
            eos_tokens=tuple(m["eos_tokens"]),
            request_id=m["request_id"],
        )
        r.output = list(m["output"])
        r.finished = m["finished"]
        return r

    engine.slots = [mk_req(m) for m in meta["slots"]]
    engine.queue = deque(mk_req(m) for m in meta["queue"])


def snapshot_backend(backend) -> dict:
    """Capture a Generator NativeBackend's KV session (multi-turn chat state,
    ≙ the reference Generator's cache + seq_len, generator.rs:59-80)."""
    arrays = {
        f"k{li}": np.asarray(jax.device_get(k))
        for li, k in enumerate(backend.cache["k"])
    }
    arrays.update(
        {
            f"v{li}": np.asarray(jax.device_get(v))
            for li, v in enumerate(backend.cache["v"])
        }
    )
    arrays["len"] = np.asarray(jax.device_get(backend.cache["len"]))
    return {"arrays": arrays, "meta": {"n_layers": len(backend.cache["k"])}}


def restore_backend(backend, snapshot: dict) -> None:
    import jax.numpy as jnp

    arrays = snapshot["arrays"]
    n = snapshot["meta"]["n_layers"]
    backend.cache = {
        "k": [jnp.asarray(arrays[f"k{li}"]) for li in range(n)],
        "v": [jnp.asarray(arrays[f"v{li}"]) for li in range(n)],
        "len": jnp.asarray(arrays["len"]),
    }


def save_snapshot(snapshot: dict, path: str) -> None:
    buf = {k: v for k, v in snapshot["arrays"].items()}
    buf["__meta__"] = np.frombuffer(
        json.dumps(snapshot["meta"]).encode(), dtype=np.uint8
    )
    np.savez(path, **buf)


def load_snapshot(path: str) -> dict:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
    return {"arrays": arrays, "meta": meta}
