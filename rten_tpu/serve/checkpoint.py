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


def _snapshot_cache(cache: dict) -> tuple[dict, dict]:
    """Flatten every cache leaf (k/v, int8-KV k_scale/v_scale, len, paged
    variants — whatever the config produced) into named host arrays plus a
    structure map for restore. Iterating all leaves rather than hard-coding
    k/v/len is what keeps int8_kv engines restorable."""
    arrays: dict[str, np.ndarray] = {}
    structure: dict[str, int | None] = {}
    for key, val in cache.items():
        if isinstance(val, list):
            structure[key] = len(val)
            for li, leaf in enumerate(val):
                arrays[f"{key}{li}"] = np.asarray(jax.device_get(leaf))
        else:
            structure[key] = None
            arrays[key] = np.asarray(jax.device_get(val))
    return arrays, structure


def _restore_cache(arrays: dict, structure: dict) -> dict:
    import jax.numpy as jnp

    cache: dict = {}
    for key, n in structure.items():
        if n is None:
            cache[key] = jnp.asarray(arrays[key])
        else:
            cache[key] = [jnp.asarray(arrays[f"{key}{li}"]) for li in range(n)]
    return cache


def snapshot_engine(engine) -> dict:
    """Capture a ServingEngine's session state (device → host copy)."""
    arrays, structure = _snapshot_cache(engine.cache)
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
        "cache_structure": structure,
    }
    return {"arrays": arrays, "meta": meta}


def restore_engine(engine, snapshot: dict) -> None:
    """Load a snapshot into a freshly constructed engine (same cfg/max_batch).
    Weights are NOT touched — the engine was built with them already."""
    from rten_tpu.serve.engine import Request

    arrays, meta = snapshot["arrays"], snapshot["meta"]
    import jax.numpy as jnp

    structure = meta.get("cache_structure") or {
        key: (len(val) if isinstance(val, list) else None)
        for key, val in engine.cache.items()
    }
    engine.cache = _restore_cache(arrays, structure)
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
    arrays, structure = _snapshot_cache(backend.cache)
    return {"arrays": arrays, "meta": {"cache_structure": structure}}


def restore_backend(backend, snapshot: dict) -> None:
    meta = snapshot["meta"]
    structure = meta.get("cache_structure")
    if structure is None:  # legacy snapshot
        n = meta["n_layers"]
        structure = {"k": n, "v": n, "len": None}
    backend.cache = _restore_cache(snapshot["arrays"], structure)


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
