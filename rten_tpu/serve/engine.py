"""Continuous-batching inference engine.

Slot-based scheduler over the native decoder: a fixed-size batch of KV-cache
slots; requests are admitted into free slots (prefill writes the slot's KV),
every engine step runs ONE batched decode program across all slots, finished
requests retire and free their slot immediately for waiting requests —
tokens/s stays at the batched rate regardless of per-request lengths.

Design notes (TPU-first):
- prefill runs per-request at bucketed lengths (compile-once per bucket) on a
  batch=1 cache, then the KV prefix is spliced into the slot with one
  dynamic_update_slice program — admission never recompiles the decode step;
- decode is one fixed-shape program per (max_batch); inactive slots compute
  garbage that is never read (cheaper than reshaping the batch every step);
- sampling happens on device inside the decode program's epilogue.

The reference has no equivalent (single-request Generator only).
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
from collections import deque
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from rten_tpu.generate.sampler import ArgMaxSampler, Sampler
from rten_tpu.models import decoder


@dataclasses.dataclass
class Request:
    prompt: list[int]
    max_new_tokens: int = 64
    eos_tokens: tuple[int, ...] = ()
    request_id: int | None = None
    on_token: Callable[[int], None] | None = None
    # filled by the engine:
    output: list[int] = dataclasses.field(default_factory=list)
    finished: bool = False


def _bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 1024) * 1024


@functools.partial(jax.jit, donate_argnums=(0,))
def _splice_slot(cache_leaf, src_leaf, slot: jax.Array):
    """Write src (batch=1 cache leaf) into row ``slot`` of the engine cache."""
    return jax.lax.dynamic_update_slice_in_dim(cache_leaf, src_leaf, slot, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_len(lens, slot, value):
    return lens.at[slot].set(value)


@functools.partial(jax.jit, donate_argnums=(0,))
def _mask_lens(lens, active_mask):
    # Inactive slots' lengths are pinned to 0 so their (garbage) KV is fully
    # masked and decode_step's +1 doesn't accumulate.
    return jnp.where(active_mask, lens, 0)


class ServingEngine:
    def __init__(
        self,
        params,
        cfg: decoder.DecoderConfig,
        *,
        max_batch: int = 8,
        max_len: int | None = None,
        sampler: Sampler | None = None,
        seed: int = 0,
        mesh=None,
        tp_mode: str = "pjit",
    ) -> None:
        """``mesh``: a ("data", "model") jax.sharding.Mesh — weights get the
        Megatron tensor-parallel layout and the KV cache shards batch×heads
        (rten_tpu.parallel.mesh). With ``tp_mode="pjit"`` (default) the
        engine code path is identical and pjit propagates shardings through
        prefill/decode; ``tp_mode="shard_map"`` runs the decode step through
        the EXPLICIT tensor-parallel path (parallel/tp.py: shard_map body
        with per-shard Pallas kernels and overlapped ring collectives —
        BASELINE config 5: Llama-class INT8 with continuous batching over
        N≥2 hosts). shard_map mode needs UNFUSED projections
        (quantize_params_int8(..., fuse=False))."""
        if tp_mode not in ("pjit", "shard_map"):
            raise ValueError(f"unknown tp_mode {tp_mode!r}")
        if tp_mode == "shard_map":
            if mesh is None:
                raise ValueError("tp_mode='shard_map' requires a mesh")
            if cfg.int8_kv:
                raise NotImplementedError(
                    "tp_mode='shard_map' has no int8-KV attention path yet; "
                    "use tp_mode='pjit' for int8_kv engines"
                )
            if any("wqkv" in l or "w_gu" in l for l in params["layers"]):
                raise ValueError(
                    "shard_map TP needs unfused projections — quantize with "
                    "quantize_params_int8(params, fuse=False)"
                )
        self.tp_mode = tp_mode
        if mesh is not None:
            from rten_tpu.parallel import shard_decoder_params

            params = shard_decoder_params(params, mesh)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len or cfg.max_seq
        self.sampler = sampler or ArgMaxSampler()
        self.cache = decoder.init_cache(cfg, max_batch, self.max_len)
        if mesh is not None:
            from rten_tpu.parallel import shard_cache

            self.cache = shard_cache(self.cache, mesh)
        self.slots: list[Request | None] = [None] * max_batch
        self.queue: deque[Request] = deque()
        self._last_tokens = np.zeros((max_batch,), np.int32)
        self._rng = jax.random.PRNGKey(seed)
        self._ids = itertools.count()
        self.steps = 0

    # -- public API -----------------------------------------------------------

    def submit(self, request: Request) -> Request:
        if request.request_id is None:
            request.request_id = next(self._ids)
        if len(request.prompt) + request.max_new_tokens > self.max_len:
            raise ValueError(
                f"request needs {len(request.prompt) + request.max_new_tokens} "
                f"cache slots, engine max_len is {self.max_len}"
            )
        self.queue.append(request)
        return request

    @property
    def n_active(self) -> int:
        return sum(1 for s in self.slots if s is not None)

    def has_work(self) -> bool:
        return self.n_active > 0 or bool(self.queue)

    def run(self) -> list[Request]:
        """Drive until all submitted requests finish; returns them."""
        done: list[Request] = []
        while self.has_work():
            done.extend(self.step())
        return done

    # -- engine step ------------------------------------------------------------

    def step(self) -> list[Request]:
        """Admit waiting requests, run one batched decode, retire finished."""
        finished_at_admission = self._admit()
        if self.n_active == 0:
            return finished_at_admission

        tokens = jnp.asarray(self._last_tokens[:, None])
        self._rng, sub = jax.random.split(self._rng)
        if self.tp_mode == "shard_map":
            from rten_tpu.parallel.tp import tp_decode_step

            logits, self.cache = tp_decode_step(
                self.params, self.cfg, tokens, self.cache,
                mesh=self.mesh, overlap=True,
            )
        else:
            logits, self.cache = decoder.decode_step(
                self.params, self.cfg, tokens, self.cache
            )
        sampled = np.asarray(self.sampler.sample(sub, logits[:, -1, :]))
        self.steps += 1
        active = jnp.asarray(
            np.array([s is not None for s in self.slots], bool)
        )
        self.cache["len"] = _mask_lens(self.cache["len"], active)

        finished: list[Request] = []
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            tok = int(sampled[slot])
            req.output.append(tok)
            if req.on_token:
                req.on_token(tok)
            self._last_tokens[slot] = tok
            hit_eos = tok in req.eos_tokens
            if hit_eos or len(req.output) >= req.max_new_tokens:
                req.finished = True
                finished.append(req)
                self.slots[slot] = None
                # Freeing the slot: zero its length so the stale KV is masked.
                self.cache["len"] = _set_len(
                    self.cache["len"], jnp.int32(slot), jnp.int32(0)
                )
        return finished_at_admission + finished

    # -- admission ---------------------------------------------------------------

    def _admit(self) -> list[Request]:
        finished: list[Request] = []
        while self.queue and self.n_active < self.max_batch:
            req = self.queue.popleft()
            slot = self.slots.index(None)
            self._prefill_into_slot(req, slot)
            # The prefill-sampled first token may already finish the request.
            first = req.output[-1]
            if first in req.eos_tokens or len(req.output) >= req.max_new_tokens:
                req.finished = True
                finished.append(req)
                self.cache["len"] = _set_len(
                    self.cache["len"], jnp.int32(slot), jnp.int32(0)
                )
            else:
                self.slots[slot] = req
        return finished

    def _prefill_into_slot(self, req: Request, slot: int) -> None:
        prompt = np.asarray(req.prompt, np.int32)
        bucket = _bucket(len(prompt))
        padded = np.zeros((1, bucket), np.int32)
        padded[0, : len(prompt)] = prompt

        # Batch-1 prefill at a bucketed length (one compile per bucket).
        tmp_cache = decoder.init_cache(self.cfg, 1, self.max_len)
        logits, tmp_cache = decoder.prefill(
            self.params, self.cfg, jnp.asarray(padded), tmp_cache
        )

        # First sampled token comes from the last REAL prompt position.
        self._rng, sub = jax.random.split(self._rng)
        first = int(
            np.asarray(self.sampler.sample(sub, logits[:, len(prompt) - 1, :]))[0]
        )
        req.output.append(first)
        if req.on_token:
            req.on_token(first)
        self._last_tokens[slot] = first

        # Splice the prefix KV into the slot; only len(prompt) entries valid.
        # Iterate ALL per-layer cache leaves — int8_kv engines carry
        # k_scale/v_scale beside k/v, and dropping them would leave the
        # prefix attending with zero scales.
        slot_arr = jnp.int32(slot)
        for key, leaves in self.cache.items():
            if not isinstance(leaves, list):
                continue
            for li in range(self.cfg.n_layers):
                self.cache[key][li] = _splice_slot(
                    self.cache[key][li], tmp_cache[key][li], slot_arr
                )
        self.cache["len"] = _set_len(
            self.cache["len"], slot_arr, jnp.int32(len(prompt))
        )
