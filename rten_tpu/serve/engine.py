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
- decode runs ``steps_per_tick`` iterations per engine tick as ONE device
  program (lax.scan with on-device sampling + per-slot active/EOS/budget
  masking) — the host sees tokens once per tick, so program-launch latency
  amortizes over K tokens; inactive slots compute garbage that is never
  read (cheaper than reshaping the batch every step).

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


@jax.jit
def _carry_admit(tok, act, budget, adm_mask, adm_tok, adm_budget):
    """Fold newly admitted slots into the device-side tick carry."""
    tok = jnp.where(adm_mask[:, None], adm_tok[:, None], tok)
    act = act | adm_mask
    budget = jnp.where(adm_mask, adm_budget, budget)
    return tok, act, budget


@functools.partial(jax.jit, donate_argnums=(0,))
def _mask_lens(lens, active_mask):
    # Inactive slots' lengths are pinned to 0 so their (garbage) KV is fully
    # masked and decode_step's +1 doesn't accumulate.
    return jnp.where(active_mask, lens, 0)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "sampler", "tp_mode", "mesh"),
    donate_argnums=(1,),
)
def _decode_k_steps(
    params,
    cache,
    tokens,  # [B, 1] int32 — last token per slot
    rng,
    active,  # [B] bool — slot occupied at tick start
    eos,  # [B, E] int32 — per-slot EOS ids, -1 padded
    budget,  # [B] int32 — remaining max_new_tokens per slot
    *,
    cfg: decoder.DecoderConfig,
    n_steps: int,
    sampler: Sampler,
    tp_mode: str = "pjit",
    mesh=None,
):
    """``n_steps`` decode iterations as ONE device program (lax.scan): forward
    + on-device sampling + per-slot active/EOS/budget masking, no host round
    trip per token. This is what makes continuous batching real through the
    tunnel's 20µs-30ms launch latency (VERDICT r2 item 4): the engine pays
    one launch per K tokens instead of per token.

    Per-slot stopping inside the scan: a slot that samples an EOS id or
    exhausts its budget flips inactive; inactive slots keep executing (the
    batch shape is static) but their ``len`` is pinned to 0, so their cache
    writes land at position 0 of a slot whose content is already dead —
    every slot that goes inactive mid-scan is retired at tick end — and
    their sampled tokens are masked out of the host-side accounting via the
    emitted ``active`` trajectory.

    Returns (tokens [n_steps, B], actives [n_steps, B], cache, carry) where
    ``actives[s, b]`` says token s of slot b is real output and ``carry`` =
    (final_tok [B,1], final_active [B], budget_left [B]) — the device-side
    tick state the pipelined driver feeds straight into the next tick
    without a host round trip.
    """

    def fwd(tok, cache):
        if tp_mode == "shard_map":
            from rten_tpu.parallel.tp import tp_decode_step

            return tp_decode_step(params, cfg, tok, cache, mesh=mesh, overlap=True)
        return decoder.forward(params, cfg, tok, cache)

    def body(carry, i):
        cache, tok, rng, act = carry
        logits, cache = fwd(tok, cache)
        rng, sub = jax.random.split(rng)
        nxt = sampler.sample(sub, logits[:, -1, :]).astype(jnp.int32)
        hit_eos = jnp.any(nxt[:, None] == eos, axis=1)
        act_next = act & ~hit_eos & (i + 1 < budget)
        cache = dict(cache)
        cache["len"] = jnp.where(act_next, cache["len"], 0)
        return (cache, nxt[:, None], rng, act_next), (nxt, act)

    cache = dict(cache)
    cache["len"] = jnp.where(active, cache["len"], 0)
    (cache, final_tok, _, final_act), (toks, actives) = jax.lax.scan(
        body, (cache, tokens, rng, active), jnp.arange(n_steps)
    )
    budget_left = budget - jnp.sum(actives, axis=0, dtype=jnp.int32)
    return toks, actives, cache, (final_tok, final_act, budget_left)


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
        steps_per_tick: int = 1,
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
        self.steps_per_tick = steps_per_tick
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
        # Monotonic session-wide EOS-array width: the eos shape is part of
        # _decode_k_steps' jit key, so a per-tick max would recompile when a
        # many-stop-token request is admitted AND again when it retires.
        self._eos_width = 4
        self._last_admitted: list[int] = []

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

    def run_pipelined(self) -> list[Request]:
        """Like ``run`` but the next tick is DISPATCHED before this tick's
        tokens are pulled to the host: the device-side tick carry
        (final token / active mask / remaining budget per slot, returned by
        ``_decode_k_steps``) feeds straight into the next program, so the
        per-tick dispatch + host round-trip latency (20µs-30ms through a
        tunnel; µs on a co-located host) overlaps the in-flight device
        program instead of serializing with it. Host bookkeeping
        (``on_token`` streaming, retirement) runs one tick behind the
        device; admission takes effect on the tick after the slot frees.
        Token-exact vs ``run()`` for DETERMINISTIC samplers (the ArgMax
        default): EOS/budget stopping is decided on device by the same
        masking either way. With a stochastic sampler the RNG split
        SEQUENCE differs (all-inactive ticks and one-tick-late admission
        each consume splits), so outputs can diverge in distribution-
        preserving ways; stopping semantics are unchanged (ADVICE r4)."""
        done: list[Request] = []
        pending = None  # (toks_dev, actives_dev, k, slots snapshot)
        carry = None  # (tok [B,1], active [B], budget [B]) device arrays
        while True:
            done.extend(self._admit())
            carry = self._sync_carry(carry)
            if self.n_active > 0:
                pending_next, carry = self._dispatch_tick(carry)
            else:
                pending_next = None
            if pending is not None:
                done.extend(self._process_tick(*pending))
            pending = pending_next
            if pending is None and not self.has_work():
                return done

    # -- engine step ------------------------------------------------------------

    def step(self, n_steps: int | None = None) -> list[Request]:
        """Admit waiting requests, run ``n_steps`` batched decode iterations
        as ONE device program (default ``steps_per_tick``), retire finished.

        Sampling, EOS detection, and per-slot stopping all happen on device
        inside the scan; the host sees tokens once per tick, not per token —
        at steps_per_tick ≥ 8 the tunnel launch latency amortizes to near
        ``generate_scan`` throughput while keeping continuous batching
        (admission/retirement) at tick granularity."""
        finished_at_admission = self._admit()
        if self.n_active == 0:
            return finished_at_admission
        k = n_steps or self.steps_per_tick

        active_np = np.array([s is not None for s in self.slots], bool)
        # eos array shape is part of the K-step program's jit key: pad to a
        # MONOTONIC session max (floor 4) so stop-token churn in the active
        # set recompiles the decode scan at most once per distinct width —
        # never again when a wide request retires.
        self._eos_width = max(
            [len(s.eos_tokens) for s in self.slots if s is not None]
            + [self._eos_width]
        )
        eos_width = self._eos_width
        eos_np = np.full((self.max_batch, eos_width), -1, np.int64)
        budget_np = np.zeros((self.max_batch,), np.int32)
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            eos_np[slot, : len(req.eos_tokens)] = req.eos_tokens
            budget_np[slot] = req.max_new_tokens - len(req.output)

        self._rng, sub = jax.random.split(self._rng)
        toks, actives, self.cache, _carry = _decode_k_steps(
            self.params,
            self.cache,
            jnp.asarray(self._last_tokens[:, None]),
            sub,
            jnp.asarray(active_np),
            jnp.asarray(eos_np.astype(np.int32)),
            jnp.asarray(budget_np),
            cfg=self.cfg,
            n_steps=k,
            sampler=self.sampler,
            tp_mode=self.tp_mode,
            mesh=self.mesh,
        )
        toks = np.asarray(toks)  # [k, B] — the tick's single host transfer
        actives = np.asarray(actives)
        self.steps += k

        finished: list[Request] = []
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            for s in range(k):
                if not actives[s, slot]:
                    break
                tok = int(toks[s, slot])
                req.output.append(tok)
                if req.on_token:
                    req.on_token(tok)
                self._last_tokens[slot] = tok
                if tok in req.eos_tokens or len(req.output) >= req.max_new_tokens:
                    req.finished = True
                    finished.append(req)
                    self.slots[slot] = None
                    # Slot freed: its device len is already 0 (the scan
                    # pinned it when the slot flipped inactive).
                    break
        return finished_at_admission + finished

    # -- admission ---------------------------------------------------------------

    def _admit(self) -> list[Request]:
        finished: list[Request] = []
        self._last_admitted = []
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
                self._last_admitted.append(slot)
        return finished

    # -- pipelined ticking -------------------------------------------------------

    def _sync_carry(self, carry):
        """Device-side tick carry, folding host events in: ``None`` → built
        fresh from host state; otherwise newly admitted slots are spliced in
        (continuing slots' values live on device, one tick AHEAD of the host
        bookkeeping — the host copies would be stale)."""
        if self.n_active == 0 and not self._last_admitted:
            return carry

        def slot_budget(s):
            return (s.max_new_tokens - len(s.output)) if s is not None else 0

        if carry is None:
            act = np.array([s is not None for s in self.slots], bool)
            budget = np.array([slot_budget(s) for s in self.slots], np.int32)
            return (
                jnp.asarray(self._last_tokens[:, None]),
                jnp.asarray(act),
                jnp.asarray(budget),
            )
        if not self._last_admitted:
            return carry
        adm = np.zeros((self.max_batch,), bool)
        adm[self._last_admitted] = True
        budget = np.array([slot_budget(s) for s in self.slots], np.int32)
        tok, act, bud = _carry_admit(
            *carry,
            jnp.asarray(adm),
            jnp.asarray(self._last_tokens),
            jnp.asarray(budget),
        )
        return (tok, act, bud)

    def _dispatch_tick(self, carry):
        """Launch one K-step decode program from the device-side carry;
        returns ((toks, actives, k, slots snapshot), next carry) WITHOUT
        forcing any host transfer."""
        k = self.steps_per_tick
        tok, act, budget = carry
        self._eos_width = max(
            [len(s.eos_tokens) for s in self.slots if s is not None]
            + [self._eos_width]
        )
        eos_np = np.full((self.max_batch, self._eos_width), -1, np.int64)
        for slot, req in enumerate(self.slots):
            if req is not None:
                eos_np[slot, : len(req.eos_tokens)] = req.eos_tokens
        self._rng, sub = jax.random.split(self._rng)
        toks, actives, self.cache, carry_out = _decode_k_steps(
            self.params,
            self.cache,
            tok,
            sub,
            act,
            jnp.asarray(eos_np.astype(np.int32)),
            budget,
            cfg=self.cfg,
            n_steps=k,
            sampler=self.sampler,
            tp_mode=self.tp_mode,
            mesh=self.mesh,
        )
        return (toks, actives, k, list(self.slots)), carry_out

    def _process_tick(self, toks, actives, k, reqs) -> list[Request]:
        """Host bookkeeping for a completed (or in-flight — np.asarray
        blocks) tick: stream tokens, retire finished requests, free slots."""
        toks = np.asarray(toks)
        actives = np.asarray(actives)
        self.steps += k
        finished: list[Request] = []
        for slot, req in enumerate(reqs):
            if req is None or req.finished:
                continue
            for s in range(k):
                if not actives[s, slot]:
                    break
                tok = int(toks[s, slot])
                req.output.append(tok)
                if req.on_token:
                    req.on_token(tok)
                self._last_tokens[slot] = tok
                if tok in req.eos_tokens or len(req.output) >= req.max_new_tokens:
                    req.finished = True
                    finished.append(req)
                    if self.slots[slot] is req:
                        self.slots[slot] = None
                    break
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
