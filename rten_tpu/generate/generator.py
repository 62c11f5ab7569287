"""The autoregressive generation loop.

Reference: rten-generate/src/generator.rs — Generator :235 (iterator of
token ids), from_model_config :319 (HF-Optimum input-name discovery),
with_prompt :465 / append_prompt :474 (multi-turn chat),
generate_next_token :511 (the per-step dance). The TPU redesign executes TWO
compiled programs — prefill and decode-step — over a preallocated KV cache,
instead of one graph run per token with cache tensors moved in and out by
value (generator.rs:565-641).

Two backends:
- ``NativeBackend`` — rten_tpu.models.decoder functional models (fast path;
  single XLA program per step, Pallas attention, optional INT8 weights).
- ``GraphBackend`` — any loaded `.rten`/ONNX graph following HF Optimum
  conventions (input_ids / attention_mask / position_ids /
  past_key_values.N.key|value). Mask-honoring graphs run COMPILED at
  bucketed cache lengths over a preallocated KV buffer (one XLA program per
  bucket); graphs without an attention_mask fall back to exact-shape
  interpret execution. Use a native model for production serving.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from rten_tpu.generate.metrics import Metrics
from rten_tpu.generate.sampler import ArgMaxSampler, Sampler


@dataclasses.dataclass
class GeneratorConfig:
    """Reference: GeneratorConfig/ModelInputsConfig, generator.rs:118-170."""

    max_tokens: int = 128
    eos_tokens: tuple[int, ...] = ()
    seed: int = 0


class NativeBackend:
    """Backend over rten_tpu.models.decoder (params, cfg)."""

    def __init__(self, params, cfg, batch: int = 1, max_len: int | None = None):
        from rten_tpu.models import decoder

        self._decoder = decoder
        self.params = params
        self.cfg = cfg
        self.batch = batch
        self.max_len = max_len or cfg.max_seq
        self.cache = decoder.init_cache(cfg, batch, self.max_len)

    def reset(self) -> None:
        self.cache = self._decoder.init_cache(self.cfg, self.batch, self.max_len)

    def prefill(self, tokens: np.ndarray) -> jax.Array:
        logits, self.cache = self._decoder.prefill(
            self.params, self.cfg, jnp.asarray(tokens, jnp.int32), self.cache
        )
        return logits[:, -1, :]

    def decode(self, tokens: np.ndarray) -> jax.Array:
        logits, self.cache = self._decoder.decode_step(
            self.params, self.cfg, jnp.asarray(tokens, jnp.int32), self.cache
        )
        return logits[:, -1, :]


def _len_bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return -(-n // 1024) * 1024


import functools  # noqa: E402


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_seq(cache, new, start):
    """Write ``new`` at sequence offset ``start`` (seq axis = -2). The cache
    buffer is donated — XLA updates it in place between steps."""
    idx = [jnp.int32(0)] * cache.ndim
    idx[-2] = jnp.int32(start)
    return jax.lax.dynamic_update_slice(cache, new.astype(cache.dtype), tuple(idx))


class GraphBackend:
    """Backend over a loaded graph Model using HF-Optimum naming conventions
    (reference: from_model_config name matching, generator.rs:319 +
    ModelInputsConfig defaults :151-170).

    Execution strategy (the TPU redesign of the reference's per-step graph
    run, generator.rs:565-641): the KV state lives in a PREALLOCATED padded
    buffer of bucketed length P; every decode step feeds the whole buffer
    plus an attention_mask that marks [0, len) and the new tail positions
    valid, runs the graph as ONE COMPILED XLA program (cached per bucket),
    and scatters the appended K/V back into the buffer with a donated
    dynamic_update_slice. The graph still performs its own Concat-on-cache
    internally, but shapes stay fixed for an entire bucket — no per-token
    retrace, no interpret-mode dispatch, no growing reallocations.

    This is exact for any graph that honors attention_mask for K/V validity
    (the HF Optimum export contract); graphs without a mask input fall back
    to the legacy exact-shape interpret path.

    ``constant_inputs`` are loop-invariant inputs (e.g. encoder states);
    on the first step the backend hoists everything derivable from them via
    ``Model.partial_run`` (reference: generator.rs:533-544) and feeds the
    frontier values back as extra inputs on every subsequent run, so the
    per-step program skips the invariant subgraph entirely.
    """

    CACHE_PATTERNS = (
        re.compile(r"^past_key_values\.(\d+)\.(key|value)$"),
        re.compile(r"^past_key_values\.(\d+)\.(decoder|encoder)\.(key|value)$"),
    )

    def __init__(self, model, *, mode: str | None = None, constant_inputs=None):
        from rten_tpu.runtime.session import RunOptions

        self.model = model
        names = model.input_names()
        self.input_ids_name = "input_ids"
        self.attention_mask_name = "attention_mask" if "attention_mask" in names else None
        self.position_ids_name = "position_ids" if "position_ids" in names else None
        # Optimum MERGED decoder exports take an explicit branch selector:
        # 0 → compute caches fresh (first step), 1 → reuse the past inputs.
        self.use_cache_branch_name = (
            "use_cache_branch" if "use_cache_branch" in names else None
        )
        self.cache_inputs: list[str] = [
            n for n in names if any(p.match(n) for p in self.CACHE_PATTERNS)
        ]
        out_names = model.output_names()
        if not out_names:
            raise ValueError(
                "graph declares no outputs — not a runnable generation "
                "model (note: load-time optimization sweeps constants "
                "unreachable from outputs, so a weights-only graph also "
                "loses its lift-able initializers)"
            )
        self.logits_name = "logits" if "logits" in out_names else out_names[0]
        # present.N[.decoder|.encoder].key|value → the matching past input
        # name. The .decoder/.encoder segments are PRESERVED — enc-dec
        # exports (Whisper/TrOCR-class, reference KvCacheData cross-attention
        # handling, generator.rs:59-66) distinguish growing self-attn caches
        # from static cross-attn caches by exactly these segments.
        self.cache_outputs = {
            n: n.replace("present", "past_key_values", 1)
            for n in out_names
            if n.startswith("present")
        }
        # Cross-attention (encoder) caches are projections of the encoder
        # states: computed once, never appended, seq axis = encoder length.
        self.static_cache = frozenset(
            n for n in self.cache_inputs if ".encoder." in n
        )
        if mode is None:
            # Auto-select compiled when the graph takes explicit position_ids
            # (we feed exact positions), OR when its positions provably come
            # from a CumSum over the attention_mask (the HF-Optimum no-
            # position-ids export pattern): under the bucketed mask (ones on
            # [0,L), zeros over the gap, ones on the tail) cumsum(mask)-1
            # yields the true position at every valid column, so padding is
            # exact. A graph that instead derives positions from the past-KV
            # SHAPE would read the padded bucket length — those stay on the
            # interpret path (and can opt in with mode="compiled").
            mode = (
                "compiled"
                if self.attention_mask_name
                and self.cache_inputs
                and (self.position_ids_name or self._positions_from_mask())
                else "interpret"
            )
            if mode == "interpret":
                import warnings

                why = (
                    "no attention_mask input"
                    if self.attention_mask_name is None
                    else "positions not derivable from the attention_mask "
                    "(no position_ids input and no CumSum-over-mask pattern)"
                )
                warnings.warn(
                    f"GraphBackend: falling back to EXACT-SHAPE INTERPRET "
                    f"execution ({why}) — one op-by-op dispatch per token, "
                    f"orders of magnitude slower than the compiled bucketed "
                    f"path. Re-export the graph with attention_mask/"
                    f"position_ids inputs, pass mode='compiled' if the graph "
                    f"is mask-exact anyway, or auto-lift onto the native "
                    f"decoder kernels (rten_tpu.models.lift).",
                    stacklevel=2,
                )
        if mode == "compiled" and self.attention_mask_name is None:
            # The compiled path marks KV validity through the mask; without
            # one the graph would attend over bucket padding (and the step
            # would crash feeding inputs[None]). Fail with the reason instead.
            raise ValueError(
                "GraphBackend(mode='compiled') requires the graph to take an "
                "attention_mask input (HF Optimum export contract); this "
                "graph has none — use mode='interpret' or auto-lift "
                "(models/lift.py) onto the native decoder kernels"
            )
        self.mode = mode
        self.opts = RunOptions(
            mode="compile" if mode == "compiled" else "interpret"
        )
        self.constant_inputs: dict[str, Any] = dict(constant_inputs or {})
        self._hoisted: dict[int, Any] | None = None
        # KV state: name → padded device array (compiled) / exact array (legacy)
        self.cache: dict[str, Any] = {}
        self.seq_len = 0
        self._bucket = 0
        self._kv_meta = self._discover_kv_meta()

    def _discover_kv_meta(self):
        metas = {}
        for name in self.cache_inputs:
            nid = self.model.node_id(name)
            shape = self.model.input_shape(nid) or []
            metas[name] = shape
        return metas

    def _positions_from_mask(self) -> bool:
        """True when the graph's positions provably derive from the
        attention_mask: some CumSum consumes a value reachable from the mask
        input, and no Shape op reads a past-KV input (which would make
        lengths/positions sensitive to the padded bucket length)."""
        from rten_tpu.graph import OperatorNode

        graph = self.model.graph
        ops = [n for n in graph.nodes if isinstance(n, OperatorNode)]
        kv_ids = {self.model.node_id(n) for n in self.cache_inputs}
        if any(
            op.op_type == "Shape" and any(i in kv_ids for i in op.inputs if i is not None)
            for op in ops
        ):
            return False
        reachable = {self.model.node_id(self.attention_mask_name)}
        changed = True
        found_cumsum = False
        while changed and not found_cumsum:
            changed = False
            for op in ops:
                ins = [i for i in op.inputs if i is not None]
                if any(i in reachable for i in ins):
                    if op.op_type == "CumSum":
                        found_cumsum = True
                        break
                    for o in op.outputs:
                        if o is not None and o not in reachable:
                            reachable.add(o)
                            changed = True
        return found_cumsum

    def reset(self) -> None:
        self.cache = {}
        self.seq_len = 0
        self._bucket = 0

    def _empty_cache_value(self, name: str, batch: int) -> np.ndarray:
        shape = list(self._kv_meta.get(name) or [])
        dims = [batch if isinstance(d, str) and "batch" in d else d for d in shape]
        dims = [0 if isinstance(d, str) or d is None else int(d) for d in dims]
        # Zero-length sequence axis: assume axis -2 is the sequence.
        if len(dims) >= 2:
            dims[-2] = 0
        return np.zeros(dims, dtype=np.float32)

    def _base_inputs(self) -> dict[Any, Any]:
        inputs: dict[Any, Any] = dict(self.constant_inputs)
        if self.constant_inputs and self._hoisted is None:
            # One-time loop-invariant hoist (reference generator.rs:533-544):
            # partial_run evaluates everything reachable from the constant
            # inputs and hands back the frontier values.
            self._hoisted = dict(
                self.model.partial_run(self.constant_inputs, [self.logits_name])
            )
        if self._hoisted:
            inputs.update(self._hoisted)
        return inputs

    # -- legacy exact-shape interpret path -----------------------------------

    def _step_legacy(self, tokens: np.ndarray) -> jax.Array:
        batch, t = tokens.shape
        inputs = self._base_inputs()
        inputs[self.input_ids_name] = tokens.astype(np.int32)
        new_len = self.seq_len + t
        if self.attention_mask_name:
            inputs[self.attention_mask_name] = np.ones((batch, new_len), np.int32)
        if self.position_ids_name:
            inputs[self.position_ids_name] = np.arange(self.seq_len, new_len, dtype=np.int32)[None, :].repeat(batch, 0)
        if self.use_cache_branch_name:
            inputs[self.use_cache_branch_name] = np.asarray(
                [0 if self.seq_len == 0 else 1], np.int32
            )
        for name in self.cache_inputs:
            inputs[name] = self.cache.get(name)
            if inputs[name] is None:
                inputs[name] = self._empty_cache_value(name, batch)
        wanted = [self.logits_name, *self.cache_outputs.keys()]
        outs = self.model.run(inputs, wanted, self.opts)
        logits = np.asarray(outs[0])
        for out_name, vals in zip(list(self.cache_outputs.keys()), outs[1:]):
            self.cache[self.cache_outputs[out_name]] = np.asarray(vals)
        self.seq_len = new_len
        return jnp.asarray(logits[:, -1, :])

    # -- compiled bucketed path ----------------------------------------------

    def _grow_cache(self, target: int) -> None:
        """Pad every GROWING KV buffer's sequence axis to ``target`` (next
        bucket); static cross-attn caches keep the encoder length."""
        for name, buf in self.cache.items():
            if name in self.static_cache:
                continue
            pad = [(0, 0)] * buf.ndim
            pad[-2] = (0, target - buf.shape[-2])
            self.cache[name] = jnp.pad(buf, pad)
        self._bucket = target

    def _step_compiled(self, tokens: np.ndarray) -> jax.Array:
        batch, t = tokens.shape
        L = self.seq_len

        if not self.cache:
            # Bucketed prefill: input_ids padded to a length bucket, pad
            # positions masked off; past arrives with a zero-length seq axis.
            tb = _len_bucket(t)
            ids = np.zeros((batch, tb), np.int32)
            ids[:, :t] = tokens
            mask = np.zeros((batch, tb), np.int32)
            mask[:, :t] = 1
            inputs = self._base_inputs()
            inputs[self.input_ids_name] = ids
            inputs[self.attention_mask_name] = mask
            if self.position_ids_name:
                pos = np.minimum(np.arange(tb), t - 1).astype(np.int32)
                inputs[self.position_ids_name] = pos[None, :].repeat(batch, 0)
            if self.use_cache_branch_name:
                inputs[self.use_cache_branch_name] = np.asarray([0], np.int32)
            for name in self.cache_inputs:
                inputs[name] = self._empty_cache_value(name, batch)
            wanted = [self.logits_name, *self.cache_outputs.keys()]
            outs = self.model.run(inputs, wanted, self.opts)
            logits = outs[0]
            self._bucket = _len_bucket(t + 1)
            for out_name, present in zip(list(self.cache_outputs.keys()), outs[1:]):
                present = jnp.asarray(present)
                key = self.cache_outputs[out_name]
                if key in self.static_cache:
                    # Cross-attn cache: encoder-length seq axis, stored
                    # exactly, never padded or appended.
                    self.cache[key] = present
                    continue
                pad = [(0, 0)] * present.ndim
                pad[-2] = (0, self._bucket - present.shape[-2])
                # Only the first t seq entries are real; the padding beyond
                # stays masked until overwritten by decode appends.
                self.cache[key] = jnp.pad(present, pad)
            self.seq_len = t
            return jnp.asarray(logits)[:, t - 1, :]

        if L + t > self._bucket:
            self._grow_cache(_len_bucket(L + t))
        P = self._bucket

        # Valid columns: the real prefix [0, L) plus the t new tail positions.
        mask = np.zeros((batch, P + t), np.int32)
        mask[:, :L] = 1
        mask[:, P:] = 1
        inputs = self._base_inputs()
        inputs[self.input_ids_name] = tokens.astype(np.int32)
        inputs[self.attention_mask_name] = mask
        if self.position_ids_name:
            inputs[self.position_ids_name] = np.arange(L, L + t, dtype=np.int32)[
                None, :
            ].repeat(batch, 0)
        if self.use_cache_branch_name:
            inputs[self.use_cache_branch_name] = np.asarray([1], np.int32)
        for name in self.cache_inputs:
            inputs[name] = self.cache[name]
        # Static cross-attn presents are identical every step — don't ask the
        # program to rematerialize them after prefill.
        growing_outs = [
            n for n in self.cache_outputs
            if self.cache_outputs[n] not in self.static_cache
        ]
        wanted = [self.logits_name, *growing_outs]
        outs = self.model.run(inputs, wanted, self.opts)
        logits = outs[0]
        start = jnp.int32(L)
        for out_name, present in zip(growing_outs, outs[1:]):
            key = self.cache_outputs[out_name]
            new = jax.lax.slice_in_dim(
                jnp.asarray(present), P, P + t, axis=jnp.ndim(present) - 2
            )
            self.cache[key] = _append_seq(self.cache[key], new, start)
        self.seq_len = L + t
        return jnp.asarray(logits)[:, -1, :]

    def _step(self, tokens: np.ndarray) -> jax.Array:
        if self.mode == "compiled":
            return self._step_compiled(tokens)
        return self._step_legacy(tokens)

    def prefill(self, tokens: np.ndarray) -> jax.Array:
        return self._step(tokens)

    def decode(self, tokens: np.ndarray) -> jax.Array:
        return self._step(tokens)


class Generator:
    """Iterator over generated token ids (one per batch row per step).

    Usage mirrors the reference chain (rten-examples/src/gpt2.rs:112-118):

        gen = (Generator(backend)
               .with_prompt(prompt_ids)
               .with_sampler(TopKSampler(40))
               .profile(metrics))
        for token in itertools.islice(gen, 50): ...
    """

    def __init__(self, backend, config: GeneratorConfig | None = None):
        self.backend = backend
        self.config = config or GeneratorConfig()
        self.sampler: Sampler = ArgMaxSampler()
        self.metrics: Metrics | None = None
        self._pending: np.ndarray | None = None
        self._rng = jax.random.PRNGKey(self.config.seed)
        self._emitted = 0
        self._finished = False
        self._first = True
        self._on_token: Callable[[np.ndarray], None] | None = None
        self._draft: "NativeBackend | None" = None

    # -- builder API (reference: generator.rs with_prompt :465 etc.) --------

    def with_prompt(self, prompt: list[int] | np.ndarray) -> "Generator":
        arr = np.asarray(prompt, np.int32)
        if arr.ndim == 1:
            arr = arr[None, :]
        self._pending = arr
        return self

    def append_prompt(self, prompt: list[int] | np.ndarray) -> "Generator":
        """Add follow-up prompt tokens mid-conversation (multi-turn chat,
        reference: generator.rs:474). The not-yet-fed last sampled token is
        prepended so the model sees the full history."""
        arr = np.asarray(prompt, np.int32)
        if arr.ndim == 1:
            arr = arr[None, :]
        if self._pending is None and not self._first:
            self._pending = np.concatenate([self._last[:, None], arr], axis=1)
        elif self._pending is not None:
            self._pending = np.concatenate([self._pending, arr], axis=1)
        else:
            self._pending = arr
        self._finished = False
        return self

    def with_sampler(self, sampler: Sampler) -> "Generator":
        self.sampler = sampler
        return self

    def with_draft(
        self, draft: "NativeBackend", *, k: int = 4, rounds_per_call: int = 4
    ) -> "Generator":
        """Enable speculative decoding: ``draft`` (a smaller NativeBackend)
        proposes ``k`` tokens per round and the main backend verifies them in
        one chunked forward (generate/speculative.py). The iterator contract
        is unchanged — one token per ``__next__`` — tokens are served from a
        per-row buffer refilled ``rounds_per_call`` rounds at a time. Output
        is exact vs non-speculative decoding: token-exact under
        ArgMaxSampler, distribution-exact under TemperatureSampler (the two
        samplers the verify step can reproduce; others raise). Both backends
        must be NativeBackend (rollback = per-row cache-length bookkeeping).
        Beyond-parity: the reference generates strictly one Model::run per
        token (rten-generate/src/generator.rs:511-651)."""
        if not isinstance(self.backend, NativeBackend) or not isinstance(
            draft, NativeBackend
        ):
            raise TypeError(
                "with_draft requires NativeBackend target and draft "
                "(speculative rollback needs the native cache's per-row "
                "valid-length bookkeeping)"
            )
        if draft.batch != self.backend.batch:
            raise ValueError("draft batch size must match target backend")
        self._draft = draft
        self._spec_k = k
        self._spec_rounds = rounds_per_call
        self._spec_buf: list[list[int]] | None = None
        return self

    def profile(self, metrics: Metrics) -> "Generator":
        self.metrics = metrics
        return self

    def on_token(self, cb: Callable[[np.ndarray], None]) -> "Generator":
        self._on_token = cb
        return self

    # -- iteration ------------------------------------------------------------

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        if self._finished or self._emitted >= self.config.max_tokens:
            raise StopIteration
        if self.metrics:
            self.metrics.start_step()
        if self._draft is not None:
            next_tokens = self._spec_next()
        else:
            if self._pending is not None:
                tokens = self._pending
                self._pending = None
                logits = (
                    self.backend.prefill(tokens)
                    if self._first
                    else self.backend.decode(tokens)
                )
                self._first = False
            else:
                logits = self.backend.decode(self._last[:, None])
            self._rng, sub = jax.random.split(self._rng)
            next_tokens = np.asarray(self.sampler.sample(sub, logits))
        jax.block_until_ready(next_tokens)
        if self.metrics:
            self.metrics.end_step()
        self._last = next_tokens
        self._emitted += 1
        if self.config.eos_tokens and bool(
            np.all(np.isin(next_tokens, self.config.eos_tokens))
        ):
            self._finished = True
        if self._on_token:
            self._on_token(next_tokens)
        return next_tokens

    # -- speculative decoding (with_draft) -----------------------------------

    def _spec_next(self) -> np.ndarray:
        """One iterator step in draft mode: serve from the per-row buffer,
        refilling it with device-side speculative rounds when any row runs
        dry. Prompt chunks feed BOTH caches so they stay prefix-aligned."""
        bk, dk = self.backend, self._draft
        if self._pending is not None:
            tokens = self._pending
            self._pending = None
            if self._first:
                # Headroom: rounds can overshoot max_tokens by up to
                # rounds*(k+1) buffered tokens, and the scan clamp reserves
                # k+2 — a cache sized for PLAIN decoding (prompt+max_tokens)
                # would let the clamp bind mid-stream and silently corrupt
                # the verified prefix. Grow both caches up front instead.
                need = (
                    tokens.shape[1]
                    + self.config.max_tokens
                    + self._spec_rounds * (self._spec_k + 1)
                    + self._spec_k + 2
                )
                for nb in (bk, dk):
                    if nb.max_len < need:
                        nb.max_len = need
                        nb.reset()
                logits = bk.prefill(tokens)
                dk.prefill(tokens)
                self._first = False
            else:
                # Mid-conversation append: the caches may hold verified
                # tokens the iterator never emitted (still buffered). The
                # invariant is cache = prompt + all produced tokens except
                # the final one (_spec_last), so dropping u buffered tokens
                # = rolling each row's valid length back by u (stale
                # entries are never read and get overwritten).
                if self._spec_buf is not None and any(self._spec_buf):
                    u = jnp.asarray(
                        [len(b) for b in self._spec_buf], jnp.int32
                    )
                    for nb in (bk, dk):
                        nb.cache = dict(nb.cache)
                        nb.cache["len"] = nb.cache["len"] - u
                logits = bk.decode(tokens)
                dk.decode(tokens)
            self._rng, sub = jax.random.split(self._rng)
            toks = np.asarray(self.sampler.sample(sub, logits))
            self._spec_buf = [[] for _ in range(bk.batch)]
            self._spec_last = toks
            return toks
        if any(not b for b in self._spec_buf):
            self._spec_refill()
        return np.asarray([b.pop(0) for b in self._spec_buf], np.int32)

    def _spec_refill(self) -> None:
        from rten_tpu.generate import speculative
        from rten_tpu.generate.sampler import TemperatureSampler

        bk, dk = self.backend, self._draft
        # The scan clamp (speculative.py s_limit) exists to protect device
        # writes for rows the HOST stopped reading; here every row is still
        # live, so the clamp binding would silently corrupt the verified
        # prefix. Refuse instead: the refill needs rounds*(k+1) appends plus
        # the k+2 reserve.
        need = (
            int(np.asarray(bk.cache["len"]).max())
            + self._spec_rounds * (self._spec_k + 1)
            + self._spec_k + 2
        )
        if bk.max_len < need or dk.max_len < need:
            raise ValueError(
                f"speculative refill needs cache headroom {need} but "
                f"max_len is {min(bk.max_len, dk.max_len)}; construct the "
                f"NativeBackends with a larger max_len (or lower "
                f"max_tokens/rounds_per_call)"
            )
        last = jnp.asarray(self._spec_last, jnp.int32)[:, None]
        if isinstance(self.sampler, ArgMaxSampler):
            toks, counts, ct, cd, last_new = speculative.speculative_scan(
                bk.params, bk.cfg, bk.cache, dk.params, dk.cfg, dk.cache,
                last, k=self._spec_k, n_rounds=self._spec_rounds,
            )
        elif isinstance(self.sampler, TemperatureSampler):
            (
                toks, counts, ct, cd, last_new, self._rng,
            ) = speculative.speculative_sample_scan(
                bk.params, bk.cfg, bk.cache, dk.params, dk.cfg, dk.cache,
                last, self._rng,
                jnp.float32(self.sampler.temperature),
                k=self._spec_k, n_rounds=self._spec_rounds,
            )
        else:
            raise ValueError(
                "speculative decoding verifies ArgMaxSampler and "
                f"TemperatureSampler exactly; {type(self.sampler).__name__} "
                "would change the target distribution"
            )
        bk.cache, dk.cache = ct, cd
        toks_np = np.asarray(toks)  # [R, B, K+1]
        counts_np = np.asarray(counts)  # [R, B]
        for r in range(toks_np.shape[0]):
            for i in range(bk.batch):
                self._spec_buf[i].extend(
                    int(t) for t in toks_np[r, i, : counts_np[r, i]]
                )
        self._spec_last = np.asarray(last_new)[:, 0]


def backend_for_model(model, n_heads: int | None = None, batch: int = 1):
    """Pick the fastest backend for a loaded graph model: try lifting it onto
    the native decoder (models/lift.py — HF-named initializers → native
    params, Pallas decode kernels, one XLA program per step); fall back to
    the generic GraphBackend (interpret-mode graph execution) when the graph
    isn't a recognized decoder."""
    from rten_tpu.models.lift import LiftError, lift_decoder, lift_encoder_decoder

    try:
        cfg, params = lift_decoder(model, n_heads=n_heads)
        return NativeBackend(params, cfg, batch=batch)
    except LiftError:
        pass
    try:
        # Whisper-class encoder-decoder graphs lift onto EncDecBackend —
        # but that backend needs the per-utterance encoder input, so hand
        # back a typed factory the caller invokes with the audio features
        # (isinstance-checkable, unlike a bare closure).
        cfg, params = lift_encoder_decoder(model, n_heads=n_heads)
        return EncDecBackendFactory(params, cfg)
    except LiftError:
        return GraphBackend(model)


class EncDecBackendFactory:
    """Returned by backend_for_model for encoder-decoder graphs: call it
    with the per-utterance encoder input (audio features) to get an
    EncDecBackend. Carries the lifted cfg/params."""

    def __init__(self, params, cfg):
        self.params = params
        self.cfg = cfg

    def __call__(self, encoder_input, max_len=None):
        return EncDecBackend(self.params, self.cfg, encoder_input, max_len=max_len)


class EncDecBackend:
    """Generator backend over the native encoder-decoder
    (models/encoder_decoder): ``encode`` once per utterance, then
    prefill/decode over the self-attention cache with precomputed
    cross-attention K/V — the reference's encoder-decoder generation flow
    (rten-generate cross-attention caches, generator.rs:59-66) as two
    compiled programs."""

    def __init__(self, params, cfg, encoder_input, max_len: int | None = None):
        import jax.numpy as jnp

        from rten_tpu.models import encoder_decoder as ed

        self._ed = ed
        self.params = params
        self.cfg = cfg
        enc_states = ed.encode_jit(params, cfg, jnp.asarray(encoder_input))
        self._enc_states = enc_states
        self.max_len = max_len or cfg.max_text_ctx
        self.state = ed.init_decoder_state(params, cfg, enc_states, self.max_len)

    def reset(self) -> None:
        self.state = self._ed.init_decoder_state(
            self.params, self.cfg, self._enc_states, self.max_len
        )

    def _step(self, tokens: np.ndarray):
        import jax.numpy as jnp

        logits, self.state = self._ed.decode_step(
            self.params, self.cfg, jnp.asarray(tokens, jnp.int32), self.state
        )
        return logits[:, -1, :]

    prefill = _step
    decode = _step
