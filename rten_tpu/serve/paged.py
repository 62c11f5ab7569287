"""Paged KV-cache serving: page pool allocator + continuous-batching engine.

The slot engine (serve/engine.py) reserves a max_len × max_batch rectangle
of KV per slot; this engine allocates fixed-size pages from a shared pool on
demand (the vLLM design, SURVEY.md §7 "paged KV cache"), so HBM holds
Σ ceil(len_i/page) pages instead of B·max_len — 2-10× more concurrent
sequences for long-tailed request lengths. Decode runs the Pallas paged
attention kernel (kernels/paged_attention.py) with per-sequence page tables
delivered via scalar prefetch; the new token's KV is appended in place by
the kernel.

Host side (this module): a free-list allocator, admission (prefill into a
temp contiguous cache, scatter into freshly allocated pages), page-table
maintenance, retirement (pages return to the free list immediately).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rten_tpu.generate.sampler import ArgMaxSampler, Sampler
from rten_tpu.kernels.paged_attention import (
    paged_attention_supported,
    paged_decode_attention,
)
from rten_tpu.models import decoder
from rten_tpu.serve.engine import Request, _bucket


class PagePool:
    """Free-list page allocator over per-layer device page arrays."""

    def __init__(
        self,
        cfg: decoder.DecoderConfig,
        n_pages: int,
        page_size: int = 128,
        dtype=None,
    ) -> None:
        if not paged_attention_supported(cfg.head_dim, page_size):
            raise ValueError(
                f"page_size {page_size} unsupported for head_dim {cfg.head_dim}"
            )
        self.cfg = cfg
        self.n_pages = n_pages
        self.page_size = page_size
        dtype = dtype or cfg.dtype
        # FOLDED page storage [Hk, P, page·D/128, 128] — 128-lane minor dim
        # keeps XLA on the row-major layout (see models/decoder.init_cache).
        # One extra physical page (index n_pages) is the SCRATCH page:
        # inactive batch rows point their page table at it so the kernel's
        # fused append lands in never-read memory instead of corrupting a
        # live sequence's page 0.
        rows = page_size * cfg.head_dim // 128
        shape = (cfg.kv_heads, n_pages + 1, rows, 128)
        self.k_pages = [jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)]
        self.v_pages = [jnp.zeros(shape, dtype) for _ in range(cfg.n_layers)]
        self.scratch_page = n_pages
        self.free: deque[int] = deque(range(n_pages))

    @property
    def n_free(self) -> int:
        return len(self.free)

    def alloc(self, n: int) -> list[int]:
        if n > len(self.free):
            raise MemoryError(f"page pool exhausted: need {n}, have {len(self.free)}")
        return [self.free.popleft() for _ in range(n)]

    def release(self, pages: list[int]) -> None:
        self.free.extend(int(p) for p in pages)

    def write_prefix(self, li: int, page: int, k: jax.Array, v: jax.Array) -> None:
        """Write a prefix chunk into a page — either [Hk, page_size, D] tokens
        or folded [Hk, rows, 128] rows (partial chunks update the page head)."""
        hk = k.shape[0]
        kf = k.reshape(hk, -1, 128)
        vf = v.reshape(hk, -1, 128)
        self.k_pages[li] = _write_page(self.k_pages[li], jnp.int32(page), kf, 0)
        self.v_pages[li] = _write_page(self.v_pages[li], jnp.int32(page), vf, 0)


import functools  # noqa: E402


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("n",))
def _write_page(pages, page_idx, chunk, n: int):
    # pages: [Hk, P, page_size, D]; chunk: [Hk, n, D]
    return jax.lax.dynamic_update_slice(
        pages, chunk[:, None], (0, page_idx, 0, 0)
    )


@dataclasses.dataclass
class _Seq:
    req: Request
    pages: list[int]
    length: int


class PagedServingEngine:
    """Continuous batching over a shared page pool. Same Request/step/run
    surface as ServingEngine; admission is bounded by free pages rather than
    a fixed slot rectangle."""

    def __init__(
        self,
        params,
        cfg: decoder.DecoderConfig,
        *,
        max_batch: int = 8,
        n_pages: int = 64,
        page_size: int = 128,
        sampler: Sampler | None = None,
        seed: int = 0,
    ) -> None:
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.pool = PagePool(cfg, n_pages, page_size)
        self.sampler = sampler or ArgMaxSampler()
        self.max_pages_per_seq = 0  # grows with admissions; page table width
        self.seqs: list[_Seq | None] = [None] * max_batch
        self.queue: deque[Request] = deque()
        self._last_tokens = np.zeros((max_batch,), np.int32)
        self._rng = jax.random.PRNGKey(seed)
        self.steps = 0
        self._rid = 0

    # -- public API ----------------------------------------------------------

    def submit(self, request: Request) -> Request:
        if request.request_id is None:
            request.request_id = self._rid
            self._rid += 1
        need = request.max_new_tokens + len(request.prompt)
        if need > self.pool.n_pages * self.pool.page_size:
            raise ValueError("request larger than entire page pool")
        self.queue.append(request)
        return request

    @property
    def n_active(self) -> int:
        return sum(1 for s in self.seqs if s is not None)

    def has_work(self) -> bool:
        return self.n_active > 0 or bool(self.queue)

    def run(self) -> list[Request]:
        done: list[Request] = []
        while self.has_work():
            done.extend(self.step())
        return done

    # -- engine step ----------------------------------------------------------

    def step(self) -> list[Request]:
        finished = self._admit()
        if self.n_active == 0:
            return finished

        # Grow pages for sequences whose next token falls outside their
        # allocated pages (admission may already have allocated decode room,
        # so this checks coverage, not a modulo). On pool exhaustion the
        # sequence is PREEMPTED — pages released, request requeued at the
        # front; admission later re-prefills prompt+output and continues —
        # rather than raising MemoryError mid-step.
        psz = self.pool.page_size
        for i, seq in enumerate(self.seqs):
            if seq is None or seq.length // psz < len(seq.pages):
                continue
            if self.pool.n_free == 0:
                self.pool.release(seq.pages)
                self.seqs[i] = None
                self.queue.appendleft(seq.req)
                continue
            seq.pages.extend(self.pool.alloc(1))
        if self.n_active == 0:
            return finished

        # Inactive rows (and table entries past a sequence's last page) point
        # at the scratch page; their kv_len stays 0 so attention reads none
        # of it, and the kernel's fused append writes harmlessly into scratch.
        table = np.full(
            (self.max_batch, max(1, self._table_width())),
            self.pool.scratch_page,
            np.int32,
        )
        lens = np.zeros((self.max_batch,), np.int32)
        for i, seq in enumerate(self.seqs):
            if seq is None:
                continue
            table[i, : len(seq.pages)] = seq.pages
            lens[i] = seq.length

        logits, self.pool.k_pages, self.pool.v_pages = _paged_decode(
            self.params,
            self.cfg,
            jnp.asarray(self._last_tokens[:, None]),
            self.pool.k_pages,
            self.pool.v_pages,
            jnp.asarray(table),
            jnp.asarray(lens),
        )
        self._rng, sub = jax.random.split(self._rng)
        sampled = np.asarray(self.sampler.sample(sub, logits[:, -1, :]))
        self.steps += 1

        for i, seq in enumerate(self.seqs):
            if seq is None:
                continue
            tok = int(sampled[i])
            seq.req.output.append(tok)
            if seq.req.on_token:
                seq.req.on_token(tok)
            self._last_tokens[i] = tok
            seq.length += 1
            if tok in seq.req.eos_tokens or len(seq.req.output) >= seq.req.max_new_tokens:
                seq.req.finished = True
                finished.append(seq.req)
                self.pool.release(seq.pages)
                self.seqs[i] = None
        return finished

    def _table_width(self) -> int:
        widths = [len(s.pages) for s in self.seqs if s is not None]
        return max(widths) if widths else 1

    # -- admission -------------------------------------------------------------

    def _admit(self) -> list[Request]:
        finished: list[Request] = []
        psz = self.pool.page_size
        while self.queue and self.n_active < self.max_batch:
            req = self.queue[0]
            # Resume context: a PREEMPTED request re-prefills prompt+output
            # and continues from the next token (output empty for fresh ones).
            ctx = list(req.prompt) + list(req.output)
            need = -(-(len(ctx) + 1) // psz)  # context + first decode page room
            if need > self.pool.n_free:
                break  # wait for pages to free up
            self.queue.popleft()
            pages = self.pool.alloc(need)
            slot = self.seqs.index(None)

            # Batch-1 prefill at a bucketed length into a contiguous temp
            # cache, then scatter the prefix into the allocated pages.
            prompt = np.asarray(ctx, np.int32)
            bucket = _bucket(len(prompt))
            padded = np.zeros((1, bucket), np.int32)
            padded[0, : len(prompt)] = prompt
            tmp = decoder.init_cache(self.cfg, 1, max(bucket, psz))
            logits, tmp = decoder.prefill(
                self.params, self.cfg, jnp.asarray(padded), tmp
            )
            # The temp cache stores FOLDED [1, Hk, S·D/128, 128] rows
            # (decoder.init_cache) — slice per page in folded-row units, not
            # token units (a token-unit slice on folded storage crashed any
            # prompt spanning >1 page).
            hd = self.cfg.head_dim
            rows_per_page = psz * hd // 128
            for li in range(self.cfg.n_layers):
                k_full = tmp["k"][li].reshape(self.cfg.kv_heads, -1, 128)
                v_full = tmp["v"][li].reshape(self.cfg.kv_heads, -1, 128)
                for blk, page in enumerate(pages):
                    if blk * psz >= len(prompt):
                        break  # decode-room page: the kernel appends into it
                    row_lo = blk * rows_per_page
                    self.pool.write_prefix(
                        li,
                        page,
                        k_full[:, row_lo : row_lo + rows_per_page],
                        v_full[:, row_lo : row_lo + rows_per_page],
                    )

            self._rng, sub = jax.random.split(self._rng)
            first = int(
                np.asarray(self.sampler.sample(sub, logits[:, len(prompt) - 1, :]))[0]
            )
            req.output.append(first)
            if req.on_token:
                req.on_token(first)
            self._last_tokens[slot] = first
            if first in req.eos_tokens or len(req.output) >= req.max_new_tokens:
                req.finished = True
                finished.append(req)
                self.pool.release(pages)
            else:
                self.seqs[slot] = _Seq(req=req, pages=pages, length=len(ctx))
        return finished


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3, 4))
def _paged_decode(params, cfg, tokens, k_pages, v_pages, page_table, lens):
    """One batched decode step over the paged pool: same transformer math as
    decoder.forward, with paged attention + in-kernel page append."""
    cache = {
        "k_pages": k_pages,
        "v_pages": v_pages,
        "page_table": page_table,
        "len": lens,
    }
    logits, cache = decoder.forward(params, cfg, tokens, cache)
    return logits, cache["k_pages"], cache["v_pages"]
