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
        int8: bool = False,
    ) -> None:
        if int8:
            from rten_tpu.kernels.paged_attention import (
                paged_attention_int8_supported,
            )

            if not paged_attention_int8_supported(cfg.head_dim, page_size):
                raise ValueError(
                    f"page_size {page_size} unsupported for int8 head_dim "
                    f"{cfg.head_dim}"
                )
        elif not paged_attention_supported(cfg.head_dim, page_size):
            raise ValueError(
                f"page_size {page_size} unsupported for head_dim {cfg.head_dim}"
            )
        self.cfg = cfg
        self.n_pages = n_pages
        self.page_size = page_size
        self.int8 = int8
        dtype = jnp.int8 if int8 else (dtype or cfg.dtype)
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
        if int8:
            # Per-(token, head) scales in the page-tile layout: token t of a
            # page at [t % f, t·D/128]; the 128-col minor dim keeps DMA
            # slices lane-aligned (cols ≥ page·D/128 are padding).
            sshape = (cfg.kv_heads, n_pages + 1, 8, 128)
            self.k_scales = [jnp.zeros(sshape, jnp.float32) for _ in range(cfg.n_layers)]
            self.v_scales = [jnp.zeros(sshape, jnp.float32) for _ in range(cfg.n_layers)]
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

    def write_scale_tiles(self, li: int, page: int, ks: jax.Array, vs: jax.Array) -> None:
        """Write per-(token, head) scale chunks ([Hk, n_tok, 1] f32) into a
        page's scale tiles (int8 pools; token t at [t % f, t·D/128])."""
        hk = ks.shape[0]
        f = 128 // self.cfg.head_dim

        def tile(scales):
            s = scales.reshape(hk, -1, f).transpose(0, 2, 1)  # [Hk, f, rows]
            return jnp.pad(
                s, ((0, 0), (0, 8 - f), (0, 128 - s.shape[-1]))
            ).astype(jnp.float32)

        self.k_scales[li] = _write_page(self.k_scales[li], jnp.int32(page), tile(ks), 0)
        self.v_scales[li] = _write_page(self.v_scales[li], jnp.int32(page), tile(vs), 0)


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
        int8_kv: bool = False,
        mesh=None,
    ) -> None:
        """``int8_kv``: INT8 page payloads + per-(token, head) scale pages —
        halves decode KV traffic (BASELINE config 4 × config 5: INT8-KV with
        paged continuous batching).

        ``mesh``: a model-axis mesh — the page pool shards on KV heads and
        every decode step runs the paged Pallas kernel per shard through the
        explicit TP path (parallel/tp.tp_paged_decode). Requires unfused
        params. With ``int8_kv`` the scale pages shard on heads beside the
        payload pages (BASELINE config 4 × 5 composed)."""
        self.mesh = mesh
        if mesh is not None:
            from rten_tpu.parallel import shard_decoder_params

            params = shard_decoder_params(params, mesh)
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        self.int8_kv = int8_kv
        # Prefill runs with int8_kv semantics so deeper layers see the SAME
        # quantized-KV attention outputs the contiguous int8 engine produces
        # (quantize-after-exact-prefill would diverge from layer 2 on).
        self._prefill_cfg = (
            dataclasses.replace(cfg, int8_kv=True) if int8_kv else cfg
        )
        self.pool = PagePool(cfg, n_pages, page_size, int8=int8_kv)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = NamedSharding(mesh, P("model", None, None, None))
            self.pool.k_pages = [jax.device_put(p, spec) for p in self.pool.k_pages]
            self.pool.v_pages = [jax.device_put(p, spec) for p in self.pool.v_pages]
            if int8_kv:
                # Scale pages [Hk, P, 8, 128] shard on heads like the payload.
                self.pool.k_scales = [
                    jax.device_put(p, spec) for p in self.pool.k_scales
                ]
                self.pool.v_scales = [
                    jax.device_put(p, spec) for p in self.pool.v_scales
                ]
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

        pool_state = {"k_pages": self.pool.k_pages, "v_pages": self.pool.v_pages}
        if self.int8_kv:
            pool_state["k_scale_pages"] = self.pool.k_scales
            pool_state["v_scale_pages"] = self.pool.v_scales
        if self.mesh is not None:
            from rten_tpu.parallel.tp import tp_paged_decode

            logits, pool_state = tp_paged_decode(
                self.params,
                self.cfg,
                jnp.asarray(self._last_tokens[:, None]),
                pool_state,
                jnp.asarray(table),
                jnp.asarray(lens),
                mesh=self.mesh,
                interpret_kernels=True,
            )
        else:
            logits, pool_state = _paged_decode(
                self.params,
                self.cfg,
                jnp.asarray(self._last_tokens[:, None]),
                pool_state,
                jnp.asarray(table),
                jnp.asarray(lens),
            )
        self.pool.k_pages = pool_state["k_pages"]
        self.pool.v_pages = pool_state["v_pages"]
        if self.int8_kv:
            self.pool.k_scales = pool_state["k_scale_pages"]
            self.pool.v_scales = pool_state["v_scale_pages"]
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
            if need > self.pool.n_pages:
                # submit() bounds prompt+max_new_tokens by the pool, so this
                # is unreachable for admitted requests — but waiting here
                # would spin forever (nothing can ever free enough pages).
                self.queue.popleft()
                req.finished = True
                raise MemoryError(
                    f"request {req.request_id} needs {need} pages, pool has "
                    f"{self.pool.n_pages}"
                )
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
            tmp = decoder.init_cache(self._prefill_cfg, 1, max(bucket, psz))
            logits, tmp = decoder.prefill(
                self.params, self._prefill_cfg, jnp.asarray(padded), tmp
            )
            # The temp cache stores FOLDED [1, Hk, S·D/128, 128] rows
            # (decoder.init_cache) — slice per page in folded-row units, not
            # token units (a token-unit slice on folded storage crashed any
            # prompt spanning >1 page).
            hd = self.cfg.head_dim
            rows_per_page = psz * hd // 128
            for li in range(self.cfg.n_layers):
                if self.int8_kv:
                    # The int8 prefill cache already holds quantized payload
                    # + per-token scales; copy both into the pages verbatim.
                    from rten_tpu.kernels.decode_attention import unpack_kv_scales

                    kq_rows = tmp["k"][li].reshape(self.cfg.kv_heads, -1, 128)
                    vq_rows = tmp["v"][li].reshape(self.cfg.kv_heads, -1, 128)
                    ks_tok = unpack_kv_scales(tmp["k_scale"][li], hd)[0]
                    vs_tok = unpack_kv_scales(tmp["v_scale"][li], hd)[0]
                    for blk, page in enumerate(pages):
                        lo = blk * psz
                        if lo >= len(prompt):
                            break
                        row_lo = blk * rows_per_page
                        self.pool.write_prefix(
                            li,
                            page,
                            kq_rows[:, row_lo : row_lo + rows_per_page],
                            vq_rows[:, row_lo : row_lo + rows_per_page],
                        )
                        self.pool.write_scale_tiles(
                            li, page, ks_tok[:, lo : lo + psz], vs_tok[:, lo : lo + psz]
                        )
                    continue
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


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def _paged_decode(params, cfg, tokens, pool_state, page_table, lens):
    """One batched decode step over the paged pool: same transformer math as
    decoder.forward, with paged attention + in-kernel page append. The pool
    (payload + int8 scale pages) is donated — in place at the jit boundary."""
    cache = {**pool_state, "page_table": page_table, "len": lens}
    logits, cache = decoder.forward(params, cfg, tokens, cache)
    out = {"k_pages": cache["k_pages"], "v_pages": cache["v_pages"]}
    if "k_scale_pages" in cache:
        out["k_scale_pages"] = cache["k_scale_pages"]
        out["v_scale_pages"] = cache["v_scale_pages"]
    return logits, out
