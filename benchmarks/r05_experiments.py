"""Round-5 experiments (one phase per invocation, fresh process):

  reconcile — settle VERDICT r4 weak #1: tiledab's 180 µs/step tiled-GEMV
              win vs BENCH_r04's 244 µs committed headline. Measures the
              EXACT bench.py harness shape (prompt 64, cache 768,
              device_put'd params) and the EXACT r04 A/B harness shape
              (prompt 16, cache 1024) with tiled-1024 AND row-major packs,
              all four combos interleaved in one process, so "wiring bug"
              vs "chip weather" separates cleanly:
                - tiled ≈ rowmajor within one harness → wiring (the tiled
                  layout is not engaging there);
                - tiled wins in both harnesses → r04's 244 was contention;
                - bench-shape slower than ab-shape at same layout → the
                  harness shape itself (cache alloc / prompt len) costs.
"""
import sys


def reconcile():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder
    from rten_tpu.utils.bench import marginal_step_time

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    packs = {
        "tiled1024": jax.device_put(decoder.quantize_params_int8(params, tile_bn=1024)),
        "rowmajor": jax.device_put(decoder.quantize_params_int8(params, tile_bn=None)),
    }
    for label, qp in packs.items():
        print(f"{label}: lm_head_q.q shape = {qp['lm_head_q']['q'].shape}", flush=True)

    rng = np.random.default_rng(0)
    harnesses = {
        # bench.py child_main exactly: prompt 64, cache 768, argmax first tok
        "bench": (
            jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)).astype(np.int32)),
            768,
        ),
        # r04 tiledab exactly: prompt 16 (arange), cache 1024
        "ab": (jnp.asarray(np.arange(16, dtype=np.int32)[None]), 1024),
    }

    def run_for(qp, prompt, cache_len):
        def run(steps):
            cache = decoder.init_cache(cfg, 1, cache_len)
            logits, cache = decoder.prefill(qp, cfg, prompt, cache)
            first = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks, _ = decoder.generate_scan(
                qp, cfg, cache, first, jax.random.PRNGKey(1), n_steps=steps
            )
            return toks

        return run

    combos = [
        (h, l, run_for(packs[l], *harnesses[h]))
        for h in harnesses
        for l in packs
    ]
    results = {(h, l): [] for h, l, _ in combos}
    for rep in range(3):
        for h, l, run in combos:
            results[(h, l)].append(marginal_step_time(run, 64, 512, trials=4))
        print(f"rep {rep} done", flush=True)
    for (h, l), ts in results.items():
        t = min(ts)
        print(
            f"{h:6s} {l:10s}: {t * 1e6:7.1f} us/step  ({1.0 / t:6.0f} tok/s)  "
            f"all_reps={[round(x * 1e6, 1) for x in ts]}",
            flush=True,
        )



def lmheadab():
    """lm_head GEMV stream rate across LAYOUT (row-major vs contiguous-tiled)
    x GEOMETRY (whole-K bn=1024/4096; K-blocked [256, 4096] — the pure-DMA
    sweet spot per CLAUDE.md). One 39 MB matrix per variant (> VMEM, forces
    real HBM streaming), all variants interleaved per rep."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.kernels.quant_matmul import (
        quant_gemv_int8,
        quantize_weights_int8,
        tile_gemv_weights,
    )
    from rten_tpu.utils.bench import marginal_step_time

    k, n = 768, 51200
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32), jnp.bfloat16)
    qw, qs = quantize_weights_int8(rng.standard_normal((k, n)).astype(np.float32))
    qd, sd = jnp.asarray(qw), jnp.asarray(qs)
    t1024 = tile_gemv_weights(qd, 1024)
    t4096 = tile_gemv_weights(qd, 4096)

    variants = {
        "row-bn1024": (qd, dict(block_n=1024)),
        "row-bn4096": (qd, dict(block_n=4096)),
        "tile-1024": (t1024, {}),
        "tile-4096": (t4096, {}),
        "row-bn4096-kb256": (qd, dict(block_n=4096, block_k=256)),
        "tile-4096-kb256": (t4096, dict(block_k=256)),
    }

    def mk(w, kw):
        def fn(c):
            return quant_gemv_int8(c, w, sd, **kw)[:, :k].astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnums=0)
        def chain(s):
            return jax.lax.scan(lambda c, _: (fn(c), None), x0, None, length=s)[0]

        return chain

    chains = {lab: mk(w, kw) for lab, (w, kw) in variants.items()}
    results = {lab: [] for lab in variants}
    for rep in range(3):
        for lab, chain in chains.items():
            try:
                results[lab].append(
                    marginal_step_time(lambda s: chain(s), 32, 256, trials=4)
                )
            except Exception as e:  # noqa: BLE001
                results[lab].append(None)
                print(f"{lab}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        print(f"rep {rep} done", flush=True)
    for lab, ts in results.items():
        ok = [t for t in ts if t]
        if not ok:
            continue
        t = min(ok)
        print(
            f"{lab:18s}: {t * 1e6:6.1f} us  ({k * n / t / 1e9:6.1f} GB/s)  "
            f"reps={[round(x * 1e6, 1) if x else None for x in ts]}",
            flush=True,
        )


def steplayout():
    """Decisive full-step layout A/B: tiled-1024 (r04 default-ON) vs
    row-major, bench.py's exact harness, with pairs TIGHTLY interleaved
    across variants within every rep (10 reps spread over the window) so
    chip weather cannot fake a 27% difference between the arms."""
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    from rten_tpu.kernels.quant_matmul import tile_gemv_pack

    lmonly = decoder.quantize_params_int8(params, tile_bn=None)
    lmonly["lm_head_q"] = tile_gemv_pack(lmonly["lm_head_q"], 1024)
    packs = {
        "tiled1024": decoder.quantize_params_int8(params, tile_bn=1024),
        "tiledlm": lmonly,  # ONLY the lm_head tiled (layer-0 wqkv row-major)
        "rowmajor": decoder.quantize_params_int8(params, tile_bn=None),
    }
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)).astype(np.int32))
    n_short, n_long = 64, 512

    def run_for(qp):
        def run(steps):
            cache = decoder.init_cache(cfg, 1, 768)
            logits, cache = decoder.prefill(qp, cfg, prompt, cache)
            first = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks, _ = decoder.generate_scan(
                qp, cfg, cache, first, jax.random.PRNGKey(1), n_steps=steps
            )
            return toks

        return run

    runs = {lab: run_for(qp) for lab, qp in packs.items()}
    for run in runs.values():  # compile both lengths for both variants first
        jax.block_until_ready(run(n_short))
        jax.block_until_ready(run(n_long))

    shorts = {lab: [] for lab in runs}
    longs = {lab: [] for lab in runs}
    for rep in range(10):
        for lab, run in runs.items():
            t0 = _t.perf_counter()
            jax.block_until_ready(run(n_short))
            t1 = _t.perf_counter()
            jax.block_until_ready(run(n_long))
            t2 = _t.perf_counter()
            shorts[lab].append(t1 - t0)
            longs[lab].append(t2 - t1)
        if rep % 3 == 2:
            print(f"rep {rep} done", flush=True)
        _t.sleep(2.0)  # spread the reps over the window
    for lab in runs:
        step = (min(longs[lab]) - min(shorts[lab])) / (n_long - n_short)
        print(
            f"{lab:10s}: {step * 1e6:6.1f} us/step ({1 / step:6.0f} tok/s)  "
            f"short_min={min(shorts[lab]) * 1e3:.1f}ms "
            f"long_min={min(longs[lab]) * 1e3:.1f}ms "
            f"long_med={sorted(longs[lab])[len(longs[lab]) // 2] * 1e3:.1f}ms",
            flush=True,
        )


def mlppipe2():
    """mlppipe redone with a working set that CANNOT be cached: r04's 4
    layer-sets (19 MB) read 995 GB/s — above the 810 GB/s HBM ceiling, so
    weights were VMEM/cache-resident and the A/B lied. 12 distinct sets
    (57 MB) force real streaming. Also adds a gridless+next_qkv arm
    (production shape: up+down+next-qkv = 6.5 MB/layer)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rten_tpu.kernels.quant_matmul import (
        _ACTIVATIONS,
        quant_mlp_int8,
        quantize_weights_int8,
        tile_gemv_weights,
    )
    from rten_tpu.utils.bench import marginal_step_time

    d, ff, m = 768, 3072, 1
    bn = 768
    s_tiles = ff // bn
    n_sets = 12
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32), jnp.bfloat16)

    mats = []
    for _ in range(n_sets):
        wu, su = quantize_weights_int8(rng.standard_normal((d, ff)).astype(np.float32))
        wd, sd_ = quantize_weights_int8(rng.standard_normal((ff, d)).astype(np.float32))
        mats.append(
            (
                jnp.asarray(wu), jnp.asarray(su).reshape(1, -1),
                jnp.asarray(wd), jnp.asarray(sd_).reshape(1, -1),
                tile_gemv_weights(wu, bn),
            )
        )

    def rate(label, fn, bytes_per_step):
        @functools.partial(jax.jit, static_argnums=0)
        def chain(s, fn=fn):
            return jax.lax.scan(lambda c, _: (fn(c), None), x0, None, length=s)[0]
        try:
            t = min(marginal_step_time(lambda s: chain(s), 24, 192, trials=4)
                    for _ in range(2))
            print(
                f"{label}: {t / n_sets * 1e6:7.2f} us/layer  "
                f"({bytes_per_step / t / 1e9:6.1f} GB/s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    bytes_per = n_sets * (d * ff * 2)

    def whole(c):
        for wu, su, wd, sd_, _ in mats:
            c = quant_mlp_int8(c, wu, su, wd, sd_, activation="gelu",
                               out_dtype=jnp.bfloat16)
        return c
    rate("gridless quant_mlp   ", whole, bytes_per)

    def pipe_kernel(x_ref, wu_ref, su_ref, wd_ref, sd_ref, o_ref, acc_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x = x_ref[...].astype(jnp.bfloat16)
        up = jnp.dot(x, wu_ref[0].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        up = up * su_ref[...].astype(jnp.float32)
        up = _ACTIVATIONS["gelu"](up)
        acc_ref[...] += jnp.dot(up.astype(jnp.bfloat16),
                                wd_ref[...].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)

        @pl.when(j == pl.num_programs(0) - 1)
        def _emit():
            o_ref[...] = (acc_ref[...] * sd_ref[...].astype(jnp.float32)).astype(
                o_ref.dtype
            )

    @jax.jit
    def mlp_pipe(x, wut, su, wd, sd_):
        return pl.pallas_call(
            pipe_kernel,
            grid=(s_tiles,),
            in_specs=[
                pl.BlockSpec((m, d), lambda j: (0, 0)),
                pl.BlockSpec((1, d, bn), lambda j: (j, 0, 0)),
                pl.BlockSpec((1, bn), lambda j: (0, j)),
                pl.BlockSpec((bn, d), lambda j: (j, 0)),
                pl.BlockSpec((1, d), lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((m, d), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((m, d), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((m, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(x, wut, su, wd, sd_)

    def piped(c):
        for wu, su, wd, sd_, wut in mats:
            c = mlp_pipe(c, wut, su, wd, sd_)
        return c
    rate("pipelined FF-stripe  ", piped, bytes_per)


def tiledcensus():
    """HLO census of the compiled generate_scan for tiled vs row-major
    params: if the tiled layout induces a per-step copy/relayout inside the
    scan body (rather than a hoisted one), it shows up here."""
    import re

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    for label, bn in (("tiled1024", 1024), ("rowmajor", None)):
        qp = decoder.quantize_params_int8(params, tile_bn=bn)
        cache = decoder.init_cache(cfg, 1, 768)
        tok = jnp.asarray([[1]], jnp.int32)

        def fn(cache, tok, rng):
            return decoder.generate_scan(qp, cfg, cache, tok, rng, n_steps=64)

        txt = (
            jax.jit(fn, donate_argnums=(0,))
            .lower(cache, tok, jax.random.PRNGKey(0))
            .compile()
            .as_text()
        )
        copies = re.findall(r"\n\s*\S+ = (\S+?) copy\(", txt)
        fus = len(re.findall(r"\n\s*\S+ = \S+ fusion\(", txt))
        cc = len(re.findall(r"custom-call", txt))
        print(f"{label}: copies={len(copies)} fusions={fus} custom-calls={cc}",
              flush=True)
        for c in copies:
            print("   copy", c, flush=True)


def layerslope():
    """Decompose the decode step: time generate_scan at n_layers ∈ {2, 12}
    (same lm_head/vocab/cache) — the slope is the TRUE per-layer cost
    (MLP kernel + attention kernel + XLA glue), the intercept is
    embed + lm_head + sampling + scan overhead. Compared against the
    measured kernel floors (MLP 7.9 µs w/ next_qkv, lm_head 44.3 µs tiled)
    this localizes the remaining roofline gap."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder
    from rten_tpu.utils.bench import marginal_step_time

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 50257, (1, 64)).astype(np.int32))

    results = {}
    cfgs = {
        n: decoder.DecoderConfig(n_layers=n, dtype=jnp.bfloat16, max_seq=1024)
        for n in (2, 12)
    }
    packs = {
        n: decoder.quantize_params_int8(
            decoder.init_params(jax.random.PRNGKey(0), cfg)
        )
        for n, cfg in cfgs.items()
    }

    def run_for(n):
        cfg, qp = cfgs[n], packs[n]

        def run(steps):
            cache = decoder.init_cache(cfg, 1, 768)
            logits, cache = decoder.prefill(qp, cfg, prompt, cache)
            first = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks, _ = decoder.generate_scan(
                qp, cfg, cache, first, jax.random.PRNGKey(1), n_steps=steps
            )
            return toks

        return run

    runs = {n: run_for(n) for n in cfgs}
    res = {n: [] for n in cfgs}
    for rep in range(4):
        for n, run in runs.items():
            res[n].append(marginal_step_time(run, 64, 512, trials=3))
    t = {n: min(v) for n, v in res.items()}
    per_layer = (t[12] - t[2]) / 10
    intercept = t[2] - 2 * per_layer
    for n in t:
        print(f"n_layers={n}: {t[n] * 1e6:6.1f} us/step", flush=True)
    print(
        f"per-layer {per_layer * 1e6:.2f} us (MLP-kernel floor ~7.9; attention+glue = rest)\n"
        f"intercept {intercept * 1e6:.2f} us (embed + lm_head [44.3 floor] + sampling + scan)",
        flush=True,
    )


def bodyops():
    """Op census of the compiled generate_scan WHILE BODY: what runs per
    decode step besides the Pallas kernels (fusions, converts, dus, gathers)
    — the intercept decomposition said ~22 us/step of non-lm_head overhead
    lives here (layerslope)."""
    import re
    from collections import Counter

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    qp = decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg))
    cache = decoder.init_cache(cfg, 1, 768)
    tok = jnp.asarray([[1]], jnp.int32)

    def fn(cache, tok, rng):
        return decoder.generate_scan(qp, cfg, cache, tok, rng, n_steps=64)

    txt = (
        jax.jit(fn, donate_argnums=(0,))
        .lower(cache, tok, jax.random.PRNGKey(0))
        .compile()
        .as_text()
    )
    # Find the while body computation (the scan body): largest computation
    # whose name contains "body".
    comps = re.split(r"\n(?=%?\w[\w.-]* \(|ENTRY )", txt)
    bodies = [c for c in comps if re.match(r"%?\w*body", c.strip().split()[0] or "")]
    body = max(bodies, key=len) if bodies else txt
    ops = Counter()
    customs = Counter()
    for mline in re.finditer(r"\n\s*(?:ROOT )?\S+ = (\S+?)\[?[({ ]*?(\S*?) ([\w.-]+)\(", body):
        pass
    for mline in re.finditer(r"\n\s*(?:ROOT )?%?\S+ = \S+ ([\w-]+)\(", body):
        ops[mline.group(1)] += 1
    for mline in re.finditer(r'custom_call_target="([^"]+)"', body):
        customs[mline.group(1)] += 1
    for mline in re.finditer(r'"kernel_name":\s*"([^"]+)"', body):
        customs["kernel:" + mline.group(1)] += 1
    print("while-body ops:", dict(ops.most_common(25)), flush=True)
    print("custom-call targets:", dict(customs.most_common(25)), flush=True)
    # fusion shapes give a hint of the data they shuffle
    for mline in list(re.finditer(r"\n\s*%?\S+ = (\S+) fusion\(", body))[:40]:
        print("  fusion out:", mline.group(1), flush=True)


def argmaxcost():
    """Isolate the fused-argmax epilogue cost on the lm_head GEMV: the
    layerslope intercept carries ~22 us over the lm_head kernel floor, and
    the floor was measured WITHOUT argmax — if the per-stripe running-argmax
    reduction serializes with the weight stream, wider stripes (fewer
    epilogue reductions) should close it."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.kernels.quant_matmul import (
        quant_gemv_int8,
        quantize_weights_int8,
        tile_gemv_weights,
    )
    from rten_tpu.utils.bench import marginal_step_time

    k, n = 768, 51200
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32), jnp.bfloat16)
    qw, qs = quantize_weights_int8(rng.standard_normal((k, n)).astype(np.float32))
    qd, sd = jnp.asarray(qw), jnp.asarray(qs)
    tiles = {1024: tile_gemv_weights(qd, 1024), 4096: tile_gemv_weights(qd, 4096)}
    ns = jnp.ones((k,), jnp.bfloat16)
    nb = jnp.zeros((k,), jnp.bfloat16)

    def mk(w, argmax, norm):
        kw = dict(argmax_n=50257) if argmax else {}
        nkw = (
            dict(norm="layernorm", norm_scale=ns, norm_bias=nb) if norm else {}
        )

        def fn(c):
            out = quant_gemv_int8(c, w, sd, **kw, **nkw)
            if argmax:
                # feed the token back as a fake activation so the chain deps
                return (x0 + out[0].astype(jnp.bfloat16) * 0).astype(jnp.bfloat16)
            return out[:, :k].astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnums=0)
        def chain(s):
            return jax.lax.scan(lambda c, _: (fn(c), None), x0, None, length=s)[0]

        return chain

    variants = {
        "tile1024-plain": mk(tiles[1024], False, False),
        "tile1024-norm": mk(tiles[1024], False, True),
        "tile1024-norm-argmax": mk(tiles[1024], True, True),
        "tile4096-norm-argmax": mk(tiles[4096], True, True),
    }
    results = {lab: [] for lab in variants}
    for rep in range(3):
        for lab, chain in variants.items():
            results[lab].append(
                marginal_step_time(lambda s: chain(s), 32, 256, trials=4)
            )
    for lab, ts in results.items():
        t = min(ts)
        print(
            f"{lab:22s}: {t * 1e6:6.1f} us  ({k * n / t / 1e9:6.1f} GB/s)  "
            f"reps={[round(x * 1e6, 1) for x in ts]}",
            flush=True,
        )

def megaab():
    """Whole-block megakernel A/B (decode_attention mlp= fusion vs the
    two-kernel default) on the EXACT bench path: decoder.generate_scan
    (donated cache, greedy fused-argmax head), GPT-2-small int8, prompt 64,
    cache 768. The trace cache is busted across variants via the use_flash
    static arg (None vs True are identical on TPU but trace separately, so
    each variant's RTEN_DECODE_FUSE is snapshotted at ITS trace).

    Measurement discipline: single short/long timed runs tightly
    interleaved across variants (chip weather hits both equally), slope
    from global minima, and any slope below the physical streaming floor
    (weights + kv at 830 GB/s) is reported as contaminated."""
    import os
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    qp = jax.device_put(
        decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg))
    )
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)).astype(np.int32))
    n_short, n_long = 64, 512

    def stream_bytes(node):
        # bench.py _quant_stream_bytes: embeddings are GATHERED (one row),
        # not streamed — excluding them is what makes the floor physical.
        if isinstance(node, dict):
            if set(node) == {"q", "s"}:
                return node["q"].size + node["s"].size * 4
            return sum(
                stream_bytes(v)
                for k, v in node.items()
                if k not in ("tok_emb", "pos_emb")
            )
        if isinstance(node, list):
            return sum(stream_bytes(v) for v in node)
        return node.size * node.dtype.itemsize

    weight_bytes = stream_bytes(qp)
    kv_prefix = -(-(64 + n_long // 2) // 256) * 256
    kv_bytes = 2 * cfg.n_layers * cfg.kv_heads * kv_prefix * cfg.head_dim * 2
    floor = (weight_bytes + kv_bytes) / 830e9
    print(
        f"streaming floor {floor * 1e6:.1f} us/step "
        f"({(weight_bytes + kv_bytes) / 1e6:.0f} MB @ 830 GB/s)",
        flush=True,
    )

    def make(fuse_mode, use_flash):
        def run(steps):
            os.environ["RTEN_DECODE_FUSE"] = fuse_mode
            cache = decoder.init_cache(cfg, 1, 768)
            logits, cache = decoder.prefill(qp, cfg, prompt, cache)
            first = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks, _ = decoder.generate_scan(
                qp, cfg, cache, first, jax.random.PRNGKey(1),
                n_steps=steps, use_flash=use_flash,
            )
            return toks

        return run

    variants = {"plain": make("1", None), "mega": make("mega", True)}
    # Warm/trace both lengths per variant; correctness: identical tokens.
    toks = {}
    for lab, run in variants.items():
        toks[lab] = np.asarray(jax.block_until_ready(run(n_short)))
        jax.block_until_ready(run(n_long))
    match = bool((toks["plain"] == toks["mega"]).all())
    print(f"token equality plain==mega over {n_short} steps: {match}", flush=True)

    times = {lab: {"s": [], "l": []} for lab in variants}
    for rep in range(12):
        for lab, run in variants.items():
            t0 = _t.perf_counter()
            jax.block_until_ready(run(n_short))
            t1 = _t.perf_counter()
            jax.block_until_ready(run(n_long))
            t2 = _t.perf_counter()
            times[lab]["s"].append(t1 - t0)
            times[lab]["l"].append(t2 - t1)
    span = n_long - n_short
    for lab in variants:
        s, l = times[lab]["s"], times[lab]["l"]
        slope = (min(l) - min(s)) / span
        med = (sorted(l)[len(l) // 2] - sorted(s)[len(s) // 2]) / span
        tag = "  [BELOW FLOOR — contaminated]" if slope < floor * 0.98 else ""
        print(
            f"{lab:6s}: slope(min) {slope * 1e6:6.1f} us/step  "
            f"slope(median) {med * 1e6:6.1f}  "
            f"long_min {min(l) * 1e3:7.1f} ms{tag}",
            flush=True,
        )


def prefillsweep():
    """Prefill dequant+matmul geometry sweep at the bench shape (2048³)
    toward the ≥0.90-of-MXU-peak bar (VERDICT r4 #6). The dequant convert
    runs once per (m, n, k) TILE, so its cost scales with M/block_m:
    at bm=512 each W tile converts 4x at M=2048 — est. ~12 us of VPU
    convert vs 87 us of MXU dot ≈ the whole 13-15% gap. Variants:
    larger bm (fewer converts), narrower bn to fit the f32 acc in VMEM,
    and the int8→bf16 direct convert re-measured at today's Mosaic."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.kernels.quant_matmul import (
        quant_matmul_int8,
        quantize_weights_int8,
    )
    from rten_tpu.utils.bench import marginal_step_time

    n = 2048
    rng = np.random.default_rng(1)
    a0 = jnp.asarray(
        rng.standard_normal((n, n)).astype(np.float32).astype(jnp.bfloat16)
    )
    qw, qs = quantize_weights_int8(rng.standard_normal((n, n)).astype(np.float32))
    qd, sd = jnp.asarray(qw), jnp.asarray(qs)

    def mk(**kw):
        @functools.partial(jax.jit, static_argnums=0)
        def chain(steps):
            def body(c, _):
                return quant_matmul_int8(c, qd, sd, **kw).astype(jnp.bfloat16), None

            return jax.lax.scan(body, a0, None, length=steps)[0]

        return chain

    variants = {
        "bm512-bn2048-bk512 (default)": mk(),
        "bm1024-bn1024-bk512": mk(block_m=1024, block_n=1024),
        "bm2048-bn512-bk512": mk(block_m=2048, block_n=512),
        "bm2048-bn1024-bk512": mk(block_m=2048, block_n=1024),
        "bm1024-bn2048-bk512": mk(block_m=1024, block_n=2048),
        "bm512-bn2048-direct": mk(w_convert="direct"),
        "bm2048-bn1024-direct": mk(block_m=2048, block_n=1024, w_convert="direct"),
        "bm1024-bn1024-bk1024": mk(block_m=1024, block_n=1024, block_k=1024),
    }
    flops = 2 * n**3
    results = {lab: [] for lab in variants}
    dead = set()
    for rep in range(3):
        for lab, chain in variants.items():
            if lab in dead:
                continue
            try:
                results[lab].append(marginal_step_time(chain, 32, 256, trials=4))
            except Exception as e:
                dead.add(lab)
                print(f"{lab}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
        print(f"rep {rep} done", flush=True)
    for lab, ts in results.items():
        if not ts:
            continue
        t = min(ts)
        print(
            f"{lab:30s}: {t * 1e6:6.1f} us  {flops / t / 1e12:6.1f} TF/s "
            f"({flops / t / 1e12 / 197:.3f} of peak)  "
            f"reps={[round(x * 1e6, 1) for x in ts]}",
            flush=True,
        )


def msaab():
    """MSA-prefetch A/B: the profiler showed ~60 us/step of exposed
    slice-done/copy-done waits — XLA memory-space assignment re-prefetching
    the loop-invariant int8 weights into VMEM every scan iteration (85 MB
    total, far over VMEM, so it thrashes). Variants: {plain, mega} x
    {unpinned, RTEN_PIN_HBM=1}. Trace-cache busted per variant via distinct
    n_steps (same 448-step span, so slopes are comparable)."""
    import os
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    qp = jax.device_put(
        decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg))
    )
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)).astype(np.int32))

    qp_noslab = {k: v for k, v in qp.items() if k != "slabs"}

    def make(fuse_mode, params, off):
        def run(steps):
            os.environ["RTEN_DECODE_FUSE"] = fuse_mode
            cache = decoder.init_cache(cfg, 1, 1024)
            logits, cache = decoder.prefill(params, cfg, prompt, cache)
            first = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks, _ = decoder.generate_scan(
                params, cfg, cache, first, jax.random.PRNGKey(1),
                n_steps=steps + off,
            )
            return toks

        return run

    variants = {
        "plain": make("1", qp_noslab, 0),
        "mega-slab": make("mega", qp, 1),
        "mega-noslab": make("mega", qp_noslab, 2),
    }
    n_short, n_long, span = 64, 512, 448
    toks = {}
    for lab, run in list(variants.items()):
        try:
            t0 = _t.perf_counter()
            toks[lab] = np.asarray(jax.block_until_ready(run(n_short)))[:, :n_short]
            t1 = _t.perf_counter()
            jax.block_until_ready(run(n_long))
            print(
                f"warm {lab}: short {t1 - t0:.1f}s long "
                f"{_t.perf_counter() - t1:.1f}s",
                flush=True,
            )
        except Exception as e:
            print(f"{lab}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            variants = {k: v for k, v in variants.items() if k != lab}
    ref = toks.get("plain")
    for lab, tk in toks.items():
        print(f"tokens {lab} == plain: {bool((tk == ref).all())}", flush=True)

    times = {lab: {"s": [], "l": []} for lab in variants}
    for rep in range(12):
        for lab, run in variants.items():
            t0 = _t.perf_counter()
            jax.block_until_ready(run(n_short))
            t1 = _t.perf_counter()
            jax.block_until_ready(run(n_long))
            t2 = _t.perf_counter()
            times[lab]["s"].append(t1 - t0)
            times[lab]["l"].append(t2 - t1)
    for lab in variants:
        s, l = times[lab]["s"], times[lab]["l"]
        slope = (min(l) - min(s)) / span
        med = (sorted(l)[len(l) // 2] - sorted(s)[len(s) // 2]) / span
        print(
            f"{lab:10s}: slope(min) {slope * 1e6:6.1f} us/step  "
            f"slope(median) {med * 1e6:6.1f}  long_min {min(l) * 1e3:7.1f} ms",
            flush=True,
        )


def msaflags():
    """XLA-flag sweep against the MSA per-iteration weight re-prefetch
    (the 0adb1d0 profile: ~60 us/step of exposed copy-done waits from XLA
    memory-space assignment thrashing 85 MB of loop-invariant int8 weights
    through VMEM).  The megakernel/slab route measured WORSE than plain
    (msaab: 265-282 vs 240 us/step), so attack the prefetcher directly:
    each variant compiles the bench-exact generate_scan under different
    XLA_FLAGS in a FRESH subprocess (flags are read once at backend init).
    """
    import subprocess

    child = r"""
import os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from rten_tpu.models import decoder
from rten_tpu.utils.bench import marginal_step_time

cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
qp = jax.device_put(
    decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg))
)
qp = {k: v for k, v in qp.items() if k != "slabs"}
rng = np.random.default_rng(0)
prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)).astype(np.int32))

def run(steps):
    cache = decoder.init_cache(cfg, 1, 768)
    logits, cache = decoder.prefill(qp, cfg, prompt, cache)
    first = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    toks, _ = decoder.generate_scan(
        qp, cfg, cache, first, jax.random.PRNGKey(1), n_steps=steps
    )
    return toks

t = min(marginal_step_time(run, 64, 512, trials=4) for _ in range(2))
print(f"RESULT {t * 1e6:.1f} us/step ({1 / t:.0f} tok/s)", flush=True)
"""
    # TPU-backend flags are libtpu-internal: they parse from
    # LIBTPU_INIT_ARGS, not XLA_FLAGS (XLA_FLAGS' client-side parser
    # rejects them as unknown).
    variants = {
        "baseline": "",
        "while-count-1": "--xla_tpu_memory_space_assignment_while_execution_count=1",
        "mblo-off": "--xla_tpu_memory_bound_loop_optimizer_options=enabled:false",
        "sliced1": "--xla_tpu_sliced_prefetch_max_slices=1",
        "use-copy-ratio": "--xla_tpu_msa_inefficient_use_to_copy_ratio=4.0",
        "combo": (
            "--xla_tpu_memory_space_assignment_while_execution_count=1 "
            "--xla_tpu_memory_bound_loop_optimizer_options=enabled:false "
            "--xla_tpu_sliced_prefetch_max_slices=1"
        ),
    }
    for rep in range(2):
        for lab, flags in variants.items():
            env = dict(os.environ)
            if flags:
                env["LIBTPU_INIT_ARGS"] = (
                    env.get("LIBTPU_INIT_ARGS", "") + " " + flags
                ).strip()
            env["JAX_ENABLE_COMPILATION_CACHE"] = "false"  # flags change codegen
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", child],
                    capture_output=True, text=True, timeout=600, env=env,
                )
                line = next(
                    (l for l in proc.stdout.splitlines() if l.startswith("RESULT")),
                    f"rc={proc.returncode} {proc.stderr[-200:]}",
                )
            except subprocess.TimeoutExpired:
                line = "TIMEOUT"
            print(f"rep{rep} {lab:16s}: {line}", flush=True)


def msaconfirm():
    """Confirmation A/B for the msaflags rep0 signal (baseline 247.4 vs
    combo 233.0 us/step): alternate fresh baseline/combo subprocesses 3x
    each (ABABAB) so chip weather hits both arms equally. Each child prints
    one slope measurement over the standard 64/512 window."""
    import subprocess

    child = r"""
import os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from rten_tpu.models import decoder
from rten_tpu.utils.bench import marginal_step_time

cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
qp = jax.device_put(
    decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg))
)
qp = {k: v for k, v in qp.items() if k != "slabs"}
rng = np.random.default_rng(0)
prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)).astype(np.int32))

def run(steps):
    cache = decoder.init_cache(cfg, 1, 768)
    logits, cache = decoder.prefill(qp, cfg, prompt, cache)
    first = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    toks, _ = decoder.generate_scan(
        qp, cfg, cache, first, jax.random.PRNGKey(1), n_steps=steps
    )
    return toks

t = min(marginal_step_time(run, 64, 512, trials=4) for _ in range(2))
print(f"RESULT {t * 1e6:.1f} us/step ({1 / t:.0f} tok/s)", flush=True)
"""
    combo = (
        "--xla_tpu_memory_space_assignment_while_execution_count=1 "
        "--xla_tpu_memory_bound_loop_optimizer_options=enabled:false "
        "--xla_tpu_sliced_prefetch_max_slices=1"
    )
    for rep in range(3):
        for lab, flags in (("baseline", ""), ("combo", combo)):
            env = dict(os.environ)
            if flags:
                env["LIBTPU_INIT_ARGS"] = (
                    env.get("LIBTPU_INIT_ARGS", "") + " " + flags
                ).strip()
            env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", child],
                    capture_output=True, text=True, timeout=900, env=env,
                )
                line = next(
                    (l for l in proc.stdout.splitlines() if l.startswith("RESULT")),
                    f"rc={proc.returncode} {proc.stderr[-200:]}",
                )
            except subprocess.TimeoutExpired:
                line = "TIMEOUT"
            print(f"rep{rep} {lab:9s}: {line}", flush=True)


def convhops():
    """Convert-hop + wo-hoist A/B on the decode path (r05 XPlane trace: the
    step is kernel-critical-path-bound and the kernels are convert-bound
    once MSA stages their weights in VMEM).

    Part 1 — isolated lm_head GEMV chain (tiled-1024, fused norm+argmax,
    production shape): w_convert direct vs f32, interleaved in-process.
    Part 2 — full generate_scan step: module default patched per trace
    (trace cache busted via the use_flash static), interleaved."""
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.kernels import quant_matmul as qm
    from rten_tpu.kernels.quant_matmul import (
        quant_gemv_int8,
        quantize_weights_int8,
        tile_gemv_weights,
    )
    from rten_tpu.models import decoder
    from rten_tpu.utils.bench import marginal_step_time
    import functools

    k, n = 768, 51200
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32), jnp.bfloat16)
    qw, qs = quantize_weights_int8(rng.standard_normal((k, n)).astype(np.float32))
    t1024 = tile_gemv_weights(qw, 1024)
    sd = jnp.asarray(qs)
    ns = jnp.ones((k,), jnp.bfloat16)
    nb = jnp.zeros((k,), jnp.bfloat16)

    def mk(mode):
        def fn(c):
            out = quant_gemv_int8(
                c, t1024, sd, argmax_n=50257, norm="layernorm",
                norm_scale=ns, norm_bias=nb, w_convert=mode,
            )
            return (c + out[0].astype(jnp.bfloat16) * 0).astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnums=0)
        def chain(s):
            return jax.lax.scan(lambda c, _: (fn(c), None), x0, None, length=s)[0]

        return chain

    chains = {m: mk(m) for m in ("direct", "f32")}
    res = {m: [] for m in chains}
    for rep in range(3):
        for m, chain in chains.items():
            res[m].append(marginal_step_time(lambda s: chain(s), 32, 256, trials=4))
    for m, ts in res.items():
        t = min(ts)
        print(
            f"lm_head {m:6s}: {t * 1e6:6.1f} us  ({k * n / t / 1e9:6.1f} GB/s)  "
            f"reps={[round(x * 1e6, 1) for x in ts]}",
            flush=True,
        )

    # Part 2 — full step. _W_CONVERT_DEFAULT is read at TRACE time; bust the
    # trace cache per variant with the use_flash static so each variant's
    # compiled program embeds ITS convert mode.
    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    qp = jax.device_put(
        decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg))
    )
    qp = {kk: v for kk, v in qp.items() if kk != "slabs"}
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)).astype(np.int32))
    n_short, n_long = 64, 512

    def make(mode, use_flash):
        def run(steps):
            qm._W_CONVERT_DEFAULT = mode
            cache = decoder.init_cache(cfg, 1, 768)
            logits, cache = decoder.prefill(qp, cfg, prompt, cache)
            first = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks, _ = decoder.generate_scan(
                qp, cfg, cache, first, jax.random.PRNGKey(1),
                n_steps=steps, use_flash=use_flash,
            )
            return toks

        return run

    variants = {"direct": make("direct", None), "f32": make("f32", True)}
    toks = {}
    for lab, run in variants.items():
        toks[lab] = np.asarray(jax.block_until_ready(run(n_short)))
        jax.block_until_ready(run(n_long))
    print(
        "token equality direct==f32:",
        bool((toks["direct"] == toks["f32"]).all()),
        flush=True,
    )
    times = {lab: {"s": [], "l": []} for lab in variants}
    for rep in range(12):
        for lab, run in variants.items():
            t0 = _t.perf_counter()
            jax.block_until_ready(run(n_short))
            t1 = _t.perf_counter()
            jax.block_until_ready(run(n_long))
            t2 = _t.perf_counter()
            times[lab]["s"].append(t1 - t0)
            times[lab]["l"].append(t2 - t1)
    span = n_long - n_short
    for lab in variants:
        s, l = times[lab]["s"], times[lab]["l"]
        slope = (min(l) - min(s)) / span
        med = (sorted(l)[len(l) // 2] - sorted(s)[len(s) // 2]) / span
        print(
            f"full-step {lab:6s}: slope(min) {slope * 1e6:6.1f} us/step  "
            f"slope(median) {med * 1e6:6.1f}  long_min {min(l) * 1e3:7.1f} ms",
            flush=True,
        )


def w8a8probe():
    """Is the v5e int8 MXU path (s8 x s8 -> s32, nominal 394 TOPS = 2x the
    bf16 197 TF/s) reachable from XLA and from Mosaic? The STATUS round-5
    decode analysis identified W8A8 as the only remaining lever past the
    ~0.75 decode plateau (kills the in-kernel VPU int8->bf16 convert) and
    it would roughly double prefill throughput vs the bf16-peak
    denominator. The reference itself ships u8 x i8 GEMM kernels
    (/root/reference/src/gemm.rs u8i8 kernels + QLinearMatMul), so W8A8 is
    inside the capability contract. Measures, all 2048^3 scan chains:
      bf16       — jnp.dot bf16 baseline (TF/s, the 197-peak yardstick)
      xla_i8     — lax.dot_general s8 x s8 -> s32 straight through XLA
      pallas_i8  — blocked Pallas matmul with in-kernel s8 dots
      pallas_i8_bf16out — same + int32->bf16 scale epilogue (the shape a
                   real W8A8 quant_matmul would take)
    """
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rten_tpu.utils.bench import marginal_step_time

    n = 2048
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (n, n)).astype(np.int8))
    b8 = jnp.asarray(rng.integers(-127, 128, (n, n)).astype(np.int8))
    abf = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    bbf = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    @functools.partial(jax.jit, static_argnums=0)
    def chain_bf16(steps):
        def body(c, _):
            out = jnp.dot(c, bbf, preferred_element_type=jnp.float32)
            return out.astype(jnp.bfloat16), None

        return jax.lax.scan(body, abf, None, length=steps)[0]

    @functools.partial(jax.jit, static_argnums=0)
    def chain_xla_i8(steps):
        def body(c, _):
            acc = jax.lax.dot_general(
                c, b8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # keep the carry int8 (cheap shift; the MXU dot dominates)
            return (acc >> 16).astype(jnp.int8), None

        return jax.lax.scan(body, a8, None, length=steps)[0]

    def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, nk, bf16_out):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(k == nk - 1)
        def _():
            if bf16_out:
                o_ref[...] = (acc_ref[...].astype(jnp.float32) * (1.0 / 65536.0)).astype(jnp.bfloat16)
            else:
                o_ref[...] = (acc_ref[...] >> 16).astype(jnp.int8)

    def mk_pallas(bm, bn, bk, bf16_out):
        nk = n // bk
        out_dtype = jnp.bfloat16 if bf16_out else jnp.int8
        mm = pl.pallas_call(
            functools.partial(_mm_kernel, nk=nk, bf16_out=bf16_out),
            grid=(n // bm, n // bn, nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((n, n), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")
            ),
        )

        @functools.partial(jax.jit, static_argnums=0)
        def chain(steps):
            def body(c, _):
                out = mm(c, b8)
                if bf16_out:
                    # requantize so the carry stays int8 without leaving VPU
                    return (out * 64.0).astype(jnp.int8), None
                return out, None

            return jax.lax.scan(body, a8, None, length=steps)[0]

        return chain

    # The production W8A8 kernel (kernels/quant_matmul.py), measured the
    # same way prefillsweep measures quant_matmul_int8: bf16 activations
    # carried through the chain, dynamic per-row quant included in the cost.
    from rten_tpu.kernels.quant_matmul import quant_matmul_w8a8, quantize_weights_int8

    qw, qs = quantize_weights_int8(rng.standard_normal((n, n)).astype(np.float32))
    qd, sd = jnp.asarray(qw), jnp.asarray(qs)

    def mk_w8a8(**kw):
        @functools.partial(jax.jit, static_argnums=0)
        def chain(steps):
            def body(c, _):
                return quant_matmul_w8a8(c, qd, sd, **kw).astype(jnp.bfloat16), None

            return jax.lax.scan(body, abf, None, length=steps)[0]

        return chain

    flops = 2 * n**3
    variants = {
        "bf16": chain_bf16,
        "xla_i8": chain_xla_i8,
        "w8a8_kernel-1024x1024x512": mk_w8a8(),
        "w8a8_kernel-512x2048x512": mk_w8a8(block_m=512, block_n=2048),
        "w8a8_kernel-1024x1024x1024": mk_w8a8(block_k=1024),
    }
    for lab, bm, bn, bk, b16 in (
        ("pallas_i8-512x1024x512", 512, 1024, 512, False),
        ("pallas_i8_bf16out-512x1024x512", 512, 1024, 512, True),
        ("pallas_i8-1024x1024x512", 1024, 1024, 512, False),
    ):
        try:
            variants[lab] = mk_pallas(bm, bn, bk, b16)
        except Exception as e:
            print(f"{lab}: BUILD FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    results = {lab: [] for lab in variants}
    dead = set()
    for rep in range(3):
        for lab, chain in variants.items():
            if lab in dead:
                continue
            try:
                results[lab].append(marginal_step_time(chain, 32, 256, trials=4))
            except Exception as e:
                dead.add(lab)
                print(f"{lab}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        print(f"rep {rep} done", flush=True)
    for lab, ts in results.items():
        if not ts:
            continue
        t = min(ts)
        print(
            f"{lab:32s}: {t * 1e6:6.1f} us  {flops / t / 1e12:6.1f} TOP/s "
            f"({flops / t / 1e12 / 197:.3f} of bf16 peak)  "
            f"reps={[round(x * 1e6, 1) for x in ts]}",
            flush=True,
        )


def w8a8decode():
    """THE follow-up to w8a8probe (which measured the int8 MXU path at
    275-336 TOPS = 1.4-1.7x bf16 peak): does routing the decode-step fused
    kernels (GEMV stripes, whole-MLP+next-qkv, fused-argmax lm_head)
    through s8 x s8 MXU dots (RTEN_W_CONVERT=w8a8) beat the weight-only
    convert path on the bench-exact generate_scan? The r05 XPlane trace
    showed the staged decode kernels are bound by the VPU int8->bf16
    weight convert (STATUS round-5 analysis: 4.0-7.1 us/layer MLP, 34.4 us
    in-loop lm_head, ~6.8M and 38.6M converted weights respectively);
    w8a8 deletes that convert entirely. ABAB fresh subprocesses so chip
    weather hits both arms equally. Numerics contract: dynamic per-row
    int8 activations (the reference's DynamicQuantizeLinear ->
    QLinearMatMul semantics, /root/reference/src/ops/quantize.rs)."""
    import os
    import subprocess

    child = r"""
import os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from rten_tpu.models import decoder
from rten_tpu.utils.bench import marginal_step_time

cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
qp = jax.device_put(
    decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg))
)
qp = {k: v for k, v in qp.items() if k != "slabs"}
rng = np.random.default_rng(0)
prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)).astype(np.int32))

def run(steps):
    cache = decoder.init_cache(cfg, 1, 768)
    logits, cache = decoder.prefill(qp, cfg, prompt, cache)
    first = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    toks, _ = decoder.generate_scan(
        qp, cfg, cache, first, jax.random.PRNGKey(1), n_steps=steps
    )
    return toks

t = min(marginal_step_time(run, 64, 512, trials=4) for _ in range(2))
print(f"RESULT {t * 1e6:.1f} us/step ({1 / t:.0f} tok/s)", flush=True)
"""
    for rep in range(2):
        for lab in ("direct", "w8a8"):
            env = dict(os.environ)
            env["RTEN_W_CONVERT"] = lab
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", child],
                    capture_output=True, text=True, timeout=900, env=env,
                )
                line = next(
                    (l for l in proc.stdout.splitlines() if l.startswith("RESULT")),
                    f"rc={proc.returncode} {proc.stderr[-300:]}",
                )
            except subprocess.TimeoutExpired:
                line = "TIMEOUT"
            print(f"rep{rep} {lab:7s}: {line}", flush=True)


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    globals()[sys.argv[1]]()
