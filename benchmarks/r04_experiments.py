"""Round-4 follow-up experiments (run after the battery; one phase per
invocation, fresh process):

  cachescale — generate_scan marginal step time vs ALLOCATED cache length
               (same valid prefix): diagnoses whether decode pays a per-step
               cost scaling with allocation (scan-carry defensive copies)
               rather than with the valid prefix the kernel reads.
  scancensus — HLO census of the compiled generate_scan body (copies that
               decode_step's census can't see live in the scan).
  prefgeom   — prefill dequant+matmul TF/s across (block_m, block_n,
               block_k): taller M amortizes the VPU dequant of each weight
               tile over more MXU rows (prefill_vs_mxu_peak 0.894 -> >=0.90).
"""
import sys


def cachescale():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder
    from rten_tpu.utils.bench import marginal_step_time

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=2048)
    qp = decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg))
    prompt = jnp.asarray(np.arange(16, dtype=np.int32)[None])

    for alloc in (512, 1024, 2048):
        def run(steps, alloc=alloc):
            cache = decoder.init_cache(cfg, 1, alloc)
            _, cache = decoder.prefill(qp, cfg, prompt, cache)
            toks, _ = decoder.generate_scan(
                qp, cfg, cache, prompt[:, -1:], jax.random.PRNGKey(1),
                n_steps=steps,
            )
            return toks

        # same token window at every alloc: 32 vs 288 steps (valid prefix
        # identical across allocs; only the allocation differs)
        t = min(marginal_step_time(run, 32, 288, trials=6) for _ in range(2))
        print(f"alloc={alloc}: {t*1e6:.1f} us/step", flush=True)


def scancensus():
    import re

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=2048)
    qp = decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg))

    for alloc in (768, 2048):
        cache = decoder.init_cache(cfg, 1, alloc)
        tok = jnp.asarray([[1]], jnp.int32)
        rng = jax.random.PRNGKey(0)

        def fn(cache, tok, rng):
            return decoder.generate_scan(
                qp, cfg, cache, tok, rng, n_steps=64
            )

        txt = (
            jax.jit(fn, static_argnames=(), donate_argnums=(0,))
            .lower(cache, tok, rng)
            .compile()
            .as_text()
        )
        copies = re.findall(r"\n\s*\S+ = (\S+?) copy\(", txt)
        big = [c for c in copies if "50257" in c or "f32[" in c or "bf16[" in c or "s8[" in c]
        fus = len(re.findall(r"\n\s*\S+ = \S+ fusion\(", txt))
        wl = len(re.findall(r"while\(", txt))
        print(f"alloc={alloc}: copies={len(copies)} fusions={fus} whiles={wl}", flush=True)
        for c in copies:
            print("   copy", c, flush=True)


def prefgeom():
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
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32), jnp.bfloat16)
    qw, qs = quantize_weights_int8(rng.standard_normal((n, n)).astype(np.float32))
    qd, sd = jnp.asarray(qw), jnp.asarray(qs)

    geoms = [
        (512, 2048, 512),   # current default
        (1024, 1024, 512),
        (1024, 2048, 256),
        (1024, 2048, 512),
        (2048, 1024, 256),
        (512, 2048, 1024),
        (256, 2048, 512),
    ]
    for bm, bn, bk in geoms:
        mm = functools.partial(
            quant_matmul_int8, w_q=qd, scales=sd,
            block_m=bm, block_n=bn, block_k=bk,
        )

        @functools.partial(jax.jit, static_argnums=0)
        def f(s, mm=mm):
            return jax.lax.scan(
                lambda c, _: (mm(c).astype(c.dtype), None), a0, None, length=s
            )[0]

        try:
            t = min(
                marginal_step_time(lambda s: f(s), 64, 512, trials=6)
                for _ in range(2)
            )
            print(f"bm={bm} bn={bn} bk={bk}: {2*n**3/t/1e12:7.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survivors matter
            print(f"bm={bm} bn={bn} bk={bk}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)




def gemvtile():
    """GEMV weight-stream rate: strided [K, bn] stripes of a row-major
    [K, N] matrix vs CONTIGUOUS pre-tiled [S, K, bn] stripes, plus pure-DMA
    controls for both layouts. gemvgeom measured ~566-596 GB/s through the
    row-major layout (each stripe row is a 4 KB read with a 51 KB stride);
    if the contiguous layout streams at the ~830 GB/s DMA ceiling, the
    decode step's weight stream — its dominant cost — speeds up ~1.4x."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rten_tpu.kernels.quant_matmul import quant_gemv_int8, quantize_weights_int8
    from rten_tpu.utils.bench import marginal_step_time

    k, n = 768, 51200
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((8, k)).astype(np.float32), jnp.bfloat16)
    mats = []
    for _ in range(2):
        qw, qs = quantize_weights_int8(rng.standard_normal((k, n)).astype(np.float32))
        mats.append((jnp.asarray(qw), jnp.asarray(qs)))

    def rate(label, fn, bytes_per_step):
        @functools.partial(jax.jit, static_argnums=0)
        def chain(s, fn=fn):
            return jax.lax.scan(lambda c, _: (fn(c), None), x0, None, length=s)[0]
        try:
            t = min(marginal_step_time(lambda s: chain(s), 32, 256, trials=5)
                    for _ in range(2))
            print(f"{label}: {bytes_per_step / t / 1e9:7.1f} GB/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    bn = 4096
    s_tiles = n // bn

    # --- current row-major GEMV (control; gemvgeom saw ~595) -------------
    def cur(c):
        for qd, sd in mats:
            c = quant_gemv_int8(c, qd, sd, block_n=bn)[:, :k].astype(jnp.bfloat16)
        return c
    rate("gemv row-major bn=4096", cur, 2 * k * n)

    # --- contiguous pre-tiled GEMV ----------------------------------------
    def make_tiled(qw):
        # [K, N] -> [S, K, bn]: stripe j contiguous in HBM
        return jnp.asarray(
            np.ascontiguousarray(
                np.asarray(qw).reshape(k, s_tiles, bn).transpose(1, 0, 2)
            )
        )
    tiled = [(make_tiled(qd), sd) for qd, sd in mats]

    def tiled_kernel(x_ref, w_ref, s_ref, o_ref):
        w = w_ref[0].astype(jnp.float32).astype(jnp.bfloat16)
        acc = jnp.dot(x_ref[...].astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)
        o_ref[...] = (acc * s_ref[...]).astype(o_ref.dtype)

    @jax.jit
    def gemv_tiled(x, wt, s):
        m = x.shape[0]
        return pl.pallas_call(
            tiled_kernel,
            grid=(s_tiles,),
            in_specs=[
                pl.BlockSpec((m, k), lambda j: (0, 0)),
                pl.BlockSpec((1, k, bn), lambda j: (j, 0, 0)),
                pl.BlockSpec((1, bn), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(x, wt, s.reshape(1, -1))

    def tl(c):
        for wt, sd in tiled:
            c = gemv_tiled(c, wt, sd)[:, :k].astype(jnp.bfloat16)
        return c
    rate("gemv contiguous-tiled bn=4096", tl, 2 * k * n)

    # --- pure-DMA controls (no compute): stream stripes into VMEM --------
    def dma_kernel_rowmajor(x_ref, w_ref, o_ref):
        o_ref[...] = (x_ref[...] + jnp.float32(w_ref[0, 0].astype(jnp.float32))).astype(o_ref.dtype)

    @jax.jit
    def dma_rowmajor(x, w):
        m = x.shape[0]
        return pl.pallas_call(
            dma_kernel_rowmajor,
            grid=(s_tiles,),
            in_specs=[
                pl.BlockSpec((m, k), lambda j: (0, 0)),
                pl.BlockSpec((k, bn), lambda j: (0, j)),
            ],
            out_specs=pl.BlockSpec((m, k), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(x, w)

    def dmarm(c):
        for qd, _ in mats:
            c = dma_rowmajor(c, qd).astype(jnp.bfloat16)
        return c
    rate("pure-DMA row-major [768,4096] stripes", dmarm, 2 * k * n)

    def dma_kernel_tiled(x_ref, w_ref, o_ref):
        o_ref[...] = (x_ref[...] + jnp.float32(w_ref[0, 0, 0].astype(jnp.float32))).astype(o_ref.dtype)

    @jax.jit
    def dma_tiled(x, wt):
        m = x.shape[0]
        return pl.pallas_call(
            dma_kernel_tiled,
            grid=(s_tiles,),
            in_specs=[
                pl.BlockSpec((m, k), lambda j: (0, 0)),
                pl.BlockSpec((1, k, bn), lambda j: (j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((m, k), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(x, wt)

    def dmat(c):
        for wt, _ in tiled:
            c = dma_tiled(c, wt).astype(jnp.bfloat16)
        return c
    rate("pure-DMA contiguous [1,768,4096] tiles", dmat, 2 * k * n)


def tiledab():
    """Decode headline A/B: contiguous-tiled lm_head (RTEN_TILE_LMHEAD)
    vs row-major, sweeping the tile width. Layouts differ by SHAPE, so both
    variants jit-cache cleanly in one process (no env-flag hazard).
    Expectation from the pure-DMA controls: lm_head stream 570-600 ->
    ~830 GB/s, worth ~20 us on a ~212 us best-known step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder
    from rten_tpu.utils.bench import marginal_step_time

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    prompt = jnp.asarray(np.arange(16, dtype=np.int32)[None])

    variants = [("rowmajor", None), ("tiled-1024", 1024), ("tiled-2048", 2048),
                ("tiled-4096", 4096)]
    # bn=4096 pads the 51200 vocab to 53248 (tile_gemv_pack) — the 4% extra
    # bytes stream too; the A/B decides if the wider DMA wins anyway.
    qps = {
        label: decoder.quantize_params_int8(params, tile_bn=bn)
        for label, bn in variants
    }

    def run_for(qp):
        def run(steps):
            cache = decoder.init_cache(cfg, 1, 1024)
            _, cache2 = decoder.prefill(qp, cfg, prompt, cache)
            toks, _ = decoder.generate_scan(
                qp, cfg, cache2, prompt[:, -1:], jax.random.PRNGKey(1),
                n_steps=steps,
            )
            return toks
        return run

    # Interleave variants across reps so chip contention hits all equally.
    results = {label: [] for label, _ in variants}
    for _ in range(3):
        for label, _ in variants:
            results[label].append(
                marginal_step_time(run_for(qps[label]), 64, 512, trials=4)
            )
    for label, _ in variants:
        t = min(results[label])
        print(f"{label}: {t*1e6:.1f} us/step  ({1.0/t:.0f} tok/s)", flush=True)


def mlppipe():
    """Whole-matrix MLP kernel (gridless: full up+down DMA exposed before
    compute) vs a PIPELINED variant (grid over FF stripes: up-columns tiled
    [S, D, bn] contiguous, down-rows [bn, D] naturally contiguous; Mosaic
    double-buffers stripe j+1's DMA under stripe j's dots). If the stream
    rate matches and latency drops, the pipelined kernel also removes the
    8 MB VMEM cap (Llama-class MLPs run the same path)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rten_tpu.kernels.quant_matmul import (
        quant_mlp_int8,
        quantize_weights_int8,
        tile_gemv_weights,
    )
    from rten_tpu.utils.bench import marginal_step_time

    d, ff, m = 768, 3072, 1
    bn = 768
    s_tiles = ff // bn
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32), jnp.bfloat16)

    mats = []  # 4 distinct layer-weight sets ≈ 19 MB: forces real HBM streaming
    for _ in range(4):
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
            t = min(marginal_step_time(lambda s: chain(s), 64, 512, trials=5)
                    for _ in range(2))
            print(f"{label}: {t*1e6:7.2f} us/chain-step  ({bytes_per_step/t/1e9:6.1f} GB/s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    bytes_per = 4 * (d * ff * 2)  # 4 layer-sets, up+down int8

    # --- control: whole-matrix fused MLP kernel --------------------------
    def whole(c):
        for wu, su, wd, sd_, _ in mats:
            c = quant_mlp_int8(c, wu, su, wd, sd_, activation="gelu",
                               out_dtype=jnp.bfloat16)
        return c
    rate("whole-matrix quant_mlp", whole, bytes_per)

    # --- pipelined FF-stripe variant -------------------------------------
    def pipe_kernel(x_ref, wu_ref, su_ref, wd_ref, sd_ref, o_ref, acc_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x = x_ref[...].astype(jnp.bfloat16)
        up = jnp.dot(x, wu_ref[0].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        from rten_tpu.kernels.quant_matmul import _ACTIVATIONS

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
    rate("pipelined FF-stripe mlp", piped, bytes_per)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    globals()[sys.argv[1]]()
