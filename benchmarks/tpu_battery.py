"""TPU measurement battery: every A/B and capture needed to validate the
round-3 kernel work on real hardware, one phase per run (fresh processes
for env-flag A/Bs — the flags are read at trace time).

Usage: python benchmarks/tpu_battery.py <phase>
Phases (append-order; see also gemvgeom / batchedab / engine / tpover):
  census    — HLO census of the decode step (count copies/fusions; verify the
              lane-pad change removed the layout-conversion copies)
  headline  — bench.py headline (decode tok/s vs roofline)
  argmaxab  — A/B: greedy fused-argmax generate_scan vs TopK sampler path
  prefill   — prefill dequant+matmul TF/s, RTEN_PREFILL_PIPE=0 vs 1, plus a
              block-size sweep at 2048/4096
  whisper   — whisper step time fused vs eager (RTEN_ED_FUSE)
  engine    — ServingEngine K-step device-loop throughput vs generate_scan
  tpover    — mesh-1x1 shard_map decode vs native decode (TP overhead bound)
"""
import os
import sys
import time

phase = sys.argv[1] if len(sys.argv) > 1 else "census"


def census():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    qparams = decoder.quantize_params_int8(params)
    cache = decoder.init_cache(cfg, 1, 1024)
    tok = jnp.asarray([[1]], jnp.int32)

    def step(t, c):
        return decoder.decode_step(qparams, cfg, t, c)

    txt = jax.jit(step, donate_argnums=(1,)).lower(tok, cache).compile().as_text()
    import re
    copies = re.findall(r"\n\s*(\S+) = \S+ copy\(", txt)
    fusions = len(re.findall(r"\n\s*\S+ = \S+ fusion\(", txt))
    customs = len(re.findall(r"custom-call", txt))
    print(f"copies: {len(copies)}  fusions: {fusions}  custom-calls: {customs}")
    # shapes of copies
    for m in re.finditer(r"\n\s*\S+ = (\S+?) copy\(", txt):
        print("  copy", m.group(1))


def headline():
    os.system("cd /root/repo && RTEN_BENCH_BUDGET_S=240 timeout 400 python bench.py")


def argmaxab():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder
    from rten_tpu.utils.bench import marginal_step_time
    from rten_tpu.generate.sampler import TopKSampler

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    params = decoder.init_params(jax.random.PRNGKey(0), cfg)
    qparams = decoder.quantize_params_int8(params)
    prompt = jnp.asarray(np.arange(16, dtype=np.int32)[None])

    def run(sampler):
        def fn(steps):
            cache = decoder.init_cache(cfg, 1, 1024)
            _, cache = decoder.prefill(qparams, cfg, prompt, cache)
            toks, _ = decoder.generate_scan(
                qparams, cfg, cache, prompt[:, -1:], jax.random.PRNGKey(1),
                n_steps=steps, sampler=sampler,
            )
            return toks
        return marginal_step_time(fn, 64, 512, trials=6)

    for name, s in [("greedy-fused", None), ("topk40", TopKSampler(40))]:
        t = min(run(s) for _ in range(2))
        print(f"{name}: {t*1e6:.1f} us/step  ({1/t:.0f} tok/s)")


def prefill():
    # run in subprocesses so the env flag re-reads
    for pipe in ("0", "1"):
        cmd = (
            f"cd /root/repo && RTEN_PREFILL_PIPE={pipe} timeout 300 python -c \""
            "import jax, functools; import jax.numpy as jnp; import numpy as np;\n"
            "from rten_tpu.kernels.quant_matmul import quant_matmul_int8, quantize_weights_int8;\n"
            "from rten_tpu.utils.bench import marginal_step_time;\n"
            "n = 2048; rng = np.random.default_rng(0);\n"
            "a0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32), jnp.bfloat16);\n"
            "qw, qs = quantize_weights_int8(rng.standard_normal((n, n)).astype(np.float32));\n"
            "qd, sd = jnp.asarray(qw), jnp.asarray(qs);\n"
            "mm = functools.partial(quant_matmul_int8, w_q=qd, scales=sd);\n"
            "f = jax.jit(lambda s: jax.lax.scan(lambda c, _: (mm(c).astype(c.dtype), None), a0, None, length=s)[0], static_argnums=0);\n"
            "t = min(marginal_step_time(lambda s: f(s), 64, 512, trials=6) for _ in range(2));\n"
            "print('pipe', __import__('os').environ['RTEN_PREFILL_PIPE'], 2*n**3/t/1e12, 'TF/s')\"")
        os.system(cmd)


def whisper():
    for fuse in ("0", "1"):
        cmd = (
            f"cd /root/repo && RTEN_ED_FUSE={fuse} timeout 400 python -c \""
            "import jax, functools; import jax.numpy as jnp; import numpy as np;\n"
            "from rten_tpu.models import encoder_decoder as ed;\n"
            "from rten_tpu.utils.bench import marginal_step_time;\n"
            "cfg0 = ed.WHISPER_TINY; import dataclasses;\n"
            "cfg = dataclasses.replace(cfg0, dtype=jnp.bfloat16, int8_kv=True);\n"
            "params = ed.quantize_params_int8(ed.init_params(jax.random.PRNGKey(0), cfg));\n"
            "mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, cfg.n_mels, cfg.n_audio_ctx*2)).astype(np.float32));\n"
            "enc = ed.encode_jit(params, cfg, mel);\n"
            "@functools.partial(jax.jit, static_argnames=('steps',))\n"
            "def chain(steps):\n"
            "    state = ed.init_decoder_state(params, cfg, enc, 448)\n"
            "    def body(c, _):\n"
            "        st, tok = c\n"
            "        lg, st = ed.decode(params, cfg, tok, st)\n"
            "        return (st, jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)), None\n"
            "    (st, tok), _ = jax.lax.scan(body, (state, jnp.ones((1,1), jnp.int32)), None, length=steps)\n"
            "    return tok\n"
            "t = min(marginal_step_time(lambda s: chain(steps=s), 64, 384, trials=5) for _ in range(2));\n"
            "print('ed_fuse', __import__('os').environ['RTEN_ED_FUSE'], t*1e3, 'ms/step')\"")
        os.system(cmd)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    os.chdir("/root/repo")
    _dispatch = {"census": census, "headline": headline, "argmaxab": argmaxab,
                 "prefill": prefill, "whisper": whisper}
    _dispatch[phase]() if phase in _dispatch else globals()[phase]()

# Appended phases (invoke via editing __main__ dispatch or python -c).

def batchedab():
    """Batch-8 decode step: RTEN_BATCHED_ATTN 0 vs 1 (fresh process per
    flag — env flags are read at trace time and the jaxpr cache survives
    _clear_cache)."""
    for flag in ("0", "1"):
        cmd = (
            f"RTEN_BATCHED_ATTN={flag} timeout 400 python -c \""
            "import jax, functools; import jax.numpy as jnp; import numpy as np;\n"
            "from rten_tpu.models import decoder;\n"
            "from rten_tpu.utils.bench import marginal_step_time;\n"
            "cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024);\n"
            "qp = decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg));\n"
            "B = 8; prompt = jnp.asarray(np.random.default_rng(0).integers(0, 50000, (B, 64)).astype(np.int32));\n"
            "def run(steps):\n"
            "    cache = decoder.init_cache(cfg, B, 768)\n"
            "    lg, cache = decoder.prefill(qp, cfg, prompt, cache)\n"
            "    first = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)\n"
            "    toks, _ = decoder.generate_scan(qp, cfg, cache, first, jax.random.PRNGKey(1), n_steps=steps)\n"
            "    return toks\n"
            "t = min(marginal_step_time(run, 64, 384, trials=5) for _ in range(2));\n"
            "print('batched', __import__('os').environ['RTEN_BATCHED_ATTN'], t*1e6, 'us/step ->', 8/t, 'tok/s aggregate')\"")
        os.system(cmd)

def gemvgeom():
    """lm-head GEMV weight-stream GB/s across (block_k, block_n) geometries.
    2 distinct matrices per chained step (>16MB — forces real HBM streaming)."""
    import jax, functools
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.kernels.quant_matmul import quant_gemv_int8, quantize_weights_int8
    from rten_tpu.utils.bench import marginal_step_time

    k, n = 768, 51200
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32).astype(jnp.bfloat16))
    mats = []
    for _ in range(2):
        qw, qs = quantize_weights_int8(rng.standard_normal((k, n)).astype(np.float32))
        mats.append((jnp.asarray(qw), jnp.asarray(qs)))

    for bk in (None, 384, 256, 128):
        for bn in (1024, 2048, 4096):
            def fn(c, mats=mats, bk=bk, bn=bn):
                for qd, sd in mats:
                    c = quant_gemv_int8(c, qd, sd, block_n=bn, block_k=bk)[:, :k].astype(jnp.bfloat16)
                return c

            @functools.partial(jax.jit, static_argnames=("s",))
            def chain(s, fn=fn):
                return jax.lax.scan(lambda c, _: (fn(c), None), x0, None, length=s)[0]

            try:
                t = min(marginal_step_time(lambda s: chain(s=s), 32, 256, trials=5)
                        for _ in range(2)) / 2
                gbs = k * n / t / 1e9
                print(f"bk={bk} bn={bn}: {gbs:7.1f} GB/s")
            except Exception as e:
                print(f"bk={bk} bn={bn}: FAILED {type(e).__name__}: {e}")

def engine():
    """ServingEngine K-step tick throughput at batch 8 vs generate_scan
    (VERDICT #4 done-criterion: within ~1.3x at batch 8)."""
    import time as _t
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder
    from rten_tpu.serve.engine import Request, ServingEngine
    from rten_tpu.utils.bench import marginal_step_time

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    qp = decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg))
    B = 8
    rng = np.random.default_rng(0)

    # generate_scan reference at batch 8
    prompt = jnp.asarray(rng.integers(0, 50000, (B, 64)).astype(np.int32))
    def run(steps):
        cache = decoder.init_cache(cfg, B, 768)
        lg, cache = decoder.prefill(qp, cfg, prompt, cache)
        first = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
        toks, _ = decoder.generate_scan(qp, cfg, cache, first, jax.random.PRNGKey(1), n_steps=steps)
        return toks
    t = min(marginal_step_time(run, 64, 384, trials=5) for _ in range(2))
    print(f"generate_scan b8: {t*1e6:.1f} us/step -> {B/t:.0f} tok/s")

    # engine: K-step ticks, full slots, long requests (steady state)
    eng = ServingEngine(qp, cfg, max_batch=B, max_len=768, steps_per_tick=16)
    for i in range(B):
        eng.submit(Request(prompt=list(rng.integers(0, 50000, 64)), max_new_tokens=600))
    # warm up a few ticks (compile)
    for _ in range(3):
        eng.step()
    n_ticks = 12
    t0 = _t.perf_counter()
    toks = 0
    for _ in range(n_ticks):
        eng.step()
        toks += B * eng.steps_per_tick
    dt = _t.perf_counter() - t0
    print(f"engine b8 k16: {toks/dt:.0f} tok/s wall (incl. tunnel launches, {dt:.2f}s)")


def tpover():
    """mesh-1x1 shard_map decode vs native decode: bounds TP overhead on
    one chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from rten_tpu.models import decoder
    from rten_tpu.parallel import tp as tpmod
    from rten_tpu.utils.bench import marginal_step_time

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    qp = decoder.quantize_params_int8(
        decoder.init_params(jax.random.PRNGKey(0), cfg), fuse=False
    )
    prompt = jnp.asarray(np.random.default_rng(0).integers(0, 50000, (1, 64)).astype(np.int32))

    def native(steps):
        cache = decoder.init_cache(cfg, 1, 768)
        lg, cache = decoder.prefill(qp, cfg, prompt, cache)
        first = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
        toks, _ = decoder.generate_scan(qp, cfg, cache, first, jax.random.PRNGKey(1), n_steps=steps)
        return toks
    t = min(marginal_step_time(native, 64, 384, trials=5) for _ in range(2))
    print(f"native unfused decode: {t*1e6:.1f} us/step")
    print("for the shard_map twin, see tests/test_tp.py wiring — run "
          "ServingEngine(tp_mode='shard_map', mesh=1x1) or tp_decode_step "
          "with a 1x1 mesh and compare")
