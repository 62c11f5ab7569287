"""TPU measurement battery: every A/B and capture needed to validate the
kernel work on real hardware (VERDICT r3 item 1 — "capture the perf
scoreboard"). Each phase runs in a FRESH subprocess (env-flag A/Bs read the
flags at module import) with its own timeout; results append incrementally
to an artifact file so a mid-battery tunnel flap loses one phase, not the
battery.

Usage:
  python benchmarks/tpu_battery.py all [--out BATTERY_r04.json]   # orchestrate
  python benchmarks/tpu_battery.py <phase>                        # one phase

Phases, priority order:
  census    — HLO census of the decode step (copies/fusions; lane-pad check)
  headline  — bench.py headline (decode tok/s vs roofline; also refreshes
              BENCH_midround.json, the outage fallback)
  prefill   — prefill dequant+matmul TF/s (2048^3 chain)
  batchedab — batch-8 decode, RTEN_BATCHED_ATTN=0 vs 1
  argmaxab  — greedy fused-argmax generate_scan vs TopK sampler path
  gemvgeom  — lm-head GEMV GB/s across (block_k, block_n) geometries
  whisper   — whisper step time fused vs eager (RTEN_ED_FUSE)
  engine    — ServingEngine K-step tick throughput vs generate_scan
  tpover    — mesh-1x1 shard_map engine vs native engine (TP overhead bound)
"""
import json
import os
import subprocess
import sys
import time


def _sh(cmd: str) -> None:
    """Run a shell command and PROPAGATE failure: a phase whose inner
    variant dies (compile error, timeout) must record rc!=0, not a silent
    empty stdout (the batchedab VMEM-OOM was masked exactly this way)."""
    rc = os.system(cmd)
    if rc != 0:
        print(f"[battery] inner command failed (rc {rc >> 8 or rc}): {cmd[:120]}...",
              flush=True)
        sys.exit(1)

PHASES = [
    # Priority order = evidence value: the phases VERDICT r4 flagged as
    # never-measured run first so a mid-battery outage costs the least.
    ("headline", 1100),
    # batchedab split per flag (VERDICT r4 #3: the combined phase died at its
    # timeout twice — each flag now gets its own subprocess AND budget, with
    # a narrower-but-valid window, so one slow compile can't starve the A/B).
    ("batchedab0", 800),
    ("batchedab1", 800),
    ("engine", 900),
    ("specdec", 1100),
    ("whisper", 1500),
    ("prefill", 700),
    ("tpover", 700),
    ("argmaxab", 500),
    ("gemvgeom", 900),
    ("census", 900),
]


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
    for m in re.finditer(r"\n\s*\S+ = (\S+?) copy\(", txt):
        print("  copy", m.group(1))


def headline():
    # Single attempt, short init watchdog: the battery only runs when the
    # tunnel was JUST probed up, so bench.py's full 3-attempt retry ladder
    # (~1680s worst case) would outlive the phase timeout and die before
    # printing the stale-fallback line. Worst case here ≈ 120 init + 300
    # budget + 150+120 whisper child + slack < 1050.
    _sh(
        "cd /root/repo && RTEN_BENCH_BUDGET_S=300 RTEN_BENCH_INIT_ATTEMPTS=1 "
        "RTEN_BENCH_INIT_TIMEOUT_S=120 RTEN_BENCH_WHISPER_BUDGET_S=150 "
        "timeout 1050 python bench.py"
    )


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
    """Prefill dequant+matmul TF/s at 2048^3 (the K-pipelined variant lost
    its A/B — 160.4 vs 176.1 TF/s, r04 — and was deleted)."""
    cmd = (
        "timeout 300 python -c \""
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
        "print('prefill', 2*n**3/t/1e12, 'TF/s')\"")
    _sh(cmd)


def whisper():
    for fuse in ("0", "1"):
        cmd = (
            f"cd /root/repo && RTEN_ED_FUSE={fuse} timeout 700 python -c \""
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
        _sh(cmd)


def _batchedab_one(flag: str) -> None:
    """One arm of the batch-8 decode A/B: RTEN_BATCHED_ATTN is snapshotted
    at module import, so each flag needs a fresh process. Narrower window
    than r04's (48 vs 256 steps ≈ 160 ms of signal at batch 8 — well past
    the ≥40 ms rule) and a 16-token prompt: r04's combined phase spent its
    budget compiling the 64-token batch-8 prefill twice and died at its
    timeout both rounds (VERDICT r4 #3)."""
    cmd = (
        f"cd /root/repo && RTEN_BATCHED_ATTN={flag} timeout 700 python -c \""
        "import jax, functools; import jax.numpy as jnp; import numpy as np;\n"
        "from rten_tpu.models import decoder;\n"
        "from rten_tpu.utils.bench import marginal_step_time;\n"
        "cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024);\n"
        "qp = decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg));\n"
        "B = 8; prompt = jnp.asarray(np.random.default_rng(0).integers(0, 50000, (B, 16)).astype(np.int32));\n"
        "def run(steps):\n"
        "    cache = decoder.init_cache(cfg, B, 768)\n"
        "    lg, cache = decoder.prefill(qp, cfg, prompt, cache)\n"
        "    first = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)\n"
        "    toks, _ = decoder.generate_scan(qp, cfg, cache, first, jax.random.PRNGKey(1), n_steps=steps)\n"
        "    return toks\n"
        "t = min(marginal_step_time(run, 48, 256, trials=3) for _ in range(2));\n"
        "print('batched', __import__('os').environ['RTEN_BATCHED_ATTN'], t*1e6, 'us/step ->', 8/t, 'tok/s aggregate')\"")
    _sh(cmd)


def batchedab0():
    _batchedab_one("0")


def batchedab1():
    _batchedab_one("1")


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

    # trimmed sweep (the 12-combo grid outlived its window): whole-K vs the
    # best K-block, across the three N widths + per-geometry flush.
    for bk in (None, 256):
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
    (VERDICT r2 #4 done-criterion: within ~1.3x at batch 8), sweeping
    steps_per_tick."""
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

    prompt = jnp.asarray(rng.integers(0, 50000, (B, 64)).astype(np.int32))
    def run(steps):
        cache = decoder.init_cache(cfg, B, 768)
        lg, cache = decoder.prefill(qp, cfg, prompt, cache)
        first = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
        toks, _ = decoder.generate_scan(qp, cfg, cache, first, jax.random.PRNGKey(1), n_steps=steps)
        return toks
    t = min(marginal_step_time(run, 64, 384, trials=5) for _ in range(2))
    print(f"generate_scan b8: {t*1e6:.1f} us/step -> {B/t:.0f} tok/s")

    for k_tick in (1, 8, 32):
        eng = ServingEngine(qp, cfg, max_batch=B, max_len=768, steps_per_tick=k_tick)
        for _ in range(B):
            eng.submit(Request(prompt=list(rng.integers(0, 50000, 64)), max_new_tokens=700))
        for _ in range(3):  # warm up (compile)
            eng.step()
        n_steps = 160
        n_ticks = max(1, n_steps // k_tick)
        t0 = _t.perf_counter()
        toks = 0
        for _ in range(n_ticks):
            eng.step()
            toks += B * k_tick
        dt = _t.perf_counter() - t0
        print(f"engine b8 k{k_tick}: {toks/dt:.0f} tok/s wall ({dt:.2f}s, incl. tunnel launches)")

    # Pipelined driver: tick t+1 dispatched from the device-side carry
    # before tick t's tokens hit the host — launch latency overlaps the
    # in-flight program instead of serializing.
    for k_tick in (8, 32):
        eng = ServingEngine(qp, cfg, max_batch=B, max_len=768, steps_per_tick=k_tick)
        for _ in range(B):
            eng.submit(
                Request(prompt=list(rng.integers(0, 50000, 64)), max_new_tokens=700)
            )
        for _ in range(3):
            eng.step()  # compile warm-up (same program the pipeline uses)
        n_ticks = max(1, 160 // k_tick)
        t0 = _t.perf_counter()
        pending = None
        carry = eng._sync_carry(None)
        for _ in range(n_ticks):
            pending_next, carry = eng._dispatch_tick(carry)
            if pending is not None:
                eng._process_tick(*pending)
            pending = pending_next
        eng._process_tick(*pending)
        dt = _t.perf_counter() - t0
        toks = B * k_tick * n_ticks
        print(
            f"engine-pipelined b8 k{k_tick}: {toks/dt:.0f} tok/s wall ({dt:.2f}s)"
        )


def tpover():
    """mesh-1x1 shard_map serving vs native serving on ONE chip: the
    real-hardware TP-overhead bound (VERDICT r3 item 5's second half).
    Same unfused int8 params both sides; K-step ticks amortize launches."""
    import time as _t
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder
    from rten_tpu.parallel import make_mesh
    from rten_tpu.serve.engine import Request, ServingEngine

    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    qp = decoder.quantize_params_int8(
        decoder.init_params(jax.random.PRNGKey(0), cfg), fuse=False
    )
    B, k_tick, n_steps = 8, 16, 160
    rng = np.random.default_rng(0)

    def run_engine(mesh, tp_mode):
        eng = ServingEngine(
            qp, cfg, max_batch=B, max_len=768, steps_per_tick=k_tick,
            mesh=mesh, tp_mode=tp_mode,
        )
        for _ in range(B):
            eng.submit(Request(prompt=list(rng.integers(0, 50000, 64)), max_new_tokens=700))
        for _ in range(3):
            eng.step()
        t0 = _t.perf_counter()
        toks = 0
        for _ in range(n_steps // k_tick):
            eng.step()
            toks += B * k_tick
        return toks / (_t.perf_counter() - t0)

    native = run_engine(None, "pjit")
    shard = run_engine(make_mesh(data=1, model=1), "shard_map")
    print(f"native unfused engine b8 k{k_tick}: {native:.0f} tok/s")
    print(f"shard_map 1x1 engine b8 k{k_tick}: {shard:.0f} tok/s")
    print(f"tp_overhead_bound: {shard/native:.4f} of native (bar >=0.85)")


def specdec():
    """Speculative decoding (greedy, K=4) vs plain generate_scan on the
    GPT-2-small-class int8 target, batch 1: wall tokens/s + measured
    acceptance. The draft is a LAYER-TRUNCATED SELF-DRAFT (target's first 2
    layers + shared embeddings/norm/lm_head — VERDICT r4 #7): truncation
    preserves the residual-stream structure, so draft and target argmax
    CORRELATE and acceptance is nonzero, unlike r04's independently-random
    draft (acceptance 0.00). Output remains token-exact vs plain greedy
    (tests/test_speculative.py)."""
    import time as _t
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.generate.speculative import speculative_scan
    from rten_tpu.models import decoder
    from rten_tpu.utils.bench import marginal_step_time

    # max_seq 1024 (was 2048): the 2048-cache speculative_scan compile alone
    # ate the phase budget twice (BATTERY_r04/r05 specdec rc=timeout);
    # acceptance measurement needs prompt+96*5 << 1024 positions.
    cfg_t = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    params_t = decoder.quantize_params_int8(
        decoder.init_params(jax.random.PRNGKey(0), cfg_t)
    )
    cfg_d = decoder.DecoderConfig(
        n_layers=2, dtype=jnp.bfloat16, max_seq=1024
    )
    # Truncated self-draft: share the target's quantized leaves directly
    # (same pytree schema — layers is just a shorter list).
    params_d = {
        k: v for k, v in params_t.items() if k != "layers"
    }
    params_d["layers"] = params_t["layers"][: cfg_d.n_layers]
    prompt = jnp.asarray(np.arange(32, dtype=np.int32)[None])

    # plain greedy baseline
    def plain(steps):
        cache = decoder.init_cache(cfg_t, 1, 1024)
        _, cache = decoder.prefill(params_t, cfg_t, prompt, cache)
        toks, _ = decoder.generate_scan(
            params_t, cfg_t, cache, prompt[:, -1:], jax.random.PRNGKey(2),
            n_steps=steps,
        )
        return toks
    t_plain = marginal_step_time(plain, 64, 384, trials=3)
    print(f"plain greedy: {t_plain*1e6:.1f} us/token ({1/t_plain:.0f} tok/s)")

    k = 4
    def spec(rounds):
        cache_t = decoder.init_cache(cfg_t, 1, 1024)
        cache_d = decoder.init_cache(cfg_d, 1, 1024)
        lg, cache_t = decoder.prefill(params_t, cfg_t, prompt, cache_t)
        _, cache_d = decoder.prefill(params_d, cfg_d, prompt, cache_d)
        last = jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32)
        toks, counts, *_ = speculative_scan(
            params_t, cfg_t, cache_t, params_d, cfg_d, cache_d, last,
            k=k, n_rounds=rounds,
        )
        return counts

    # marginal time per ROUND, then tokens/round from a measured run
    t_round = marginal_step_time(spec, 16, 96, trials=3)
    counts = np.asarray(jax.block_until_ready(spec(96)))
    toks_per_round = float(counts.mean())
    tok_s = toks_per_round / t_round
    print(
        f"specdec k={k} self-draft-2L: {t_round*1e6:.1f} us/round, "
        f"{toks_per_round:.2f} tok/round (acceptance "
        f"{(toks_per_round - 1) / k:.2f}) -> {tok_s:.0f} tok/s "
        f"({tok_s * t_plain:.2f}x plain)"
    )
    ceiling = (k + 1) / t_round
    # Break-even: rounds cost t_round; plain costs t_plain/token — spec wins
    # when tokens/round > t_round/t_plain.
    be_tpr = t_round / t_plain
    print(
        f"full-acceptance ceiling: {ceiling:.0f} tok/s "
        f"({ceiling * t_plain:.2f}x plain); break-even at "
        f"{be_tpr:.2f} tok/round = acceptance {(be_tpr - 1) / k:.2f}"
    )


def run_all(out_path: str) -> None:
    """Run every phase in priority order, each in a fresh subprocess,
    appending structured results to ``out_path`` after each phase. Holds
    /tmp/rten_chip_lock so benchmarks/capture_loop.py skips its cycles
    while the battery owns the chip."""
    lock = "/tmp/rten_chip_lock"
    own_lock = not os.path.exists(lock)
    if own_lock:
        try:
            with open(lock, "w") as f:
                f.write(f"tpu_battery pid {os.getpid()}")
        except OSError:
            own_lock = False
    try:
        _run_all_inner(out_path)
    finally:
        if own_lock:
            try:
                os.remove(lock)
            except OSError:
                pass


def _run_all_inner(out_path: str) -> None:
    results: dict = {"started_unix": int(time.time()), "phases": {}}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                results = json.load(f)
        except ValueError:
            pass
    for name, timeout_s in PHASES:
        prior = results["phases"].get(name)
        if prior and prior.get("rc") == 0 and os.environ.get("RTEN_BATTERY_RERUN") != "1":
            print(f"[battery] {name}: cached ok, skipping", flush=True)
            continue
        print(f"[battery] {name} (timeout {timeout_s}s)...", flush=True)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                capture_output=True, text=True, timeout=timeout_s,
                cwd="/root/repo",
                env=dict(os.environ, PYTHONUNBUFFERED="1"),
            )
            rec = {
                "rc": proc.returncode,
                "stdout": proc.stdout[-8000:],
                "stderr": proc.stderr[-2000:],
            }
        except subprocess.TimeoutExpired as e:
            out = e.stdout
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            rec = {
                "rc": "timeout",
                "stdout": (out or "")[-8000:],
                "stderr": "phase timeout",
            }
        rec["wall_s"] = round(time.time() - t0, 1)
        results["phases"][name] = rec
        results["updated_unix"] = int(time.time())
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1)
        os.replace(tmp, out_path)
        print(f"[battery] {name}: rc={rec['rc']} ({rec['wall_s']}s)", flush=True)
        print(rec["stdout"], flush=True)


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    os.chdir("/root/repo")
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    if phase == "all":
        out = "BATTERY_r05.json"
        if "--out" in sys.argv:
            out = sys.argv[sys.argv.index("--out") + 1]
        run_all(out)
    else:
        globals()[phase]()
