"""Per-kernel roofline benchmarks (reference analog: the #[ignore]d GEMM
benches, /root/reference/src/gemm.rs:1779-1917, run manually via
`cargo test --release bench_gemm`).

Runs each hot Pallas kernel at production shapes on the attached backend and
prints achieved throughput vs its roofline (MXU TF/s for compute-bound
prefill, HBM GB/s for bandwidth-bound decode). Uses the robust wide-window
slope timing (utils/bench.marginal_step_time — see CLAUDE.md measurement
rules; narrow windows drown in tunnel launch jitter).

    python benchmarks/kernels.py                # all suites
    python benchmarks/kernels.py --suite gemv   # one suite
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _chain(fn, x0, steps):
    import jax

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(n):
        import jax.numpy as jnp

        def body(c, _):
            return fn(c), None

        return jax.lax.scan(body, x0, None, length=n)[0]

    return run(n=steps)


def _measure(fn, x0, short=64, long=512, reps=3):
    import jax

    from rten_tpu.utils.bench import marginal_step_time

    jax.block_until_ready(_chain(fn, x0, short))
    jax.block_until_ready(_chain(fn, x0, long))
    best = None
    for _ in range(reps):
        st = marginal_step_time(lambda s: _chain(fn, x0, s), short, long, trials=5)
        if st > 0 and (best is None or st < best):
            best = st
    return best if best is not None else float("nan")


MXU_PEAK_TFLOPS = 197.0
HBM_GBS = 810.0


def bench_prefill_matmul(rows):
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.kernels.quant_matmul import quant_matmul_int8, quantize_weights_int8

    n = 2048
    rng = np.random.default_rng(1)
    a0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32).astype(jnp.bfloat16))
    qw, qs = quantize_weights_int8(rng.standard_normal((n, n)).astype(np.float32))
    qd, sd = jnp.asarray(qw), jnp.asarray(qs)
    step = _measure(
        lambda c: quant_matmul_int8(c, qd, sd).astype(jnp.bfloat16), a0
    )
    tf = 2 * n**3 / step / 1e12
    rows.append(("dequant+matmul 2048^3", f"{tf:7.1f} TF/s", f"{tf / MXU_PEAK_TFLOPS:.2f} of MXU peak"))


def bench_gemv(rows):
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.kernels.quant_matmul import quant_gemv_int8, quantize_weights_int8

    # 12 distinct matrices per chained step: forces genuine HBM streaming
    # (a single repeated matrix gets kept VMEM-resident by XLA) and gives
    # the slope a ≥25 ms signal against tunnel jitter.
    for k, n, reps, label in (
        (768, 51200, 2, "lm-head 768x51200"),
        (768, 2304, 12, "qkv 768x2304"),
    ):
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32).astype(jnp.bfloat16))
        mats = []
        for _ in range(reps):
            qw, qs = quantize_weights_int8(rng.standard_normal((k, n)).astype(np.float32))
            mats.append((jnp.asarray(qw), jnp.asarray(qs)))

        def fn(c, mats=mats, k=k):
            for qd, sd in mats:
                c = quant_gemv_int8(c, qd, sd)[:, :k].astype(jnp.bfloat16)
            return c

        step = _measure(fn, x0, short=32, long=256) / reps
        gbs = k * n / step / 1e9
        rows.append((f"int8 GEMV {label}", f"{gbs:7.1f} GB/s", f"{gbs / HBM_GBS:.2f} of HBM"))


def bench_mlp(rows):
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.kernels.quant_matmul import quant_mlp_int8, quantize_weights_int8

    d, ff = 768, 3072
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, d)).astype(np.float32).astype(jnp.bfloat16))
    qu, su = quantize_weights_int8(rng.standard_normal((d, ff)).astype(np.float32))
    qd_, sd_ = quantize_weights_int8(rng.standard_normal((ff, d)).astype(np.float32))
    ns = jnp.ones((d,), jnp.float32)
    args = [jnp.asarray(a) for a in (qu, su, qd_, sd_)]

    def fn(c):
        return quant_mlp_int8(
            c, *args, activation="gelu", norm="layernorm", norm_scale=ns,
            residual=c.astype(jnp.float32), out_dtype=jnp.bfloat16,
        )

    step = _measure(fn, x0)
    gbs = 2 * d * ff / step / 1e9
    rows.append((f"fused MLP {d}x{ff}", f"{gbs:7.1f} GB/s", f"{gbs / HBM_GBS:.2f} of HBM (VMEM-resident reps overstate)"))


def bench_decode_attention(rows):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.kernels.decode_attention import decode_attention
    from rten_tpu.kernels.quant_matmul import quantize_weights_int8

    H, HD, S, D, L = 12, 64, 768, 768, 12
    rng = np.random.default_rng(0)
    wo_w, wo_s = (jnp.asarray(a) for a in quantize_weights_int8(rng.standard_normal((D, D)).astype(np.float32)))
    q0 = jnp.asarray(rng.standard_normal((1, H, 1, HD)).astype(np.float32).astype(jnp.bfloat16))
    kv_len = jnp.asarray([384], jnp.int32)
    resid = jnp.zeros((1, D), jnp.bfloat16)
    caches = [
        (jnp.zeros((1, H, S * HD // 128, 128), jnp.bfloat16),
         jnp.zeros((1, H, S * HD // 128, 128), jnp.bfloat16))
        for _ in range(L)
    ]  # 12 distinct layer caches (28 MB) force genuine HBM streaming

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(q_in, caches, n):
        def body(carry, _):
            q, caches = carry
            out = []
            for ck, cv in caches:
                hidden, ck, cv = decode_attention(q, ck, cv, kv_len, q, q, wo_w, wo_s, None, resid)
                q = hidden[:, : H * HD].reshape(1, H, 1, HD).astype(jnp.bfloat16)
                out.append((ck, cv))
            return (q, out), None
        return jax.lax.scan(body, (q_in, caches), None, length=n)[0][0]

    from rten_tpu.utils.bench import marginal_step_time

    jax.block_until_ready(chain(q0, caches, n=16))
    step = min(
        marginal_step_time(lambda s: chain(q0, caches, n=s), 16, 128, trials=5)
        for _ in range(2)
    )
    rows.append((f"decode attn+wo (kv=384) x{L}", f"{step / L * 1e6:7.2f} us/layer", ""))


def bench_argmax_gemv(rows):
    """lm-head GEMV with the fused argmax epilogue vs XLA-side argmax —
    the greedy-sampler step of generate_scan. Both variants chain through a
    token→embedding gather so the comparison includes identical glue."""
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.kernels.quant_matmul import quant_gemv_int8, quantize_weights_int8

    k, n, vocab = 768, 51200, 50257
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32).astype(jnp.bfloat16))
    table = jnp.asarray(
        rng.standard_normal((vocab, k)).astype(np.float32).astype(jnp.bfloat16)
    )
    mats = []
    for _ in range(2):
        qw, qs = quantize_weights_int8(rng.standard_normal((k, n)).astype(np.float32))
        mats.append((jnp.asarray(qw), jnp.asarray(qs)))

    def fn_fused(c, mats=mats):
        for qd, sd in mats:
            tok = quant_gemv_int8(c, qd, sd, argmax_n=vocab)
            c = table[tok[0]][None, :]
        return c

    def fn_xla(c, mats=mats):
        for qd, sd in mats:
            logits = quant_gemv_int8(c, qd, sd, out_dtype=jnp.float32)
            tok = jnp.argmax(logits[:, :vocab], axis=-1)
            c = table[tok[0]][None, :]
        return c

    for label, fn in (("fused", fn_fused), ("xla-argmax", fn_xla)):
        step = _measure(fn, x0, short=32, long=256) / 2
        rows.append((f"lm-head+greedy ({label})", f"{step * 1e6:7.2f} us/call", ""))


SUITES = {
    "prefill": bench_prefill_matmul,
    "gemv": bench_gemv,
    "mlp": bench_mlp,
    "attention": bench_decode_attention,
    "argmax": bench_argmax_gemv,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--suite", choices=sorted(SUITES), action="append")
    args = p.parse_args(argv)
    import jax

    print(f"backend: {jax.default_backend()} ({jax.devices()[0].device_kind})")
    rows: list[tuple[str, str, str]] = []
    for name in args.suite or sorted(SUITES):
        SUITES[name](rows)
    width = max(len(r[0]) for r in rows) + 2
    for name, val, note in rows:
        print(f"{name:<{width}} {val}   {note}")


if __name__ == "__main__":
    main()
