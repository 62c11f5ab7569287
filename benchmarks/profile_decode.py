"""Device-trace profiler for the decode step (round-5 perf diagnosis).

Captures an XPlane trace of ``decoder.generate_scan`` on the bench-exact
path (GPT-2-small int8, prompt 64, cache 768, greedy fused-argmax) and
aggregates per-op device time over the steady-state window, so the gap
between the measured step time and the streaming roofline is attributed
to named ops (kernels vs XLA fusions vs exposed DMA waits) instead of
guessed at.  Reference analog for "profile before optimizing":
/root/reference/docs/performance.md:86-105 (samply workflow).

Usage:
  python benchmarks/profile_decode.py [fuse_mode ...]   # default: 1 mega

Parses the raw ``*.xplane.pb`` via tensorflow.tsl's xplane proto — no
tensorboard needed.
"""

import glob
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def capture(fuse_mode: str, n_steps: int = 256, tag: str = "") -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.models import decoder

    os.environ["RTEN_DECODE_FUSE"] = fuse_mode
    cfg = decoder.DecoderConfig(dtype=jnp.bfloat16, max_seq=1024)
    qp = jax.device_put(
        decoder.quantize_params_int8(decoder.init_params(jax.random.PRNGKey(0), cfg))
    )
    if fuse_mode != "mega":
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

    print(f"[prof] compiling fuse_mode={fuse_mode}...", flush=True)
    jax.block_until_ready(run(n_steps))  # compile + warm
    print("[prof] compiled; warming...", flush=True)
    logdir = f"/tmp/rten_prof_{tag or fuse_mode}"
    os.system(f"rm -rf {logdir}")
    jax.block_until_ready(run(n_steps))
    print("[prof] tracing...", flush=True)
    with jax.profiler.trace(logdir):
        jax.block_until_ready(run(n_steps))
    print("[prof] trace done", flush=True)
    return logdir


def parse(logdir: str, n_steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    sp = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        sp.ParseFromString(f.read())

    dev = None
    for plane in sp.planes:
        if "TPU" in plane.name and "device" in plane.name.lower():
            dev = plane
            break
    if dev is None:
        for plane in sp.planes:
            if "TPU" in plane.name:
                dev = plane
                break
    assert dev is not None, [p.name for p in sp.planes]

    ev_meta = dev.event_metadata
    out = {}
    for line in dev.lines:
        per_op = defaultdict(lambda: [0, 0])  # name -> [total_ps, count]
        t0, t1 = None, None
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            per_op[name][0] += ev.duration_ps
            per_op[name][1] += 1
            start = ev.offset_ps
            end = ev.offset_ps + ev.duration_ps
            t0 = start if t0 is None or start < t0 else t0
            t1 = end if t1 is None or end > t1 else t1
        if per_op:
            out[line.name] = (per_op, t0, t1)
    return out


def report(logdir: str, n_steps: int, top: int = 28):
    lines = parse(logdir, n_steps)
    for lname, (per_op, t0, t1) in lines.items():
        span_us = (t1 - t0) / 1e6
        busy_us = sum(v[0] for v in per_op.values()) / 1e6
        print(
            f"\n== line '{lname}': span {span_us:.0f} us, busy {busy_us:.0f} us "
            f"({busy_us / n_steps:.2f} us/step busy, "
            f"{(span_us - busy_us) / n_steps:.2f} us/step idle-in-span)"
        )
        rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top]
        for name, (tot, cnt) in rows:
            print(
                f"  {tot / 1e6 / n_steps:8.2f} us/step  x{cnt / n_steps:6.1f}  "
                f"{name[:110]}"
            )


if __name__ == "__main__":
    modes = sys.argv[1:] or ["1", "mega"]
    n_steps = int(os.environ.get("RTEN_PROF_STEPS", "256"))
    dirs = [(m, capture(m, n_steps)) for m in modes]
    for m, d in dirs:
        print(f"\n########## fuse_mode={m} ({d}) ##########")
        report(d, n_steps)
