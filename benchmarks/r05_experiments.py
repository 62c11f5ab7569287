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


if __name__ == "__main__":
    globals()[sys.argv[1]]()
