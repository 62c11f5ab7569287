"""Multi-chip scaling benchmark: serving throughput vs mesh size.

BASELINE.json asks for tokens/s at 1 chip / 1 host / N≥2 hosts with ≥85%
host-to-host scaling efficiency. This harness measures the continuous-
batching engine's aggregate decode throughput over a ("data", "model") mesh
and reports per-mesh tokens/s + efficiency vs the single-device run.

On real multi-chip hardware run it as-is (devices = jax.devices()); on a
dev box use --virtual N to fake an N-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count).

    python benchmarks/scaling.py --virtual 8 --meshes 1x1,2x1,2x4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--virtual", type=int, default=0, help="fake N CPU devices")
    p.add_argument("--meshes", default="1x1,2x1,1x2", help="comma list of DxM")
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--steps", type=int, default=48)
    p.add_argument("--batch-per-data", type=int, default=4)
    p.add_argument(
        "--reps", type=int, default=3,
        help="repeat each mesh measurement; keep the fastest (the virtual-"
        "CPU proxy timeshares one host and has large run-to-run variance — "
        "min over reps is the same discipline the TPU bench uses)",
    )
    args = p.parse_args(argv)

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.models import decoder
    from rten_tpu.parallel import make_mesh, shard_cache, shard_decoder_params
    from rten_tpu.utils.bench import marginal_step_time

    meshes = []
    for spec in args.meshes.split(","):
        d, m = (int(v) for v in spec.split("x"))
        meshes.append((d, m))
    max_model = max(m for _, m in meshes)

    cfg = decoder.DecoderConfig(
        vocab_size=1024,
        n_layers=args.layers,
        n_heads=2 * max_model,
        n_kv_heads=max_model,
        d_model=args.d_model * max_model // max(1, max_model),
        d_ff=2 * args.d_model,
        max_seq=256,
        pos_encoding="rope",
        norm="rmsnorm",
        activation="swiglu",
        tie_embeddings=False,
        dtype=jnp.float32,
    )
    params0 = decoder.init_params(jax.random.PRNGKey(0), cfg)

    results = []
    for d, m in meshes:
        if d * m > len(jax.devices()):
            print(f"skip {d}x{m}: only {len(jax.devices())} devices", file=sys.stderr)
            continue
        mesh = make_mesh(data=d, model=m)
        params = shard_decoder_params(params0, mesh)
        batch = args.batch_per_data * d

        def run_at(n_steps, params=params, mesh=mesh, batch=batch):
            cache = shard_cache(decoder.init_cache(cfg, batch, cfg.max_seq), mesh)
            tok = jnp.zeros((batch, 1), jnp.int32)
            toks, _ = decoder.generate_scan(
                params, cfg, cache, tok, jax.random.PRNGKey(0),
                n_steps=n_steps, use_flash=False,
            )
            return toks

        short = max(2, args.steps // 4)
        step_s = min(
            marginal_step_time(run_at, short, max(args.steps, short + 4))
            for _ in range(max(1, args.reps))
        )
        tok_s = batch / step_s

        # Collective census of the compiled per-mesh program (definitions
        # only): the deterministic, hardware-independent half of the
        # overhead story. A Megatron-minimal decode is 1 embedding psum +
        # 2 all-reduces per layer + the tiny sampling all-gathers.
        import jax as _jax

        n_probe = 4
        fn = _jax.jit(
            lambda p, c, t, _params=params, _mesh=mesh: decoder.generate_scan(
                _params, cfg, c, t, _jax.random.PRNGKey(0),
                n_steps=n_probe, use_flash=False,
            )
        )
        cache0 = shard_cache(decoder.init_cache(cfg, batch, cfg.max_seq), mesh)
        hlo = fn.lower(params, cache0, jnp.zeros((batch, 1), jnp.int32)).compile().as_text()
        collectives = {
            k: hlo.count(f" {k}(")
            for k in ("all-reduce", "all-gather", "collective-permute",
                      "reduce-scatter", "all-to-all")
        }
        results.append(
            {
                "mesh": f"{d}x{m}",
                "devices": d * m,
                "tokens_per_s": tok_s,
                "collectives_per_step_program": collectives,
            }
        )

    if results:
        base = results[0]
        for r in results:
            ideal = base["tokens_per_s"] * r["devices"] / base["devices"]
            r["scaling_efficiency"] = r["tokens_per_s"] / ideal if ideal else 1.0
            # On a virtual CPU mesh every "device" shares the host's physical
            # cores, so linear-scaling efficiency is physically unreachable
            # (8 devices on 1 core can at best hold throughput FLAT). The
            # meaningful fixed-silicon number is the sharding OVERHEAD: how
            # much total throughput survives partitioning the same compute
            # across N program shards + collectives. 1.0 = the mesh program
            # costs nothing beyond the math; BASELINE's ≥0.85 bar applied to
            # this proxy bounds the non-compute (collective/glue) fraction.
            r["fixed_silicon_efficiency"] = r["tokens_per_s"] / base["tokens_per_s"]
    out = {
        "backend": "cpu-virtual" if args.virtual else None,
        "physical_cores": os.cpu_count(),
        "reps": args.reps,
        "efficiency_basis": (
            "scaling_efficiency = tokens_per_s vs linear-in-devices from the "
            "first mesh (real multi-chip metric); fixed_silicon_efficiency = "
            "tokens_per_s vs the unsharded run on the SAME silicon (virtual-"
            "mesh proxy: bounds sharding/collective overhead). CAVEAT: on a "
            "single-core host the proxy timeshares every virtual device and "
            "has been measured to swing ±25% run to run (a zero-collective "
            "DP-only mesh read 1.26 once); compare against a DxM=Dx1 control "
            "and the collective census before attributing drops to sharding."
        ),
        "results": results,
    }
    if not args.virtual:
        import jax as _jax

        out["backend"] = _jax.default_backend()
    print(json.dumps(out, indent=None, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
