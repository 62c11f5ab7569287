"""Multi-chip execution: device mesh + named shardings (new scope — the
reference is single-process CPU; SURVEY.md §2.4). Scaling rides
jax.sharding.Mesh + pjit: weights and KV caches get NamedShardings, XLA
inserts the all-gather/reduce-scatter collectives over ICI.
"""

from rten_tpu.parallel.mesh import (
    make_mesh,
    shard_cache,
    shard_decoder_params,
    decoder_param_specs,
    cache_specs,
)

__all__ = [
    "make_mesh",
    "shard_decoder_params",
    "shard_cache",
    "decoder_param_specs",
    "cache_specs",
]
