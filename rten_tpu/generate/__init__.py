"""Autoregressive generation (reference: rten-generate crate).

``Generator`` reproduces the reference's iterator semantics
(rten-generate/src/generator.rs:235) — prompt/append, samplers, profiling
metrics, streaming decode — on top of a TPU-native execution plan: two
compiled programs (prefill + decode step) over a preallocated KV cache
instead of one graph run per token with concat-grown caches.
"""

from rten_tpu.generate.generator import (
    EncDecBackend,
    Generator,
    GeneratorConfig,
    GraphBackend,
    NativeBackend,
)
from rten_tpu.generate.metrics import Metrics
from rten_tpu.generate.sampler import (
    ArgMaxSampler,
    Sampler,
    TemperatureSampler,
    TopKSampler,
    TopPSampler,
)

__all__ = [
    "Generator",
    "GeneratorConfig",
    "GraphBackend",
    "EncDecBackend",
    "NativeBackend",
    "Metrics",
    "Sampler",
    "ArgMaxSampler",
    "TemperatureSampler",
    "TopKSampler",
    "TopPSampler",
]
