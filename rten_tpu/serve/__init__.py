"""Serving: continuous batching over slot-based KV caches (new scope — the
reference's rten-generate runs batch_size=1 hardcoded,
rten-generate/src/generator.rs:519; BASELINE.json config 5 requires
continuous batching for the Llama-class multi-host target).
"""

from rten_tpu.serve.engine import Request, ServingEngine

__all__ = ["Request", "ServingEngine"]
