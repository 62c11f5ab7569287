"""Token samplers (reference: rten-generate/src/sampler.rs — Sampler trait
:12, ArgMax :21, TopK :43; TopP is new scope). Batched: logits [B, vocab] →
token ids [B]. Samplers are pure jax functions so the whole sample step can
fuse into the decode program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Sampler:
    """Samplers are hashable on their configuration so they can be passed as
    static args to jitted device-side generation (decoder.generate_scan)."""

    def _key(self) -> tuple:
        return (type(self).__name__,)

    def __hash__(self) -> int:
        return hash(self._key())

    def __eq__(self, other) -> bool:
        return isinstance(other, Sampler) and self._key() == other._key()

    def sample(self, rng: jax.Array | None, logits: jax.Array) -> jax.Array:
        raise NotImplementedError


class ArgMaxSampler(Sampler):
    def sample(self, rng, logits):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)


class TemperatureSampler(Sampler):
    """Plain temperature sampling over the full vocabulary. This is the
    sampler speculative decoding can verify EXACTLY (Generator.with_draft):
    accept/reject against the target softmax reproduces its marginals."""

    def __init__(self, temperature: float = 1.0):
        self.temperature = temperature

    def _key(self):
        return (type(self).__name__, self.temperature)

    def sample(self, rng, logits):
        if rng is None:
            raise ValueError("TemperatureSampler requires an rng key")
        lg = logits.astype(jnp.float32) / max(self.temperature, 1e-6)
        return jax.random.categorical(rng, lg, axis=-1).astype(jnp.int32)


class TopKSampler(Sampler):
    """Sample from the k highest-probability tokens with temperature."""

    def __init__(self, k: int = 50, temperature: float = 1.0):
        self.k = k
        self.temperature = temperature

    def _key(self):
        return (type(self).__name__, self.k, self.temperature)

    def sample(self, rng, logits):
        if rng is None:
            raise ValueError("TopKSampler requires an rng key")
        vals, idx = jax.lax.top_k(logits, self.k)  # [B, k]
        vals = vals / max(self.temperature, 1e-6)
        choice = jax.random.categorical(rng, vals, axis=-1)  # [B]
        return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(
            jnp.int32
        )


class TopPSampler(Sampler):
    """Nucleus sampling: smallest prefix of the sorted distribution with
    cumulative probability ≥ p."""

    def __init__(self, p: float = 0.9, temperature: float = 1.0):
        self.p = p
        self.temperature = temperature

    def _key(self):
        return (type(self).__name__, self.p, self.temperature)

    def sample(self, rng, logits):
        if rng is None:
            raise ValueError("TopPSampler requires an rng key")
        logits = logits / max(self.temperature, 1e-6)
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep tokens while the cumulative mass *before* them is < p.
        keep = cum - probs < self.p
        cutoff = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        masked = jnp.where(logits >= cutoff, logits, -jnp.inf)
        return jax.random.categorical(rng, masked, axis=-1).astype(jnp.int32)
