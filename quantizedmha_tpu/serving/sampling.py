"""On-device token sampling for the serving engine.

No reference analog: the reference repo is an attention kernel study with
no decoding loop at all (SURVEY.md §2) — this is north-star serving scope.
Greedy argmax, temperature, top-k, and top-p (nucleus) sampling as pure
jittable functions —
usable both per step and inside the fused decode loop's lax.scan (the PRNG
key is part of the scan carry, so fused chunks replay exactly like
step-at-a-time decoding with the same seed).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """temperature == 0 -> greedy argmax (top_k/top_p ignored).
    top_k == 0 -> no k-truncation; top_p == 1.0 -> no nucleus truncation.
    Both set -> top-k first, then the nucleus over the survivors (the
    common "top_k + top_p" composition)."""

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0

    def validate(self) -> "SamplingParams":
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if self.top_k < 0:
            raise ValueError("top_k must be >= 0")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        return self

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0


def sample(
    logits: jnp.ndarray,
    key: Optional[jax.Array],
    params: SamplingParams,
) -> jnp.ndarray:
    """logits: [batch, vocab] -> tokens [batch] i32.

    Statically specializes on params (it's a frozen dataclass captured at
    trace time), so the greedy path compiles to a bare argmax.
    """
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / params.temperature
    if params.top_k > 0:
        # Clamp to the vocab size: SamplingParams.validate() can't know it,
        # and an oversized top_k would raise at trace time inside the jitted
        # decode loop. top_k >= vocab degrades to no truncation.
        k = min(params.top_k, logits.shape[-1])
        kth = jax.lax.top_k(scaled, k)[0][..., -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if params.top_p < 1.0:
        # Nucleus: keep the smallest set of tokens whose probability mass
        # reaches top_p. Sort descending, find the cumulative cutoff, and
        # mask everything SOFTER than the last kept logit (the first token
        # is always kept, so the set is never empty).
        sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < params.top_p  # keep while mass BEFORE token < p
        cutoff = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
