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


def warp_logits(logits: jnp.ndarray, params: SamplingParams) -> jnp.ndarray:
    """Apply temperature / top-k / top-p to [..., vocab] logits. The warped
    logits DEFINE the sampling distribution (softmax of them); speculative
    rejection sampling needs it explicitly, so it lives apart from the
    categorical draw. Requires params.temperature > 0."""
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
    return scaled


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
    return jax.random.categorical(
        key, warp_logits(logits, params), axis=-1).astype(jnp.int32)


def rejection_sample(
    draft_logits: jnp.ndarray,   # [B, k, vocab] — draft model, per position
    target_logits: jnp.ndarray,  # [B, k, vocab] — target model, same positions
    drafts: jnp.ndarray,         # [B, k] i32 — tokens the draft proposed
    key: jax.Array,
    params: SamplingParams,
) -> tuple:
    """Speculative rejection sampling (Leviathan et al.): accept draft
    token x_j with prob min(1, p_j(x)/q_j(x)); at the first rejection draw
    the replacement from the residual max(p_j - q_j, 0) (renormalized).
    Emitting [accepted drafts] + [replacement] is then EXACTLY distributed
    as sampling the target token-by-token with `params` — both p and q are
    the WARPED (temperature/top-k/top-p) distributions, so exactness holds
    with any sampling config. Greedy (temperature=0) degenerates to the
    argmax-match path and is handled by the caller.

    Returns (n_accepted [B] i32, replacement [B] i32). replacement is only
    meaningful where n_accepted < k (full-acceptance rows ignore it).
    """
    if params.greedy:
        raise ValueError("rejection_sample requires temperature > 0")
    B, k, _ = draft_logits.shape
    q = jax.nn.softmax(warp_logits(draft_logits, params), axis=-1)
    p = jax.nn.softmax(warp_logits(target_logits, params), axis=-1)
    qd = jnp.take_along_axis(q, drafts[..., None], axis=-1)[..., 0]  # [B,k]
    pd = jnp.take_along_axis(p, drafts[..., None], axis=-1)[..., 0]
    key_u, key_r = jax.random.split(key)
    u = jax.random.uniform(key_u, (B, k))
    # accept iff u < p/q  <=>  u*q < p (no division; q=0 proposals — which
    # can't actually be drawn — reject unless p > 0 anyway).
    acc = (u * qd) < pd
    n_accepted = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
    # Residual distribution at the first rejected position (clamped for
    # full-accept rows, where it is unused).
    j = jnp.minimum(n_accepted, k - 1)[:, None, None]
    p_j = jnp.take_along_axis(p, j, axis=1)[:, 0]  # [B, vocab]
    q_j = jnp.take_along_axis(q, j, axis=1)[:, 0]
    resid = jnp.maximum(p_j - q_j, 0.0)
    rs = jnp.sum(resid, axis=-1, keepdims=True)
    # p == q everywhere => residual is empty; any draw from p is correct.
    resid = jnp.where(rs > 0.0, resid / jnp.maximum(rs, 1e-20), p_j)
    replacement = jax.random.categorical(
        key_r, jnp.log(jnp.maximum(resid, 1e-20)), axis=-1).astype(jnp.int32)
    return n_accepted.astype(jnp.int32), replacement
