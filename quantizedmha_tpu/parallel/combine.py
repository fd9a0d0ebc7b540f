"""Cross-shard online-softmax merging.

The same (m, l) rescaling recurrence the fused kernel runs across KV tiles
(reference mha_kernels/fa.cu:106-209), lifted one level up: each shard holds
a *partial* attention output plus its log-sum-exp, and partials are merged
exactly. Used by context parallelism (merge across chips via psum) and ring
attention (merge across ring steps locally).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def merge_two_partials(
    o_a: jnp.ndarray, lse_a: jnp.ndarray, o_b: jnp.ndarray, lse_b: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge two partial attention results.

    o_*: [..., q, d] already normalized by their own l; lse_*: [..., q].
    Fully-masked partials carry lse = -inf and drop out exactly.
    """
    lse_a = lse_a.astype(jnp.float32)
    lse_b = lse_b.astype(jnp.float32)
    m = jnp.maximum(lse_a, lse_b)
    # Guard -inf - -inf = nan for rows masked in both partials.
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w_a = jnp.exp(jnp.where(jnp.isfinite(lse_a), lse_a - m_safe, -jnp.inf))
    w_b = jnp.exp(jnp.where(jnp.isfinite(lse_b), lse_b - m_safe, -jnp.inf))
    denom = w_a + w_b
    lse_out = m_safe + jnp.log(denom)
    lse_out = jnp.where(jnp.isfinite(m), lse_out, -jnp.inf)
    denom_safe = jnp.where(denom == 0.0, 1.0, denom)
    o = (
        o_a.astype(jnp.float32) * (w_a / denom_safe)[..., None]
        + o_b.astype(jnp.float32) * (w_b / denom_safe)[..., None]
    )
    return o.astype(o_a.dtype), lse_out


def merge_partial_attention(
    o_local: jnp.ndarray, lse_local: jnp.ndarray, axis_name: str
) -> jnp.ndarray:
    """Merge partial attention outputs across a mesh axis (two collectives:
    pmax for the global max, one fused tuple-psum for both corrected sums
    — boom guide 15)."""
    lse_local = lse_local.astype(jnp.float32)
    # The global max is only a numerical-stability shift — the merged output
    # is mathematically invariant to it — so treat it as a constant:
    # stop_gradient both makes the merge differentiable (pmax has no diff
    # rule) and is exact.
    m_global = jax.lax.stop_gradient(
        jax.lax.pmax(jax.lax.stop_gradient(lse_local), axis_name=axis_name)
    )
    m_safe = jnp.where(jnp.isfinite(m_global), m_global, 0.0)
    w = jnp.exp(jnp.where(jnp.isfinite(lse_local), lse_local - m_safe, -jnp.inf))
    # One fused tuple-psum for both sums: half the all-reduce launches of
    # two separate psums on the context-parallel hot path.
    l_global, o_global = jax.lax.psum(
        (w, o_local.astype(jnp.float32) * w[..., None]), axis_name=axis_name
    )
    l_safe = jnp.where(l_global == 0.0, 1.0, l_global)
    return (o_global / l_safe[..., None]).astype(o_local.dtype)
