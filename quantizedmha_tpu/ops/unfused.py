"""Unfused 3-stage MHA baseline.

The algorithmic twin of the reference's `unfused` kernel
(reference mha_kernels/unfused.cu:7-184: tiled QK^T, block-per-row softmax,
tiled PV, with 2*N^2 floats of scratch DRAM). On TPU the three stages are
plain XLA HLOs — the point of keeping this variant is the same as the
reference's: a roofline anchor that materializes the full score matrix in
HBM, against which the fused kernels' bandwidth savings are measured.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def unfused_mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """q, k, v: [batch, heads, seq, head_dim]. Materializes S and P in HBM."""
    if causal and q.shape[2] > k.shape[2]:
        # Fully masked rows would come out as UNIFORM attention (max-shifted
        # softmax of an all-masked row), silently wrong — same guard as the
        # fused kernels.
        raise ValueError("causal attention requires q_len <= kv_len")
    head_dim = q.shape[-1]
    scale = sm_scale if sm_scale is not None else head_dim**-0.5
    # Stage 1: S = Q K^T * scale (unfused.cu:46-83 `mma_A_Bt`). HIGHEST so
    # this is a true FP32 kernel like the reference's (the TPU default would
    # run the MXU in bf16 passes and fail the 1e-3 gate on causal rows).
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) * scale
    if causal:
        q_len, kv_len = s.shape[-2], s.shape[-1]
        qi = jnp.arange(q_len)[:, None] + (kv_len - q_len)
        ki = jnp.arange(kv_len)[None, :]
        s = jnp.where(ki <= qi, s, jnp.finfo(jnp.float32).min)
    # Stage 2: row-wise stable softmax (unfused.cu:97-164).
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    # Stage 3: O = P V (unfused.cu:7-44 `mma_A_B`).
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return o.astype(q.dtype)
