"""Block quantization utilities (host-side XLA passes).

The reference quantizes K/V tiles *inside* the kernel on every iteration —
and, because scales lived in global DRAM keyed only by kv-block, raced
across thread blocks (reference fa_tc_int8_a.cu:38-147, 414, 528-531). Here
K/V are quantized once per sequence in a single O(S*D) XLA pass (vs the
kernel's O(S^2) work), producing int8 payloads plus per-(head, block)
scales. This is also the storage format of the INT8 KV cache: the fused
kernel reads int8 K/V directly — half the HBM traffic of f32.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def quantize_kv_blocks(
    x: jnp.ndarray, block: int, *, scale_clamp: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-(seq block) max-abs int8 quantization.

    x: [batch, heads, seq, head_dim] (seq must be a multiple of `block`).
    Returns (values int8 same shape, scales f32 [batch, heads, seq/block]).
    """
    b, h, s, d = x.shape
    assert s % block == 0, f"seq {s} not a multiple of block {block}"
    xr = x.reshape(b, h, s // block, block, d).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xr), axis=(-2, -1))
    scale = jnp.maximum(amax, scale_clamp) / 127.0
    q = jnp.clip(
        jnp.round(xr / scale[..., None, None]), -127, 127
    ).astype(jnp.int8)
    return q.reshape(b, h, s, d), scale


def dequantize_kv_blocks(values: jnp.ndarray, scales: jnp.ndarray, block: int) -> jnp.ndarray:
    b, h, s, d = values.shape
    xr = values.reshape(b, h, s // block, block, d).astype(jnp.float32)
    return (xr * scales[..., None, None]).reshape(b, h, s, d)
