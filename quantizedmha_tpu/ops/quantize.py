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


def quantize_kv_blocks_t(
    xt: jnp.ndarray, block: int, *, scale_clamp: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """quantize_kv_blocks over HEAD-TRANSPOSED values.

    xt: [batch, heads, head_dim, seq] — the layout the transposed-score
    kernel consumes for V (flash_attention_int8_t_prequant). Quantizing in
    this layout lets the reference-ABI fast path (api.solve) feed V^T with
    ONE whole-matrix transpose instead of a per-head split + relayout; the
    scales and int8 payload are BITWISE the ones quantize_kv_blocks would
    produce for the untransposed array (max is order-insensitive and the
    quantization arithmetic is elementwise).

    Returns (values int8 [b, h, d, s], scales f32 [b, h, s/block]).
    """
    b, h, d, s = xt.shape
    assert s % block == 0, f"seq {s} not a multiple of block {block}"
    xr = xt.reshape(b, h, d, s // block, block).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xr), axis=(2, 4))
    scale = jnp.maximum(amax, scale_clamp) / 127.0
    q = jnp.clip(
        jnp.round(xr / scale[:, :, None, :, None]), -127, 127
    ).astype(jnp.int8)
    return q.reshape(b, h, d, s), scale


def dequantize_kv_blocks(values: jnp.ndarray, scales: jnp.ndarray, block: int) -> jnp.ndarray:
    b, h, s, d = values.shape
    xr = values.reshape(b, h, s // block, block, d).astype(jnp.float32)
    return (xr * scales[..., None, None]).reshape(b, h, s, d)


def quantize_kv_blocks_int4(
    x: jnp.ndarray, block: int, *, scale_clamp: float = 1e-8,
    scale_block: int = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-(seq block) max-abs INT4 quantization, nibble-packed.

    x: [batch, heads, seq, head_dim] (seq a multiple of `block`, head_dim
    even). Returns (packed int8 [b, h, s, head_dim//2], scales f32
    [b, h, s/scale_block]). DEINTERLEAVED packing: byte j holds element j
    in its low nibble and element j + head_dim//2 in its high nibble, so a
    kernel can unpack into two contiguous half-head_dim tiles with int32
    shifts and run the attention dots per half — no lane reassembly needed
    (quantizedmha_tpu.ops.decode _decode_kernel_int4).

    scale_block (default = block): the SCALE tile can be finer than the
    storage block — int4 has only 3 magnitude bits, so a whole 256-token
    page sharing one max-abs scale wastes most of them on outlier-free
    tokens (run8's unexamined coupling; measured in run12). Must divide
    `block`.
    """
    b, h, s, d = x.shape
    scale_block = block if scale_block is None else scale_block
    assert s % block == 0, f"seq {s} not a multiple of block {block}"
    assert block % scale_block == 0, (
        f"scale_block {scale_block} must divide block {block}")
    assert d % 2 == 0, f"head_dim {d} must be even for nibble packing"
    xr = x.reshape(b, h, s // scale_block, scale_block, d).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xr), axis=(-2, -1))
    scale = jnp.maximum(amax, scale_clamp) / 7.0
    q = jnp.clip(jnp.round(xr / scale[..., None, None]), -7, 7)
    q = q.reshape(b, h, s, d).astype(jnp.int32)
    lo = q[..., : d // 2]
    hi = q[..., d // 2:]
    packed = jnp.bitwise_and(lo, 0xF) | jnp.left_shift(hi, 4)
    return packed.astype(jnp.int8), scale


def unpack_int4_halves(packed: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of the nibble packing: packed int8 [..., d//2] -> (lo, hi)
    int32 halves ([..., d//2] each; elements [0, d/2) and [d/2, d)).
    Pure shift arithmetic — safe inside Pallas kernels on this backend
    (int8 shifts don't lower in Mosaic; int32 shifts do)."""
    p = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)  # sign-extended low nibble
    hi = jnp.right_shift(p, 4)
    return lo, hi


def dequantize_kv_blocks_int4(
    packed: jnp.ndarray, scales: jnp.ndarray, block: int
) -> jnp.ndarray:
    """`block` here is the SCALE tile (scales.shape[-1] * block == seq)."""
    b, h, s, d2 = packed.shape
    lo, hi = unpack_int4_halves(packed)
    vals = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    xr = vals.reshape(b, h, s // block, block, 2 * d2)
    return (xr * scales[..., None, None]).reshape(b, h, s, 2 * d2)
