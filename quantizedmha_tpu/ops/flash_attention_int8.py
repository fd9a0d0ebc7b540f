"""Fused INT8 FlashAttention forward — the flagship kernel.

TPU-native re-design of the reference's fastest kernel, fa_tc_int8_b
(reference mha_kernels/fa_tc_int8_b.cu, 7.70 ms on its L4 headline workload),
and of the INT8 algorithm documented in its run6 notes
(profiles/md/run6/int8_notes.md:103-140) / INT-FlashAttention
(arXiv 2409.16997):

  per (q_block, kv_block) tile:
    Qq,Kq,Vq   int8 = symmetric max-abs per tile      (fa_tc_int8_a.cu:38-147)
    S_i32      = Qq @ Kq^T on the MXU's int8 path     (wmma int8, :177-280)
    S_f32      = S_i32 * sQ * sK * sm_scale           (dequant, :150-174)
    online softmax in f32 (m, l in VMEM scratch)
    Pq  int8   = round(P * 127)    P in (0,1] so the scale is static
    O_i32      = Pq @ Vq on the MXU
    acc_f32   += O_i32 * sV / 127                     (fp32 accum, :420-423)

Deliberate departures from the reference:
  * Q is quantized ONCE per q block and cached in VMEM scratch; the
    reference re-quantized Q on every kv iteration (fa_tc_int8_b.cu:482).
  * Scales are kernel-local per-(q_block, kv_block) values — the reference
    kept them in global DRAM arrays keyed only by kv block, a true data race
    across q blocks (fa_tc_int8_a.cu:414,528-531; SURVEY.md 4.4).
  * No SMEM buffer unions / PAD / swizzles: VMEM has no bank conflicts, and
    the aliasing hazard that cost the reference 0.3-0.4% accuracy
    (profiles/md/run7/notes.md:41-53) does not exist here.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedmha_tpu.ops.flash_attention import DEFAULT_MASK_VALUE, LANES, _auto_interpret


def _quant_tile(x: jnp.ndarray, scale_clamp: float):
    """Symmetric per-tile max-abs int8 quantization (in-kernel, VPU)."""
    amax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(amax, scale_clamp) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def _int8_fwd_kernel(
    q_ref,  # [1, 1, block_q, head_dim] f32/bf16
    k_ref,  # [1, 1, block_kv, head_dim]
    v_ref,  # [1, 1, block_kv, head_dim]
    o_ref,  # [1, 1, block_q, head_dim]
    m_scratch,  # [block_q, LANES] f32
    l_scratch,  # [block_q, LANES] f32
    acc_scratch,  # [block_q, head_dim] f32
    qi8_scratch,  # [block_q, head_dim] int8 — Q quantized once per q block
    sq_scratch,  # [1] f32 in SMEM — Q tile scale
    *,
    sm_scale: float,
    causal: bool,
    q_len: int,
    kv_len: int,
    block_q: int,
    block_kv: int,
    scale_clamp: float,
    p_scale: float,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)
        q = q_ref[0, 0, :, :].astype(jnp.float32)
        qi8, sq = _quant_tile(q, scale_clamp)
        qi8_scratch[...] = qi8
        sq_scratch[0] = sq

    diag_offset = kv_len - q_len
    if causal:
        last_q_row = q_idx * block_q + diag_offset + block_q - 1
        should_run = last_q_row >= kv_idx * block_kv
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        k = k_ref[0, 0, :, :].astype(jnp.float32)
        ki8, sk = _quant_tile(k, scale_clamp)
        # precision pinned to DEFAULT: integer matmuls reject the fp32
        # contract precision a global jax_default_matmul_precision=highest
        # would otherwise inject.
        s_i32 = jax.lax.dot_general(
            qi8_scratch[...], ki8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        )
        s = s_i32.astype(jnp.float32) * (sq_scratch[0] * sk * sm_scale)

        need_kv_edge_mask = kv_len % block_kv != 0
        if causal or need_kv_edge_mask:
            qpos = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
                + q_idx * block_q
                + diag_offset
            )
            kpos = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                + kv_idx * block_kv
            )
            mask = jnp.ones((block_q, block_kv), jnp.bool_)
            if causal:
                mask &= kpos <= qpos
            if need_kv_edge_mask:
                mask &= kpos < kv_len
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        # P is in (0, 1] after the max subtraction, so a static scale of 127
        # quantizes it with no amax reduction (INT-FlashAttention's trick;
        # the reference instead ran a full per-tile reduction on P each
        # iteration, fa_tc_int8_b.cu:352-360).
        p_i8 = jnp.round(p * p_scale).astype(jnp.int8)

        v = v_ref[0, 0, :, :].astype(jnp.float32)
        vi8, sv = _quant_tile(v, scale_clamp)
        pv_i32 = jax.lax.dot_general(
            p_i8, vi8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc_scratch[...] = acc_scratch[...] * alpha + pv_i32.astype(jnp.float32) * (
            sv / p_scale
        )

    @pl.when(kv_idx == num_kv - 1)
    def _epilogue():
        l = l_scratch[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0, :, :] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def flash_attention_int8(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    block_q: int = 256,
    block_kv: int = 256,
    scale_clamp: float = 1e-8,
    p_static_scale: float = 127.0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused INT8-quantized FlashAttention forward on TPU.

    q, k, v: [batch, heads, seq, head_dim] float32/bfloat16 in; same dtype
    out (matching the reference's FP32-in/FP32-out ABI with internal INT8,
    reference mha_kernels/fa_tc_int8_b.cu). Quantization is symmetric
    per-(q_block, kv_block) tile max-abs; both matmuls run on the MXU's
    int8 x int8 -> int32 path.
    """
    if q.ndim != 4:
        raise ValueError(f"expected [batch, heads, seq, head_dim], got {q.shape}")
    batch, heads, q_len, head_dim = q.shape
    kv_len = k.shape[2]
    scale = sm_scale if sm_scale is not None else head_dim**-0.5
    block_q = min(block_q, q_len)
    block_kv = min(block_kv, kv_len)
    if causal and q_len > kv_len:
        raise ValueError("causal attention requires q_len <= kv_len")

    q_pad = (-q_len) % block_q
    kv_pad = (-kv_len) % block_kv
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad), (0, 0))) if q_pad else q
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad), (0, 0))) if kv_pad else k
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad), (0, 0))) if kv_pad else v
    q_len_p, kv_len_p = q_len + q_pad, kv_len + kv_pad

    grid = (batch, heads, q_len_p // block_q, kv_len_p // block_kv)
    kernel = functools.partial(
        _int8_fwd_kernel,
        sm_scale=scale,
        causal=causal,
        q_len=q_len,
        kv_len=kv_len,
        block_q=block_q,
        block_kv=block_kv,
        scale_clamp=scale_clamp,
        p_scale=p_static_scale,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, h, i, j: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((batch, heads, q_len_p, head_dim), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.int8),
            pltpu.SMEM((1,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_auto_interpret(interpret),
    )(qp, kp, vp)
    return out[:, :, :q_len, :]
