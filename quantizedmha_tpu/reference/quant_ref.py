"""Fake-quantized INT8 attention reference.

Reproduces, in pure jnp, the exact quantization math the fused INT8 Pallas
kernel performs, so the kernel can be verified bit-for-tile against a slow
golden. Semantics mirror the reference's in-kernel quantizer
(reference mha_kernels/fa_tc_int8_a.cu:38-147): symmetric per-tile max-abs,
scale = amax/127 clamped below at 1e-8, round-to-nearest, clamp to [-127,127]
(the reference clamps to int8 after `__float2int_rn`), int8 x int8 -> int32
matmuls, dequant by the product of the two tile scales.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def quantize_int8_tile(
    x: jnp.ndarray, *, axis=(-2, -1), scale_clamp: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric max-abs int8 quantization.

    Default axis=(-2, -1) -> one scale per trailing [rows, head_dim] tile
    (the reference's per-tile granularity, one scale per SMEM tile —
    fa_tc_int8_a.cu:38-147 — which on TPU is one scale per VMEM block, per
    (batch, head) grid cell). Returns (int8 values, float32 scales with
    keepdims so x ~= values * scales).
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, scale_clamp) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def fake_quant_int8(x: jnp.ndarray, *, axis=(-2, -1), scale_clamp: float = 1e-8) -> jnp.ndarray:
    q, scale = quantize_int8_tile(x, axis=axis, scale_clamp=scale_clamp)
    return q.astype(jnp.float32) * scale


def mha_int8_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    block_q: int = 256,
    block_kv: int = 256,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    p_static_scale: float = 127.0,
    scale_clamp: float = 1e-8,
    pv_dtype: str = "int8",
    summode: str = "vpu",
) -> jnp.ndarray:
    """Blocked fake-quant INT8 attention golden over [..., seq, head_dim].

    Exactly the fused INT8 kernel's algorithm, materialized:
      per (q_block, kv_block) tile:
        S_i32   = Qq_i8 @ Kq_i8^T            (int32 accumulate)
        S_f32   = S_i32 * sQ * sK * sm_scale (dequant, fa_tc_int8_a.cu:150-174)
        online softmax in f32
        Pq_i8   = round(P * 127)             (P in (0,1], static scale)
        O_i32   = Pq_i8 @ Vq_i8
        acc    += O_i32 * (1/127) * sV       (fp32 accumulator,
                                              fa_tc_int8_a.cu:420-423)
    Scales are per-(q_block, kv_block) — keyed by both blocks, fixing the
    reference's cross-block DRAM scale race (fa_tc_int8_a.cu:414,528-531).
    """
    *lead, q_len, head_dim = q.shape
    kv_len = k.shape[-2]
    scale = sm_scale if sm_scale is not None else head_dim**-0.5
    block_q = min(block_q, q_len)
    block_kv = min(block_kv, kv_len)
    assert q_len % block_q == 0 and kv_len % block_kv == 0

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    out = jnp.zeros((*lead, q_len, head_dim), jnp.float32)
    neg_big = jnp.float32(-0.7 * jnp.finfo(jnp.float32).max)

    for qi in range(q_len // block_q):
        qs = slice(qi * block_q, (qi + 1) * block_q)
        q_tile = qf[..., qs, :]
        # Q is quantized PER ROW (axis=-1): each query's result is then
        # independent of its tile-mates (matches the kernel; K/V stay
        # per-block, matching the KV-cache storage granularity).
        q_q, s_q = quantize_int8_tile(q_tile, axis=(-1,), scale_clamp=scale_clamp)
        m = jnp.full((*lead, block_q, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((*lead, block_q, 1), jnp.float32)
        acc = jnp.zeros((*lead, block_q, head_dim), jnp.float32)
        for ki in range(kv_len // block_kv):
            ks = slice(ki * block_kv, (ki + 1) * block_kv)
            k_q, s_k = quantize_int8_tile(kf[..., ks, :], scale_clamp=scale_clamp)
            v_q, s_v = quantize_int8_tile(vf[..., ks, :], scale_clamp=scale_clamp)
            s_i32 = jnp.einsum(
                "...qd,...kd->...qk",
                q_q.astype(jnp.int32),
                k_q.astype(jnp.int32),
            )
            s = s_i32.astype(jnp.float32) * (s_q * s_k * scale)
            if causal:
                qpos = jnp.arange(block_q)[:, None] + qi * block_q + (kv_len - q_len)
                kpos = jnp.arange(block_kv)[None, :] + ki * block_kv
                s = jnp.where(kpos <= qpos, s, neg_big)
            m_curr = jnp.max(s, axis=-1, keepdims=True)
            m_next = jnp.maximum(m, m_curr)
            alpha = jnp.exp(m - m_next)
            # ln(p_scale) folded into the exponent, exactly like the kernel:
            # P arrives in (0, 127], l carries the p_scale factor, and the
            # factor cancels in the epilogue division.
            p = jnp.exp(s - (m_next - jnp.log(jnp.float32(p_static_scale))))
            if pv_dtype == "bf16":
                # Models the kernel's bf16 P path (run21): P rides the PV
                # matmul as bf16, V dequantizes through the same s_v.
                pb = p.astype(jnp.bfloat16).astype(jnp.float32)
                # summode="mxu" (run25): l is the ones-row of the PV
                # matmul, i.e. it sums the SAME bf16 P the numerator uses.
                l_p = pb if summode == "mxu" else p
                l = alpha * l + jnp.sum(l_p, axis=-1, keepdims=True)
                o = jnp.einsum("...qk,...kd->...qd", pb,
                               v_q.astype(jnp.float32))
            else:
                l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
                p_q = jnp.clip(jnp.round(p), -127, 127).astype(jnp.int32)
                o = jnp.einsum(
                    "...qk,...kd->...qd", p_q,
                    v_q.astype(jnp.int32)).astype(jnp.float32)
            acc = alpha * acc + o * s_v
            m = m_next
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out = out.at[..., qs, :].set(acc * l_inv)
    return out.astype(q.dtype)
