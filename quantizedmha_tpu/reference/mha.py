"""Golden jnp multi-head attention reference.

The reference repo's CPU golden (reference utils/verify.cu:9-104) is a naive
O(N^2 d) float MHA with RoPE applied to the Q and K rows and a numerically
stable softmax. This module is that golden reborn as pure jnp so it is
(a) fast enough to run on random inputs for every test (the reference only
ever verified constant-1.0 inputs — its main blind spot, see SURVEY.md 4.4),
(b) differentiable, so the Pallas kernels' custom VJPs can be gate-checked
against `jax.grad` of this function, and
(c) shape-polymorphic over [batch, heads, seq, head_dim].

Unlike the reference, RoPE here is applied consistently by both the golden
and the kernels (the reference's CPU golden applied RoPE, verify.cu:56-69,
while none of its GPU kernels did — masked only by the constant-input test).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _rope_angles(seq_len: int, head_dim: int, theta: float, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # Pairing convention matches reference utils/verify.cu:56-69 /
    # tests/generate_golden.cpp:28-43: element pairs (2i, 2i+1) rotated by
    # angle pos * theta^(-2i/d).
    half = head_dim // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim)
    pos = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    ang = pos * freqs[None, :]
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def apply_rope(x: jnp.ndarray, theta: float = 10000.0, positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Rotary position embedding over the last two dims [seq, head_dim].

    x: [..., seq, head_dim]; head_dim must be even.
    positions: optional [seq] int positions (for decode steps); defaults to
    arange(seq).
    """
    *lead, seq, hd = x.shape
    assert hd % 2 == 0, "head_dim must be even for RoPE"
    x32 = x.astype(jnp.float32)
    xe = x32[..., 0::2]
    xo = x32[..., 1::2]
    if positions is None:
        cos, sin = _rope_angles(seq, hd, theta, jnp.float32)
    else:
        half = hd // 2
        freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) * 2.0 / hd)
        ang = positions.astype(jnp.float32)[:, None] * freqs[None, :]
        cos, sin = jnp.cos(ang), jnp.sin(ang)
    re = xe * cos - xo * sin
    ro = xe * sin + xo * cos
    out = jnp.stack([re, ro], axis=-1).reshape(*lead, seq, hd)
    return out.astype(x.dtype)


def mha_with_intermediates(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    use_rope: bool = False,
    rope_theta: float = 10000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-materialization MHA returning (O, S, P).

    q, k, v: [..., seq, head_dim]. Returns output plus the scaled score
    matrix S and the probability matrix P — the same intermediates the
    reference's golden generator wrote to disk (tests/generate_golden.cpp:53-92)
    so golden cases can assert on them, not just on O.
    """
    if use_rope:
        q = apply_rope(q, rope_theta)
        k = apply_rope(k, rope_theta)
    head_dim = q.shape[-1]
    scale = sm_scale if sm_scale is not None else head_dim**-0.5
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # HIGHEST precision: on TPU the default matmul precision is bf16 passes;
    # the golden must be the full-f32 result (like the CPU golden it rebuilds).
    s = jnp.einsum("...qd,...kd->...qk", qf, kf, precision=jax.lax.Precision.HIGHEST) * scale
    if causal:
        q_len, kv_len = s.shape[-2], s.shape[-1]
        qi = jnp.arange(q_len)[:, None] + (kv_len - q_len)
        ki = jnp.arange(kv_len)[None, :]
        s = jnp.where(ki <= qi, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p_norm = p / l
    o = jnp.einsum("...qk,...kd->...qd", p_norm, vf, precision=jax.lax.Precision.HIGHEST)
    return o.astype(q.dtype), s, p_norm


def mha_reference_shaped(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    use_rope: bool = False,
    rope_theta: float = 10000.0,
) -> jnp.ndarray:
    """Golden MHA over [batch, heads, seq, head_dim] (or any leading dims)."""
    o, _, _ = mha_with_intermediates(
        q, k, v, sm_scale=sm_scale, causal=causal, use_rope=use_rope, rope_theta=rope_theta
    )
    return o


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    d_model: int,
    num_heads: int,
    *,
    use_rope: bool = True,
    sm_scale: Optional[float] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Reference-ABI golden: flat [N, d_model] in/out, like `cpu_reference`
    (reference utils/verify.cu:25-104): slices each head's [N, d] columns,
    applies RoPE (on by default, matching verify.cu:56-69), runs stable
    softmax attention, concatenates heads back.
    """
    n = q.shape[0]
    d = d_model // num_heads
    def split(x):
        return x.reshape(n, num_heads, d).transpose(1, 0, 2)  # [h, N, d]
    qh, kh, vh = split(q), split(k), split(v)
    oh = mha_reference_shaped(
        qh, kh, vh, sm_scale=sm_scale if sm_scale is not None else d**-0.5,
        causal=causal, use_rope=use_rope,
    )
    return oh.transpose(1, 0, 2).reshape(n, d_model)


def mha_masked_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: int = 0,
) -> jnp.ndarray:
    """Golden for masked-variant attention: end-aligned causal, Mistral-style
    sliding window ((q_pos - kv_pos) < window) and Gemma-2 logit soft-cap
    (cap * tanh(s / cap) on the SCALED logits, applied before masking).
    GQA-aware: k/v with fewer heads are expanded here (the kernels share
    them in-place instead). The single source of truth for these semantics —
    the kernel tests and the model's jnp fallback both gate against it.
    """
    n_rep = q.shape[1] // k.shape[1]
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=1)
        v = jnp.repeat(v, n_rep, axis=1)
    scale = sm_scale if sm_scale is not None else q.shape[-1] ** -0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    q_len, kv_len = s.shape[-2], s.shape[-1]
    qi = jnp.arange(q_len)[:, None] + (kv_len - q_len)  # end-aligned
    ki = jnp.arange(kv_len)[None, :]
    mask = jnp.ones((q_len, kv_len), bool)
    if causal:
        mask &= ki <= qi
        if window is not None:
            in_win = (qi - ki) < window
            if sinks:
                in_win |= ki < sinks  # StreamingLLM attention sinks
            mask &= in_win
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32)
    ).astype(q.dtype)
