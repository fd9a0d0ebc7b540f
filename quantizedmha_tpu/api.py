"""Reference-ABI entry point.

The reference exposes one C ABI — `solve(Q, K, V, out, N, d_model, h)` with
flat [N, d_model] float32 matrices (reference mha_kernels/*.cu `extern "C"
solve`, extensions/torch/torch_ext.cpp:11-43, extensions/jax/jax_binding.py:
25-77). Here that surface is a plain jittable JAX function: no DLPack/CuPy
pointer escape hatch is needed because the kernels ARE jnp callables, and
kernel selection is a runtime string instead of a per-kernel binary build
(reference Makefile:39-53 built one binary per kernel).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from quantizedmha_tpu.configs.attention import AttentionConfig

from quantizedmha_tpu.ops.flash_attention import flash_attention
from quantizedmha_tpu.ops.flash_attention_int8 import flash_attention_int8
from quantizedmha_tpu.ops.unfused import unfused_mha
from quantizedmha_tpu.reference.mha import apply_rope, mha_reference_shaped

# Kernel ladder, mirroring the reference's variant names (README.md:9-19).
# The CUDA-specific layout experiments (v1b/v2/v2a/v2b: WMMA tile shapes,
# SMEM PAD, XOR swizzle) have no TPU analogue — their capability (a tuned
# tensor-core fused kernel) is "fa_bf16" here.
KERNELS = ("unfused", "fa", "fa_bf16", "fa_int8", "reference")


def solve(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    d_model: int,
    num_heads: Optional[int] = None,
    *,
    kernel: str = "fa_int8",
    config: Optional[AttentionConfig] = None,
    causal: Optional[bool] = None,
    use_rope: Optional[bool] = None,
    rope_theta: Optional[float] = None,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    interpret: Optional[bool] = None,
    abi_fast: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention over flat [N, d_model] Q/K/V (reference ABI).

    Splits heads, optionally applies RoPE to Q and K (the reference's CPU
    golden semantics, utils/verify.cu:56-69 — which its GPU kernels skipped),
    runs the selected kernel batched over heads in one launch (replacing the
    per-head host loop + 2 streams of launchers.h:41-62), and concatenates.

    abi_fast: the fa_int8 zero-copy layout path (run15). The transposed-
    score kernel natively consumes Q and V HEAD-TRANSPOSED ([1, h, d, N]) —
    which is exactly a free reshape of the flat matrices' transposes — so
    instead of the per-head split + per-operand relayout chain, Q/V each
    get ONE whole-matrix transpose, V is quantized directly in that layout
    (quantize_kv_blocks_t — bitwise the same scales/payload), and the
    kernel's transposed output reshapes straight back to [N, d_model] with
    one final relayout. Output is BITWISE identical to the standard route
    (pure layout change). None = auto (on whenever eligible: fa_int8,
    head_dim <= 64, no RoPE, N divisible by the kv quant block); False
    forces the standard route (the run15 A/B baseline).
    """
    if kernel not in KERNELS:
        raise ValueError(f"unknown kernel {kernel!r}; choose from {KERNELS}")
    # An AttentionConfig (the reference's config.h reborn as a runtime
    # object) supplies defaults; explicit keyword arguments win.
    quant_kw = {}
    if config is not None:
        config.validate()
        num_heads = num_heads if num_heads is not None else config.num_heads
        causal = causal if causal is not None else config.causal
        use_rope = use_rope if use_rope is not None else config.use_rope
        rope_theta = rope_theta if rope_theta is not None else config.rope_theta
        sm_scale = sm_scale if sm_scale is not None else config.sm_scale
        if config.head_dim is not None and config.head_dim * num_heads != d_model:
            raise ValueError(
                f"config.head_dim {config.head_dim} * num_heads {num_heads} "
                f"!= d_model {d_model}")
        blocks = config.blocks.validate(q.shape[0], k.shape[0])
        block_q = block_q if block_q is not None else blocks.block_q
        block_kv = block_kv if block_kv is not None else blocks.block_kv
        quant_kw = dict(scale_clamp=config.quant.scale_clamp,
                        p_static_scale=config.quant.p_static_scale)
    if num_heads is None:
        raise ValueError("pass num_heads or a config")
    causal = bool(causal) if causal is not None else False
    use_rope = bool(use_rope) if use_rope is not None else False
    rope_theta = float(rope_theta) if rope_theta is not None else 10000.0
    # One validation surface for the whole ladder — no kernel may silently
    # drop a masking knob the others would raise on.
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
    if attention_sinks and window is None:
        raise ValueError("attention_sinks require a window")
    n = q.shape[0]
    d = d_model // num_heads
    if d * num_heads != d_model:
        raise ValueError("num_heads must divide d_model")

    def split(x):
        return x.reshape(n, num_heads, d).transpose(1, 0, 2)[None]  # [1, h, N, d]

    qh, kh, vh = split(q), split(k), split(v)
    if use_rope:
        qh = apply_rope(qh, rope_theta)
        kh = apply_rope(kh, rope_theta)

    masked_kw = dict(window=window, logit_softcap=logit_softcap,
                     attention_sinks=attention_sinks)
    if kernel == "unfused":
        if window is not None or logit_softcap is not None:
            raise ValueError("unfused kernel has no window/softcap support")
        oh = unfused_mha(qh, kh, vh, sm_scale=sm_scale, causal=causal)
    elif kernel == "fa":
        oh = flash_attention(
            qh, kh, vh, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_kv=block_kv, interpret=interpret,
            **masked_kw,
        )
    elif kernel == "fa_bf16":
        oh = flash_attention(
            qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
            sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_kv=block_kv, interpret=interpret,
            **masked_kw,
        ).astype(qh.dtype)
    elif kernel == "fa_int8":
        eligible = d <= 64 and not use_rope
        if eligible:
            from quantizedmha_tpu.ops.flash_attention_int8 import pick_blocks_t

            _, bkv_eff = pick_blocks_t(n, n, block_q=block_q, block_kv=block_kv)
            eligible = n % bkv_eff == 0
        if abi_fast and not eligible:
            raise ValueError(
                "abi_fast requires head_dim <= 64, use_rope=False, and "
                "seq divisible by the kv quant block")
        # Auto default flipped to the STANDARD route in round 3: under the
        # bf16-P-V kernel the run15 re-run measured abi_fast 6.18 ms vs
        # standard 5.57 ms interleaved (profiles/raw_r3/run15_abi.out) —
        # the whole-matrix-transpose layout lost its edge (outputs remain
        # bitwise identical; abi_fast=True keeps the route for A/Bs).
        if eligible and abi_fast:
            from quantizedmha_tpu.ops.flash_attention_int8 import (
                flash_attention_int8_t_prequant)
            from quantizedmha_tpu.ops.quantize import (
                quantize_kv_blocks, quantize_kv_blocks_t)

            sc = quant_kw.get("scale_clamp", 1e-8)
            qt = q.T.reshape(1, num_heads, d, n)   # one relayout, then free
            vt = v.T.reshape(1, num_heads, d, n)
            k_i8, k_scales = quantize_kv_blocks(kh, bkv_eff, scale_clamp=sc)
            vt_i8, v_scales = quantize_kv_blocks_t(vt, bkv_eff, scale_clamp=sc)
            ot = flash_attention_int8_t_prequant(
                qt, k_i8, k_scales, vt_i8, v_scales,
                sm_scale=sm_scale, causal=causal, block_q=block_q,
                scale_clamp=sc,
                p_static_scale=quant_kw.get("p_static_scale", 127.0),
                q_transposed=True, v_transposed=True, out_transposed=True,
                interpret=interpret, **masked_kw,
            )
            return ot[0].reshape(d_model, n).T  # free merge, one relayout
        oh = flash_attention_int8(
            qh, kh, vh, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_kv=block_kv, interpret=interpret,
            **masked_kw, **quant_kw,
        )
    elif window is not None or logit_softcap is not None:
        from quantizedmha_tpu.reference.mha import mha_masked_reference

        oh = mha_masked_reference(
            qh, kh, vh, sm_scale=sm_scale, causal=causal,
            window=window, softcap=logit_softcap, sinks=attention_sinks)
    else:  # reference
        oh = mha_reference_shaped(qh, kh, vh, sm_scale=sm_scale, causal=causal)

    return oh[0].transpose(1, 0, 2).reshape(n, d_model)


@functools.partial(jax.jit, static_argnums=(3, 4), static_argnames=("kernel",))
def solve_jit(q, k, v, d_model, num_heads, kernel="fa_int8"):
    return solve(q, k, v, d_model, num_heads, kernel=kernel)
