"""Fused INT8 FlashAttention forward — the flagship kernel.

TPU-native re-design of the reference's fastest kernel, fa_tc_int8_b
(reference mha_kernels/fa_tc_int8_b.cu, 7.70 ms on its L4 headline workload),
and of the INT8 algorithm documented in its run6 notes
(profiles/md/run6/int8_notes.md:103-140) / INT-FlashAttention
(arXiv 2409.16997):

  per (q_block, kv_block) tile:
    S_i32    = Qq_i8 @ Kq_i8^T on the MXU's int8 path   (wmma int8, :177-280)
    S_f32    = S_i32 * sQ * sK * sm_scale               (dequant, :150-174)
    online softmax in f32 (m, l in VMEM scratch)
    P' = exp(s - (m - ln 127)) in (0, 127]; then either
      Pq int8 = round(P')            (pv_dtype="int8", the reference's way)
      Pq bf16 = P'.astype(bf16)      (pv_dtype="bf16": deletes the round +
                                      cast VPU sweeps; default at d <= 64
                                      where it measures 1.05-1.12x faster
                                      AND tighter vs the fp32 golden —
                                      run21, profiles/raw_r3/run21_pv.out)
    O        = Pq @ Vq_i8 on the MXU (int32 or f32 accumulation)
    acc_f32 += O * sV       (fp32 accum, :420-423; the 127 cancels vs l')

Deliberate departures from the reference:
  * K/V are quantized ONCE per sequence in an O(S*D) host-side XLA pass
    (ops/quantize.py) and the kernel reads int8 payloads + per-block scales
    — half the K/V HBM traffic, no per-(q_block, kv_block) re-quantization
    VPU work (the reference re-quantized K and V inside every grid cell,
    fa_tc_int8_b.cu:495,517), and the natural format for an INT8 KV cache.
  * Q is quantized once per q block with PER-ROW scales and cached in
    VMEM scratch; the reference re-quantized whole tiles on every kv
    iteration (fa_tc_int8_b.cu:482).
  * Scales are per-(head, block) kernel inputs in SMEM — the reference kept
    them in global DRAM arrays keyed only by kv block, a true data race
    across q blocks (fa_tc_int8_a.cu:414,528-531; SURVEY.md 4.4).
  * No SMEM buffer unions / PAD / swizzles: VMEM has no bank conflicts, and
    the aliasing hazard that cost the reference 0.3-0.4% accuracy
    (profiles/md/run7/notes.md:41-53) does not exist here.
"""

from __future__ import annotations

import functools
from typing import Optional

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedmha_tpu.ops.flash_attention import (
    DEFAULT_MASK_VALUE,
    LANES,
    _auto_interpret,
    _window_start,
    block_should_run,
    pick_blocks,
    validate_masking,
)
from quantizedmha_tpu.ops.quantize import quantize_kv_blocks

_INT8_PRECISION = jax.lax.Precision.DEFAULT  # fp32 contract precision is
# invalid for integer matmuls; pin DEFAULT against a global
# jax_default_matmul_precision=highest.

def _ln(x: float) -> float:

    return math.log(x)

# ln(p_scale) is folded into the online-softmax max subtraction so P comes
# out of exp already scaled to (0, 127] — removing the p*127 multiply over
# every score element and the /p_scale on the accumulator. The rescaled
# l' = p_scale*l cancels in the epilogue division, so no correction is
# needed downstream. (A base-2 variant folding log2(e) into the dequant
# scalar measured neutral-to-slightly-worse on v5e — exp2 lowers through
# the same transcendental path — see profiles/md/run3_softmax_folds.)


def _int8_fwd_kernel(
    offs_ref,  # [batch, 2] int32 SMEM: per-sequence global (q_off, kv_off)
    q_ref,   # [1, 1, block_q, head_dim] f32/bf16
    k_ref,   # [1, 1, block_kv, head_dim] int8
    v_ref,   # [1, 1, block_kv, head_dim] int8
    ks_ref,  # [batch, kv_heads, nkv] f32 in SMEM — K block scales (GQA:
             #  indexed by kvh_idx = h_idx // group)
    vs_ref,  # [batch, kv_heads, nkv] f32 in SMEM — V block scales
    o_ref,   # [1, 1, block_q, head_dim]
    lse_ref,  # [1, 1, block_q, LANES] or None — natural log-sum-exp residual
    m_scratch,    # [block_q, LANES] f32
    l_scratch,    # [block_q, LANES] f32
    acc_scratch,  # [block_q, head_dim] f32
    qi8_scratch,  # [block_q, head_dim] int8 — Q quantized once per q block
    sq_scratch,   # [block_q, LANES] f32 VMEM — per-ROW Q scales (col 0 live)
    *,
    sm_scale: float,
    causal: bool,
    kv_len: int,
    block_q: int,
    block_kv: int,
    scale_clamp: float,
    p_scale: float,
    mask_kv_tail: bool,
    group: int,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: int = 0,
    windowed_grid: Optional[tuple] = None,
    pv_dtype: str = "int8",
):
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)      # q head; kv head = h_idx // group (GQA)
    kvh_idx = h_idx // group
    q_idx = pl.program_id(2)
    j = pl.program_id(3)  # local step along the (possibly shrunk) kv grid
    if windowed_grid is not None:
        # Shrunk kv grid (true O(seq*window)): same recovery formula as the
        # float forward's (ops/flash_attention._fwd_kernel) — the minor
        # grid dim spans sink blocks then only the windowed blocks.
        q_off_s, kv_off_s, nkv_tot, sink_blocks = windowed_grid
        start = _window_start(
            q_idx, q_off_s, kv_off_s, window, block_q, block_kv,
            nkv_tot, pl.num_programs(3) - sink_blocks, min_start=sink_blocks,
        )
        kv_idx = jnp.where(j < sink_blocks, j, start + j - sink_blocks)
    else:
        kv_idx = j
    num_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)
        q = q_ref[0, 0, :, :].astype(jnp.float32)
        # PER-ROW symmetric scales: more accurate than one per-tile scale
        # (the reference quantized whole tiles, fa_tc_int8_b.cu:482) and
        # makes each row's result independent of its tile-mates — verified
        # row logits don't depend on the speculation block size.
        amax = jnp.max(jnp.abs(q), axis=1, keepdims=True)  # [block_q, 1]
        scale = jnp.maximum(amax, scale_clamp) / 127.0
        qi8_scratch[...] = jnp.clip(jnp.round(q / scale), -127.0, 127.0).astype(jnp.int8)
        sq_scratch[...] = jnp.broadcast_to(scale, sq_scratch.shape)

    q_off, kv_off = offs_ref[b_idx, 0], offs_ref[b_idx, 1]
    should_run = block_should_run(
        causal, window, sinks,
        q_off + q_idx * block_q,
        q_off + q_idx * block_q + block_q - 1,
        kv_off + kv_idx * block_kv,
        kv_off + kv_idx * block_kv + block_kv - 1,
    )

    @pl.when(should_run)
    def _run():
        s_i32 = jax.lax.dot_general(
            qi8_scratch[...], k_ref[0, 0, :, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=_INT8_PRECISION,
        )
        s = s_i32.astype(jnp.float32) * (
            sq_scratch[:, :1] * (ks_ref[b_idx, kvh_idx, kv_idx] * sm_scale)
        )
        if softcap is not None:
            # Gemma-2-style cap*tanh(s/cap) on the scaled dequantized logits.
            s = softcap * jnp.tanh(s / softcap)

        # The caller may hand a cache padded BEYOND kv_len even when kv_len
        # is block-aligned; the static gate comes from the wrapper.
        need_kv_edge_mask = mask_kv_tail
        if causal or need_kv_edge_mask:
            qpos = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
                + q_idx * block_q
            )
            kpos = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                + kv_idx * block_kv
            )
            mask = jnp.ones((block_q, block_kv), jnp.bool_)
            if causal:
                mask &= (kpos + kv_off) <= (qpos + q_off)
                if window is not None:
                    in_win = ((qpos + q_off) - (kpos + kv_off)) < window
                    if sinks:
                        in_win |= (kpos + kv_off) < sinks
                    mask &= in_win
            if need_kv_edge_mask:
                mask &= kpos < kv_len
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        # P is in (0, 1] after the max subtraction, so the static scale
        # p_scale=127 quantizes it with no amax reduction (INT-
        # FlashAttention's trick; the reference ran a full per-tile
        # reduction on P each iteration, fa_tc_int8_b.cu:352-360). The
        # scale is applied inside the exponent — P arrives in (0, 127] —
        # and l is tracked rescaled by p_scale, cancelling in the epilogue.
        p = jnp.exp(s - (m_next - _ln(p_scale)))
        if causal or need_kv_edge_mask:
            # Rows masked across the whole block would get p = p_scale per
            # entry (mean-of-V garbage); zero them so l stays 0 and the
            # epilogue emits o = 0, lse = -inf.
            p = jnp.where(m_next > DEFAULT_MASK_VALUE * 0.5, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        if pv_dtype == "bf16":
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                v_ref[0, 0, :, :].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_INT8_PRECISION,
            )
        else:
            # int8 P: the default here — at head_dim >= 128 the PV
            # matmul's bf16-rate surcharge outweighs the two deleted VPU
            # sweeps (the transposed d<=64 orientation defaults to bf16).
            p_i8 = jnp.round(p).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_i8, v_ref[0, 0, :, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=_INT8_PRECISION,
            ).astype(jnp.float32)
        acc_scratch[...] = acc_scratch[...] * alpha + pv * (
            vs_ref[b_idx, kvh_idx, kv_idx]
        )

    @pl.when(j == num_kv - 1)
    def _epilogue():
        # l is p_scale*sum(exp): the p_scale factors in acc and l cancel.
        l = l_scratch[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0, :, :] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        if lse_ref is not None:
            # l carries the p_scale factor: lse = m + log(l') - log(p_scale).
            # Fully masked rows (l == 0) get -inf so they drop out of
            # cross-shard merges (parallel/combine).
            lse = jnp.where(
                l > 0.0,
                m_scratch[:, :1] + jnp.log(l) - _ln(p_scale),
                -jnp.inf,
            )
            lse_ref[0, 0, :, :] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _strip_lse_int8(kernel, offs_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                    o_ref, m_s, l_s, acc_s, qi8_s, sq_s):
    return kernel(offs_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, None,
                  m_s, l_s, acc_s, qi8_s, sq_s)


def flash_attention_int8_prequant(
    q: jnp.ndarray,
    k_i8: jnp.ndarray,
    k_scales: jnp.ndarray,
    v_i8: jnp.ndarray,
    v_scales: jnp.ndarray,
    *,
    kv_len: Optional[int] = None,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    scale_clamp: float = 1e-8,
    p_static_scale: float = 127.0,
    q_offset=None,
    kv_offset=None,
    save_residuals: bool = False,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    interpret: Optional[bool] = None,
    pv_dtype: str = "int8",
):
    """Fused INT8 attention over pre-quantized K/V (the INT8 KV-cache path).

    q: [batch, heads, q_len, head_dim] f32/bf16.
    k_i8, v_i8: [batch, kv_heads, kv_len_padded, head_dim] int8 with
    kv_heads dividing q's heads (GQA-native), kv_len_padded a multiple of
    block_kv; k_scales, v_scales: [batch, kv_heads, nkv] f32 with
    nkv = kv_len_padded // block_kv.
    kv_len: true (unpadded) kv length; defaults to the padded length.
    q_offset/kv_offset: global positions for causal masking (traced scalars
    allowed — chunked prefill passes the chunk's start position). Default
    end-aligned, matching the non-offset behavior.
    """
    validate_masking(causal, window, attention_sinks)
    batch, heads, q_len, head_dim = q.shape
    kv_len_p = k_i8.shape[2]
    kv_len = kv_len if kv_len is not None else kv_len_p
    # GQA: the quantized cache may carry fewer heads than q; each group of
    # consecutive q heads reads one kv head via the BlockSpec index map.
    kv_heads = k_i8.shape[1]
    if heads % kv_heads:
        raise ValueError(f"q heads {heads} not a multiple of kv heads {kv_heads}")
    group = heads // kv_heads
    scale = sm_scale if sm_scale is not None else head_dim**-0.5
    nkv = k_scales.shape[-1]
    block_kv = kv_len_p // nkv if block_kv is None else min(block_kv, kv_len_p)
    block_q, _ = pick_blocks(q_len, kv_len_p, head_dim, block_q=block_q, block_kv=block_kv)
    # Hard errors, not asserts (python -O strips asserts, and a block-size
    # mismatch would dequantize every block with the WRONG scale).
    if kv_len_p % block_kv:
        raise ValueError(f"cache length {kv_len_p} not a multiple of "
                         f"block_kv {block_kv}")
    if nkv != kv_len_p // block_kv:
        raise ValueError(
            f"k_scales has {nkv} blocks but the cache implies "
            f"{kv_len_p // block_kv} at block_kv={block_kv}")
    if causal and q_len > kv_len:
        raise ValueError("causal attention requires q_len <= kv_len")

    q_pad = (-q_len) % block_q
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad), (0, 0))) if q_pad else q
    q_len_p = q_len + q_pad

    if q_offset is None:
        q_offset = kv_len - q_len
    if kv_offset is None:
        kv_offset = 0
    # Per-sequence offsets [batch, 2]; scalars broadcast (the common case).
    q_off_arr = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (batch,))
    kv_off_arr = jnp.broadcast_to(jnp.asarray(kv_offset, jnp.int32), (batch,))
    offsets = jnp.stack([q_off_arr, kv_off_arr], axis=1)

    nkv_tot = kv_len_p // block_kv
    # True O(seq * window) kv grid when the window and offsets are STATIC —
    # the same shrink the float forward does (ops/flash_attention._fwd):
    # skipped blocks are never DMA'd, vs pl.when's compute-only skip.
    static_offsets = isinstance(q_offset, int) and isinstance(kv_offset, int)
    windowed_grid = None
    if window is not None and causal and static_offsets:
        sink_blocks = -(-attention_sinks // block_kv) if attention_sinks else 0
        nkv_win = min(nkv_tot, (block_q + window - 2) // block_kv + 2)
        if sink_blocks + nkv_win < nkv_tot:
            windowed_grid = (int(q_offset), int(kv_offset), nkv_tot,
                             sink_blocks)
            nkv_grid = sink_blocks + nkv_win
        else:
            nkv_grid = nkv_tot
    else:
        nkv_grid = nkv_tot
    grid = (batch, heads, q_len_p // block_q, nkv_grid)

    def _kv_block(b, h, i, j):
        if windowed_grid is None:
            return (b, h // group, j, 0)
        sink_blocks = windowed_grid[3]
        start = _window_start(
            i, windowed_grid[0], windowed_grid[1], window, block_q,
            block_kv, nkv_tot, nkv_grid - sink_blocks, min_start=sink_blocks,
        )
        return (b, h // group, jnp.where(j < sink_blocks, j,
                                         start + j - sink_blocks), 0)

    kernel = functools.partial(
        _int8_fwd_kernel,
        pv_dtype=pv_dtype,
        sm_scale=scale,
        causal=causal,
        kv_len=kv_len,
        block_q=block_q,
        block_kv=block_kv,
        scale_clamp=scale_clamp,
        p_scale=p_static_scale,
        mask_kv_tail=kv_len < kv_len_p,
        group=group,
        window=window,
        softcap=logit_softcap,
        sinks=attention_sinks,
        windowed_grid=windowed_grid,
    )
    if not save_residuals:
        kernel = functools.partial(_strip_lse_int8, kernel)
    out_shapes = [jax.ShapeDtypeStruct((batch, heads, q_len_p, head_dim), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0))
    ]
    if save_residuals:
        out_shapes.append(
            jax.ShapeDtypeStruct((batch, heads, q_len_p, LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, i, j: (b, h, i, 0))
        )
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, head_dim), _kv_block),
            pl.BlockSpec((1, 1, block_kv, head_dim), _kv_block),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.int8),
            pltpu.VMEM((block_q, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_auto_interpret(interpret),
    )(offsets, qp, k_i8, v_i8, k_scales, v_scales)
    o = results[0][:, :, :q_len, :]
    if save_residuals:
        return o, results[1][:, :, :q_len, 0]
    return o


# ---------------------------------------------------------------------------
# Transposed-score variant for small head_dim.
#
# For head_dim < 128 the standard orientation pays an MXU shape tax twice:
# QK^T contracts over d (k-dim padded to 128) and PV produces d output lanes
# (n-dim padded to 128). The contraction tax is inherent to the problem
# shape, but the PV tax is not: computing O^T = V^T @ P^T makes d the
# *streaming* dimension (cheap when small) with a full 128-lane output.
# Measured on v5e at the reference headline shape (d=32): int8 PV goes from
# 77 to 176 TOPS. Softmax becomes column-wise (reduction over sublanes).
# ---------------------------------------------------------------------------


def _int8_fwd_kernel_t(
    offs_ref,  # [batch, 2] int32 SMEM: per-sequence global (q_off, kv_off)
    qt_ref,  # [1, 1, head_dim, block_q] f32/bf16 — Q^T tile
    k_ref,   # [1, 1, block_kv, head_dim] int8
    vt_ref,  # [1, 1, head_dim, block_kv] int8 — V^T tile
    ks_ref,  # [batch, kv_heads, nkv] f32 in SMEM (indexed by h // group)
    vs_ref,  # [batch, kv_heads, nkv] f32 in SMEM
    ot_ref,  # [1, 1, head_dim, block_q]
    lse_ref,  # [1, 1, _SUBS, block_q] or None — natural log-sum-exp residual
    m_scratch,    # [SUBS, block_q] f32 (row 0 live)
    l_scratch,    # [SUBS, block_q] f32 (row 0 live)
    acc_scratch,  # [head_dim, block_q] f32 — O^T accumulator
    qi8_scratch,  # [head_dim, block_q] int8 — Q^T quantized once per q block
    sq_scratch,   # [_SUBS, block_q] f32 VMEM — per-Q-column scales (row 0 live)
    *,
    sm_scale: float,
    causal: bool,
    kv_len: int,
    block_q: int,
    block_kv: int,
    scale_clamp: float,
    p_scale: float,
    mask_kv_tail: bool,
    group: int,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: int = 0,
    windowed_grid: Optional[tuple] = None,
    pv_dtype: str = "bf16",
    summode: str = "vpu",
):
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)      # q head; kv head = h_idx // group (GQA)
    kvh_idx = h_idx // group
    q_idx = pl.program_id(2)
    j = pl.program_id(3)  # local step along the (possibly shrunk) kv grid
    if windowed_grid is not None:
        q_off_s, kv_off_s, nkv_tot, sink_blocks = windowed_grid
        start = _window_start(
            q_idx, q_off_s, kv_off_s, window, block_q, block_kv,
            nkv_tot, pl.num_programs(3) - sink_blocks, min_start=sink_blocks,
        )
        kv_idx = jnp.where(j < sink_blocks, j, start + j - sink_blocks)
    else:
        kv_idx = j
    num_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)
        qt = qt_ref[0, 0, :, :].astype(jnp.float32)
        # Per-Q (column) scales — see the standard kernel's per-row note.
        amax = jnp.max(jnp.abs(qt), axis=0, keepdims=True)  # [1, block_q]
        scale = jnp.maximum(amax, scale_clamp) / 127.0
        qi8_scratch[...] = jnp.clip(jnp.round(qt / scale), -127.0, 127.0).astype(jnp.int8)
        sq_scratch[...] = jnp.broadcast_to(scale, sq_scratch.shape)

    # Global positions (traced per-sequence offsets — ring/CP steps rotate
    # them), matching the standard orientation's contract.
    q_off, kv_off = offs_ref[b_idx, 0], offs_ref[b_idx, 1]
    should_run = block_should_run(
        causal, window, sinks,
        q_off + q_idx * block_q,
        q_off + q_idx * block_q + block_q - 1,
        kv_off + kv_idx * block_kv,
        kv_off + kv_idx * block_kv + block_kv - 1,
    )

    @pl.when(should_run)
    def _run():
        # S^T [block_kv, block_q] = K @ Q^T (contraction over head_dim).
        st_i32 = jax.lax.dot_general(
            k_ref[0, 0, :, :], qi8_scratch[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=_INT8_PRECISION,
        )
        st = st_i32.astype(jnp.float32) * (
            sq_scratch[:1, :] * (ks_ref[b_idx, kvh_idx, kv_idx] * sm_scale)
        )
        if softcap is not None:
            st = softcap * jnp.tanh(st / softcap)

        need_kv_edge_mask = mask_kv_tail
        if causal or need_kv_edge_mask:
            kpos = (
                jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 0)
                + kv_idx * block_kv
            )
            qpos = (
                jax.lax.broadcasted_iota(jnp.int32, (block_kv, block_q), 1)
                + q_idx * block_q
            )
            mask = jnp.ones((block_kv, block_q), jnp.bool_)
            if causal:
                mask &= (kpos + kv_off) <= (qpos + q_off)
                if window is not None:
                    in_win = ((qpos + q_off) - (kpos + kv_off)) < window
                    if sinks:
                        in_win |= (kpos + kv_off) < sinks
                    mask &= in_win
            if need_kv_edge_mask:
                mask &= kpos < kv_len
            st = jnp.where(mask, st, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:1, :]
        l_prev = l_scratch[:1, :]
        m_curr = jnp.max(st, axis=0, keepdims=True)  # [1, block_q]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        # ln(p_scale) folded into the exponent offset: P arrives in
        # (0, 127] and l is tracked rescaled (cancels in the epilogue).
        p = jnp.exp(st - (m_next - _ln(p_scale)))
        if causal or need_kv_edge_mask:
            # Columns (= q rows) masked across the whole block: see the
            # standard kernel's note.
            p = jnp.where(m_next > DEFAULT_MASK_VALUE * 0.5, p, 0.0)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)

        # O^T [head_dim, block_q] += V^T @ P^T: full-lane output, head_dim
        # is only the cheap streaming dimension.
        if pv_dtype == "bf16":
            # run21: drop the round + int8-cast VPU sweeps entirely — P
            # goes to the MXU as bf16. p in (0, p_scale] and int8 V fit
            # bf16's 8-bit mantissa, so accuracy is AT LEAST the int8
            # path's (measured max_abs 3.9e-4 vs 4.8e-4 against the fp32
            # golden) while the two deleted VPU sweeps dominate the PV
            # matmul's bf16-rate surcharge at head_dim <= 64 (1.12x at
            # the reference headline shape, profiles/raw_r3/run21_pv.out;
            # run9 row 7's "accuracy collapse" was a tiny-|ref|
            # denominator artifact in its baseline-relative check).
            p_bf = p.astype(jnp.bfloat16)
            if summode == "mxu":
                # run25: l rides the PV matmul as a ones-row appended to
                # V^T — at head_dim <= 64 the MXU output tile has idle
                # sublanes, so the extra row is free and the whole VPU
                # sum(p) reduction pass is deleted. l then sums the SAME
                # bf16 P the numerator uses (denominator-consistent).
                # run3 rejected an int8 ones-row on accuracy (the ~vs/2
                # rounding of round(1/vs) lands on l); a bf16 ones-row is
                # exact. run9's 'mxusum' loser was a SEPARATE ones @ P
                # matmul paying its own MXU pass, not a fused row.
                hd = acc_scratch.shape[0]
                vt_aug = jnp.concatenate(
                    [vt_ref[0, 0, :, :].astype(jnp.bfloat16),
                     jnp.ones((1, block_kv), jnp.bfloat16)], axis=0)
                pv_aug = jax.lax.dot_general(
                    vt_aug, p_bf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_INT8_PRECISION,
                )
                pv = pv_aug[:hd, :]
                l_next = alpha * l_prev + pv_aug[hd:hd + 1, :]
            else:
                l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
                pv = jax.lax.dot_general(
                    vt_ref[0, 0, :, :].astype(jnp.bfloat16),
                    p_bf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_INT8_PRECISION,
                )
        else:
            l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
            p_i8 = jnp.round(p).astype(jnp.int8)
            pv = jax.lax.dot_general(
                vt_ref[0, 0, :, :], p_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=_INT8_PRECISION,
            ).astype(jnp.float32)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
        acc_scratch[...] = acc_scratch[...] * alpha + pv * (
            vs_ref[b_idx, kvh_idx, kv_idx]
        )

    @pl.when(j == num_kv - 1)
    def _epilogue():
        # l is p_scale*sum(exp): the p_scale factors in acc and l cancel.
        l = l_scratch[:1, :]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        ot_ref[0, 0, :, :] = (acc_scratch[...] * l_inv).astype(ot_ref.dtype)
        if lse_ref is not None:
            # l carries the p_scale factor: lse = m + log(l') - log(p_scale);
            # fully masked columns get -inf (drop out of cross-shard merges).
            lse = jnp.where(
                l > 0.0,
                m_scratch[:1, :] + jnp.log(l) - _ln(p_scale),
                -jnp.inf,
            )
            lse_ref[0, 0, :, :] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _strip_lse_int8_t(kernel, offs_ref, qt_ref, k_ref, vt_ref, ks_ref,
                      vs_ref, ot_ref, m_s, l_s, acc_s, qi8_s, sq_s):
    return kernel(offs_ref, qt_ref, k_ref, vt_ref, ks_ref, vs_ref, ot_ref,
                  None, m_s, l_s, acc_s, qi8_s, sq_s)


_SUBS = 8  # min f32 sublane tile for the [1, block_q] m/l statistics


def pick_blocks_t(
    q_len: int,
    kv_len: int,
    head_dim: int = 64,
    *,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
):
    """Tile sizes for the transposed kernel (scores are [block_kv, block_q]):
    a wide q block feeds the full-lane O^T matmul; tuned on v5e at the
    reference headline shape (bq=4096, bkv=512 -> 5.6 ms vs 7.7 ms L4)."""
    if block_kv is None:
        block_kv = 512
    if block_q is None:
        # head_dim > 64 doubles every d-proportional VMEM term (Q^T/O^T
        # tiles, acc, qi8); bq=4096 compiles at short sequences but blows
        # the 16 MiB scoped-VMEM stack at 16K+ (run27b chip compile
        # matrix; re-confirmed round 5, profiles/raw_r5/run47: 16K FAILs,
        # 4K compiles and runs 0.534 vs 0.555 ms). Shape-aware cap: take
        # the wide-q win where it compiles, fall back to 2048 beyond.
        if head_dim > 64:
            block_q = 4096 if kv_len <= 4096 else 2048
        else:
            block_q = 4096
        while block_q * block_kv * 6 > 13 * 1024 * 1024 and block_q > 512:
            block_q //= 2
    return min(block_q, q_len), min(block_kv, kv_len)


def flash_attention_int8_t_prequant(
    q: jnp.ndarray,
    k_i8: jnp.ndarray,
    k_scales: jnp.ndarray,
    v_i8: jnp.ndarray,
    v_scales: jnp.ndarray,
    *,
    kv_len: Optional[int] = None,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    block_q: Optional[int] = None,
    scale_clamp: float = 1e-8,
    p_static_scale: float = 127.0,
    q_offset=None,
    kv_offset=None,
    save_residuals: bool = False,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    interpret: Optional[bool] = None,
    pv_dtype: str = "bf16",
    summode: Optional[str] = None,
    q_transposed: bool = False,
    v_transposed: bool = False,
    out_transposed: bool = False,
):
    """Transposed-score INT8 attention over PRE-quantized K/V — the fast
    (head_dim <= 64) orientation with the full composition contract of the
    standard one: traced per-sequence q/kv offsets and an lse residual, so
    ring/context-parallel steps (parallel/ring.py) run this orientation
    instead of falling back (VERDICT round-1 weak #4).

    Same argument convention as flash_attention_int8_prequant; block_kv is
    implied by the quantization blocks (k_scales' last dim).

    q_transposed / v_transposed: q (resp. v_i8) is ALREADY in the kernel's
    native head-transposed layout — [B, H, head_dim, Sq] / [B, Hkv,
    head_dim, Skv] — so no relayout is issued here. out_transposed: return
    o in that same layout ([B, H, head_dim, Sq]) instead of transposing
    back. Callers that hold flat reference-ABI matrices (api.solve) use
    these to feed the kernel with ONE whole-matrix transpose per operand
    instead of a per-head split + per-operand relayout chain (run15).
    """
    validate_masking(causal, window, attention_sinks)
    if summode is None:
        # run25 default: with bf16 P the l ones-row is free MXU work and
        # measured 1.28-1.34x (profiles/raw_r3/run21b_pv_ab.out); the int8
        # P path keeps the VPU sum (an int8 ones-row is lossy — run3).
        summode = "mxu" if pv_dtype == "bf16" else "vpu"
    if summode not in ("vpu", "mxu"):
        raise ValueError(f"summode must be 'vpu' or 'mxu', got {summode!r}")
    if summode == "mxu" and pv_dtype != "bf16":
        raise ValueError(
            "summode='mxu' requires pv_dtype='bf16' (an int8 ones-row "
            "would put round(1/vs) quantization error on l — run3)")
    if q_transposed:
        batch, heads, head_dim, q_len = q.shape
    else:
        batch, heads, q_len, head_dim = q.shape
    kv_len_p = k_i8.shape[2]
    kv_len = kv_len if kv_len is not None else kv_len_p
    kv_heads = k_i8.shape[1]
    if heads % kv_heads:
        raise ValueError(f"q heads {heads} not a multiple of kv heads {kv_heads}")
    group = heads // kv_heads
    scale = sm_scale if sm_scale is not None else head_dim**-0.5
    nkv = k_scales.shape[-1]
    if kv_len_p % nkv:
        raise ValueError(
            f"cache length {kv_len_p} not divisible into {nkv} scale blocks")
    block_kv_eff = kv_len_p // nkv
    block_q_eff, _ = pick_blocks_t(
        q_len, kv_len_p, head_dim, block_q=block_q, block_kv=block_kv_eff)
    if causal and q_offset is None and q_len > kv_len:
        raise ValueError("causal attention requires q_len <= kv_len")

    q_pad = (-q_len) % block_q_eff
    if q_pad:
        seq_dim = 3 if q_transposed else 2
        widths = [(0, 0)] * 4
        widths[seq_dim] = (0, q_pad)
        qp = jnp.pad(q, widths)
    else:
        qp = q
    q_len_p = q_len + q_pad

    if q_offset is None:
        q_offset = kv_len - q_len
    if kv_offset is None:
        kv_offset = 0
    q_off_arr = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (batch,))
    kv_off_arr = jnp.broadcast_to(jnp.asarray(kv_offset, jnp.int32), (batch,))
    offsets = jnp.stack([q_off_arr, kv_off_arr], axis=1)

    qt = qp if q_transposed else qp.transpose(0, 1, 3, 2)      # [B, H, D, Sq]
    vt_i8 = v_i8 if v_transposed else v_i8.transpose(0, 1, 3, 2)  # [B, Hkv, D, Skv]

    nkv_tot = kv_len_p // block_kv_eff
    static_offsets = isinstance(q_offset, int) and isinstance(kv_offset, int)
    windowed_grid = None
    if window is not None and causal and static_offsets:
        sink_blocks = (
            -(-attention_sinks // block_kv_eff) if attention_sinks else 0)
        nkv_win = min(
            nkv_tot, (block_q_eff + window - 2) // block_kv_eff + 2)
        if sink_blocks + nkv_win < nkv_tot:
            windowed_grid = (int(q_offset), int(kv_offset), nkv_tot,
                             sink_blocks)
            nkv_grid = sink_blocks + nkv_win
        else:
            nkv_grid = nkv_tot
    else:
        nkv_grid = nkv_tot

    def _mapped_kv(i, j):
        if windowed_grid is None:
            return j
        sink_blocks = windowed_grid[3]
        start = _window_start(
            i, windowed_grid[0], windowed_grid[1], window, block_q_eff,
            block_kv_eff, nkv_tot, nkv_grid - sink_blocks,
            min_start=sink_blocks,
        )
        return jnp.where(j < sink_blocks, j, start + j - sink_blocks)

    grid = (batch, heads, q_len_p // block_q_eff, nkv_grid)
    kernel = functools.partial(
        _int8_fwd_kernel_t,
        pv_dtype=pv_dtype,
        summode=summode,
        sm_scale=scale,
        causal=causal,
        kv_len=kv_len,
        block_q=block_q_eff,
        block_kv=block_kv_eff,
        scale_clamp=scale_clamp,
        p_scale=p_static_scale,
        mask_kv_tail=kv_len < kv_len_p,
        group=group,
        window=window,
        softcap=logit_softcap,
        sinks=attention_sinks,
        windowed_grid=windowed_grid,
    )
    if not save_residuals:
        kernel = functools.partial(_strip_lse_int8_t, kernel)
    out_shapes = [
        jax.ShapeDtypeStruct((batch, heads, head_dim, q_len_p), q.dtype)
    ]
    out_specs = [
        pl.BlockSpec((1, 1, head_dim, block_q_eff), lambda b, h, i, j: (b, h, 0, i))
    ]
    if save_residuals:
        out_shapes.append(
            jax.ShapeDtypeStruct((batch, heads, _SUBS, q_len_p), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, 1, _SUBS, block_q_eff), lambda b, h, i, j: (b, h, 0, i))
        )
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, head_dim, block_q_eff), lambda b, h, i, j: (b, h, 0, i)),
            pl.BlockSpec((1, 1, block_kv_eff, head_dim),
                         lambda b, h, i, j: (b, h // group, _mapped_kv(i, j), 0)),
            pl.BlockSpec((1, 1, head_dim, block_kv_eff),
                         lambda b, h, i, j: (b, h // group, 0, _mapped_kv(i, j))),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((_SUBS, block_q_eff), jnp.float32),
            pltpu.VMEM((_SUBS, block_q_eff), jnp.float32),
            pltpu.VMEM((head_dim, block_q_eff), jnp.float32),
            pltpu.VMEM((head_dim, block_q_eff), jnp.int8),
            pltpu.VMEM((_SUBS, block_q_eff), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_auto_interpret(interpret),
    )(offsets, qt, k_i8, vt_i8, k_scales, v_scales)
    if out_transposed:
        o = results[0][:, :, :, :q_len]
    else:
        o = results[0].transpose(0, 1, 3, 2)[:, :, :q_len, :]
    if save_residuals:
        return o, results[1][:, :, 0, :q_len]
    return o


def flash_attention_int8_t(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    scale_clamp: float = 1e-8,
    p_static_scale: float = 127.0,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    interpret: Optional[bool] = None,
    pv_dtype: str = "bf16",
    summode: Optional[str] = None,
) -> jnp.ndarray:
    """Transposed-score fused INT8 attention (optimal for head_dim <= 64):
    quantize K/V per block, then run the prequant entry point. P rides the
    PV matmul as bf16 by default (run21: faster AND tighter than int8 P at
    d <= 64); pv_dtype="int8" restores the all-int8 pipeline."""
    if q.ndim != 4:
        raise ValueError(f"expected [batch, heads, seq, head_dim], got {q.shape}")
    validate_masking(causal, window, attention_sinks)
    q_len = q.shape[2]
    kv_len = k.shape[2]
    if causal and q_len > kv_len:
        raise ValueError("causal attention requires q_len <= kv_len")
    block_q_eff, block_kv_eff = pick_blocks_t(
        q_len, kv_len, q.shape[-1], block_q=block_q, block_kv=block_kv
    )
    kv_pad = (-kv_len) % block_kv_eff
    if kv_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad), (0, 0)))
    k_i8, k_scales = quantize_kv_blocks(k, block_kv_eff, scale_clamp=scale_clamp)
    v_i8, v_scales = quantize_kv_blocks(v, block_kv_eff, scale_clamp=scale_clamp)
    return flash_attention_int8_t_prequant(
        q, k_i8, k_scales, v_i8, v_scales,
        kv_len=kv_len, sm_scale=sm_scale, causal=causal,
        block_q=block_q_eff, scale_clamp=scale_clamp,
        p_static_scale=p_static_scale,
        window=window, logit_softcap=logit_softcap,
        attention_sinks=attention_sinks,
        interpret=interpret, pv_dtype=pv_dtype, summode=summode,
    )


def flash_attention_int8(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    scale_clamp: float = 1e-8,
    p_static_scale: float = 127.0,
    transposed: Optional[bool] = None,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    interpret: Optional[bool] = None,
    pv_dtype: Optional[str] = None,
    summode: Optional[str] = None,
) -> jnp.ndarray:
    """Fused INT8-quantized FlashAttention forward on TPU.

    q, k, v: [batch, heads, seq, head_dim] float32/bfloat16 in; same dtype
    out (matching the reference's FP32-in/FP32-out ABI with internal INT8,
    reference mha_kernels/fa_tc_int8_b.cu). K/V are block-quantized in a
    fused O(S*D) prepass; both attention matmuls run on the MXU's
    int8 x int8 -> int32 path. GQA: k/v may carry fewer heads than q
    (kv_heads divides heads) — shared across each query group in-kernel.
    """
    if q.ndim != 4:
        raise ValueError(f"expected [batch, heads, seq, head_dim], got {q.shape}")
    validate_masking(causal, window, attention_sinks)
    q_len = q.shape[2]
    kv_len = k.shape[2]
    head_dim = q.shape[-1]
    if transposed is None:
        # d <= 64: the PV-orientation win (this file's header), causal or
        # not. d = 128 NON-CAUSAL: the QK contraction is MXU-full either
        # way, but the transposed orientation still deletes the sublane-
        # sum VPU pass via the fused ones-row (run25) — measured 0.565 vs
        # 0.614 ms at n4k_d128 with better accuracy (run27, raw:
        # profiles/raw_r3/run27_d128_orient.out). d = 128 CAUSAL/WINDOWED:
        # the standard orientation wins instead (0.473 vs 0.488 causal,
        # 7.92 vs 8.56 windowed-32K — run27c) — the transposed mask/skip
        # structure costs more than the fused row saves there. Above
        # d=128 the ones-row stops riding a single output tile: standard.
        transposed = head_dim <= 64 or (head_dim <= 128 and not causal)
    if transposed:
        return flash_attention_int8_t(
            q, k, v, sm_scale=sm_scale, causal=causal,
            block_q=block_q, block_kv=block_kv,
            scale_clamp=scale_clamp, p_static_scale=p_static_scale,
            window=window, logit_softcap=logit_softcap,
            attention_sinks=attention_sinks,
            interpret=interpret,
            pv_dtype=pv_dtype if pv_dtype is not None else "bf16",
            summode=summode,
        )
    if summode not in (None, "vpu"):
        raise ValueError(
            "summode='mxu' is a transposed-orientation feature: the "
            "standard orientation's PV output lanes are full, so a fused "
            "ones-row is not free there")
    _, block_kv_eff = pick_blocks(q_len, kv_len, q.shape[-1], block_q=block_q, block_kv=block_kv)
    kv_pad = (-kv_len) % block_kv_eff
    if kv_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad), (0, 0)))
    k_i8, k_scales = quantize_kv_blocks(k, block_kv_eff, scale_clamp=scale_clamp)
    v_i8, v_scales = quantize_kv_blocks(v, block_kv_eff, scale_clamp=scale_clamp)
    return flash_attention_int8_prequant(
        q, k_i8, k_scales, v_i8, v_scales,
        kv_len=kv_len, sm_scale=sm_scale, causal=causal,
        block_q=block_q, block_kv=block_kv_eff,
        scale_clamp=scale_clamp, p_static_scale=p_static_scale,
        window=window, logit_softcap=logit_softcap,
        attention_sinks=attention_sinks,
        interpret=interpret,
        pv_dtype=pv_dtype if pv_dtype is not None else "int8",
    )
