"""Paged multi-token (q_len > 1) attention over the INT8 paged KV cache.

VERDICT round-1 item #3: chunked prefill and speculative verification were
gathering the WHOLE block table per layer per call
(serving/llama_adapter.py) — an O(max_context) HBM gather + re-layout that
dominates at 32K serving. This kernel attends straight from the pages:
the repo's own decode design (ops/decode.py:45-138) generalized with a
q-block grid dimension, serving the role the reference's in-kernel KV
streaming loop plays per kernel (reference mha_kernels/fa.cu:283-359).

Design:
  - grid (batch, kv_head, q_block, page): per step one physical page's K/V
    is mapped through the scalar-prefetched block table
    (PrefetchScalarGridSpec, same as decode).
  - all q heads of a GQA group ride in the q block: q arrives as
    [group, block_q, head_dim] and flattens to a single
    [group*block_q, head_dim] MXU operand (positions depend only on the
    row index mod block_q, so masks broadcast across the group).
  - causal bound: pages past a q block's last visible position are
    (a) compute-skipped with pl.when and (b) DMA-elided by CLAMPING the
    page index map to the last needed page — Pallas skips the copy when a
    step's block index equals the previous step's, so cost is proportional
    to the true prefix length, not the table size.
  - per-sequence global offsets (q_starts) support chunked prefill
    (chunk_start) and batched speculative verify (positions0) directly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedmha_tpu.ops.decode import _read_scale
from quantizedmha_tpu.ops.flash_attention import (
    DEFAULT_MASK_VALUE,
    LANES,
    _auto_interpret,
    validate_masking,
)

_INT8_PRECISION = jax.lax.Precision.DEFAULT


def _out_block(group, block_q, head_dim):
    return pl.BlockSpec(
        (1, 1, group, block_q, head_dim),
        lambda b, h, qb, i, L, S, T: (b, h, 0, qb, 0),
    )


def _lse_block(group, block_q):
    return pl.BlockSpec(
        (1, 1, group, block_q, LANES),
        lambda b, h, qb, i, L, S, T: (b, h, 0, qb, 0),
    )


def _prefill_kernel(
    # scalar prefetch
    lengths_ref,   # [batch] i32 — total visible context length
    qstarts_ref,   # [batch] i32 — global position of q row 0
    tables_ref,    # [batch, max_pages] i32
    # inputs
    q_ref,         # [1, 1, group, block_q, head_dim]
    k_page_ref,    # [1, 1, page_size, head_dim] int8
    v_page_ref,    # [1, 1, page_size, head_dim] int8
    ks_ref,        # [1, num_pages, 1] f32 VMEM — this kv head's column
    vs_ref,        # [1, num_pages, 1] f32 VMEM (decode._scales_cols)
    # outputs: o_ref [1, 1, group, block_q, head_dim] (+ lse_ref
    # [1, 1, group, block_q, LANES] when save_residuals), then scratch
    # m/l [group*block_q, LANES], acc [group*block_q, head_dim]
    *refs,
    sm_scale: float,
    page_size: int,
    block_q: int,
    group: int,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: int = 0,
    save_residuals: bool = False,
):
    if save_residuals:
        o_ref, lse_ref, m_scratch, l_scratch, acc_scratch = refs
    else:
        o_ref, m_scratch, l_scratch, acc_scratch = refs
        lse_ref = None
    b = pl.program_id(0)
    h = pl.program_id(1)
    qb = pl.program_id(2)
    i = pl.program_id(3)
    num_pages_grid = pl.num_programs(3)
    length = lengths_ref[b]
    q_start = qstarts_ref[b] + qb * block_q  # global pos of this block's row 0

    @pl.when(i == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Pages visible to this q block: page start must be <= the block's last
    # row position (causal) and within the sequence; behind-the-window pages
    # are skipped unless they hold sink positions.
    last_q_pos = q_start + block_q - 1
    in_ctx = (i * page_size <= last_q_pos) & (i * page_size < length)
    if window is not None:
        in_win = (i + 1) * page_size > q_start - window + 1
        if sinks:
            in_win |= i * page_size < sinks
        in_ctx &= in_win

    @pl.when(in_ctx)
    def _run():
        page = tables_ref[b, i]
        gbq = group * block_q
        q = q_ref[0, 0].reshape(gbq, q_ref.shape[-1]).astype(jnp.float32)
        q = q * sm_scale
        k = k_page_ref[0, 0, :, :]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_INT8_PRECISION,
        ) * _read_scale(ks_ref, page, h)
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)

        # Row r of the flattened [group*block_q] q has global position
        # q_start + (r % block_q); kv column c has position i*page_size + c.
        rows = jax.lax.broadcasted_iota(jnp.int32, (gbq, page_size), 0)
        qpos = q_start + jax.lax.rem(rows, block_q)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (gbq, page_size), 1) + i * page_size
        valid = (kpos <= qpos) & (kpos < length)
        if window is not None:
            in_win = kpos > qpos - window
            if sinks:
                in_win |= kpos < sinks
            valid &= in_win
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        # Rows whose every position is masked in this page (but whose block
        # ran for other rows): zero them so l stays 0 -> o = 0.
        p = jnp.where(m_next > DEFAULT_MASK_VALUE * 0.5, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        v = v_page_ref[0, 0, :, :]
        pv = jax.lax.dot_general(
            p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_INT8_PRECISION,
        ) * _read_scale(vs_ref, page, h)
        acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(i == num_pages_grid - 1)
    def _epilogue():
        l = l_scratch[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out = acc_scratch[...] * l_inv
        o_ref[0, 0] = out.reshape(o_ref.shape[2:]).astype(o_ref.dtype)
        if save_residuals:
            # lse in parallel/combine's merge convention (m + log l over
            # the scaled logits); a row with no visible positions is
            # exactly -inf so it drops out of merge_two_partials.
            m = m_scratch[:, :1]
            lse = jnp.where(l == 0.0, -jnp.inf,
                            m + jnp.log(jnp.maximum(l, 1e-38)))
            lse_ref[0, 0] = jnp.broadcast_to(
                lse, (lse.shape[0], lse_ref.shape[-1])
            ).reshape(lse_ref.shape[2:])


def paged_prefill_attention(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    k_scales: jnp.ndarray,
    v_scales: jnp.ndarray,
    lengths: jnp.ndarray,
    q_starts: jnp.ndarray,
    block_tables: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    block_q: int = 256,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    save_residuals: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-token causal attention straight from the paged INT8 cache.

    save_residuals=True additionally returns lse [batch, num_q_heads,
    q_len] f32 — the partial-attention form merge_two_partials consumes
    (mixed-precision chunked prefill).

    q:            [batch, num_q_heads, q_len, head_dim] — a prefill chunk's
                  or a speculative verify window's queries (post-RoPE)
    k/v_pages:    [num_kv_heads, num_pages, page_size, head_dim] int8
    k/v_scales:   [num_kv_heads, num_pages] f32
    lengths:      [batch] i32 — TOTAL visible context (prefix + this chunk)
    q_starts:     [batch] i32 — global position of each sequence's q row 0
    block_tables: [batch, max_pages] i32
    Returns [batch, num_q_heads, q_len, head_dim]. HBM traffic per
    (batch, kv_head) is O(lengths[b]) pages, NOT O(max_pages): pages past
    the causal bound are DMA-elided via a clamped index map — and with a
    sliding window, pages wholly behind it elide too (O(window + sinks)
    per q block, mirroring the decode kernel's clamp).
    """
    validate_masking(True, window, attention_sinks)
    batch, num_q_heads, q_len, head_dim = q.shape
    num_kv_heads, num_pages, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    group = num_q_heads // num_kv_heads
    if group * num_kv_heads != num_q_heads:
        raise ValueError(
            f"q heads {num_q_heads} not a multiple of kv heads {num_kv_heads}")
    scale = sm_scale if sm_scale is not None else head_dim**-0.5

    block_q = min(block_q, max(q_len, 16))
    q_pad = (-q_len) % block_q
    qg = q.reshape(batch, num_kv_heads, group, q_len, head_dim)
    if q_pad:
        qg = jnp.pad(qg, ((0, 0),) * 3 + ((0, q_pad), (0, 0)))
    q_len_p = q_len + q_pad

    kernel = functools.partial(
        _prefill_kernel,
        sm_scale=scale,
        page_size=page_size,
        block_q=block_q,
        group=group,
        window=window,
        softcap=logit_softcap,
        sinks=attention_sinks,
        save_residuals=save_residuals,
    )

    def _page_idx(b, h, qb, i, L, S, T):
        # Clamp to the page range this q block can see: trailing steps
        # re-reference the last visible page, behind-the-window steps the
        # first visible one (sink pages pass through) — Pallas elides the
        # repeated copies, mirroring decode's _make_clamped_page_idx, so
        # windowed chunked prefill pays O(window + sinks) traffic, not
        # O(prefix).
        last_pos = jnp.minimum(
            S[b] + (qb + 1) * block_q - 1, jnp.maximum(L[b] - 1, 0))
        last_page = jnp.maximum(last_pos, 0) // page_size
        ic = jnp.minimum(i, last_page)
        if window is not None:
            first_vis = jnp.maximum(S[b] + qb * block_q - window + 1, 0)
            lo = jnp.minimum(first_vis // page_size, last_page)
            clamped = jnp.clip(i, lo, last_page)
            if attention_sinks:
                sink_pages = -(-attention_sinks // page_size)
                ic = jnp.where(i < sink_pages, ic, clamped)
            else:
                ic = clamped
        return (h, T[b, ic], 0, 0)

    from quantizedmha_tpu.ops.decode import _scales_cols

    # per-head VMEM scale columns (SMEM words cost ~32 B each — whole-
    # pool tables blow the 1 MiB SMEM budget; see decode._scales_cols).
    _scol_spec = pl.BlockSpec(
        (1, num_pages, 1), lambda b, h, qb, i, L, S, T: (h, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, num_kv_heads, q_len_p // block_q, max_pages),
        in_specs=[
            pl.BlockSpec((1, 1, group, block_q, head_dim),
                         lambda b, h, qb, i, L, S, T: (b, h, 0, qb, 0)),
            pl.BlockSpec((1, 1, page_size, head_dim), _page_idx),
            pl.BlockSpec((1, 1, page_size, head_dim), _page_idx),
            _scol_spec,
            _scol_spec,
        ],
        out_specs=(
            (_out_block(group, block_q, head_dim),
             _lse_block(group, block_q)) if save_residuals
            else _out_block(group, block_q, head_dim)
        ),
        scratch_shapes=[
            pltpu.VMEM((group * block_q, LANES), jnp.float32),
            pltpu.VMEM((group * block_q, LANES), jnp.float32),
            pltpu.VMEM((group * block_q, head_dim), jnp.float32),
        ],
    )
    o_shape = jax.ShapeDtypeStruct(
        (batch, num_kv_heads, group, q_len_p, head_dim), q.dtype)
    lse_shape = jax.ShapeDtypeStruct(
        (batch, num_kv_heads, group, q_len_p, LANES), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(o_shape, lse_shape) if save_residuals else o_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_auto_interpret(interpret),
    )(lengths.astype(jnp.int32), q_starts.astype(jnp.int32),
      block_tables.astype(jnp.int32), qg, k_pages, v_pages,
      _scales_cols(k_scales), _scales_cols(v_scales))
    if save_residuals:
        o, lse = out
        return (
            o[:, :, :, :q_len, :].reshape(batch, num_q_heads, q_len, head_dim),
            lse[:, :, :, :q_len, 0].reshape(batch, num_q_heads, q_len),
        )
    out = out[:, :, :, :q_len, :]
    return out.reshape(batch, num_q_heads, q_len, head_dim)


def _prefill_kernel_int4(
    # scalar prefetch
    lengths_ref,   # [batch] i32
    qstarts_ref,   # [batch] i32
    tables_ref,    # [batch, max_pages] i32
    # inputs
    q_ref,         # [1, 1, group, block_q, head_dim]
    k_page_ref,    # [1, 1, page_size, head_dim//2] int8 (nibble-packed)
    v_page_ref,    # [1, 1, page_size, head_dim//2] int8 (nibble-packed)
    ks_ref,        # [1, num_pages * subs, 1] f32 VMEM — this head's
    vs_ref,        # [1, num_pages * subs, 1] f32 VMEM
    # outputs: o_ref [1, 1, group, block_q, head_dim] (+ lse_ref
    # [1, 1, group, block_q, LANES] when save_residuals), then scratch
    # m/l [group*block_q, LANES], acc_lo/acc_hi [group*block_q, head_dim//2]
    *refs,
    sm_scale: float,
    page_size: int,
    block_q: int,
    group: int,
    half_dim: int,
    subs: int = 1,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: int = 0,
    save_residuals: bool = False,
):
    """INT4-KV multi-token kernel: _prefill_kernel over nibble-packed
    pages (ops.quantize's deinterleaved layout — unpack into two
    contiguous half-head_dim tiles, dot per half; per-sub-tile scales
    applied per score/probability column, exactly as the int4 decode
    kernel does). Completes the int4 path's q_len > 1 surface — the
    missing piece for chunked prefill over a mixed-precision cache."""
    from quantizedmha_tpu.ops.quantize import unpack_int4_halves

    if save_residuals:
        o_ref, lse_ref, m_scratch, l_scratch, acc_lo, acc_hi = refs
    else:
        o_ref, m_scratch, l_scratch, acc_lo, acc_hi = refs
        lse_ref = None
    b = pl.program_id(0)
    h = pl.program_id(1)
    qb = pl.program_id(2)
    i = pl.program_id(3)
    num_pages_grid = pl.num_programs(3)
    length = lengths_ref[b]
    q_start = qstarts_ref[b] + qb * block_q

    @pl.when(i == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_lo[...] = jnp.zeros_like(acc_lo)
        acc_hi[...] = jnp.zeros_like(acc_hi)

    last_q_pos = q_start + block_q - 1
    in_ctx = (i * page_size <= last_q_pos) & (i * page_size < length)
    if window is not None:
        in_win = (i + 1) * page_size > q_start - window + 1
        if sinks:
            in_win |= i * page_size < sinks
        in_ctx &= in_win

    def _scale_cols(scales_ref, page):
        if subs == 1:
            return _read_scale(scales_ref, page, h)
        sub_w = page_size // subs
        return jnp.concatenate(
            [jnp.full((1, sub_w),
                      _read_scale(scales_ref, page * subs + j, h),
                      jnp.float32)
             for j in range(subs)], axis=1)

    @pl.when(in_ctx)
    def _run():
        page = tables_ref[b, i]
        gbq = group * block_q
        q = q_ref[0, 0].reshape(gbq, q_ref.shape[-1]).astype(jnp.float32)
        q = q * sm_scale
        q_lo, q_hi = q[:, :half_dim], q[:, half_dim:]
        k_lo, k_hi = unpack_int4_halves(k_page_ref[0, 0, :, :])
        s = (
            jax.lax.dot_general(
                q_lo, k_lo.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_INT8_PRECISION)
            + jax.lax.dot_general(
                q_hi, k_hi.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_INT8_PRECISION)
        ) * _scale_cols(ks_ref, page)
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)

        rows = jax.lax.broadcasted_iota(jnp.int32, (gbq, page_size), 0)
        qpos = q_start + jax.lax.rem(rows, block_q)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (gbq, page_size), 1) + i * page_size
        valid = (kpos <= qpos) & (kpos < length)
        if window is not None:
            in_win = kpos > qpos - window
            if sinks:
                in_win |= kpos < sinks
            valid &= in_win
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        p = jnp.where(m_next > DEFAULT_MASK_VALUE * 0.5, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        v_lo, v_hi = unpack_int4_halves(v_page_ref[0, 0, :, :])
        p_s = p * _scale_cols(vs_ref, page)
        acc_lo[...] = acc_lo[...] * alpha + jax.lax.dot_general(
            p_s, v_lo.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_INT8_PRECISION)
        acc_hi[...] = acc_hi[...] * alpha + jax.lax.dot_general(
            p_s, v_hi.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_INT8_PRECISION)

    @pl.when(i == num_pages_grid - 1)
    def _epilogue():
        l = l_scratch[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out = jnp.concatenate(
            [acc_lo[...] * l_inv, acc_hi[...] * l_inv], axis=-1)
        o_ref[0, 0] = out.reshape(o_ref.shape[2:]).astype(o_ref.dtype)
        if save_residuals:
            m = m_scratch[:, :1]
            lse = jnp.where(l == 0.0, -jnp.inf,
                            m + jnp.log(jnp.maximum(l, 1e-38)))
            lse_ref[0, 0] = jnp.broadcast_to(
                lse, (lse.shape[0], lse_ref.shape[-1])
            ).reshape(lse_ref.shape[2:])


def paged_prefill_attention_int4(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    k_scales: jnp.ndarray,
    v_scales: jnp.ndarray,
    lengths: jnp.ndarray,
    q_starts: jnp.ndarray,
    block_tables: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    block_q: int = 256,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    save_residuals: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """paged_prefill_attention over an INT4 (nibble-packed) cache.

    k/v_pages: [num_kv_heads, num_pages, page_size, head_dim // 2] int8 in
    quantize_kv_blocks_int4's deinterleaved layout; k/v_scales:
    [num_kv_heads, num_pages] or [num_kv_heads, num_pages, subs]
    (sub-page scale tiles, run12). Everything else — offsets, masking,
    clamped index maps (O(length), and O(window + sinks) when windowed) —
    matches paged_prefill_attention."""
    validate_masking(True, window, attention_sinks)
    batch, num_q_heads, q_len, head_dim = q.shape
    num_kv_heads, num_pages, page_size, half = k_pages.shape
    if half * 2 != head_dim:
        raise ValueError(
            f"packed pages last dim {half} != head_dim // 2 ({head_dim // 2})")
    if k_scales.ndim == 2:
        k_scales = k_scales[..., None]
    if v_scales.ndim == 2:
        v_scales = v_scales[..., None]
    subs = k_scales.shape[-1]
    if page_size % subs:
        raise ValueError(
            f"page_size {page_size} not a multiple of scale sub-tiles {subs}")
    if v_scales.shape[-1] != subs:
        raise ValueError("k_scales and v_scales must agree on sub-tiles")
    max_pages = block_tables.shape[1]
    group = num_q_heads // num_kv_heads
    if group * num_kv_heads != num_q_heads:
        raise ValueError(
            f"q heads {num_q_heads} not a multiple of kv heads {num_kv_heads}")
    scale = sm_scale if sm_scale is not None else head_dim**-0.5

    block_q = min(block_q, max(q_len, 16))
    q_pad = (-q_len) % block_q
    qg = q.reshape(batch, num_kv_heads, group, q_len, head_dim)
    if q_pad:
        qg = jnp.pad(qg, ((0, 0),) * 3 + ((0, q_pad), (0, 0)))
    q_len_p = q_len + q_pad

    kernel = functools.partial(
        _prefill_kernel_int4,
        sm_scale=scale,
        page_size=page_size,
        block_q=block_q,
        group=group,
        half_dim=half,
        subs=subs,
        window=window,
        softcap=logit_softcap,
        sinks=attention_sinks,
        save_residuals=save_residuals,
    )

    def _page_idx(b, h, qb, i, L, S, T):
        last_pos = jnp.minimum(
            S[b] + (qb + 1) * block_q - 1, jnp.maximum(L[b] - 1, 0))
        last_page = jnp.maximum(last_pos, 0) // page_size
        ic = jnp.minimum(i, last_page)
        if window is not None:
            first_vis = jnp.maximum(S[b] + qb * block_q - window + 1, 0)
            lo = jnp.minimum(first_vis // page_size, last_page)
            clamped = jnp.clip(i, lo, last_page)
            if attention_sinks:
                sink_pages = -(-attention_sinks // page_size)
                ic = jnp.where(i < sink_pages, ic, clamped)
            else:
                ic = clamped
        return (h, T[b, ic], 0, 0)

    from quantizedmha_tpu.ops.decode import _scales_cols

    _scol_spec = pl.BlockSpec(
        (1, num_pages * subs, 1),
        lambda b, h, qb, i, L, S, T: (h, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, num_kv_heads, q_len_p // block_q, max_pages),
        in_specs=[
            pl.BlockSpec((1, 1, group, block_q, head_dim),
                         lambda b, h, qb, i, L, S, T: (b, h, 0, qb, 0)),
            pl.BlockSpec((1, 1, page_size, half), _page_idx),
            pl.BlockSpec((1, 1, page_size, half), _page_idx),
            _scol_spec,
            _scol_spec,
        ],
        out_specs=(
            (_out_block(group, block_q, head_dim),
             _lse_block(group, block_q)) if save_residuals
            else _out_block(group, block_q, head_dim)
        ),
        scratch_shapes=[
            pltpu.VMEM((group * block_q, LANES), jnp.float32),
            pltpu.VMEM((group * block_q, LANES), jnp.float32),
            pltpu.VMEM((group * block_q, half), jnp.float32),
            pltpu.VMEM((group * block_q, half), jnp.float32),
        ],
    )
    o_shape = jax.ShapeDtypeStruct(
        (batch, num_kv_heads, group, q_len_p, head_dim), q.dtype)
    lse_shape = jax.ShapeDtypeStruct(
        (batch, num_kv_heads, group, q_len_p, LANES), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(o_shape, lse_shape) if save_residuals else o_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_auto_interpret(interpret),
    )(lengths.astype(jnp.int32), q_starts.astype(jnp.int32),
      block_tables.astype(jnp.int32), qg, k_pages, v_pages,
      _scales_cols(k_scales), _scales_cols(v_scales))
    if save_residuals:
        o, lse = out
        return (
            o[:, :, :, :q_len, :].reshape(batch, num_q_heads, q_len, head_dim),
            lse[:, :, :, :q_len, 0].reshape(batch, num_q_heads, q_len),
        )
    out = out[:, :, :, :q_len, :]
    return out.reshape(batch, num_q_heads, q_len, head_dim)
