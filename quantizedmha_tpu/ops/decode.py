"""Paged-KV decode attention kernel (q_len = 1, GQA, INT8 KV cache).

The serving hot path BASELINE.json's north star adds on top of the
reference's kernel-study scope: one new token's query attends to the whole
paged KV cache. Decode is HBM-bandwidth-bound (the entire cache is read per
step), which is exactly why the cache is INT8 — half the bytes of bf16
(reference run6/int8_notes.md motivates int8 by SMEM/DRAM economy; here the
same math halves HBM traffic).

Design (boom guide secs 8-13 shape the approach):
  - k/v live in pages [num_kv_heads, num_pages, page_size, head_dim] int8
    with one symmetric max-abs scale per (kv_head, page) — the same
    per-block scale scheme as ops/quantize.py, so a page is one quant tile.
  - block tables [batch, max_pages] map each sequence's logical pages to
    physical ones; they are scalar-prefetched so the Pallas BlockSpec
    index_map can gather non-contiguous pages (PrefetchScalarGridSpec).
  - grid (batch, kv_head, page): per step one page's K/V tile is DMA'd;
    all q heads of the GQA group attend to it with online (m, l) carry.
  - pages past a sequence's length (or wholly behind the sliding window)
    are BOTH compute-skipped with @pl.when AND DMA-elided by clamping the
    block-table index map (Pallas skips the copy when a grid step's block
    index equals the previous step's), so cost is proportional to the true
    context length, not max_pages.
  - page_size is the dominant latency knob at long context: the
    per-page grid step has ~0.5 us of fixed cost and small pages make
    8 KB DMAs that can't amortize it — 64 -> 256 measured 13x faster at
    32K context (profiles/md/run8_decode_pages). Prefer >= 256 when
    sequences are long; the tradeoff is coarser per-page scales and more
    allocator waste on short ones.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedmha_tpu.ops.flash_attention import (
    DEFAULT_MASK_VALUE,
    LANES,
    _auto_interpret,
    validate_masking,
)

_INT8_PRECISION = jax.lax.Precision.DEFAULT
_SUB = 8  # f32 sublane quantum; the GQA group dim is padded up to this


def _decode_kernel(
    # scalar prefetch
    lengths_ref,       # [batch] i32
    tables_ref,        # [batch, max_pages] i32
    # (stacked only: layer_ref [1] i32 — consumed by the BlockSpec index
    # maps, dropped here)
    # inputs
    # q_ref [1, 1, group_p, head_dim] f32/bf16,
    # then J k-page refs + J v-page refs [(1,) 1, 1, page_size, head_dim]
    # int8 (J = pages_per_step; operand j holds logical page i*J + j),
    # ks_ref / vs_ref [(1,) 1, num_pages, 1] f32 VMEM — this head's column
    # (_scales_cols layout),
    # outputs: o_ref [1, 1, group_p, head_dim] (+ lse_ref [1, 1, group_p,
    # LANES] when save_residuals), then scratch m/l [group_p, LANES],
    # acc [group_p, head_dim]
    *refs,
    sm_scale: float,
    page_size: int,
    group_p: int,
    pages_per_step: int = 1,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: int = 0,
    save_residuals: bool = False,
    stacked: bool = False,
):
    J = pages_per_step
    if stacked:
        refs = refs[1:]  # drop layer_ref — index maps consumed it
    q_ref = refs[0]
    refs = refs[1:]
    k_refs = refs[:J]
    v_refs = refs[J:2 * J]
    ks_ref, vs_ref = refs[2 * J], refs[2 * J + 1]
    rest = refs[2 * J + 2:]
    # Layer-stacked pools carry one extra leading block dim (see
    # paged_decode_attention's `layer` argument); collapse it here so the
    # body below is layout-agnostic.
    if stacked:
        k_page = lambda j: k_refs[j][0, 0, 0, :, :]
        v_page = lambda j: v_refs[j][0, 0, 0, :, :]
        read_scale = lambda ref, row: ref[0, 0, row, 0]
    else:
        k_page = lambda j: k_refs[j][0, 0, :, :]
        v_page = lambda j: v_refs[j][0, 0, :, :]
        read_scale = lambda ref, row: ref[0, row, 0]
    if save_residuals:
        o_ref, lse_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        o_ref, m_scratch, l_scratch, acc_scratch = rest
        lse_ref = None
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    num_pages_grid = pl.num_programs(2)
    length = lengths_ref[b]
    span = page_size * J       # positions covered by one grid step
    base = i * span            # first position of this step's span
    max_pages = tables_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Step-level skip: run only if ANY page in the span is needed. The
    # per-POSITION `valid` mask below is what makes the result exact —
    # pages past the context (or behind the window) inside a running span
    # are fetched as clamped duplicates and masked to DEFAULT_MASK_VALUE
    # (finite, -0.7*f32max: exp underflows those p entries to exactly 0 —
    # the mask must be applied BEFORE any sum over s).
    in_ctx = base < length
    if window is not None:
        # Sliding window: the new token (position length-1) sees positions
        # >= length - window; skip spans entirely behind that — except
        # spans holding attention-sink positions.
        in_win = base + span > length - window
        if sinks:
            in_win |= base < sinks
        in_ctx &= in_win

    @pl.when(in_ctx)
    def _run():
        q = q_ref[0, 0, :, :].astype(jnp.float32) * sm_scale
        # The span's J pages as ONE [span, head_dim] tile: a single deeper
        # QK^T matmul amortizes the per-grid-step fixed cost that dominates
        # short-context decode (run28: 2.97 ms/step at ctx 288 vs a ~1 ms
        # data floor). Per-page scales move onto the score COLUMNS — the
        # scale is constant per column block, so (q @ K_cat^T) ⊙ kscale_col
        # equals the per-page (q @ k_j^T) * scale_j exactly.
        if J == 1:
            page = tables_ref[b, jnp.minimum(i, max_pages - 1)]
            k = k_page(0)
            # q is a handful of rows; dequantizing scores (not k) keeps the
            # matmul int-free on the q side: s = (q @ k^T_int8) * k_scale.
            s = jax.lax.dot_general(
                q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_INT8_PRECISION,
            ) * read_scale(ks_ref, page)
        else:
            # Scale reads clamp the logical page to the sequence's LAST
            # needed page (same contract as _make_clamped_page_idx), so a
            # masked tail page always reads a scale the sequence actually
            # owns — never block-table padding, whose entry could be an
            # out-of-range physical id or map to a non-finite pool scale
            # (0 * inf = NaN would poison pv; p == 0 only neutralizes
            # finite values). The duplicate's columns are masked to
            # DEFAULT_MASK_VALUE (k) / carry p == 0 (v), so WHICH owned
            # scale is read is irrelevant.
            last = jnp.maximum(length - 1, 0) // page_size
            pages = [tables_ref[b, jnp.minimum(jnp.minimum(i * J + j, last),
                                               max_pages - 1)]
                     for j in range(J)]
            k = jnp.concatenate([k_page(j) for j in range(J)], axis=0)
            s = jax.lax.dot_general(
                q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_INT8_PRECISION,
            )
            kcols = jnp.concatenate(
                [jnp.full((1, page_size), read_scale(ks_ref, pages[j]),
                          jnp.float32) for j in range(J)], axis=1)
            s = s * kcols
        if softcap is not None:
            # Gemma-2-style cap*tanh(s/cap) on the scaled logits.
            s = softcap * jnp.tanh(s / softcap)

        # Mask positions beyond the sequence length within this span (and
        # behind the sliding window, if any).
        pos = jax.lax.broadcasted_iota(jnp.int32, (group_p, span), 1) + base
        valid = pos < length
        if window is not None:
            in_win = pos >= length - window
            if sinks:
                in_win |= pos < sinks
            valid &= in_win
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        if J == 1:
            v = v_page(0)
            pv = jax.lax.dot_general(
                p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_INT8_PRECISION,
            ) * read_scale(vs_ref, page)
        else:
            # Per-page v scales ride the P columns: (p ⊙ vscale_col) @ V_cat
            # == Σ_j (p_j @ v_j) * vscale_j exactly.
            v = jnp.concatenate([v_page(j) for j in range(J)], axis=0)
            vcols = jnp.concatenate(
                [jnp.full((1, page_size), read_scale(vs_ref, pages[j]),
                          jnp.float32) for j in range(J)], axis=1)
            pv = jax.lax.dot_general(
                p * vcols, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_INT8_PRECISION,
            )
        acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(i == num_pages_grid - 1)
    def _epilogue():
        l = l_scratch[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0, :, :] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        if save_residuals:
            # lse in the merge convention of parallel/combine: m + log(l)
            # over the SCALED logits; an empty region (l == 0, e.g. the
            # whole batch lane masked) is exactly -inf so it drops out of
            # merge_two_partials.
            m = m_scratch[:, :1]
            lse = jnp.where(l == 0.0, -jnp.inf, m + jnp.log(jnp.maximum(l, 1e-38)))
            lse_ref[0, 0, :, :] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _scales_cols(scales: jnp.ndarray) -> jnp.ndarray:
    """[num_kv_heads, num_pages(, subs)] -> [num_kv_heads, rows, 1]: the
    per-(head, page) scales with the page/sub rows on the SUBLANE dim, so
    each grid (b, h) block-fetches ITS column into VMEM and reads scalars
    by native dynamic-sublane indexing.

    Why not SMEM (the original design): each SMEM word costs ~32 bytes on
    this target, so whole-pool scale tables blow the 1 MiB SMEM budget at
    ~1500 pages x 8 kv heads — the round-3 run17 re-run hit exactly this
    ("Ran out of memory in memory space smem. Used 2.00M of 1.00M",
    profiles/raw_r3/run17_mixed.out). A [num_pages, 1] VMEM block per head
    costs num_pages x 512 B of (lane-padded) VMEM out of ~16 MiB and is
    fetched once per (b, h) — the index map ignores the page step, so
    Pallas elides the re-fetch across the page grid."""
    if scales.ndim == 3:
        h, n, subs = scales.shape
        return scales.reshape(h, n * subs, 1)
    return scales[:, :, None]


def _scales_cols_stacked(scales: jnp.ndarray) -> jnp.ndarray:
    """Layer-stacked variant: [L, num_kv_heads, num_pages] ->
    [L, num_kv_heads, num_pages, 1] (the layer index map picks one layer's
    head column per (b, h) grid cell). Callers on the hot path should pass
    scales ALREADY carrying the trailing unit dim: this reshape is a real
    layout change (rows move from lanes to sublanes) that costs a copy of
    the whole plane — run33's trace measured it at ~0.65 ms/step when
    re-materialized per layer inside the decode scan. decode_loop
    pre-columns the carry once per fused chunk instead."""
    if scales.ndim == 4:  # already columned
        return scales
    return scales[:, :, :, None]


def _read_scale(scales_ref, row, h):
    """One f32 scale from this head's [1, rows, 1] VMEM block: a native
    dynamic-SUBLANE scalar read (rows ride the sublane dim; Mosaic has no
    dynamic lane indexing, and a (rows, 1)-over-(rows, Hkv) block is
    rejected — the last block dim must be 128-divisible or whole, which
    is why the layout is [Hkv, rows, 1] blocked (1, rows, 1): both
    trailing block dims EQUAL the array dims). An earlier iota-select
    variant over head lanes measured 14% slower on the serving-shape
    decode (profiles/raw_r3/run22 first pass); this read matches the old
    SMEM path (run22: 1.00-1.02 ms both ways, bitwise equal). `h` is
    consumed by the BlockSpec, not here."""
    del h
    return scales_ref[0, row, 0]


def _scales_spec(num_rows: int, stacked: bool = False):
    """One kv head's scale column as a [1, rows, 1] VMEM block, fetched
    once per (b, h) — the index map ignores the page step, so Pallas
    elides the re-fetch across the page grid. Stacked pools block one
    LAYER's column out of [L, Hkv, rows, 1] via the prefetched layer
    scalar."""
    if stacked:
        return pl.BlockSpec(
            (1, 1, num_rows, 1), lambda b, h, i, L, T, LI: (LI[0], h, 0, 0))
    return pl.BlockSpec((1, num_rows, 1), lambda b, h, i, L, T: (h, 0, 0))


def _make_clamped_page_idx(page_size: int, window, sinks: int,
                           pages_per_step: int = 1, j: int = 0,
                           stacked: bool = False):
    """Block-table index map CLAMPED to the pages a sequence actually
    needs: grid steps past the context (or wholly behind the sliding
    window, sink pages aside) re-reference an adjacent needed page, and
    Pallas elides the DMA when a step's block index equals the previous
    step's. This is what makes decode cost proportional to the TRUE
    context length instead of max_pages — pl.when alone skips only the
    compute, not the page fetch (VERDICT round-1 weak #2).

    pages_per_step/j: operand j of a J-page-folded grid holds logical page
    i*J + j (the kernel masks any clamped duplicates per position).

    stacked: pools carry a leading layer dim; the prefetched layer scalar
    becomes the first block coordinate."""

    def page_idx(b, h, i, L, T, *LI):
        i = i * pages_per_step + j
        last = jnp.maximum(L[b] - 1, 0) // page_size
        ic = jnp.minimum(i, last)
        if window is not None:
            first_win = jnp.maximum(L[b] - window, 0) // page_size
            lo = jnp.minimum(first_win, last)
            clamped = jnp.clip(i, lo, last)
            if sinks:
                sink_pages = -(-sinks // page_size)
                ic = jnp.where(i < sink_pages, ic, clamped)
            else:
                ic = clamped
        if stacked:
            return (LI[0][0], h, T[b, ic], 0, 0)
        return (h, T[b, ic], 0, 0)

    return page_idx


def paged_decode_attention(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    k_scales: jnp.ndarray,
    v_scales: jnp.ndarray,
    lengths: jnp.ndarray,
    block_tables: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    save_residuals: bool = False,
    pages_per_step: Optional[int] = None,
    layer: Optional[jnp.ndarray] = None,
    fold_kv_heads: Optional[bool] = None,
    scales_prerowed: bool = False,
    seqs_per_step: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Single-token attention against a paged INT8 KV cache.

    fold_kv_heads: move the kv-head dim from the GRID into the BLOCK —
    grid (batch, page_step) with one strided DMA per operand fetching ALL
    heads' page and a static per-head unroll inside the step. The
    (batch, kv_head, page) grid pays ~0.9us of fixed cost per step for a
    16 KB page pair (run42: 60us/layer for ~6 MB of pages at batch 8);
    folding cuts the step count num_kv_heads-fold. None -> auto: fold
    whenever there is more than one kv head. scales_prerowed: the scales
    are already in the folded kernel's [*(L,) num_pages, Hkv] layout
    (decode_loop pre-transposes once per fused chunk; passing raw
    [*(L,) Hkv, num_pages] is fine for standalone calls — the transpose
    happens inline).

    pages_per_step: fold J pages into each grid step (J offset-indexed
    page operands, one [J*page_size, head_dim] score tile). The per-step
    fixed cost (~0.4 us) dominates short-context decode — run28 measured
    the kernel at ~33% of its data floor at ctx 288 — and folding
    amortizes it J-fold while keeping per-page scales exact (they ride
    the score/P columns). None -> min(4, max_pages).

    window/logit_softcap: sliding-window size and Gemma-2 soft-cap, matching
    ops.flash_attention semantics (decode is causal by construction; pages
    wholly behind the window are skipped).

    q:            [batch, num_q_heads, head_dim] (the new token's queries)
    k/v_pages:    [num_kv_heads, num_pages, page_size, head_dim] int8
    k/v_scales:   [num_kv_heads, num_pages] f32
    lengths:      [batch] i32 — current context length per sequence
    block_tables: [batch, max_pages] i32 — physical page ids (pad with 0)
    Returns [batch, num_q_heads, head_dim]; with save_residuals=True,
    (out, lse [batch, num_q_heads] f32) — the partial-attention form
    parallel/combine.merge_two_partials consumes (mixed-precision KV
    merges, decode-side context parallelism).

    layer: when k/v_pages carry a leading LAYER-STACK dim
    ([num_layers, num_kv_heads, num_pages, page_size, head_dim] pools,
    [num_layers, num_kv_heads, num_pages] scales), a traced i32 scalar
    selecting the layer to read. The whole stack flows in unsliced — the
    serving decode scan threads the stacked cache as a lax.scan CARRY
    (token-granular in-place scatter appends), and slicing one layer's
    pool out per step would copy ~pool/num_layers bytes per layer per
    token, the run23 'nested-scan carry copies' overhead. The kernel DMAs
    only the pages it needs, so the stack costs nothing extra.
    """
    batch, num_q_heads, head_dim = q.shape
    stacked = k_pages.ndim == 5
    if stacked:
        if layer is None:
            raise ValueError(
                "layer-stacked pools (ndim 5) need the `layer` index")
        _, num_kv_heads, num_pages, page_size, _ = k_pages.shape
    else:
        if layer is not None:
            raise ValueError("`layer` is only meaningful for 5-D stacked pools")
        num_kv_heads, num_pages, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    group = num_q_heads // num_kv_heads
    assert group * num_kv_heads == num_q_heads
    scale = sm_scale if sm_scale is not None else head_dim**-0.5

    group_p = max(group, _SUB)
    # [batch, kv_heads, group, head_dim], padded group rows are garbage in /
    # garbage out and sliced off.
    qg = q.reshape(batch, num_kv_heads, group, head_dim)
    if group_p != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_p - group), (0, 0)))

    # Same masking contract as flash_attention/flash_attention_int8 (decode
    # is causal by construction): sinks without a window must raise here
    # too, not be silently ignored.
    validate_masking(True, window, attention_sinks)
    if pages_per_step is not None and pages_per_step * page_size > 2048:
        # Each folded page adds a double-buffered K+V VMEM operand and
        # widens the score tile; an unbounded J is a VMEM blowout far from
        # the call site. 2048 positions/step (e.g. J=8 @ page 256) is the
        # tested budget — run29 measured J=4 as the knee.
        raise ValueError(
            f"pages_per_step={pages_per_step} x page_size={page_size} "
            f"exceeds the 2048-position per-step tile budget; use a "
            f"smaller fold (run29: J=4 captures the win)")
    J = pages_per_step if pages_per_step is not None else min(4, max_pages)
    J = max(1, min(J, max_pages))
    if fold_kv_heads is None:
        fold_kv_heads = num_kv_heads > 1
    if fold_kv_heads:
        return _paged_decode_attention_hfold(
            qg, k_pages, v_pages, k_scales, v_scales, lengths, block_tables,
            sm_scale=scale, window=window, logit_softcap=logit_softcap,
            attention_sinks=attention_sinks, save_residuals=save_residuals,
            pages_per_step=J, layer=layer, scales_prerowed=scales_prerowed,
            interpret=interpret, stacked=stacked, group=group,
            group_p=group_p, num_pages=num_pages, page_size=page_size,
            batch=batch, num_q_heads=num_q_heads, head_dim=head_dim,
            q_dtype=q.dtype, seqs_per_step=seqs_per_step)
    kernel = functools.partial(
        _decode_kernel,
        sm_scale=scale,
        page_size=page_size,
        group_p=group_p,
        pages_per_step=J,
        window=window,
        softcap=logit_softcap,
        sinks=attention_sinks,
        save_residuals=save_residuals,
        stacked=stacked,
    )
    page_block = (1, 1, 1, page_size, head_dim) if stacked else (
        1, 1, page_size, head_dim)
    page_specs = [
        pl.BlockSpec(
            page_block,
            _make_clamped_page_idx(page_size, window, attention_sinks, J, j,
                                   stacked=stacked))
        for j in range(J)
    ]
    q_block = pl.BlockSpec(
        (1, 1, group_p, head_dim), lambda b, h, i, *s: (b, h, 0, 0)
    )
    out_block = pl.BlockSpec(
        (1, 1, group_p, head_dim), lambda b, h, i, *s: (b, h, 0, 0)
    )
    lse_block = pl.BlockSpec(
        (1, 1, group_p, LANES), lambda b, h, i, *s: (b, h, 0, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if stacked else 2,
        grid=(batch, num_kv_heads, -(-max_pages // J)),
        in_specs=[
            q_block,
            *page_specs,
            *page_specs,
            _scales_spec(num_pages, stacked),
            _scales_spec(num_pages, stacked),
        ],
        out_specs=(out_block, lse_block) if save_residuals else out_block,
        scratch_shapes=[
            pltpu.VMEM((group_p, LANES), jnp.float32),
            pltpu.VMEM((group_p, LANES), jnp.float32),
            pltpu.VMEM((group_p, head_dim), jnp.float32),
        ],
    )
    o_shape = jax.ShapeDtypeStruct((batch, num_kv_heads, group_p, head_dim), q.dtype)
    lse_shape = jax.ShapeDtypeStruct((batch, num_kv_heads, group_p, LANES), jnp.float32)
    if stacked:
        prefetch = (lengths, block_tables,
                    jnp.asarray(layer, jnp.int32).reshape(1))
        scols = (_scales_cols_stacked(k_scales), _scales_cols_stacked(v_scales))
    else:
        prefetch = (lengths, block_tables)
        scols = (_scales_cols(k_scales), _scales_cols(v_scales))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(o_shape, lse_shape) if save_residuals else o_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=_auto_interpret(interpret),
    )(*prefetch, qg, *([k_pages] * J), *([v_pages] * J), *scols)
    if save_residuals:
        o, lse = out
        return (
            o[:, :, :group, :].reshape(batch, num_q_heads, head_dim),
            lse[:, :, :group, 0].reshape(batch, num_q_heads),
        )
    return out[:, :, :group, :].reshape(batch, num_q_heads, head_dim)


def _decode_kernel_hfold(
    # scalar prefetch
    lengths_ref,       # [batch] i32
    tables_ref,        # [batch, max_pages] i32
    # (stacked only: layer_ref [1] i32 — consumed by the BlockSpec index
    # maps, dropped here)
    # inputs
    # q_ref [S, Hkv, group_p, head_dim] (S = seqs_per_step),
    # then S*J k-page refs + S*J v-page refs (s-major; operand (s, j)
    # holds seq b*S+s's logical page i*J + j) [(1,) Hkv, 1, page_size,
    # head_dim] int8 — ALL kv heads' copy of the page in ONE strided DMA,
    # ks_ref / vs_ref: [num_pages, Hkv] f32 VMEM (heads on LANES —
    # _scales_rows; a [Hkv, rows, 1] whole-head block would lane-pad every
    # head's column to 512 B/row). With stacked pools the scales are
    # either layer-stacked [1, num_pages, Hkv] (LI-indexed blocks,
    # scales_stacked=True) or a PER-LAYER [num_pages, Hkv] view the
    # serving scan derives outside (scales_stacked=False — run48),
    # outputs: o_ref [S, Hkv, group_p, head_dim] (+ lse_ref [S, Hkv,
    # group_p, LANES]), then scratch m/l [S*Hkv, group_p, LANES],
    # acc [S*Hkv, group_p, head_dim]
    *refs,
    sm_scale: float,
    page_size: int,
    group_p: int,
    num_kv_heads: int,
    pages_per_step: int = 1,
    seqs_per_step: int = 1,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: int = 0,
    save_residuals: bool = False,
    stacked: bool = False,
    scales_stacked: bool = True,
):
    """Head-FOLDED variant of _decode_kernel: grid (batch/S, page_step)
    with the kv-head dim (and optionally S sequences) moved from the grid
    into the block. run42's trace put the (batch, kv_head, page) form at
    60us/layer for ~6 MB of pages at batch 8 — 64 grid steps each moving
    one 16 KB page pair, pure per-step fixed cost (~0.9us/step vs ~40ns
    of DMA). Folding all kv heads into one strided page DMA cuts the
    steps num_kv_heads-fold (run44: 2.5-2.7x); folding seqs_per_step
    sequences into each step cuts them again (each sequence keeps its own
    page operands, lengths, masks, and online-softmax state — a static
    unroll, like the head loop). Reference analog: fa.cu:283-359 streams
    KV per block with the same amortization goal, one CUDA block per
    (head, query tile) — on TPU the whole chip is one 'block', so heads
    and sequences fold into the tile."""
    J = pages_per_step
    S = seqs_per_step
    if stacked:
        refs = refs[1:]  # drop layer_ref — index maps consumed it
    q_ref = refs[0]
    refs = refs[1:]
    k_refs = refs[:S * J]
    v_refs = refs[S * J:2 * S * J]
    ks_ref, vs_ref = refs[2 * S * J], refs[2 * S * J + 1]
    rest = refs[2 * S * J + 2:]
    if stacked:
        k_page = lambda sq, j, h: k_refs[sq * J + j][0, h, 0, :, :]
        v_page = lambda sq, j, h: v_refs[sq * J + j][0, h, 0, :, :]
    else:
        k_page = lambda sq, j, h: k_refs[sq * J + j][h, 0, :, :]
        v_page = lambda sq, j, h: v_refs[sq * J + j][h, 0, :, :]
    if stacked and scales_stacked:
        read_scale = lambda ref, row, h: ref[0, row, h]
    else:  # unstacked pools, or per-layer scales beside stacked pools
        read_scale = lambda ref, row, h: ref[row, h]
    if save_residuals:
        o_ref, lse_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        o_ref, m_scratch, l_scratch, acc_scratch = rest
        lse_ref = None
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_steps = pl.num_programs(1)
    span = page_size * J
    base = i * span
    max_pages = tables_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    for sq in range(S):  # static unroll over the step's sequences
        length = lengths_ref[b * S + sq]
        in_ctx = base < length
        if window is not None:
            in_win = base + span > length - window
            if sinks:
                in_win |= base < sinks
            in_ctx &= in_win

        @pl.when(in_ctx)
        def _run(sq=sq, length=length):
            seq = b * S + sq
            # Logical->physical page ids and the position mask are shared
            # by every head (one block table per sequence); compute once.
            if J == 1:
                pages = [tables_ref[seq, jnp.minimum(i, max_pages - 1)]]
            else:
                last = jnp.maximum(length - 1, 0) // page_size
                pages = [tables_ref[seq,
                                    jnp.minimum(jnp.minimum(i * J + j, last),
                                                max_pages - 1)]
                         for j in range(J)]
            pos = jax.lax.broadcasted_iota(
                jnp.int32, (group_p, span), 1) + base
            valid = pos < length
            if window is not None:
                in_win = pos >= length - window
                if sinks:
                    in_win |= pos < sinks
                valid &= in_win

            for h in range(num_kv_heads):  # static unroll, resident tiles
                r = sq * num_kv_heads + h  # scratch row
                q = q_ref[sq, h, :, :].astype(jnp.float32) * sm_scale
                if J == 1:
                    s = jax.lax.dot_general(
                        q, k_page(sq, 0, h).astype(jnp.float32),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_INT8_PRECISION,
                    ) * read_scale(ks_ref, pages[0], h)
                else:
                    k = jnp.concatenate(
                        [k_page(sq, j, h) for j in range(J)], axis=0)
                    s = jax.lax.dot_general(
                        q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_INT8_PRECISION,
                    )
                    kcols = jnp.concatenate(
                        [jnp.full((1, page_size),
                                  read_scale(ks_ref, pages[j], h),
                                  jnp.float32) for j in range(J)], axis=1)
                    s = s * kcols
                if softcap is not None:
                    s = softcap * jnp.tanh(s / softcap)
                s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

                m_prev = m_scratch[r, :, :1]
                l_prev = l_scratch[r, :, :1]
                m_curr = jnp.max(s, axis=-1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(s - m_next)
                l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
                m_scratch[r, :, :] = jnp.broadcast_to(
                    m_next, m_scratch.shape[1:])
                l_scratch[r, :, :] = jnp.broadcast_to(
                    l_next, l_scratch.shape[1:])

                if J == 1:
                    pv = jax.lax.dot_general(
                        p, v_page(sq, 0, h).astype(jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_INT8_PRECISION,
                    ) * read_scale(vs_ref, pages[0], h)
                else:
                    v = jnp.concatenate(
                        [v_page(sq, j, h) for j in range(J)], axis=0)
                    vcols = jnp.concatenate(
                        [jnp.full((1, page_size),
                                  read_scale(vs_ref, pages[j], h),
                                  jnp.float32) for j in range(J)], axis=1)
                    pv = jax.lax.dot_general(
                        p * vcols, v.astype(jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_INT8_PRECISION,
                    )
                acc_scratch[r, :, :] = acc_scratch[r, :, :] * alpha + pv

    @pl.when(i == num_steps - 1)
    def _epilogue():
        for sq in range(S):
            for h in range(num_kv_heads):
                r = sq * num_kv_heads + h
                l = l_scratch[r, :, :1]
                l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
                o_ref[sq, h, :, :] = (
                    acc_scratch[r, :, :] * l_inv).astype(o_ref.dtype)
                if save_residuals:
                    m = m_scratch[r, :, :1]
                    lse = jnp.where(
                        l == 0.0, -jnp.inf,
                        m + jnp.log(jnp.maximum(l, 1e-38)))
                    lse_ref[sq, h, :, :] = jnp.broadcast_to(
                        lse, lse_ref.shape[2:])


def _scales_rows(scales: jnp.ndarray, num_kv_heads: int,
                 prerowed: bool) -> jnp.ndarray:
    """Scale layout for the head-folded kernel: [*(L,) num_pages, Hkv] —
    pages on SUBLANES (dynamic scalar reads), heads on LANES (static index
    per unrolled head). One whole block costs pages x 512 B of lane-padded
    VMEM TOTAL — the columned [Hkv, rows, 1] layout blocked whole would pay
    that PER HEAD. Callers inside a layer scan harus pass prerowed=True
    with the transpose done once per chunk (decode_loop), or the layout
    change re-materializes per layer (run33's ~0.65 ms/step lesson)."""
    if prerowed:
        if scales.shape[-1] != num_kv_heads:
            raise ValueError(
                f"prerowed scales last dim {scales.shape[-1]} != "
                f"num_kv_heads {num_kv_heads}")
        return scales
    # raw [*(L,) Hkv, num_pages] -> [*(L,) num_pages, Hkv]
    return jnp.swapaxes(scales, -1, -2)


def _hfold_page_idx(page_size: int, window, sinks: int,
                    pages_per_step: int, j: int, stacked: bool,
                    seqs_per_step: int = 1, sq: int = 0):
    """_make_clamped_page_idx for the head-folded grid (batch/S,
    page_step): same clamp contract (DMA elision past the true context),
    head block coordinate pinned to 0 (the block spans ALL kv heads).
    Operand (sq, j) serves sequence b*S + sq's logical page i*J + j."""

    def page_idx(b, i, L, T, *LI):
        seq = b * seqs_per_step + sq
        i = i * pages_per_step + j
        last = jnp.maximum(L[seq] - 1, 0) // page_size
        ic = jnp.minimum(i, last)
        if window is not None:
            first_win = jnp.maximum(L[seq] - window, 0) // page_size
            lo = jnp.minimum(first_win, last)
            clamped = jnp.clip(i, lo, last)
            if sinks:
                sink_pages = -(-sinks // page_size)
                ic = jnp.where(i < sink_pages, ic, clamped)
            else:
                ic = clamped
        if stacked:
            return (LI[0][0], 0, T[seq, ic], 0, 0)
        return (0, T[seq, ic], 0, 0)

    return page_idx


def _paged_decode_attention_hfold(
    qg, k_pages, v_pages, k_scales, v_scales, lengths, block_tables, *,
    sm_scale, window, logit_softcap, attention_sinks, save_residuals,
    pages_per_step, layer, scales_prerowed, interpret, stacked, group,
    group_p, num_pages, page_size, batch, num_q_heads, head_dim, q_dtype,
    seqs_per_step=None,
):
    """Launcher for _decode_kernel_hfold (see paged_decode_attention's
    fold_kv_heads doc). qg arrives already grouped/padded
    [batch, Hkv, group_p, head_dim]. seqs_per_step: fold S sequences into
    each grid step — each keeps its own page operands, masks, and
    online-softmax state (bitwise-identical results). Default 1: after
    the head fold the kernel is no longer step-count-bound, and run61
    measured S=2 at +5% at batch 8 / -5% at batch 32 (S=4 worse at
    both) — not worth a default; kept as an explicit knob for
    batch-heavy serving experiments."""
    num_kv_heads = qg.shape[1]
    max_pages = block_tables.shape[1]
    J = pages_per_step
    S = seqs_per_step if seqs_per_step is not None else 1
    if batch % S:
        raise ValueError(f"seqs_per_step {S} must divide batch {batch}")
    per_layer_scales = stacked and k_scales.ndim == 2
    kernel = functools.partial(
        _decode_kernel_hfold,
        sm_scale=sm_scale,
        page_size=page_size,
        group_p=group_p,
        num_kv_heads=num_kv_heads,
        pages_per_step=J,
        seqs_per_step=S,
        window=window,
        softcap=logit_softcap,
        sinks=attention_sinks,
        save_residuals=save_residuals,
        stacked=stacked,
        scales_stacked=not per_layer_scales,
    )
    page_block = (1, num_kv_heads, 1, page_size, head_dim) if stacked else (
        num_kv_heads, 1, page_size, head_dim)
    page_specs = [
        pl.BlockSpec(
            page_block,
            _hfold_page_idx(page_size, window, attention_sinks, J, j,
                            stacked, seqs_per_step=S, sq=sq))
        for sq in range(S)
        for j in range(J)
    ]
    q_block = pl.BlockSpec(
        (S, num_kv_heads, group_p, head_dim), lambda b, i, *s: (b, 0, 0, 0))
    out_block = q_block
    lse_block = pl.BlockSpec(
        (S, num_kv_heads, group_p, LANES), lambda b, i, *s: (b, 0, 0, 0))
    # Stacked pools normally take layer-stacked scales ([L, pages, Hkv],
    # LI-indexed), but the serving scan hands PER-LAYER rowed scales
    # ([pages, Hkv], already sliced outside the kernel): a rowed STACKED
    # scale carry makes every append's DUS materialize full-plane copies
    # (run48: 7.3 ms/step of f32[L, P, Hkv] copies at batch 32), so the
    # carry stays in the columned append-friendly layout and the tiny
    # per-layer row view (~pages*32 B) is built per layer instead.
    if stacked and not per_layer_scales:
        scales_spec = pl.BlockSpec(
            (1, num_pages, num_kv_heads),
            lambda b, i, L, T, LI: (LI[0], 0, 0))
    elif stacked:
        scales_spec = pl.BlockSpec(
            (num_pages, num_kv_heads), lambda b, i, L, T, LI: (0, 0))
    else:
        scales_spec = pl.BlockSpec(
            (num_pages, num_kv_heads), lambda b, i, L, T: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if stacked else 2,
        grid=(batch // S, -(-max_pages // J)),
        in_specs=[
            q_block,
            *page_specs,
            *page_specs,
            scales_spec,
            scales_spec,
        ],
        out_specs=(out_block, lse_block) if save_residuals else out_block,
        scratch_shapes=[
            pltpu.VMEM((S * num_kv_heads, group_p, LANES), jnp.float32),
            pltpu.VMEM((S * num_kv_heads, group_p, LANES), jnp.float32),
            pltpu.VMEM((S * num_kv_heads, group_p, head_dim), jnp.float32),
        ],
    )
    o_shape = jax.ShapeDtypeStruct(
        (batch, num_kv_heads, group_p, head_dim), q_dtype)
    lse_shape = jax.ShapeDtypeStruct(
        (batch, num_kv_heads, group_p, LANES), jnp.float32)
    if stacked:
        prefetch = (lengths, block_tables,
                    jnp.asarray(layer, jnp.int32).reshape(1))
    else:
        prefetch = (lengths, block_tables)

    def _rows(s):
        if scales_prerowed:
            return _scales_rows(s, num_kv_heads, True)
        # Accept the COLUMN layout ([*(L,) Hkv, rows, 1], what decode_loop
        # pre-columns for the per-head kernel) by un-columning first —
        # detection is by rank, which is unambiguous per stackedness.
        if s.ndim == (4 if stacked else 3):
            s = s[..., 0]
        return _scales_rows(s, num_kv_heads, False)

    srows = (_rows(k_scales), _rows(v_scales))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(o_shape, lse_shape) if save_residuals else o_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_auto_interpret(interpret),
    )(*prefetch, qg, *([k_pages] * (S * J)), *([v_pages] * (S * J)),
      *srows)
    if save_residuals:
        o, lse = out
        return (
            o[:, :, :group, :].reshape(batch, num_q_heads, head_dim),
            lse[:, :, :group, 0].reshape(batch, num_q_heads),
        )
    return out[:, :, :group, :].reshape(batch, num_q_heads, head_dim)


def _decode_kernel_int4(
    # scalar prefetch
    lengths_ref,       # [batch] i32
    tables_ref,        # [batch, max_pages] i32
    # inputs
    q_ref,             # [1, 1, group_p, head_dim] f32/bf16
    k_page_ref,        # [1, 1, page_size, head_dim//2] int8 (nibble-packed)
    v_page_ref,        # [1, 1, page_size, head_dim//2] int8 (nibble-packed)
    ks_ref,            # [1, num_pages * subs, 1] f32 VMEM — this head's
    vs_ref,            # [1, num_pages * subs, 1] f32 VMEM
    # outputs: o_ref [1, 1, group_p, head_dim] (+ lse_ref [1, 1, group_p,
    # LANES] when save_residuals), then scratch m/l [group_p, LANES],
    # acc_lo/acc_hi [group_p, head_dim//2]
    *refs,
    sm_scale: float,
    page_size: int,
    group_p: int,
    half_dim: int,
    subs: int = 1,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: int = 0,
    save_residuals: bool = False,
):
    """INT4-KV decode: pages arrive nibble-packed (ops.quantize
    quantize_kv_blocks_int4's deinterleaved layout), HALF the HBM bytes of
    int8 — decode is bandwidth-bound, so this is the 2x-traffic lever. The
    packing needs no lane reassembly: unpack into two contiguous
    half-head_dim tiles (int32 shifts; int8 shifts don't lower in Mosaic on
    this backend) and run every dot per half.

    subs: scale sub-tiles per page — int4's 3 magnitude bits can't afford
    one max-abs scale across a whole 256-token page (run12 measures the
    accuracy cliff); scores/probs are re-scaled per column group instead of
    per page (two extra VPU passes on a bandwidth-bound kernel)."""
    from quantizedmha_tpu.ops.quantize import unpack_int4_halves

    if save_residuals:
        o_ref, lse_ref, m_scratch, l_scratch, acc_lo, acc_hi = refs
    else:
        o_ref, m_scratch, l_scratch, acc_lo, acc_hi = refs
        lse_ref = None
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    num_pages_grid = pl.num_programs(2)
    length = lengths_ref[b]

    @pl.when(i == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_lo[...] = jnp.zeros_like(acc_lo)
        acc_hi[...] = jnp.zeros_like(acc_hi)

    in_ctx = i * page_size < length
    if window is not None:
        in_win = (i + 1) * page_size > length - window
        if sinks:
            in_win |= i * page_size < sinks
        in_ctx &= in_win

    def _scale_cols(scales_ref, page):
        """[1, page_size] per-column dequant row from the page's sub-tile
        scales (subs is static and small, so this unrolls)."""
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
        q = q_ref[0, 0, :, :].astype(jnp.float32) * sm_scale
        q_lo, q_hi = q[:, :half_dim], q[:, half_dim:]
        k_lo, k_hi = unpack_int4_halves(k_page_ref[0, 0, :, :])
        # s = q . k summed over BOTH halves (the deinterleave makes each
        # half contiguous, so no reassembly of the packed layout).
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

        pos = jax.lax.broadcasted_iota(jnp.int32, (group_p, page_size), 1) + i * page_size
        valid = pos < length
        if window is not None:
            in_win = pos >= length - window
            if sinks:
                in_win |= pos < sinks
            valid &= in_win
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)

        v_lo, v_hi = unpack_int4_halves(v_page_ref[0, 0, :, :])
        # V's sub-tile scale applies per kv ROW: fold into p's columns once
        # (both halves share it), then the dots dequantize for free.
        p_s = p * _scale_cols(vs_ref, page)
        acc_lo[...] = acc_lo[...] * alpha + jax.lax.dot_general(
            p_s, v_lo.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_INT8_PRECISION)
        acc_hi[...] = acc_hi[...] * alpha + jax.lax.dot_general(
            p_s, v_hi.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_INT8_PRECISION)

    @pl.when(i == num_pages_grid - 1)
    def _epilogue():
        l = l_scratch[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0, :, :half_dim] = (acc_lo[...] * l_inv).astype(o_ref.dtype)
        o_ref[0, 0, :, half_dim:] = (acc_hi[...] * l_inv).astype(o_ref.dtype)
        if save_residuals:
            m = m_scratch[:, :1]
            lse = jnp.where(l == 0.0, -jnp.inf, m + jnp.log(jnp.maximum(l, 1e-38)))
            lse_ref[0, 0, :, :] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def paged_decode_attention_int4(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    k_scales: jnp.ndarray,
    v_scales: jnp.ndarray,
    lengths: jnp.ndarray,
    block_tables: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    save_residuals: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Single-token attention against an INT4 (nibble-packed) paged KV
    cache: half the HBM traffic of the int8 cache on the bandwidth-bound
    decode path. k/v_pages: [num_kv_heads, num_pages, page_size,
    head_dim // 2] int8 in quantize_kv_blocks_int4's deinterleaved layout.
    k/v_scales: [num_kv_heads, num_pages] (one scale per page) or
    [num_kv_heads, num_pages, subs] (sub-page scale tiles — int4 accuracy
    needs finer scales than a 256-token page, run12); everything else
    matches paged_decode_attention, including save_residuals -> (out, lse)
    for partial-attention merging."""
    batch, num_q_heads, head_dim = q.shape
    num_kv_heads, num_pages, page_size, half = k_pages.shape
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
    if half * 2 != head_dim:
        raise ValueError(
            f"packed pages last dim {half} != head_dim // 2 ({head_dim // 2})")
    max_pages = block_tables.shape[1]
    group = num_q_heads // num_kv_heads
    assert group * num_kv_heads == num_q_heads
    scale = sm_scale if sm_scale is not None else head_dim**-0.5
    validate_masking(True, window, attention_sinks)

    group_p = max(group, _SUB)
    qg = q.reshape(batch, num_kv_heads, group, head_dim)
    if group_p != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_p - group), (0, 0)))

    kernel = functools.partial(
        _decode_kernel_int4,
        sm_scale=scale,
        page_size=page_size,
        group_p=group_p,
        half_dim=half,
        subs=subs,
        window=window,
        softcap=logit_softcap,
        sinks=attention_sinks,
        save_residuals=save_residuals,
    )
    page_idx = _make_clamped_page_idx(page_size, window, attention_sinks)
    out_block = pl.BlockSpec(
        (1, 1, group_p, head_dim), lambda b, h, i, L, T: (b, h, 0, 0)
    )
    lse_block = pl.BlockSpec(
        (1, 1, group_p, LANES), lambda b, h, i, L, T: (b, h, 0, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_kv_heads, max_pages),
        in_specs=[
            pl.BlockSpec((1, 1, group_p, head_dim), lambda b, h, i, L, T: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, page_size, half), page_idx),
            pl.BlockSpec((1, 1, page_size, half), page_idx),
            _scales_spec(num_pages * subs),
            _scales_spec(num_pages * subs),
        ],
        out_specs=(out_block, lse_block) if save_residuals else out_block,
        scratch_shapes=[
            pltpu.VMEM((group_p, LANES), jnp.float32),
            pltpu.VMEM((group_p, LANES), jnp.float32),
            pltpu.VMEM((group_p, half), jnp.float32),
            pltpu.VMEM((group_p, half), jnp.float32),
        ],
    )
    o_shape = jax.ShapeDtypeStruct((batch, num_kv_heads, group_p, head_dim), q.dtype)
    lse_shape = jax.ShapeDtypeStruct((batch, num_kv_heads, group_p, LANES), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(o_shape, lse_shape) if save_residuals else o_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=_auto_interpret(interpret),
    )(lengths, block_tables, qg, k_pages, v_pages,
      _scales_cols(k_scales), _scales_cols(v_scales))
    if save_residuals:
        o, lse = out
        return (
            o[:, :, :group, :].reshape(batch, num_q_heads, head_dim),
            lse[:, :, :group, 0].reshape(batch, num_q_heads),
        )
    return out[:, :, :group, :].reshape(batch, num_q_heads, head_dim)
