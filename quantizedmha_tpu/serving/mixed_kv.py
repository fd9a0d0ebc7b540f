"""Mixed-precision paged KV: INT8 sink pages + INT4 bulk pages.

Run 12 (profiles/md/run12_int4_scales) resolved the int4-KV accuracy
question: the error floor is the 3 magnitude bits themselves, not the
scale granularity — finer scales recover only ~10 % of the error. The fix
it filed is MIXED precision: keep the pages holding attention-sink /
early-context tokens (where StreamingLLM-style outliers concentrate, and
whose probabilities the softmax revisits on every step) at INT8, and the
long bulk of the context at INT4 — 2x the cache capacity of int8 within
epsilon of its accuracy where it matters.

TPU-native composition — NOT a mixed-dtype kernel: the two regions run
the existing `paged_decode_attention` (int8) and
`paged_decode_attention_int4` kernels with `save_residuals=True` and the
partials merge EXACTLY with `parallel.combine.merge_two_partials` (the
same lse algebra ring/context-parallel attention uses). Softmax over a
row is associative across disjoint position sets, so the split is
mathematically exact; positions carry no intra-kernel encoding (RoPE is
applied upstream), so the int4 region simply sees `length - boundary`
valid positions.

The reference has no serving cache at all (its per-launch slabs:
/root/reference/include/launchers.h:27-33); this extends the repo's own
north-star serving scope (BASELINE.json).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from quantizedmha_tpu.ops.decode import (
    paged_decode_attention,
    paged_decode_attention_int4,
)
from quantizedmha_tpu.ops.paged_prefill import (
    paged_prefill_attention,
    paged_prefill_attention_int4,
)
from quantizedmha_tpu.parallel.combine import merge_two_partials


@dataclasses.dataclass
class MixedPagedKVState:
    """One layer's mixed cache: a small INT8 pool for the first
    `boundary_tokens` positions of every sequence, an INT4 (nibble-packed)
    pool for the rest. Pools are separate page spaces with separate block
    tables — a sequence's logical page i maps into the int8 table for
    i < boundary_pages and into the int4 table (at i - boundary_pages)
    beyond."""

    k8: jnp.ndarray        # [Hkv, n8, page, hd] int8
    v8: jnp.ndarray
    k8_scales: jnp.ndarray  # [Hkv, n8] f32
    v8_scales: jnp.ndarray
    k4: jnp.ndarray        # [Hkv, n4, page, hd // 2] int8 (nibble-packed)
    v4: jnp.ndarray
    k4_scales: jnp.ndarray  # [Hkv, n4, subs] f32
    v4_scales: jnp.ndarray

    @staticmethod
    def create(num_kv_heads: int, n8_pages: int, n4_pages: int,
               page_size: int, head_dim: int, subs: int = 4) -> "MixedPagedKVState":
        if head_dim % 2:
            raise ValueError("head_dim must be even for nibble packing")
        if page_size % subs:
            raise ValueError(f"page_size {page_size} not a multiple of subs {subs}")
        return MixedPagedKVState(
            k8=jnp.zeros((num_kv_heads, n8_pages, page_size, head_dim), jnp.int8),
            v8=jnp.zeros((num_kv_heads, n8_pages, page_size, head_dim), jnp.int8),
            k8_scales=jnp.ones((num_kv_heads, n8_pages), jnp.float32),
            v8_scales=jnp.ones((num_kv_heads, n8_pages), jnp.float32),
            k4=jnp.zeros((num_kv_heads, n4_pages, page_size, head_dim // 2), jnp.int8),
            v4=jnp.zeros((num_kv_heads, n4_pages, page_size, head_dim // 2), jnp.int8),
            k4_scales=jnp.ones((num_kv_heads, n4_pages, subs), jnp.float32),
            v4_scales=jnp.ones((num_kv_heads, n4_pages, subs), jnp.float32),
        )

    @property
    def page_size(self) -> int:
        return self.k8.shape[2]

    @property
    def subs(self) -> int:
        return self.k4_scales.shape[-1]


jax.tree_util.register_dataclass(
    MixedPagedKVState,
    data_fields=["k8", "v8", "k8_scales", "v8_scales",
                 "k4", "v4", "k4_scales", "v4_scales"],
    meta_fields=[],
)


def quantize_page_int4(
    x: jnp.ndarray, subs: int, scale_clamp: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [Hkv, page_size, head_dim] -> (nibble-packed [Hkv, page_size,
    head_dim//2] int8, per-(head, sub-tile) scales [Hkv, subs] f32).
    A per-page view of ops.quantize.quantize_kv_blocks_int4 — ONE
    implementation owns the pack layout the decode kernel unpacks."""
    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks_int4

    h, p, d = x.shape
    if p % subs:
        raise ValueError(f"page_size {p} not a multiple of subs {subs}")
    packed, scale = quantize_kv_blocks_int4(
        x[None], p, scale_clamp=scale_clamp, scale_block=p // subs)
    return packed[0], scale[0].reshape(h, subs)


def write_pages_mixed(
    state: MixedPagedKVState,
    k_new: jnp.ndarray,   # [Hkv, n_tokens, hd] — positions 0..n_tokens of a seq
    v_new: jnp.ndarray,
    page_ids8: jnp.ndarray,  # [p8] physical int8-pool pages (the sink region)
    page_ids4: jnp.ndarray,  # [p4] physical int4-pool pages (the bulk)
) -> MixedPagedKVState:
    """Prefill write: the first len(page_ids8) pages of tokens land in the
    INT8 pool, the rest nibble-packed in the INT4 pool. n_tokens must be
    (p8 + p4) * page_size (pad first, as with kv_cache.write_pages)."""
    from quantizedmha_tpu.serving.kv_cache import quantize_page

    page = state.page_size
    h, n_tokens, d = k_new.shape
    p8 = page_ids8.shape[0]
    p4 = page_ids4.shape[0]
    if n_tokens != (p8 + p4) * page:
        raise ValueError(
            f"n_tokens {n_tokens} != ({p8}+{p4}) pages x {page}")
    kr = k_new.reshape(h, p8 + p4, page, d).transpose(1, 0, 2, 3)
    vr = v_new.reshape(h, p8 + p4, page, d).transpose(1, 0, 2, 3)

    def write8(state: MixedPagedKVState, inputs):
        pid, kp, vp = inputs
        kq, ks = quantize_page(kp)
        vq, vs = quantize_page(vp)
        return dataclasses.replace(
            state,
            k8=state.k8.at[:, pid].set(kq),
            v8=state.v8.at[:, pid].set(vq),
            k8_scales=state.k8_scales.at[:, pid].set(ks),
            v8_scales=state.v8_scales.at[:, pid].set(vs),
        ), None

    def write4(state: MixedPagedKVState, inputs):
        pid, kp, vp = inputs
        kq, ks = quantize_page_int4(kp, state.subs)
        vq, vs = quantize_page_int4(vp, state.subs)
        return dataclasses.replace(
            state,
            k4=state.k4.at[:, pid].set(kq),
            v4=state.v4.at[:, pid].set(vq),
            k4_scales=state.k4_scales.at[:, pid].set(ks),
            v4_scales=state.v4_scales.at[:, pid].set(vs),
        ), None

    if p8:
        state, _ = jax.lax.scan(write8, state, (page_ids8, kr[:p8], vr[:p8]))
    if p4:
        state, _ = jax.lax.scan(write4, state, (page_ids4, kr[p8:], vr[p8:]))
    return state


def append_token_mixed(
    state: MixedPagedKVState,
    k_tok: jnp.ndarray,  # [Hkv, hd]
    v_tok: jnp.ndarray,
    *,
    position: int,          # absolute position of the token (host-side int)
    boundary_tokens: int,
    page_id: jnp.ndarray,   # physical page in the pool that owns `position`
    slot: jnp.ndarray,
) -> MixedPagedKVState:
    """Route a decode-time append to the pool that owns `position`:
    below the boundary the token lands INT8 (a prefill shorter than the
    sink region keeps decoding into it), at or past it INT4. `position`
    is a host int (the allocator knows lengths host-side), so the routing
    is static per jit specialization."""
    if position < boundary_tokens:
        from quantizedmha_tpu.serving.kv_cache import (
            PagedKVCacheState, append_token)

        view = PagedKVCacheState(
            k_pages=state.k8, v_pages=state.v8,
            k_scales=state.k8_scales, v_scales=state.v8_scales)
        view = append_token(view, k_tok, v_tok, page_id, slot)
        return dataclasses.replace(
            state, k8=view.k_pages, v8=view.v_pages,
            k8_scales=view.k_scales, v8_scales=view.v_scales)
    return append_token_int4(state, k_tok, v_tok, page_id, slot)


def append_token_int4(
    state: MixedPagedKVState,
    k_tok: jnp.ndarray,  # [Hkv, hd]
    v_tok: jnp.ndarray,
    page_id: jnp.ndarray,  # scalar i32 int4-pool physical page
    slot: jnp.ndarray,     # scalar i32 offset within the page
) -> MixedPagedKVState:
    """Append one decoded token into the INT4 bulk (positions at or past
    the boundary — append_token_mixed routes). Same scale policy as
    kv_cache.append_tokens_batched: the SUB-TILE's scale is fitted by the
    first token landing in it, later tokens clamp into it."""
    page = state.page_size
    subs = state.subs
    sub_w = page // subs
    sub = slot // sub_w
    d = k_tok.shape[-1]
    half = d // 2

    def upd(pages, scales, tok):
        tf = tok.astype(jnp.float32)                       # [Hkv, hd]
        fit = jnp.maximum(jnp.max(jnp.abs(tf), axis=-1), 1e-8) / 7.0
        s = jnp.where(slot % sub_w == 0, fit, scales[:, page_id, sub])
        q = jnp.clip(jnp.round(tf / s[:, None]), -7, 7).astype(jnp.int32)
        packed = (jnp.bitwise_and(q[:, :half], 0xF)
                  | jnp.left_shift(q[:, half:], 4)).astype(jnp.int8)
        return (pages.at[:, page_id, slot].set(packed),
                scales.at[:, page_id, sub].set(s))

    k4, k4s = upd(state.k4, state.k4_scales, k_tok)
    v4, v4s = upd(state.v4, state.v4_scales, v_tok)
    return dataclasses.replace(
        state, k4=k4, v4=v4, k4_scales=k4s, v4_scales=v4s)


def write_pages_mixed_routed(
    state: MixedPagedKVState,
    k_new: jnp.ndarray,   # [Hkv, n_tokens, hd] — n_tokens = n_pages * page
    v_new: jnp.ndarray,
    below: jnp.ndarray,   # [n_pages] bool TRACED — page belongs to int8?
    page_ids8: jnp.ndarray,  # [n_pages] i32 — int8 page (or anything when
    page_ids4: jnp.ndarray,  # [n_pages] i32 —  not below; routed to scrap)
    scrap8: int = 0,
    scrap4: int = 0,
) -> MixedPagedKVState:
    """write_pages_mixed with TRACED routing: every page is quantized and
    written into BOTH pools, the non-owning pool at its scrap page — so a
    chunked prefill whose boundary crossing depends on a traced
    chunk_start stays shape-stable (write_pages_mixed needs static p8/p4
    splits; this pays double quantize work per chunk instead, trivial
    next to the chunk's matmuls)."""
    from quantizedmha_tpu.serving.kv_cache import quantize_page

    page = state.page_size
    h, n_tokens, d = k_new.shape
    n_pg = n_tokens // page
    kr = k_new.reshape(h, n_pg, page, d).transpose(1, 0, 2, 3)
    vr = v_new.reshape(h, n_pg, page, d).transpose(1, 0, 2, 3)
    pid8 = jnp.where(below, page_ids8, scrap8).astype(jnp.int32)
    pid4 = jnp.where(below, scrap4, page_ids4).astype(jnp.int32)

    def w(state, inputs):
        p8, p4, kp, vp = inputs
        kq8, ks8 = quantize_page(kp)
        vq8, vs8 = quantize_page(vp)
        kq4, ks4 = quantize_page_int4(kp, state.subs)
        vq4, vs4 = quantize_page_int4(vp, state.subs)
        return dataclasses.replace(
            state,
            k8=state.k8.at[:, p8].set(kq8),
            v8=state.v8.at[:, p8].set(vq8),
            k8_scales=state.k8_scales.at[:, p8].set(ks8),
            v8_scales=state.v8_scales.at[:, p8].set(vs8),
            k4=state.k4.at[:, p4].set(kq4),
            v4=state.v4.at[:, p4].set(vq4),
            k4_scales=state.k4_scales.at[:, p4].set(ks4),
            v4_scales=state.v4_scales.at[:, p4].set(vs4),
        ), None

    state, _ = jax.lax.scan(w, state, (pid8, pid4, kr, vr))
    return state


def append_tokens_batched_int4(
    state: MixedPagedKVState,
    k_tok: jnp.ndarray,  # [B, Hkv, hd]
    v_tok: jnp.ndarray,
    page_ids: jnp.ndarray,  # [B] i32 int4-pool physical pages
    slots: jnp.ndarray,     # [B] i32
) -> MixedPagedKVState:
    """Batched form of append_token_int4 (the engine's decode path): one
    token per sequence into the INT4 bulk, same sub-tile scale policy
    (fit at the sub-tile's first slot, clamp after)."""
    page = state.page_size
    subs = state.subs
    sub_w = page // subs
    sub = slots // sub_w                                   # [B]
    d = k_tok.shape[-1]
    half = d // 2

    def upd(pages, scales, tok):
        tf = tok.astype(jnp.float32).transpose(1, 0, 2)    # [Hkv, B, hd]
        fit = jnp.maximum(jnp.max(jnp.abs(tf), axis=-1), 1e-8) / 7.0
        s = jnp.where(slots[None, :] % sub_w == 0, fit,
                      scales[:, page_ids, sub])            # [Hkv, B]
        q = jnp.clip(jnp.round(tf / s[..., None]), -7, 7).astype(jnp.int32)
        packed = (jnp.bitwise_and(q[..., :half], 0xF)
                  | jnp.left_shift(q[..., half:], 4)).astype(jnp.int8)
        return (pages.at[:, page_ids, slots].set(packed),
                scales.at[:, page_ids, sub].set(s))

    k4, k4s = upd(state.k4, state.k4_scales, k_tok)
    v4, v4s = upd(state.v4, state.v4_scales, v_tok)
    return dataclasses.replace(
        state, k4=k4, v4=v4, k4_scales=k4s, v4_scales=v4s)


def append_tokens_batched_mixed(
    state: MixedPagedKVState,
    k_tok: jnp.ndarray,      # [B, Hkv, hd]
    v_tok: jnp.ndarray,
    positions: jnp.ndarray,  # [B] i32 TRACED — absolute position per lane
    boundary_tokens: int,
    page_ids8: jnp.ndarray,  # [B] i32 — int8-pool page owning the slot
    page_ids4: jnp.ndarray,  # [B] i32 — int4-pool page owning the slot
    slots: jnp.ndarray,      # [B] i32 (position % page: boundary is
                             # page-aligned so both frames share it)
    scrap8: int = 0,
    scrap4: int = 0,
) -> MixedPagedKVState:
    """Shape-stable batched mixed append: every lane writes BOTH pools,
    with the pool that does not own the lane's position routed to that
    pool's scrap page (same trick the block tables use for trimmed
    slots) — per-lane routing stays traced, unlike append_token_mixed's
    host-static `position`. Scrap contents/scales are never read
    meaningfully (masked out by lengths in the kernels)."""
    from quantizedmha_tpu.serving.kv_cache import (
        PagedKVCacheState, append_tokens_batched)

    below = positions < boundary_tokens
    pid8 = jnp.where(below, page_ids8, scrap8).astype(jnp.int32)
    pid4 = jnp.where(below, scrap4, page_ids4).astype(jnp.int32)
    view = PagedKVCacheState(
        k_pages=state.k8, v_pages=state.v8,
        k_scales=state.k8_scales, v_scales=state.v8_scales)
    view = append_tokens_batched(view, k_tok, v_tok, pid8, slots)
    state = dataclasses.replace(
        state, k8=view.k_pages, v8=view.v_pages,
        k8_scales=view.k_scales, v8_scales=view.v_scales)
    return append_tokens_batched_int4(state, k_tok, v_tok, pid4, slots)


def mixed_paged_decode_attention(
    q: jnp.ndarray,            # [batch, num_q_heads, head_dim]
    state: MixedPagedKVState,
    lengths: jnp.ndarray,      # [batch] i32 — TOTAL live context
    tables8: jnp.ndarray,      # [batch, max_pages8] i32 into the int8 pool
    tables4: jnp.ndarray,      # [batch, max_pages4] i32 into the int4 pool
    boundary_tokens: int,      # int8 region size (page-aligned, static)
    *,
    sm_scale: Optional[float] = None,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Decode attention over the mixed cache: positions
    [0, min(length, boundary)) read the INT8 pool, positions
    [boundary, length) the INT4 pool; the two partial softmaxes merge
    exactly via lse. Sequences shorter than the boundary get an all-masked
    int4 partial (lse = -inf) that drops out of the merge exactly.

    Windowed (StreamingLLM) serving: requires `attention_sinks ==
    boundary_tokens` — the int8 region IS the sink region, which is the
    whole design point of mixed pages. The int8 partial is then the
    always-visible sinks (full causal over len8) and the int4 partial
    applies the window in its own frame: its position p4 = absolute -
    boundary, so `p4 >= len4 - window  <=>  absolute >= length - window`
    — exact, with window masking (not just page trimming) protecting any
    table slot kv_cache.trim_window has remapped to the scrap page.
    """
    page = state.page_size
    if boundary_tokens % page:
        raise ValueError(
            f"boundary_tokens {boundary_tokens} not page-aligned ({page})")
    if window is None and attention_sinks:
        raise ValueError("attention_sinks requires a window (same contract "
                         "as the decode kernels)")
    if window is not None and attention_sinks != boundary_tokens:
        raise ValueError(
            f"windowed mixed decode needs attention_sinks "
            f"({attention_sinks}) == boundary_tokens ({boundary_tokens}): "
            "the int8 region must be exactly the always-visible sink "
            "region for the two partial masks to compose exactly")
    len8 = jnp.minimum(lengths, boundary_tokens)
    len4 = jnp.maximum(lengths - boundary_tokens, 0)
    o8, lse8 = paged_decode_attention(
        q, state.k8, state.v8, state.k8_scales, state.v8_scales,
        len8, tables8, sm_scale=sm_scale, logit_softcap=logit_softcap,
        save_residuals=True, interpret=interpret)
    o4, lse4 = paged_decode_attention_int4(
        q, state.k4, state.v4, state.k4_scales, state.v4_scales,
        len4, tables4, sm_scale=sm_scale, window=window,
        logit_softcap=logit_softcap,
        save_residuals=True, interpret=interpret)
    o, _ = merge_two_partials(o8, lse8, o4, lse4)
    return o


def mixed_paged_prefill_attention(
    q: jnp.ndarray,            # [batch, num_q_heads, q_len, head_dim]
    state: MixedPagedKVState,
    lengths: jnp.ndarray,      # [batch] i32 — TOTAL visible context
    q_starts: jnp.ndarray,     # [batch] i32 — absolute position of q row 0
    tables8: jnp.ndarray,
    tables4: jnp.ndarray,
    boundary_tokens: int,
    *,
    sm_scale: Optional[float] = None,
    block_q: int = 256,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Chunked prefill / speculative verify over the mixed cache: the
    q_len > 1 form of mixed_paged_decode_attention, same two-partial lse
    merge. Frames: the int8 partial sees absolute positions (its region
    starts at 0); the int4 partial's positions and q_starts shift by the
    boundary, which preserves BOTH the causal relation (kpos <= qpos is
    shift-invariant) and, when windowed, the window relation — so rows
    that start below the boundary simply mask out of the int4 partial
    (negative frame position => lse = -inf => exact dropout). Windowed
    use requires attention_sinks == boundary_tokens, as in decode."""
    page = state.page_size
    if boundary_tokens % page:
        raise ValueError(
            f"boundary_tokens {boundary_tokens} not page-aligned ({page})")
    if window is None and attention_sinks:
        raise ValueError("attention_sinks requires a window (same contract "
                         "as the paged kernels)")
    if window is not None and attention_sinks != boundary_tokens:
        raise ValueError(
            f"windowed mixed prefill needs attention_sinks "
            f"({attention_sinks}) == boundary_tokens ({boundary_tokens})")
    len8 = jnp.minimum(lengths, boundary_tokens)
    len4 = jnp.maximum(lengths - boundary_tokens, 0)
    o8, lse8 = paged_prefill_attention(
        q, state.k8, state.v8, state.k8_scales, state.v8_scales,
        len8, q_starts, tables8, sm_scale=sm_scale, block_q=block_q,
        logit_softcap=logit_softcap, save_residuals=True,
        interpret=interpret)
    o4, lse4 = paged_prefill_attention_int4(
        q, state.k4, state.v4, state.k4_scales, state.v4_scales,
        len4, q_starts - boundary_tokens, tables4, sm_scale=sm_scale,
        block_q=block_q, window=window, logit_softcap=logit_softcap,
        save_residuals=True, interpret=interpret)
    o, _ = merge_two_partials(o8, lse8, o4, lse4)
    return o
