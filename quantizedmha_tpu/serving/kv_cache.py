"""Paged INT8 KV cache.

Virtual memory for KV state (boom guide sec 8): physical pages of
`page_size` tokens live in HBM as int8 payloads with one symmetric max-abs
scale per (kv_head, page); sequences map logical to physical pages through
block tables. The reference has no serving state at all — its closest
analogue is the per-head device slabs malloc'd per launch
(reference include/launchers.h:27-33); this module is the production
replacement: allocation is page-granular, persistent, and shared across a
continuously batched set of sequences.

Device state is pure (jnp arrays updated functionally inside jit); the page
allocator/block tables are host-side Python (the scheduler's domain).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PagedKVCacheState:
    """Device arrays of one layer's cache."""

    k_pages: jnp.ndarray  # [num_kv_heads, num_pages, page_size, head_dim] int8
    v_pages: jnp.ndarray
    k_scales: jnp.ndarray  # [num_kv_heads, num_pages] f32
    v_scales: jnp.ndarray

    @staticmethod
    def create(num_kv_heads: int, num_pages: int, page_size: int, head_dim: int) -> "PagedKVCacheState":
        return PagedKVCacheState(
            k_pages=jnp.zeros((num_kv_heads, num_pages, page_size, head_dim), jnp.int8),
            v_pages=jnp.zeros((num_kv_heads, num_pages, page_size, head_dim), jnp.int8),
            k_scales=jnp.ones((num_kv_heads, num_pages), jnp.float32),
            v_scales=jnp.ones((num_kv_heads, num_pages), jnp.float32),
        )


jax.tree_util.register_dataclass(
    PagedKVCacheState,
    data_fields=["k_pages", "v_pages", "k_scales", "v_scales"],
    meta_fields=[],
)


def quantize_page(x: jnp.ndarray, scale_clamp: float = 1e-8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [num_kv_heads, page_size, head_dim] -> (int8 page, per-head scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(-2, -1))
    scale = jnp.maximum(amax, scale_clamp) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[:, None, None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def write_pages(
    state: PagedKVCacheState,
    k_new: jnp.ndarray,  # [num_kv_heads, n_tokens, head_dim]
    v_new: jnp.ndarray,
    page_ids: jnp.ndarray,  # [n_pages_written] i32 physical page ids
    page_size: int,
) -> PagedKVCacheState:
    """Quantize and scatter `n_tokens` (a multiple of page_size, pad first)
    of fresh K/V into the given physical pages. Functional update (jit-safe).
    """
    h, n_tokens, d = k_new.shape
    n_pages = n_tokens // page_size
    assert n_pages * page_size == n_tokens
    kr = k_new.reshape(h, n_pages, page_size, d).transpose(1, 0, 2, 3)
    vr = v_new.reshape(h, n_pages, page_size, d).transpose(1, 0, 2, 3)

    def write_one(state: PagedKVCacheState, inputs):
        pid, kp, vp = inputs
        kq, ks = quantize_page(kp)
        vq, vs = quantize_page(vp)
        return PagedKVCacheState(
            k_pages=state.k_pages.at[:, pid].set(kq),
            v_pages=state.v_pages.at[:, pid].set(vq),
            k_scales=state.k_scales.at[:, pid].set(ks),
            v_scales=state.v_scales.at[:, pid].set(vs),
        ), None

    state, _ = jax.lax.scan(write_one, state, (page_ids, kr, vr))
    return state


def append_tokens_batched(
    state: PagedKVCacheState,
    k_tok: jnp.ndarray,  # [B, num_kv_heads, head_dim]
    v_tok: jnp.ndarray,
    page_ids: jnp.ndarray,  # [B] i32 — physical page holding each slot
    slots: jnp.ndarray,  # [B] i32 — offset within each page
) -> PagedKVCacheState:
    """Append one decoded token per sequence into its page slot (one layer).

    Quantization policy — the SINGLE implementation (append_token and the
    engine's batched decode both route here): a token is quantized with
    the page's *existing* scale and clamped into its range (rewriting the
    whole page to grow the scale would cost a page of traffic per token);
    a page's scale is fitted by its first token (slot == 0) — fresh decode
    pages would otherwise quantize against the placeholder scale of 1.0.
    Decode-time K/V magnitudes are stationary in practice, so the clamp
    error stays at the int8 rounding floor — bounded and measured in tests.
    """
    kf = k_tok.astype(jnp.float32).transpose(1, 0, 2)  # [Hkv, B, hd]
    vf = v_tok.astype(jnp.float32).transpose(1, 0, 2)
    k_fit = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1), 1e-8) / 127.0  # [Hkv, B]
    v_fit = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1), 1e-8) / 127.0
    ks = jnp.where(slots[None, :] == 0, k_fit, state.k_scales[:, page_ids])
    vs = jnp.where(slots[None, :] == 0, v_fit, state.v_scales[:, page_ids])
    kq = jnp.clip(jnp.round(kf / ks[..., None]), -127, 127).astype(jnp.int8)
    vq = jnp.clip(jnp.round(vf / vs[..., None]), -127, 127).astype(jnp.int8)
    return PagedKVCacheState(
        k_pages=state.k_pages.at[:, page_ids, slots].set(kq),
        v_pages=state.v_pages.at[:, page_ids, slots].set(vq),
        k_scales=state.k_scales.at[:, page_ids].set(ks),
        v_scales=state.v_scales.at[:, page_ids].set(vs),
    )


def append_tokens_batched_at_layer(
    state: PagedKVCacheState,  # LAYER-STACKED leaves [L, ...]
    layer: jnp.ndarray,  # scalar i32 (traced)
    k_tok: jnp.ndarray,  # [B, num_kv_heads, head_dim]
    v_tok: jnp.ndarray,
    page_ids: jnp.ndarray,  # [B] i32
    slots: jnp.ndarray,  # [B] i32
) -> PagedKVCacheState:
    """append_tokens_batched against ONE layer of a layer-stacked cache,
    without slicing the layer out. Two different update disciplines, each
    forced by a measured failure mode:

    - PAGE PAYLOADS: a chain of per-lane single-index DUS ops. A batched
      `.at[layer, :, page_ids, slots].set(...)` scatter materializes the
      whole 5-D pool per layer inside the scan carry (run30: +26.5
      ms/step at 8B shape); write-only DUS chains alias in place.
    - SCALE TABLES: ONE masked plane read-modify-write + a single
      contiguous layer-plane DUS. The per-lane RMW chain (read old scale,
      pick, write back, x2B per layer) made XLA materialize full
      [L, Hkv, pages] plane copies — ~16 per layer-step, 7-9 ms/step at
      batch 32, in every layout tried (run48/48b traces).

    Same quantization policy as append_tokens_batched (page scale fitted
    by slot 0, later tokens clamped into it), bit-identical to the old
    per-lane chain (run53b chip bisect)."""
    B, hkv, hd = k_tok.shape
    kf = k_tok.astype(jnp.float32)  # [B, Hkv, hd]
    vf = v_tok.astype(jnp.float32)
    k_fit = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1), 1e-8) / 127.0  # [B, Hkv]
    v_fit = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1), 1e-8) / 127.0
    kp, vp, kssa, vssa = (state.k_pages, state.v_pages,
                          state.k_scales, state.v_scales)
    layer = jnp.asarray(layer, jnp.int32)
    zero = jnp.int32(0)
    # Scales may arrive PRE-COLUMNED [L, Hkv, pages, 1] (decode_loop's
    # carry layout — run33) as well as raw [L, Hkv, pages]; handle both.
    # (The head-folded kernel's rowed layout never reaches appends: the
    # serving carry stays columned and per-layer rowed VIEWS are derived
    # in body_stacked — run48.)
    cols = kssa.ndim == 4

    # --- scale planes: ONE read-modify-write per layer (see docstring).
    # Page ids are distinct across ACTIVE lanes (one sequence per lane),
    # so the whole batch's updates compose into one masked plane update,
    # written back with a single contiguous layer-plane DUS that XLA
    # aliases in place.
    num_pages = kssa.shape[2]
    onehot = (jnp.arange(num_pages, dtype=jnp.int32)[None, :]
              == page_ids[:, None]).astype(jnp.float32)  # [B, P]
    w = onehot * (slots == 0)[:, None].astype(jnp.float32)
    # Page ids are distinct across ACTIVE lanes; the engine's scrap page
    # may be shared by several drained lanes, so clamp the mask — the
    # scrap page then holds a finite sum of fits (never read through a
    # clamped block table, same dont-care contract as the old last-lane-
    # wins behavior).
    mask = jnp.minimum(jnp.sum(w, axis=0), 1.0)  # [P] — refitted pages
    plane_sizes = ((1, hkv, num_pages, 1) if cols
                   else (1, hkv, num_pages))
    plane_idx = ((layer, zero, zero, zero) if cols
                 else (layer, zero, zero))

    # Which lane refits each page (all-zero columns select lane 0 — their
    # mask is 0, so the value is never used). GATHERS, not one-hot
    # matmuls: an MXU dot under the int8 paths' DEFAULT precision rounds
    # f32 through bf16 passes, which would round every stored SCALE and
    # break bit-parity with the per-lane append paths (run17-r5 caught
    # exactly this); gathers are exact.
    sel = jnp.argmax(w, axis=0)  # [P] i32

    def plane_update(ssa, fit):
        old = jax.lax.dynamic_slice(ssa, plane_idx, plane_sizes)
        old_hp = old.reshape(hkv, num_pages)  # [Hkv, P]
        fit_plane = jnp.take(fit.T, sel, axis=1)  # [Hkv, P]
        new_hp = jnp.where(mask > 0.0, fit_plane, old_hp)
        # Per-lane scales actually used for quantization: gather each
        # lane's pid column.
        used = jnp.take(new_hp, page_ids, axis=1)  # [Hkv, B]
        new = new_hp.reshape(plane_sizes)
        return jax.lax.dynamic_update_slice(ssa, new, plane_idx), used

    kssa, ks_used = plane_update(kssa, k_fit)
    vssa, vs_used = plane_update(vssa, v_fit)

    for b in range(B):  # B is static; each DUS consumes the previous.
        # The page-payload appends stay a chain of per-lane single-index
        # DUS ops — the batched `.at[layer, :, page_ids, slots]` scatter
        # form materializes the whole 5-D pool per layer (run30: +26.5
        # ms/step at 8B shape).
        pid, slot = page_ids[b], slots[b]
        kq = jnp.clip(jnp.round(kf[b] / ks_used[:, b][:, None]),
                      -127, 127).astype(jnp.int8)
        vq = jnp.clip(jnp.round(vf[b] / vs_used[:, b][:, None]),
                      -127, 127).astype(jnp.int8)
        idx = (layer, zero, pid, slot, zero)
        kp = jax.lax.dynamic_update_slice(kp, kq[None, :, None, None, :], idx)
        vp = jax.lax.dynamic_update_slice(vp, vq[None, :, None, None, :], idx)
    return PagedKVCacheState(k_pages=kp, v_pages=vp,
                             k_scales=kssa, v_scales=vssa)


def append_token(
    state: PagedKVCacheState,
    k_tok: jnp.ndarray,  # [num_kv_heads, head_dim]
    v_tok: jnp.ndarray,
    page_id: jnp.ndarray,  # scalar i32
    slot: jnp.ndarray,  # scalar i32
) -> PagedKVCacheState:
    """Single-token form of append_tokens_batched (B = 1)."""
    return append_tokens_batched(
        state, k_tok[None], v_tok[None],
        jnp.asarray(page_id, jnp.int32)[None],
        jnp.asarray(slot, jnp.int32)[None],
    )


class PageAllocator:
    """Host-side physical page free-list + per-sequence block tables.

    The scheduler's bookkeeping: O(1) allocate/free, no device interaction.
    """

    def __init__(self, num_pages: int, page_size: int,
                 scrap_page: Optional[int] = None):
        """scrap_page: a page PERMANENTLY reserved as the harmless DMA
        target for padded batch lanes and window-trimmed table slots. It is
        never allocated, never freed, and block_table_array maps trimmed
        (None) slots to it — first-class here rather than a convention
        enforced by callers reaching into _free (round-1 advisor finding).
        """
        self.num_pages = num_pages
        self.page_size = page_size
        self.scrap_page = scrap_page
        self._free: List[int] = [
            p for p in range(num_pages - 1, -1, -1) if p != scrap_page
        ]
        self.tables: Dict[int, List[int]] = {}
        self.lengths: Dict[int, int] = {}
        # Prefix-cache support: pages referenced by >1 sequence carry a
        # refcount; a page returns to the free list only when the LAST
        # reference drops. on_free (if set) fires then — the engine uses it
        # to invalidate its prefix-hash map before the id is reused.
        self._ref: Dict[int, int] = {}
        self.on_free = None

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def _release_page(self, page: int) -> None:
        r = self._ref.get(page, 1) - 1
        if r <= 0:
            self._ref.pop(page, None)
            if self.on_free is not None:
                self.on_free(page)
            self._free.append(page)
        else:
            self._ref[page] = r

    def share(self, pages: List[Optional[int]]) -> None:
        """Add a reference to already-allocated pages (prefix reuse).
        `None` entries (scrap slots for positions wholly behind a sliding
        window) carry no storage and are skipped."""
        for p in pages:
            if p is not None:
                self._ref[p] = self._ref.get(p, 1) + 1

    def admit_with_prefix(self, seq_id: int, n_tokens: int,
                          shared_pages: List[Optional[int]]) -> List[int]:
        """Admit with the first len(shared_pages) table SLOTS reused from
        another sequence (caller bumps refcounts via share() — this method
        does); only the remainder is freshly allocated. `None` entries are
        window-trimmed placeholder slots (hybrid prefix reuse): they keep
        the table position-indexed but reference no page — block tables map
        them to the scrap page, and the window mask keeps them unread.
        Returns the fresh pages."""
        need = self.pages_needed(n_tokens) - len(shared_pages)
        if need < 0:
            raise ValueError("shared prefix longer than the prompt")
        if need > self.free_pages:
            raise RuntimeError(
                f"out of pages: need {need}, have {self.free_pages}")
        self.share(shared_pages)
        fresh = [self._free.pop() for _ in range(need)]
        self.tables[seq_id] = list(shared_pages) + fresh
        self.lengths[seq_id] = n_tokens
        return fresh

    def pages_needed(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    def can_admit(self, n_tokens: int) -> bool:
        return self.free_pages >= self.pages_needed(n_tokens)

    def admit(self, seq_id: int, n_tokens: int) -> List[int]:
        need = self.pages_needed(n_tokens)
        if need > self.free_pages:
            raise RuntimeError(f"out of pages: need {need}, have {self.free_pages}")
        pages = [self._free.pop() for _ in range(need)]
        self.tables[seq_id] = pages
        self.lengths[seq_id] = n_tokens
        return pages

    def extend(self, seq_id: int) -> Tuple[int, int, Optional[int]]:
        """Account one more token; returns (page_id, slot, newly_allocated)."""
        n = self.lengths[seq_id]
        table = self.tables[seq_id]
        slot = n % self.page_size
        new_page = None
        if slot == 0 and n // self.page_size == len(table):
            if not self._free:
                raise RuntimeError("out of pages during decode")
            new_page = self._free.pop()
            table.append(new_page)
        self.lengths[seq_id] = n + 1
        return table[n // self.page_size], slot, new_page

    def rollback(self, seq_id: int, new_len: int) -> None:
        """Rewind a sequence to `new_len` tokens, freeing pages past the new
        end. Slots between new_len and the old length keep stale K/V on
        device — harmless, because slots are position-indexed and will be
        overwritten before they are ever read (speculative decoding rejects
        drafted tokens this way)."""
        old = self.lengths[seq_id]
        if not 0 <= new_len <= old:
            raise ValueError(f"rollback to {new_len} outside [0, {old}]")
        table = self.tables[seq_id]
        keep = self.pages_needed(new_len)
        while len(table) > max(keep, 1):
            page = table.pop()
            if page is None:  # not assert: must survive python -O
                raise RuntimeError(
                    "rollback reached a window-trimmed page: trim_window "
                    "must only run after speculative commits")
            self._release_page(page)
        self.lengths[seq_id] = new_len

    def trim_window(self, seq_id: int, window: int, sinks: int = 0) -> int:
        """Rolling-window page recycling: free pages whose positions are
        wholly behind the sliding window (and hold no attention-sink
        positions). Trimmed logical slots keep a placeholder (`None`, mapped
        to `scrap_page` in block tables) so tables stay position-indexed —
        the decode/prefill kernels' window mask never *consumes* those
        pages, only the masked-out DMA touches the scrap page. Caps a
        sequence's live pages at O(window + sinks). Returns #pages freed.

        Call AFTER any speculative rollback commits: trimming uses the
        current length, and rolling back past a trimmed page would
        resurrect positions whose K/V is gone."""
        n = self.lengths[seq_id]
        first_needed = max(n - window, 0)
        first_block = first_needed // self.page_size
        sink_blocks = -(-sinks // self.page_size) if sinks else 0
        table = self.tables[seq_id]
        freed = 0
        for i in range(sink_blocks, min(first_block, len(table))):
            if table[i] is not None:
                self._release_page(table[i])
                table[i] = None
                freed += 1
        return freed

    def release(self, seq_id: int) -> None:
        for p in reversed(self.tables.pop(seq_id)):
            if p is not None:
                self._release_page(p)
        self.lengths.pop(seq_id)

    def block_table_array(self, seq_ids: List[int], max_pages: int) -> np.ndarray:
        scrap = self.scrap_page if self.scrap_page is not None else 0
        out = np.full((len(seq_ids), max_pages), scrap, np.int32)
        for row, sid in enumerate(seq_ids):
            t = self.tables[sid]
            out[row, : len(t)] = [scrap if p is None else p for p in t]
        return out

    def lengths_array(self, seq_ids: List[int]) -> np.ndarray:
        return np.asarray([self.lengths[s] for s in seq_ids], np.int32)


class MixedPageAllocator:
    """Host bookkeeping for the mixed (INT8-sink / INT4-bulk) cache: one
    PageAllocator per pool with a page-aligned position boundary. A
    sequence's logical page i lives in the int8 pool for
    i < boundary_pages and in the int4 pool at slot i - boundary_pages
    past it; both pools reserve page 0 as scrap. Per-sequence capacity is
    boundary_tokens + max_pages_per_seq * page_size (the int4 table is
    the growth frame; the int8 table is exactly boundary_pages wide)."""

    def __init__(self, pages8: int, pages4: int, page_size: int,
                 boundary_tokens: int):
        if boundary_tokens % page_size:
            raise ValueError(
                f"boundary_tokens {boundary_tokens} not a multiple of "
                f"page_size {page_size}")
        if boundary_tokens <= 0:
            raise ValueError("boundary_tokens must be positive (pure-int4 "
                             "serving is paged_decode_attention_int4; the "
                             "mixed mode exists for the int8 sink region)")
        self.page_size = page_size
        self.boundary = boundary_tokens
        self.bp = boundary_tokens // page_size
        self.a8 = PageAllocator(pages8, page_size, scrap_page=0)
        self.a4 = PageAllocator(pages4, page_size, scrap_page=0)
        self.lengths: Dict[int, int] = {}
        self.scrap_page = 0

    @property
    def free_pages(self) -> int:
        return self.a4.free_pages  # the growth pool (metrics surface)

    @property
    def tables(self) -> Dict[int, list]:
        """Unified logical view (int8 slots then int4 slots) — for len()
        style bookkeeping; physical ids are per-pool, use the sub-
        allocators' tables to resolve them."""
        return {rid: self.a8.tables[rid] + self.a4.tables[rid]
                for rid in self.lengths}

    def pages_needed(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    def _split(self, n_tokens: int) -> Tuple[int, int]:
        return min(n_tokens, self.boundary), max(n_tokens - self.boundary, 0)

    def can_admit(self, n_tokens: int) -> bool:
        n8, n4 = self._split(n_tokens)
        return self.a8.can_admit(n8) and self.a4.can_admit(n4)

    def admit(self, seq_id: int, n_tokens: int) -> Tuple[list, list]:
        n8, n4 = self._split(n_tokens)
        if not self.can_admit(n_tokens):
            raise RuntimeError(
                f"out of pages admitting {n_tokens} tokens "
                f"(int8 free {self.a8.free_pages}, int4 free "
                f"{self.a4.free_pages})")
        p8 = self.a8.admit(seq_id, n8)
        p4 = self.a4.admit(seq_id, n4)  # n4 == 0 -> empty table, kept
        self.lengths[seq_id] = n_tokens
        return p8, p4

    def extend(self, seq_id: int) -> Tuple[int, int, int, bool]:
        """Account one more token. Returns (pid8, pid4, slot, below): the
        owning pool's physical page plus the OTHER pool's scrap page —
        exactly what the shape-stable batched mixed append consumes."""
        n = self.lengths[seq_id]
        below = n < self.boundary
        if below:
            pid, slot, _ = self.a8.extend(seq_id)
            out = (pid, self.a4.scrap_page, slot, True)
        else:
            pid, slot, _ = self.a4.extend(seq_id)
            out = (self.a8.scrap_page, pid, slot, False)
        self.lengths[seq_id] = n + 1
        return out

    def rollback(self, seq_id: int, new_len: int) -> None:
        n8, n4 = self._split(new_len)
        self.a8.rollback(seq_id, n8)
        self.a4.rollback(seq_id, n4)
        self.lengths[seq_id] = new_len

    def trim_window(self, seq_id: int, window: int, sinks: int = 0) -> int:
        """Windowed mixed serving requires sinks == boundary (the int8
        pool IS the always-visible sink region — engine validates), so
        only the int4 bulk ever trims, in its own frame: local length =
        n - boundary, so `local - window` lands exactly at the absolute
        `n - window` cut."""
        return self.a4.trim_window(seq_id, window, 0)

    def release(self, seq_id: int) -> None:
        self.a8.release(seq_id)
        self.a4.release(seq_id)
        self.lengths.pop(seq_id)

    def block_tables(self, seq_ids: List[int], max_pages4: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """([B, boundary_pages] int8 table, [B, max_pages4] int4 table)."""
        return (self.a8.block_table_array(seq_ids, self.bp),
                self.a4.block_table_array(seq_ids, max_pages4))

    def lengths_array(self, seq_ids: List[int]) -> np.ndarray:
        return np.asarray([self.lengths[s] for s in seq_ids], np.int32)

    def check_extend_headroom(self, seq_ids: List[int], n_tokens: int,
                              max_pages_per_seq: int) -> None:
        """Per-pool headroom BEFORE mutating (the engine's atomic-error
        contract): int4 table bound AND both free lists."""
        ps = self.page_size
        need8 = need4 = 0
        for sid in seq_ids:
            n = self.lengths[sid] + n_tokens
            n8, n4 = self._split(n)
            p4_after = -(-n4 // ps)
            if p4_after > max_pages_per_seq:
                raise RuntimeError(
                    f"seq {sid}: extending by {n_tokens} token(s) needs "
                    f"{p4_after} int4 pages > max_pages_per_seq "
                    f"({max_pages_per_seq})")
            need8 += max(0, -(-n8 // ps) - len(self.a8.tables[sid]))
            need4 += max(0, p4_after - len(self.a4.tables[sid]))
        if need8 > self.a8.free_pages or need4 > self.a4.free_pages:
            raise RuntimeError(
                f"page pool exhausted: +{n_tokens} token(s) for "
                f"{len(seq_ids)} sequences needs int8 {need8} "
                f"(free {self.a8.free_pages}) / int4 {need4} "
                f"(free {self.a4.free_pages}). Raise int8_pages/int4_pages "
                "or lower max_batch/max_new_tokens.")
