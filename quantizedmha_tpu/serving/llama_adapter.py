"""Llama model adapter for the serving engine: prefill + paged decode.

Splits the model forward (models/llama.py) into the two serving phases:
  - prefill: full causal flash attention over the prompt; emits the
    per-layer K/V (post-RoPE) for cache insertion plus last-token logits.
  - decode_step: one token per sequence; projects q/k/v, RoPE at the
    absolute position, appends K/V to the paged INT8 cache, and attends
    with ops.decode.paged_decode_attention.

Both are pure functions of (params, state) — jit once per shape bucket.

Tensor parallelism: every function takes an optional `axis_name`. When set,
the function is being called inside `shard_map` with Megatron-style sharded
weights (wq/wk/wv/w_gate/w_up column-sharded over heads, wo/w_down
row-sharded) and a kv-head-sharded cache; the partial attention and MLP
projections are `psum`-reduced over that axis before the residual add —
the only two collectives a TP decoder layer needs. Pass the LOCAL config
(num_heads and num_kv_heads divided by the axis size); see
quantizedmha_tpu.serving.sharded for the wrapper that sets all this up.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from quantizedmha_tpu.models.llama import (
    LlamaConfig,
    _act,
    _attention,
    _pattern_period,
    _pattern_runs,
    embed_tokens,
    final_logits,
    mlp_gate_up,
    qkv_triple,
    rms_norm,
    scan_layers,
)
from quantizedmha_tpu.quant.weights import (
    LayerIndexed4,
    QuantizedWeight4,
    qdense,
)
from quantizedmha_tpu.ops.decode import paged_decode_attention
from quantizedmha_tpu.reference.mha import apply_rope
from quantizedmha_tpu.serving.kv_cache import (
    PagedKVCacheState,
    append_tokens_batched as _append_batch,
    append_tokens_batched_at_layer as _append_batch_at,
    write_pages,
)


# Measurement escape hatches (scripts/run30, run34): STACKED_CARRY=False
# routes plain-cache decode_step back through the xs/ys layer scan
# (per-layer pool slice + re-stack); PRECOLUMN_SCALES=False re-materializes
# the kernel's scale-column layout per layer instead of once per chunk.
# Both exist for same-process A/Bs on the chip.
STACKED_CARRY = True
PRECOLUMN_SCALES = True
# Head-folded paged decode attention (ops.decode fold_kv_heads): one
# strided DMA per page fetches ALL kv heads; run44 measured 26.6 vs 66.4
# us/layer at batch 8 and 96 vs 257 at batch 32. The kernel's ROWED
# scale view ([pages, Hkv]) is derived PER LAYER from the columned carry
# inside body_stacked — carrying the whole stack rowed made every
# append's DUS materialize a full-plane copy (run48: 7.3 ms/step at
# b32). False restores the (batch, kv_head, page) grid for A/Bs.
FOLD_KV_HEADS = True


def ensure_serving_supported(cfg: LlamaConfig) -> None:
    """Serving supports the full family surface (per-layer windows,
    sandwich norms, GeGLU, softcaps, Gemma scalings) — this validates the
    knob VALUES early so a typo'd hidden_act fails at cache creation, not
    mid-trace."""
    _act(cfg, jnp.zeros((1,), jnp.float32))  # raises on unknown hidden_act
    cfg.layer_windows  # raises on a mis-sized window_pattern


def _attn_residual(cfg: LlamaConfig, dense, p, x, o_flat, reduce_tp):
    """x + [post-norm](psum(wo @ o)) — the TP psum must precede the Gemma-2
    post-attention norm (the norm needs the full row sum)."""
    o = reduce_tp(dense(o_flat.astype(cfg.dtype), p["wo"]))
    if cfg.sandwich_norms:
        o = rms_norm(o, p["post_attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
    return x + o


def _mlp_residual(cfg: LlamaConfig, dense, p, x, reduce_tp):
    h = rms_norm(x, p["mlp_norm"], cfg.rms_eps, cfg.rms_plus_one)
    g_pre, up = mlp_gate_up(cfg, dense, h, p)
    gate = _act(cfg, g_pre.astype(jnp.float32)).astype(x.dtype)
    m = reduce_tp(dense(gate * up, p["w_down"]))
    if cfg.sandwich_norms:
        m = rms_norm(m, p["post_mlp_norm"], cfg.rms_eps, cfg.rms_plus_one)
    return x + m


def make_cache(cfg: LlamaConfig, num_pages: int, page_size: int) -> PagedKVCacheState:
    """Layer-stacked cache: every array has a leading num_layers dim."""
    ensure_serving_supported(cfg)
    one = PagedKVCacheState.create(cfg.num_kv_heads, num_pages, page_size, cfg.hd)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (cfg.num_layers, *x.shape)).copy(), one
    )


# --- Hybrid (grouped) KV cache -------------------------------------------
#
# A per-layer window pattern splits the layers into GROUPS by window value.
# With the single layer-stacked cache, every group shares one physical page
# pool, so a sequence's KV memory is O(context) in EVERY layer even though
# its sliding layers only ever read the last `window` positions. Grouped
# caches give each window group its OWN page pool + block tables: the
# engine recycles the sliding groups' pages behind the window while the
# full-attention groups keep theirs — per-sequence KV memory becomes
# L_full*O(context) + L_slide*O(window + sinks) (Gemma-2-9B at 32K: ~44 %
# of the un-grouped footprint). Group keys are STRINGS ("full", "w4096"):
# jax sorts dict pytree keys and None/int don't compare.

def group_key(window: Optional[int]) -> str:
    return "full" if window is None else f"w{window}"


def window_groups(cfg: LlamaConfig) -> Dict[str, list]:
    """Group layout: key -> ascending global layer indices with that window."""
    groups: Dict[str, list] = {}
    for i, w in enumerate(cfg.layer_windows):
        groups.setdefault(group_key(w), []).append(i)
    return groups


def make_cache_hybrid(cfg: LlamaConfig, pages_by_group: Dict[str, int],
                      page_size: int) -> Dict[str, PagedKVCacheState]:
    """One layer-stacked cache PER window group (leading dim = the group's
    layer count, stacked in ascending global layer order)."""
    ensure_serving_supported(cfg)
    groups = window_groups(cfg)
    missing = set(groups) - set(pages_by_group)
    if missing:
        raise ValueError(f"pages_by_group missing groups {sorted(missing)}")
    out = {}
    for key, idxs in groups.items():
        one = PagedKVCacheState.create(
            cfg.num_kv_heads, pages_by_group[key], page_size, cfg.hd)
        out[key] = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (len(idxs), *x.shape)).copy(), one)
    return out


def _g(d, window):
    """Resolve a maybe-grouped argument: dict -> the window group's entry,
    anything else -> shared across groups."""
    return d[group_key(window)] if isinstance(d, dict) else d


def make_cache_hybrid_mixed(cfg: LlamaConfig, pages_by_group: Dict[str, int],
                            page_size: int, *, n8_pages: int, n4_pages: int,
                            subs: int = 4) -> Dict[str, Any]:
    """Hybrid caches where the FULL-ATTENTION group is mixed-precision
    (int8 sinks + int4 bulk) and sliding groups stay plain int8.

    The composition targets Gemma-2-class patterns at long context: the
    full layers are the unbounded KV tenant (sliding layers cap at
    O(window + sinks) via trims), so the int4 capacity lever applies
    exactly where it pays; a sliding group's fixed-size pool gains little
    and would re-open the windowed-mixed sinks==boundary constraint."""
    from quantizedmha_tpu.serving.mixed_kv import MixedPagedKVState

    ensure_serving_supported(cfg)
    groups = window_groups(cfg)
    if "full" not in groups:
        raise ValueError(
            "mixed_kv x hybrid_kv puts the int8/int4 split on the "
            "full-attention group; this window pattern has none "
            f"(groups: {sorted(groups)})")
    missing = set(groups) - set(pages_by_group) - {"full"}
    if missing:
        raise ValueError(f"pages_by_group missing groups {sorted(missing)}")
    out = {}
    for key, idxs in groups.items():
        if key == "full":
            one = MixedPagedKVState.create(
                cfg.num_kv_heads, n8_pages, n4_pages, page_size, cfg.hd,
                subs)
        else:
            one = PagedKVCacheState.create(
                cfg.num_kv_heads, pages_by_group[key], page_size, cfg.hd)
        out[key] = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (len(idxs), *x.shape)).copy(), one)
    return out


def scan_layers_caches(windows: Tuple, body, x, layers, caches: Dict[str, Any]):
    """scan_layers for grouped caches: `body(x, layer_slice, cache_slice,
    window) -> (x, new_cache_slice)` where cache_slice comes from the
    layer's OWN group stack. Same three-way decomposition as
    models.llama.scan_layers (each kernel call keeps a STATIC window);
    returns (x, new caches dict) with every group re-stacked in ascending
    global layer order."""
    L = len(windows)
    distinct = {group_key(w): w for w in windows}
    if len(distinct) == 1:
        (key, w0), = distinct.items()
        x, new = jax.lax.scan(
            lambda x, s: body(x, s[0], s[1], w0), x, (layers, caches[key]))
        return x, {key: new}
    period = _pattern_period(windows)
    if period <= 4:
        per = windows[:period]
        cnt = {group_key(w): sum(1 for u in per if u == w) for w in set(per)}
        rank, seen = [], {}
        for w in per:
            k = group_key(w)
            rank.append(seen.get(k, 0))
            seen[k] = seen.get(k, 0) + 1
        n_chunks = L // period
        layers_c = jax.tree.map(
            lambda a: a.reshape(n_chunks, period, *a.shape[1:]), layers)
        caches_c = {
            k: jax.tree.map(
                lambda a: a.reshape(n_chunks, cnt[k], *a.shape[1:]), caches[k])
            for k in caches}

        def chunk_body(x, scanned):
            lc, cc = scanned
            outs = {k: [None] * cnt[k] for k in cc}
            for i in range(period):
                w = per[i]
                k = group_key(w)
                p = jax.tree.map(lambda a: a[i], lc)
                c = jax.tree.map(lambda a: a[rank[i]], cc[k])
                x, cnew = body(x, p, c, w)
                outs[k][rank[i]] = cnew
            ys = {k: jax.tree.map(lambda *zs: jnp.stack(zs), *outs[k])
                  for k in outs}
            return x, ys

        x, ys = jax.lax.scan(chunk_body, x, (layers_c, caches_c))
        return x, {
            k: jax.tree.map(
                lambda a: a.reshape(n_chunks * cnt[k], *a.shape[2:]), ys[k])
            for k in ys}
    cursor = {k: 0 for k in caches}
    parts: Dict[str, list] = {k: [] for k in caches}
    start = 0
    for win, n_run in _pattern_runs(windows):
        k = group_key(win)
        lsub = jax.tree.map(lambda a: a[start:start + n_run], layers)
        csub = jax.tree.map(
            lambda a: a[cursor[k]:cursor[k] + n_run], caches[k])
        x, y = jax.lax.scan(
            lambda x, s, w=win: body(x, s[0], s[1], w), x, (lsub, csub))
        parts[k].append(y)
        cursor[k] += n_run
        start += n_run
    return x, {k: jax.tree.map(lambda *zs: jnp.concatenate(zs), *parts[k])
               for k in parts}


def _psum_or_id(axis_name: Optional[str]):
    if axis_name is None:
        return lambda x: x
    return lambda x: jax.lax.psum(x, axis_name)


def prefill_at(cfg: LlamaConfig, params: Dict[str, Any], tokens: jnp.ndarray,
               last_index: jnp.ndarray, axis_name: Optional[str] = None):
    """Prefill over a (possibly right-padded) prompt.

    tokens: [1, n_pad]; last_index: scalar i32 of the final *real* token
    (causal attention makes its logits independent of the padding).
    Returns (logits [1, vocab], k_all, v_all [L, Hkv, n_pad, hd], post-RoPE).
    """
    return _prefill_all(cfg, params, tokens, last_index, axis_name)


def prefill(cfg: LlamaConfig, params: Dict[str, Any], tokens: jnp.ndarray,
            axis_name: Optional[str] = None):
    """tokens: [1, n] -> (last_logits [1, vocab], k_all, v_all [L, Hkv, n, hd])."""
    return _prefill_all(cfg, params, tokens, tokens.shape[1] - 1, axis_name)


def _prefill_all(cfg: LlamaConfig, params: Dict[str, Any], tokens: jnp.ndarray,
                 last_index, axis_name: Optional[str] = None):
    b, n = tokens.shape
    hd = cfg.hd
    reduce_tp = _psum_or_id(axis_name)
    dense = functools.partial(qdense, mode=cfg.weight_quant_mode)
    x = embed_tokens(cfg, params, tokens)

    def body(x, p, window):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
        q, k, v = qkv_triple(cfg, dense, h, p)
        q = q.reshape(b, n, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cfg.rope_theta)
        k = apply_rope(k, cfg.rope_theta)
        kv_k, kv_v = k, v  # cached post-RoPE
        o = _attention(cfg, q, k, v, causal=True, window=window)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
        x = _mlp_residual(cfg, dense, p, x, reduce_tp)
        return x, (kv_k[0], kv_v[0])

    x, (k_all, v_all) = scan_layers(cfg.layer_windows, body, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    # Project ONLY the requested position: the full [bucket, vocab] logits
    # would be an extra ~2 TFLOP matmul + ~1 GiB buffer per prefill at
    # Llama-3-8B scale, all discarded but one row.
    logits = final_logits(cfg, x[:, last_index], params["lm_head"])
    return logits, k_all, v_all


def prefill_cp_at(cfg: LlamaConfig, params: Dict[str, Any],
                  tokens: jnp.ndarray, last_index, *, axis_name: str):
    """Context-parallel prefill body — call INSIDE shard_map with `tokens`
    sharded on the sequence axis ([1, n // n_dev] per device) and params
    replicated. Long prompts are the one serving phase whose working set
    (activations + per-layer K/V) outgrows a chip before the weights do;
    CP shards the sequence and runs RING attention per layer
    (parallel/ring.ring_attention: KV shards rotate via ppermute, overlap
    with the per-block online softmax — the north star's "ring-allgather
    of K/V tiles overlapped with per-block softmax", BASELINE.json; no
    reference analog, /root/reference/drivers/main.cu is single-GPU).

    Per device: embeddings/norms/projections/MLP are local (replicated
    weights, sequence-sharded activations — no collectives), RoPE uses
    GLOBAL positions, attention is the ring, and the last-token hidden
    state is psum-gathered from its owner shard so every device computes
    identical logits. Returns (logits [1, vocab], k/v [L, Hkv, n_shard,
    hd] — sequence-sharded; shard_map out_specs reassemble the full
    cache-insertion arrays).
    """
    from quantizedmha_tpu.parallel.ring import ring_attention

    b, n_shard = tokens.shape
    hd = cfg.hd
    dense = functools.partial(qdense, mode=cfg.weight_quant_mode)
    idx = jax.lax.axis_index(axis_name)
    positions = (idx * n_shard
                 + jnp.arange(n_shard, dtype=jnp.int32))[None, :]  # [1, S]
    x = embed_tokens(cfg, params, tokens)
    ident = _psum_or_id(None)

    def body(x, p, window):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
        q, k, v = qkv_triple(cfg, dense, h, p)
        q = q.reshape(b, n_shard, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n_shard, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n_shard, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        q = _rope_positions(q, positions, cfg.rope_theta)
        k = _rope_positions(k, positions, cfg.rope_theta)
        kv_k, kv_v = k, v  # cached post-RoPE, this device's shard
        o = ring_attention(
            q, k, v, axis_name=axis_name, causal=True,
            sm_scale=cfg.sm_scale, window=window,
            logit_softcap=cfg.logit_softcap,
            attention_sinks=cfg.attention_sinks if window is not None else 0,
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, n_shard, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, ident)
        x = _mlp_residual(cfg, dense, p, x, ident)
        return x, (kv_k[0], kv_v[0])

    x, (k_all, v_all) = scan_layers(cfg.layer_windows, body, x,
                                    params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    # Gather the last REAL token's hidden state from its owner shard (the
    # logits then replicate: same weights, same x_last everywhere).
    last_index = jnp.asarray(last_index, jnp.int32)
    owner = last_index // n_shard
    lx = last_index % n_shard
    x_here = jax.lax.dynamic_index_in_dim(x, lx, axis=1, keepdims=False)
    x_last = jax.lax.psum(
        jnp.where(idx == owner, x_here, jnp.zeros_like(x_here)), axis_name)
    logits = final_logits(cfg, x_last, params["lm_head"])
    return logits, k_all, v_all


def write_prefill(
    cfg: LlamaConfig,
    cache: PagedKVCacheState,  # layer-stacked
    k_all: jnp.ndarray,  # [L, Hkv, n_tokens, hd] (n_tokens multiple of page_size)
    v_all: jnp.ndarray,
    page_ids: jnp.ndarray,  # [n_pages] i32 — same physical ids for every layer
    *,
    page_size: int,
) -> PagedKVCacheState:
    """Quantize + scatter a prompt's K/V into the paged cache, all layers."""

    def body(_, scanned):
        cache_l, k_l, v_l = scanned
        return None, write_pages(cache_l, k_l, v_l, page_ids, page_size)

    _, cache = jax.lax.scan(body, None, (cache, k_all, v_all))
    return cache


def write_prefill_hybrid(
    cfg: LlamaConfig,
    caches: Dict[str, PagedKVCacheState],
    k_all: jnp.ndarray,  # [num_layers, Hkv, n_tokens, hd] — ALL layers
    v_all: jnp.ndarray,
    page_ids,            # Dict[str, [n_pages] i32] — per-group physical ids
    *,
    page_size: int,
) -> Dict[str, PagedKVCacheState]:
    """write_prefill into grouped caches: each group receives ITS layers'
    slice of the prompt K/V, scattered into its own page pool. A MIXED
    group (make_cache_hybrid_mixed) passes its page ids as an
    (ids8, ids4) tuple and writes through write_pages_mixed."""
    from quantizedmha_tpu.serving.mixed_kv import write_pages_mixed

    out = {}
    for key, idxs in window_groups(cfg).items():
        sel = jnp.asarray(idxs, jnp.int32)
        k_g = jnp.take(k_all, sel, axis=0)
        v_g = jnp.take(v_all, sel, axis=0)
        pg = page_ids[key]
        if isinstance(pg, tuple):
            ids8, ids4 = pg

            def body(_, scanned, ids8=ids8, ids4=ids4):
                cache_l, k_l, v_l = scanned
                return None, write_pages_mixed(cache_l, k_l, v_l, ids8, ids4)

            _, out[key] = jax.lax.scan(body, None, (caches[key], k_g, v_g))
        else:
            out[key] = write_prefill(
                cfg, caches[key], k_g, v_g, pg, page_size=page_size)
    return out


# --- Mixed-precision KV (int8 sinks + int4 bulk, serving.mixed_kv) -------
#
# The engine's third cache mode: positions < boundary_tokens live in an
# INT8 page pool, the rest nibble-packed INT4 — near-int8 accuracy where
# outliers concentrate at near-int4 capacity (run12/run13). The kernels
# merge the two partial softmaxes exactly by lse; these adapters wire the
# mode through bucketed prefill, chunked prefill and batched decode.
# Mixed mode requires a UNIFORM window pattern (the boundary split is
# orthogonal to windows; per-layer patterns would need grouped mixed
# pools — hybrid_kv x mixed is gated at the engine).

def ensure_mixed_supported(cfg: LlamaConfig) -> None:
    if len(set(cfg.layer_windows)) != 1:
        raise ValueError(
            "mixed KV needs a uniform window pattern (hybrid_kv covers "
            "per-layer patterns; their composition is not supported yet)")


def make_cache_mixed(cfg: LlamaConfig, n8_pages: int, n4_pages: int,
                     page_size: int, subs: int = 4):
    """Layer-stacked MixedPagedKVState (leading num_layers dim)."""
    from quantizedmha_tpu.serving.mixed_kv import MixedPagedKVState

    ensure_serving_supported(cfg)
    ensure_mixed_supported(cfg)
    one = MixedPagedKVState.create(
        cfg.num_kv_heads, n8_pages, n4_pages, page_size, cfg.hd, subs)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (cfg.num_layers, *x.shape)).copy(), one)


def write_prefill_mixed(
    cfg: LlamaConfig,
    cache,               # layer-stacked MixedPagedKVState
    k_all: jnp.ndarray,  # [L, Hkv, n_tokens, hd]
    v_all: jnp.ndarray,
    page_ids8: jnp.ndarray,  # [p8] i32 — the prompt's below-boundary pages
    page_ids4: jnp.ndarray,  # [p4] i32 — the rest (p8 + p4 pages total)
    *,
    page_size: int,
) -> Any:
    """write_prefill for the mixed cache: the static p8/p4 split is known
    at admission (bucket size and boundary are both static)."""
    from quantizedmha_tpu.serving.mixed_kv import write_pages_mixed

    def body(_, scanned):
        cache_l, k_l, v_l = scanned
        return None, write_pages_mixed(cache_l, k_l, v_l,
                                       page_ids8, page_ids4)

    _, cache = jax.lax.scan(body, None, (cache, k_all, v_all))
    return cache


def decode_step_mixed(
    cfg: LlamaConfig,
    params: Dict[str, Any],
    cache,                   # layer-stacked MixedPagedKVState
    tokens: jnp.ndarray,     # [B] i32
    positions: jnp.ndarray,  # [B] i32 — absolute position per lane
    page_ids8: jnp.ndarray,  # [B] i32 — int8 page owning the slot (or scrap)
    page_ids4: jnp.ndarray,  # [B] i32 — int4 page owning the slot (or scrap)
    slots: jnp.ndarray,      # [B] i32
    lengths: jnp.ndarray,    # [B] i32 — INCLUDING this token
    tables8: jnp.ndarray,    # [B, max_pages8] i32
    tables4: jnp.ndarray,    # [B, max_pages4] i32
    *,
    boundary_tokens: int,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Any]:
    """decode_step over the mixed cache: batched scrap-routed appends +
    the exact two-partial lse merge (mixed_paged_decode_attention)."""
    from quantizedmha_tpu.serving.mixed_kv import (
        append_tokens_batched_mixed, mixed_paged_decode_attention)

    ensure_mixed_supported(cfg)
    b = tokens.shape[0]
    hd = cfg.hd
    w = cfg.layer_windows[0]
    reduce_tp = _psum_or_id(axis_name)
    dense = functools.partial(qdense, mode=cfg.weight_quant_mode)
    x = embed_tokens(cfg, params, tokens)[:, None, :]  # [B, 1, hid]

    def body(x, p, cache_l):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
        q, k, v = qkv_triple(cfg, dense, h, p)
        q = q.reshape(b, cfg.num_heads, hd)
        k = k.reshape(b, cfg.num_kv_heads, hd)
        v = v.reshape(b, cfg.num_kv_heads, hd)
        q = _rope_single(q, positions, cfg.rope_theta)
        k = _rope_single(k, positions, cfg.rope_theta)
        cache_l = append_tokens_batched_mixed(
            cache_l, k, v, positions, boundary_tokens,
            page_ids8, page_ids4, slots)
        o = mixed_paged_decode_attention(
            q, cache_l, lengths, tables8, tables4, boundary_tokens,
            sm_scale=cfg.sm_scale, window=w,
            logit_softcap=cfg.logit_softcap,
            attention_sinks=cfg.attention_sinks if w is not None else 0,
        )
        o = o.reshape(b, 1, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
        x = _mlp_residual(cfg, dense, p, x, reduce_tp)
        return x, cache_l

    x, cache = jax.lax.scan(
        lambda x, s: body(x, s[0], s[1]), x, (params["layers"], cache))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    logits = final_logits(cfg, x[:, 0], params["lm_head"])
    return logits, cache


def prefill_chunk_mixed(
    cfg: LlamaConfig,
    params: Dict[str, Any],
    cache,                     # layer-stacked MixedPagedKVState
    tokens: jnp.ndarray,       # [1, C] i32 — one chunk, right-padded
    chunk_start: jnp.ndarray,  # scalar i32, multiple of page_size
    table8: jnp.ndarray,       # [max_pages8] i32
    table4: jnp.ndarray,       # [max_pages4] i32
    last_index: jnp.ndarray,   # scalar i32
    *,
    page_size: int,
    boundary_tokens: int,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Any]:
    """prefill_chunk over the mixed cache. The chunk's boundary crossing
    depends on the TRACED chunk_start, so page writes route per page
    (write_pages_mixed_routed) instead of a static split."""
    from quantizedmha_tpu.serving.mixed_kv import (
        mixed_paged_prefill_attention, write_pages_mixed_routed)

    ensure_mixed_supported(cfg)
    b, C = tokens.shape
    assert b == 1, "chunked prefill is per-sequence"
    hd = cfg.hd
    w = cfg.layer_windows[0]
    bp = boundary_tokens // page_size
    reduce_tp = _psum_or_id(axis_name)
    dense = functools.partial(qdense, mode=cfg.weight_quant_mode)

    positions = chunk_start + jnp.arange(C, dtype=jnp.int32)
    x = embed_tokens(cfg, params, tokens)

    n_pg = C // page_size
    ls = chunk_start // page_size + jnp.arange(n_pg, dtype=jnp.int32)
    below = ls < bp
    pid8 = table8[jnp.clip(ls, 0, table8.shape[0] - 1)]
    pid4 = table4[jnp.clip(ls - bp, 0, table4.shape[0] - 1)]

    def body(x, p, cache_l):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
        q, k, v = qkv_triple(cfg, dense, h, p)
        q = q.reshape(b, C, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, C, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, C, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cfg.rope_theta, positions)
        k = apply_rope(k, cfg.rope_theta, positions)
        keep = (jnp.arange(C) <= last_index)[None, :, None]
        cache_l = write_pages_mixed_routed(
            cache_l, k[0] * keep, v[0] * keep, below, pid8, pid4)
        o = mixed_paged_prefill_attention(
            q, cache_l,
            jnp.broadcast_to(jnp.asarray(chunk_start + C, jnp.int32), (1,)),
            jnp.broadcast_to(jnp.asarray(chunk_start, jnp.int32), (1,)),
            table8[None], table4[None], boundary_tokens,
            sm_scale=cfg.sm_scale,
            window=w, logit_softcap=cfg.logit_softcap,
            attention_sinks=cfg.attention_sinks if w is not None else 0,
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, C, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
        x = _mlp_residual(cfg, dense, p, x, reduce_tp)
        return x, cache_l

    x, cache = jax.lax.scan(
        lambda x, s: body(x, s[0], s[1]), x, (params["layers"], cache))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    logits = final_logits(cfg, x[0, last_index], params["lm_head"])
    return logits[None], cache


def decode_loop_mixed(
    cfg: LlamaConfig,
    params: Dict[str, Any],
    cache,                   # layer-stacked MixedPagedKVState
    tokens: jnp.ndarray,     # [B] i32 — pending tokens
    lengths: jnp.ndarray,    # [B] i32 — context EXCLUDING the pending token
    tables8: jnp.ndarray,    # [B, boundary_pages] i32
    tables4: jnp.ndarray,    # [B, max_pages4] i32 — covers lengths + n_steps
    key: Optional[jnp.ndarray] = None,
    *,
    n_steps: int,
    page_size: int,
    boundary_tokens: int,
    sampling=None,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Any]:
    """decode_loop over the mixed cache: per-step pool routing stays
    in-scan (below = position < boundary picks which table feeds the
    append; the other pool rides its scrap page), so the fused
    multi-token loop crosses the int8/int4 boundary mid-chunk without a
    host round-trip."""
    from quantizedmha_tpu.serving.sampling import SamplingParams, sample

    sampling = sampling or SamplingParams()
    if key is None:
        key = jax.random.PRNGKey(sampling.seed)

    def take(t, idx):
        idx = jnp.clip(idx, 0, t.shape[1] - 1)
        return jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0]

    def body(carry, _):
        cache, toks, lens, key = carry
        pos = lens
        below = pos < boundary_tokens
        pid8 = jnp.where(below, take(tables8, pos // page_size), 0)
        pid4 = jnp.where(
            below, 0, take(tables4, (pos - boundary_tokens) // page_size))
        slots = pos % page_size
        logits, cache = decode_step_mixed(
            cfg, params, cache, toks, pos, pid8, pid4, slots, lens + 1,
            tables8, tables4, boundary_tokens=boundary_tokens,
            axis_name=axis_name,
        )
        key, sub = jax.random.split(key)
        nxt = sample(logits, sub, sampling)
        return (cache, nxt, lens + 1, key), nxt

    (cache, _, _, _), out = jax.lax.scan(
        body, (cache, tokens, lengths, key), None, length=n_steps
    )
    return out, cache


def prefill_chunk(
    cfg: LlamaConfig,
    params: Dict[str, Any],
    cache: PagedKVCacheState,  # layer-stacked
    tokens: jnp.ndarray,       # [1, C] i32 — one chunk, right-padded
    chunk_start: jnp.ndarray,  # scalar i32, multiple of page_size
    table: jnp.ndarray,        # [max_pages] i32 — this sequence's block table
    last_index: jnp.ndarray,   # scalar i32 — last REAL token index within chunk
    *,
    page_size: int,
    axis_name: Optional[str] = None,
    boundary_tokens: Optional[int] = None,
) -> Tuple[jnp.ndarray, PagedKVCacheState]:
    """One chunk of a chunked prefill (prompts longer than the largest
    bucket): per layer, project/RoPE the chunk, WRITE its K/V into the paged
    INT8 cache, then attend the chunk's queries against the whole prefix
    gathered from the cache — the chunk's own keys included, causally masked
    by global offsets (the kernel's traced q_offset). Self-attention within
    the prompt thus runs over INT8 K/V, the same error budget as decode.

    Returns (logits [1, vocab] at `last_index`, updated cache).
    """
    from quantizedmha_tpu.ops.paged_prefill import paged_prefill_attention

    b, C = tokens.shape
    assert b == 1, "chunked prefill is per-sequence"
    hd = cfg.hd
    reduce_tp = _psum_or_id(axis_name)
    dense = functools.partial(qdense, mode=cfg.weight_quant_mode)

    positions = chunk_start + jnp.arange(C, dtype=jnp.int32)
    x = embed_tokens(cfg, params, tokens)

    def body(x, p, cache_l, window):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
        q, k, v = qkv_triple(cfg, dense, h, p)
        q = q.reshape(b, C, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, C, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, C, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cfg.rope_theta, positions)
        k = apply_rope(k, cfg.rope_theta, positions)

        # Write this chunk's K/V into its pages (chunk_start is page-
        # aligned). The final partial chunk's padding rows are zeroed so
        # they can't inflate the per-page scales fitted over them.
        keep = (jnp.arange(C) <= last_index)[None, :, None]
        tbl = _g(table, window)
        if isinstance(tbl, tuple):  # mixed group (make_cache_hybrid_mixed)
            from quantizedmha_tpu.serving.mixed_kv import (
                mixed_paged_prefill_attention,
                write_pages_mixed_routed,
            )

            t8, t4 = tbl
            bp = boundary_tokens // page_size
            n_pg = C // page_size
            ls = chunk_start // page_size + jnp.arange(n_pg, dtype=jnp.int32)
            below = ls < bp
            pid8 = t8[jnp.clip(ls, 0, t8.shape[0] - 1)]
            pid4 = t4[jnp.clip(ls - bp, 0, t4.shape[0] - 1)]
            cache_l = write_pages_mixed_routed(
                cache_l, k[0] * keep, v[0] * keep, below, pid8, pid4)
            o = mixed_paged_prefill_attention(
                q, cache_l,
                jnp.broadcast_to(
                    jnp.asarray(chunk_start + C, jnp.int32), (1,)),
                jnp.broadcast_to(jnp.asarray(chunk_start, jnp.int32), (1,)),
                t8[None], t4[None], boundary_tokens,
                sm_scale=cfg.sm_scale,
                window=window, logit_softcap=cfg.logit_softcap,
                attention_sinks=cfg.attention_sinks if window is not None else 0,
            )
            o = o.transpose(0, 2, 1, 3).reshape(b, C, cfg.num_heads * hd)
            x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
            x = _mlp_residual(cfg, dense, p, x, reduce_tp)
            return x, cache_l
        chunk_pages = jax.lax.dynamic_slice(
            tbl, (chunk_start // page_size,), (C // page_size,)
        )
        cache_l = write_pages(cache_l, k[0] * keep, v[0] * keep,
                              chunk_pages, page_size)

        # Attend straight from the pages (no O(max_pages) gather — the
        # kernel's clamped index maps make HBM traffic O(prefix), and the
        # causal mask covers both the not-yet-written tail and padding).
        o = paged_prefill_attention(
            q, cache_l.k_pages, cache_l.v_pages,
            cache_l.k_scales, cache_l.v_scales,
            jnp.broadcast_to(
                jnp.asarray(chunk_start + C, jnp.int32), (1,)),
            jnp.broadcast_to(jnp.asarray(chunk_start, jnp.int32), (1,)),
            tbl[None],
            sm_scale=cfg.sm_scale,
            window=window, logit_softcap=cfg.logit_softcap,
            attention_sinks=cfg.attention_sinks if window is not None else 0,
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, C, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
        x = _mlp_residual(cfg, dense, p, x, reduce_tp)
        return x, cache_l

    if isinstance(cache, dict):
        x, cache = scan_layers_caches(
            cfg.layer_windows, body, x, params["layers"], cache)
    else:
        x, cache = scan_layers(
            cfg.layer_windows, lambda x, s, w: body(x, s[0], s[1], w),
            x, (params["layers"], cache))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    logits = final_logits(cfg, x[0, last_index], params["lm_head"])
    return logits[None], cache


def _rope_single(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """RoPE for one token per sequence. x: [B, H, hd]; positions: [B].
    Thin wrapper over _rope_positions so there is exactly ONE per-batch
    rotation implementation to keep in sync with reference.mha.apply_rope
    (tests pin all of them together)."""
    return _rope_positions(x[:, :, None, :], positions[:, None], theta)[:, :, 0, :]


def _rope_positions(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """RoPE with per-sequence absolute positions. x: [B, Hh, S, hd];
    positions: [B, S]."""
    hd = x.shape[-1]
    half = hd // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) * 2.0 / hd)
    ang = positions.astype(jnp.float32)[..., None] * freqs  # [B, S, half]
    cos = jnp.cos(ang)[:, None]  # [B, 1, S, half]
    sin = jnp.sin(ang)[:, None]
    xf = x.astype(jnp.float32)
    xe, xo = xf[..., 0::2], xf[..., 1::2]
    re = xe * cos - xo * sin
    ro = xe * sin + xo * cos
    return jnp.stack([re, ro], axis=-1).reshape(x.shape).astype(x.dtype)


def verify_step(
    cfg: LlamaConfig,
    params: Dict[str, Any],
    cache: PagedKVCacheState,   # layer-stacked
    tokens: jnp.ndarray,        # [B, S] i32 — pending token + S-1 draft tokens
    positions0: jnp.ndarray,    # [B] i32 — absolute position of tokens[:, 0]
    page_sched: jnp.ndarray,    # [B, S] i32 — page receiving token j's K/V
    slot_sched: jnp.ndarray,    # [B, S] i32 — slot within that page
    tables: jnp.ndarray,        # [B, max_pages] i32
    *,
    page_size: int,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, PagedKVCacheState]:
    """Speculative-decoding verification: process S tokens per sequence in
    ONE forward — append their K/V to the paged cache (slots are position-
    indexed, so rejected drafts are simply overwritten later after a host
    rollback), attend causally against each sequence's gathered pages with
    PER-SEQUENCE global offsets, and return logits at every position.

    Returns (logits [B, S, vocab], cache).
    """
    from quantizedmha_tpu.ops.paged_prefill import paged_prefill_attention

    b, S = tokens.shape
    hd = cfg.hd
    reduce_tp = _psum_or_id(axis_name)
    dense = functools.partial(qdense, mode=cfg.weight_quant_mode)

    positions = positions0[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    x = embed_tokens(cfg, params, tokens)  # [B, S, hid]

    def body(x, p, cache_l, window):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
        q, k, v = qkv_triple(cfg, dense, h, p)
        q = q.reshape(b, S, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, S, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, S, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        q = _rope_positions(q, positions, cfg.rope_theta)
        k = _rope_positions(k, positions, cfg.rope_theta)

        # Append token-by-token (S is small and static) so the page-scale
        # fit-at-slot-0 policy matches plain decode exactly.
        psched = _g(page_sched, window)
        for j in range(S):
            cache_l = _append_batch(
                cache_l, k[:, :, j], v[:, :, j],
                psched[:, j], slot_sched[:, j],
            )

        # Attend straight from the pages with PER-SEQUENCE offsets (the
        # kernel is GQA-native and its clamped index maps keep HBM traffic
        # O(each sequence's context), not O(max_pages) — no gather).
        o = paged_prefill_attention(
            q, cache_l.k_pages, cache_l.v_pages,
            cache_l.k_scales, cache_l.v_scales,
            (positions0 + S).astype(jnp.int32),
            positions0.astype(jnp.int32),
            _g(tables, window),
            sm_scale=cfg.sm_scale,
            window=window, logit_softcap=cfg.logit_softcap,
            attention_sinks=cfg.attention_sinks if window is not None else 0,
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, S, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
        x = _mlp_residual(cfg, dense, p, x, reduce_tp)
        return x, cache_l

    if isinstance(cache, dict):
        x, cache = scan_layers_caches(
            cfg.layer_windows, body, x, params["layers"], cache)
    else:
        x, cache = scan_layers(
            cfg.layer_windows, lambda x, s, w: body(x, s[0], s[1], w),
            x, (params["layers"], cache))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    logits = final_logits(cfg, x, params["lm_head"])  # [B, S, vocab]
    return logits, cache


def decode_step(
    cfg: LlamaConfig,
    params: Dict[str, Any],
    cache: PagedKVCacheState,  # layer-stacked
    tokens: jnp.ndarray,     # [B] i32 — the tokens just sampled
    positions: jnp.ndarray,  # [B] i32 — their absolute positions
    page_ids,                # [B] i32 — page receiving each token's K/V
    slots: jnp.ndarray,      # [B] i32 — slot within that page
    lengths: jnp.ndarray,    # [B] i32 — context length INCLUDING this token
    tables,                  # [B, max_pages] i32
    axis_name: Optional[str] = None,
    boundary_tokens: Optional[int] = None,
) -> Tuple[jnp.ndarray, PagedKVCacheState]:
    """One decode step for a batch of sequences -> (logits [B, vocab], cache).

    Hybrid caches: `cache` may be a group dict (make_cache_hybrid), in
    which case `page_ids` and `tables` are group dicts too (each group has
    its own page pool); `slots`/`lengths` are position-derived and shared.
    A MIXED group (make_cache_hybrid_mixed) carries (pid8, pid4) /
    (tables8, tables4) tuples and `boundary_tokens` must be set.
    """
    from quantizedmha_tpu.serving.mixed_kv import (
        MixedPagedKVState,
        append_tokens_batched_mixed,
        mixed_paged_decode_attention,
    )

    b = tokens.shape[0]
    hd = cfg.hd
    reduce_tp = _psum_or_id(axis_name)
    dense = functools.partial(qdense, mode=cfg.weight_quant_mode)
    x = embed_tokens(cfg, params, tokens)[:, None, :]  # [B, 1, hid]

    def qkv(p, x):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
        q, k, v = qkv_triple(cfg, dense, h, p)
        q = q.reshape(b, cfg.num_heads, hd)
        k = k.reshape(b, cfg.num_kv_heads, hd)
        v = v.reshape(b, cfg.num_kv_heads, hd)
        # RoPE at each sequence's absolute position.
        q = _rope_single(q, positions, cfg.rope_theta)
        k = _rope_single(k, positions, cfg.rope_theta)
        return q, k, v

    def body(x, p, cache_l, window):
        q, k, v = qkv(p, x)
        if isinstance(cache_l, MixedPagedKVState):
            pid8, pid4 = _g(page_ids, window)
            t8, t4 = _g(tables, window)
            cache_l = append_tokens_batched_mixed(
                cache_l, k, v, positions, boundary_tokens, pid8, pid4, slots)
            o = mixed_paged_decode_attention(
                q, cache_l, lengths, t8, t4, boundary_tokens,
                sm_scale=cfg.sm_scale,
                window=window, logit_softcap=cfg.logit_softcap,
                attention_sinks=cfg.attention_sinks if window is not None else 0,
            )
        else:
            cache_l = _append_batch(cache_l, k, v, _g(page_ids, window), slots)
            o = paged_decode_attention(
                q, cache_l.k_pages, cache_l.v_pages,
                cache_l.k_scales, cache_l.v_scales, lengths, _g(tables, window),
                sm_scale=cfg.sm_scale,
                window=window, logit_softcap=cfg.logit_softcap,
                attention_sinks=cfg.attention_sinks if window is not None else 0,
            )
        o = o.reshape(b, 1, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
        x = _mlp_residual(cfg, dense, p, x, reduce_tp)
        return x, cache_l

    # W4 weights get the same stacked treatment as the cache: the packed
    # stacks stay OUT of the scan's xs (an xs slice must materialize a
    # dense per-layer copy before each pallas operand — run38 traced that
    # at more than the whole int4 bandwidth saving) and the kernel DMAs
    # the selected layer directly via its prefetched layer scalar.
    _qw4_stacked = {k: v for k, v in params["layers"].items()
                    if isinstance(v, QuantizedWeight4)}

    def body_stacked(carry, scanned, window):
        # Plain layer-stacked cache rides the scan CARRY: the appends are
        # in-place token-granular scatters at [layer, ...] and the kernel
        # reads one layer of the whole stack via its prefetched `layer`
        # scalar — no per-layer pool slice in, no per-layer pool stack out.
        # The xs/ys form (`body` above) made XLA materialize pool/L-sized
        # dynamic slices + update-slices per layer (the run23 trace's
        # 'nested-scan carry copies', ~0.5 ms/step at 8B scale).
        x, cache = carry
        p, li = scanned
        if _qw4_stacked:
            p = {**p, **{k: LayerIndexed4(w, li)
                         for k, w in _qw4_stacked.items()}}
        q, k, v = qkv(p, x)
        cache = _append_batch_at(cache, li, k, v, _g(page_ids, window),
                                 slots)
        # The head-folded kernel wants scales ROWED ([pages, Hkv], heads
        # on lanes) but a rowed STACKED carry makes every append's DUS
        # materialize a full [L, pages, Hkv] plane copy (run48: 7.3
        # ms/step at batch 32). So the carry keeps the append-friendly
        # columned/raw layout and each layer derives its own tiny
        # [pages, Hkv] view (~pages*32 B of XLA work per layer).
        def _rowed(s):
            sl = jax.lax.dynamic_index_in_dim(s, li, 0, keepdims=False)
            if sl.ndim == 3:  # pre-columned [Hkv, pages, 1]
                sl = sl[..., 0]
            return jnp.swapaxes(sl, 0, 1)
        if FOLD_KV_HEADS:
            k_sc, v_sc = _rowed(cache.k_scales), _rowed(cache.v_scales)
            fold_kw = dict(fold_kv_heads=True, scales_prerowed=True)
        else:  # A/B escape hatch: the per-head (batch, kv_head, page) grid
            k_sc, v_sc = cache.k_scales, cache.v_scales
            fold_kw = dict(fold_kv_heads=False)
        o = paged_decode_attention(
            q, cache.k_pages, cache.v_pages, k_sc, v_sc,
            lengths, _g(tables, window),
            sm_scale=cfg.sm_scale,
            window=window, logit_softcap=cfg.logit_softcap,
            attention_sinks=cfg.attention_sinks if window is not None else 0,
            layer=li,
            **fold_kw,
        )
        o = o.reshape(b, 1, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
        x = _mlp_residual(cfg, dense, p, x, reduce_tp)
        return (x, cache), None

    if isinstance(cache, dict):
        x, cache = scan_layers_caches(
            cfg.layer_windows, body, x, params["layers"], cache)
    elif isinstance(cache, PagedKVCacheState) and STACKED_CARRY:
        lidx = jnp.arange(len(cfg.layer_windows), dtype=jnp.int32)
        xs_layers = {k: v for k, v in params["layers"].items()
                     if k not in _qw4_stacked}
        (x, cache), _ = scan_layers(
            cfg.layer_windows,
            lambda c, s, w: body_stacked(c, s, w),
            (x, cache), (xs_layers, lidx))
    else:
        x, cache = scan_layers(
            cfg.layer_windows, lambda x, s, w: body(x, s[0], s[1], w),
            x, (params["layers"], cache))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    logits = final_logits(cfg, x[:, 0], params["lm_head"])
    return logits, cache


def decode_loop(
    cfg: LlamaConfig,
    params: Dict[str, Any],
    cache: PagedKVCacheState,  # layer-stacked
    tokens: jnp.ndarray,    # [B] i32 — pending tokens (K/V not yet cached)
    lengths: jnp.ndarray,   # [B] i32 — context length EXCLUDING the pending token
    tables: jnp.ndarray,    # [B, max_pages] i32 — covers lengths + n_steps slots
    key: Optional[jnp.ndarray] = None,  # PRNG key (only used when sampling)
    *,
    n_steps: int,
    page_size: int,
    sampling=None,  # serving.sampling.SamplingParams; None -> greedy
    axis_name: Optional[str] = None,
    return_logits: bool = False,
    boundary_tokens: Optional[int] = None,
) -> Tuple[jnp.ndarray, PagedKVCacheState]:
    """Fused decode of `n_steps` tokens per sequence, entirely on-device:
    the sampled token feeds the next step inside a lax.scan, and each
    step's (page, slot) is derived from the block table and the running
    length — no host round-trip per token. The host must pre-reserve the
    pages the loop will touch (engine does this at chunk granularity).

    Returns (tokens [n_steps, B], cache); with return_logits=True,
    (tokens, cache, logits [n_steps, B, vocab]) — speculative rejection
    sampling needs the draft's per-position distribution. tokens[i] is the
    token sampled AFTER the i-th cached append, i.e. the continuation.
    """
    from quantizedmha_tpu.serving.sampling import SamplingParams, sample

    sampling = sampling or SamplingParams()
    if key is None:
        key = jax.random.PRNGKey(sampling.seed)

    def take_pids(t, pos):
        return jnp.take_along_axis(t, (pos // page_size)[:, None], axis=1)[:, 0]

    def take_clip(t, idx):
        idx = jnp.clip(idx, 0, t.shape[1] - 1)
        return jnp.take_along_axis(t, idx[:, None], axis=1)[:, 0]

    def pids_for(t, pos):
        if isinstance(t, tuple):  # mixed group: route by the boundary
            t8, t4 = t
            below = pos < boundary_tokens
            p8 = jnp.where(below, take_clip(t8, pos // page_size), 0)
            p4 = jnp.where(
                below, 0,
                take_clip(t4, (pos - boundary_tokens) // page_size))
            return (p8, p4)
        return take_pids(t, pos)

    def body(carry, _):
        cache, toks, lens, key = carry
        pos = lens  # absolute position of the pending token
        if isinstance(tables, dict):
            pids = {k: pids_for(t, pos) for k, t in tables.items()}
        else:
            pids = take_pids(tables, pos)
        slots = pos % page_size
        logits, cache = decode_step(
            cfg, params, cache, toks, pos, pids, slots, lens + 1, tables,
            axis_name, boundary_tokens=boundary_tokens,
        )
        key, sub = jax.random.split(key)
        nxt = sample(logits, sub, sampling)
        out = (nxt, logits) if return_logits else nxt
        return (cache, nxt, lens + 1, key), out

    # Pre-column the stacked cache's scales ([L, Hkv, pages] ->
    # [L, Hkv, pages, 1]) ONCE per fused chunk — the append-friendly
    # layout (per-lane DUS alias in place; run33). The head-folded
    # kernel's ROWED view is derived per layer inside body_stacked from
    # a tiny per-layer slice: carrying the whole stack rowed made every
    # append materialize a full-plane copy (run48: 7.3 ms/step at b32).
    # De-column on exit so the external cache contract is unchanged.
    pre_col = (STACKED_CARRY and PRECOLUMN_SCALES
               and isinstance(cache, PagedKVCacheState)
               and cache.k_pages.ndim == 5)
    if pre_col:
        cache = PagedKVCacheState(
            k_pages=cache.k_pages, v_pages=cache.v_pages,
            k_scales=cache.k_scales[..., None],
            v_scales=cache.v_scales[..., None])
    (cache, _, _, _), out = jax.lax.scan(
        body, (cache, tokens, lengths, key), None, length=n_steps
    )
    if pre_col:
        cache = PagedKVCacheState(
            k_pages=cache.k_pages, v_pages=cache.v_pages,
            k_scales=cache.k_scales[..., 0], v_scales=cache.v_scales[..., 0])
    if return_logits:
        toks, logits = out
        return toks, cache, logits
    return out, cache
