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
    qkv_proj,
    rms_norm,
)
from quantizedmha_tpu.quant.weights import qdense
from quantizedmha_tpu.ops.decode import paged_decode_attention
from quantizedmha_tpu.reference.mha import apply_rope
from quantizedmha_tpu.serving.kv_cache import (
    PagedKVCacheState,
    append_tokens_batched as _append_batch,
    write_pages,
)


def ensure_serving_supported(cfg: LlamaConfig) -> None:
    """Serving supports the full family surface (per-layer windows,
    sandwich norms, GeGLU, softcaps, Gemma scalings) — this validates the
    knob VALUES early so a typo'd hidden_act fails at cache creation, not
    mid-trace."""
    _act(cfg, jnp.zeros((1,), jnp.float32))  # raises on unknown hidden_act
    cfg.layer_windows  # raises on a mis-sized window_pattern


def _embed(cfg: LlamaConfig, params, tokens) -> jnp.ndarray:
    x = params["embed"][tokens].astype(cfg.dtype)
    if cfg.embed_scale:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, cfg.dtype)
    return x


def _final_logits(cfg: LlamaConfig, x, lm_head) -> jnp.ndarray:
    logits = (x @ lm_head).astype(jnp.float32)
    if cfg.final_logit_softcap is not None:
        cap = cfg.final_logit_softcap
        logits = jnp.tanh(logits / cap) * cap
    return logits


def _attn_residual(cfg: LlamaConfig, dense, p, x, o_flat, reduce_tp):
    """x + [post-norm](psum(wo @ o)) — the TP psum must precede the Gemma-2
    post-attention norm (the norm needs the full row sum)."""
    o = reduce_tp(dense(o_flat.astype(cfg.dtype), p["wo"]))
    if cfg.sandwich_norms:
        o = rms_norm(o, p["post_attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
    return x + o


def _mlp_residual(cfg: LlamaConfig, dense, p, x, reduce_tp):
    h = rms_norm(x, p["mlp_norm"], cfg.rms_eps, cfg.rms_plus_one)
    gate = _act(cfg, dense(h, p["w_gate"]).astype(jnp.float32)).astype(x.dtype)
    m = reduce_tp(dense(gate * dense(h, p["w_up"]), p["w_down"]))
    if cfg.sandwich_norms:
        m = rms_norm(m, p["post_mlp_norm"], cfg.rms_eps, cfg.rms_plus_one)
    return x + m


def _scan_layers(cfg: LlamaConfig, body, x, xs):
    """lax.scan over the leading layer axis of `xs` where the body takes
    each layer's STATIC window: `body(x, scanned_slice, window) -> (x, y)`.

    Same decomposition as models.llama.forward — uniform pattern: one
    scan; short periodic pattern (Gemma-2 alternation): chunked scan with
    a p-layer unrolled body; otherwise (Qwen2's max_window_layers split):
    one scan per contiguous equal-window run. Returns (x, ys) with ys
    stacked [num_layers, ...] in layer order in every case."""
    windows = cfg.layer_windows
    period = _pattern_period(windows)
    L = cfg.num_layers
    if period == 1:
        return jax.lax.scan(lambda x, s: body(x, s, windows[0]), x, xs)
    if period <= 4:
        chunked = jax.tree.map(
            lambda a: a.reshape(L // period, period, *a.shape[1:]), xs)

        def chunk_body(x, chunk):
            ys = []
            for i in range(period):
                s = jax.tree.map(lambda a: a[i], chunk)
                x, y = body(x, s, windows[i])
                ys.append(y)
            return x, jax.tree.map(lambda *zs: jnp.stack(zs), *ys)

        x, ys = jax.lax.scan(chunk_body, x, chunked)
        return x, jax.tree.map(lambda a: a.reshape(L, *a.shape[2:]), ys)
    start = 0
    outs = []
    for win, n_run in _pattern_runs(windows):
        sub = jax.tree.map(lambda a: a[start:start + n_run], xs)
        x, y = jax.lax.scan(lambda x, s, w=win: body(x, s, w), x, sub)
        outs.append(y)
        start += n_run
    return x, jax.tree.map(lambda *zs: jnp.concatenate(zs), *outs)


def make_cache(cfg: LlamaConfig, num_pages: int, page_size: int) -> PagedKVCacheState:
    """Layer-stacked cache: every array has a leading num_layers dim."""
    ensure_serving_supported(cfg)
    one = PagedKVCacheState.create(cfg.num_kv_heads, num_pages, page_size, cfg.hd)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (cfg.num_layers, *x.shape)).copy(), one
    )


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
    x = _embed(cfg, params, tokens)

    def body(x, p, window):
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
        q = qkv_proj(dense, h, p, "wq", "bq").reshape(b, n, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = qkv_proj(dense, h, p, "wk", "bk").reshape(b, n, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = qkv_proj(dense, h, p, "wv", "bv").reshape(b, n, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cfg.rope_theta)
        k = apply_rope(k, cfg.rope_theta)
        kv_k, kv_v = k, v  # cached post-RoPE
        o = _attention(cfg, q, k, v, causal=True, window=window)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
        x = _mlp_residual(cfg, dense, p, x, reduce_tp)
        return x, (kv_k[0], kv_v[0])

    x, (k_all, v_all) = _scan_layers(cfg, body, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    # Project ONLY the requested position: the full [bucket, vocab] logits
    # would be an extra ~2 TFLOP matmul + ~1 GiB buffer per prefill at
    # Llama-3-8B scale, all discarded but one row.
    logits = _final_logits(cfg, x[:, last_index], params["lm_head"])
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
    x = _embed(cfg, params, tokens)

    def body(x, scanned, window):
        p, cache_l = scanned
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
        q = qkv_proj(dense, h, p, "wq", "bq").reshape(b, C, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = qkv_proj(dense, h, p, "wk", "bk").reshape(b, C, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = qkv_proj(dense, h, p, "wv", "bv").reshape(b, C, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cfg.rope_theta, positions)
        k = apply_rope(k, cfg.rope_theta, positions)

        # Write this chunk's K/V into its pages (chunk_start is page-
        # aligned). The final partial chunk's padding rows are zeroed so
        # they can't inflate the per-page scales fitted over them.
        keep = (jnp.arange(C) <= last_index)[None, :, None]
        chunk_pages = jax.lax.dynamic_slice(
            table, (chunk_start // page_size,), (C // page_size,)
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
            table[None],
            sm_scale=cfg.sm_scale,
            window=window, logit_softcap=cfg.logit_softcap,
            attention_sinks=cfg.attention_sinks if window is not None else 0,
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, C, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
        x = _mlp_residual(cfg, dense, p, x, reduce_tp)
        return x, cache_l

    x, cache = _scan_layers(cfg, body, x, (params["layers"], cache))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    logits = _final_logits(cfg, x[0, last_index], params["lm_head"])
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
    x = _embed(cfg, params, tokens)  # [B, S, hid]

    def body(x, scanned, window):
        p, cache_l = scanned
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
        q = qkv_proj(dense, h, p, "wq", "bq").reshape(b, S, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = qkv_proj(dense, h, p, "wk", "bk").reshape(b, S, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = qkv_proj(dense, h, p, "wv", "bv").reshape(b, S, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
        q = _rope_positions(q, positions, cfg.rope_theta)
        k = _rope_positions(k, positions, cfg.rope_theta)

        # Append token-by-token (S is small and static) so the page-scale
        # fit-at-slot-0 policy matches plain decode exactly.
        for j in range(S):
            cache_l = _append_batch(
                cache_l, k[:, :, j], v[:, :, j],
                page_sched[:, j], slot_sched[:, j],
            )

        # Attend straight from the pages with PER-SEQUENCE offsets (the
        # kernel is GQA-native and its clamped index maps keep HBM traffic
        # O(each sequence's context), not O(max_pages) — no gather).
        o = paged_prefill_attention(
            q, cache_l.k_pages, cache_l.v_pages,
            cache_l.k_scales, cache_l.v_scales,
            (positions0 + S).astype(jnp.int32),
            positions0.astype(jnp.int32),
            tables,
            sm_scale=cfg.sm_scale,
            window=window, logit_softcap=cfg.logit_softcap,
            attention_sinks=cfg.attention_sinks if window is not None else 0,
        )
        o = o.transpose(0, 2, 1, 3).reshape(b, S, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
        x = _mlp_residual(cfg, dense, p, x, reduce_tp)
        return x, cache_l

    x, cache = _scan_layers(cfg, body, x, (params["layers"], cache))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    logits = _final_logits(cfg, x, params["lm_head"])  # [B, S, vocab]
    return logits, cache


def decode_step(
    cfg: LlamaConfig,
    params: Dict[str, Any],
    cache: PagedKVCacheState,  # layer-stacked
    tokens: jnp.ndarray,     # [B] i32 — the tokens just sampled
    positions: jnp.ndarray,  # [B] i32 — their absolute positions
    page_ids: jnp.ndarray,   # [B] i32 — page receiving each token's K/V
    slots: jnp.ndarray,      # [B] i32 — slot within that page
    lengths: jnp.ndarray,    # [B] i32 — context length INCLUDING this token
    tables: jnp.ndarray,     # [B, max_pages] i32
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, PagedKVCacheState]:
    """One decode step for a batch of sequences -> (logits [B, vocab], cache)."""
    b = tokens.shape[0]
    hd = cfg.hd
    reduce_tp = _psum_or_id(axis_name)
    dense = functools.partial(qdense, mode=cfg.weight_quant_mode)
    x = _embed(cfg, params, tokens)[:, None, :]  # [B, 1, hid]

    def body(x, scanned, window):
        p, cache_l = scanned
        h = rms_norm(x, p["attn_norm"], cfg.rms_eps, cfg.rms_plus_one)
        q = qkv_proj(dense, h, p, "wq", "bq").reshape(b, cfg.num_heads, hd)
        k = qkv_proj(dense, h, p, "wk", "bk").reshape(b, cfg.num_kv_heads, hd)
        v = qkv_proj(dense, h, p, "wv", "bv").reshape(b, cfg.num_kv_heads, hd)
        # RoPE at each sequence's absolute position.
        q = _rope_single(q, positions, cfg.rope_theta)
        k = _rope_single(k, positions, cfg.rope_theta)
        cache_l = _append_batch(cache_l, k, v, page_ids, slots)
        o = paged_decode_attention(
            q, cache_l.k_pages, cache_l.v_pages,
            cache_l.k_scales, cache_l.v_scales, lengths, tables,
            sm_scale=cfg.sm_scale,
            window=window, logit_softcap=cfg.logit_softcap,
            attention_sinks=cfg.attention_sinks if window is not None else 0,
        )
        o = o.reshape(b, 1, cfg.num_heads * hd)
        x = _attn_residual(cfg, dense, p, x, o, reduce_tp)
        x = _mlp_residual(cfg, dense, p, x, reduce_tp)
        return x, cache_l

    x, cache = _scan_layers(cfg, body, x, (params["layers"], cache))
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    logits = _final_logits(cfg, x[:, 0], params["lm_head"])
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

    def body(carry, _):
        cache, toks, lens, key = carry
        pos = lens  # absolute position of the pending token
        pids = jnp.take_along_axis(tables, (pos // page_size)[:, None], axis=1)[:, 0]
        slots = pos % page_size
        logits, cache = decode_step(
            cfg, params, cache, toks, pos, pids, slots, lens + 1, tables,
            axis_name,
        )
        key, sub = jax.random.split(key)
        nxt = sample(logits, sub, sampling)
        out = (nxt, logits) if return_logits else nxt
        return (cache, nxt, lens + 1, key), out

    (cache, _, _, _), out = jax.lax.scan(
        body, (cache, tokens, lengths, key), None, length=n_steps
    )
    if return_logits:
        toks, logits = out
        return toks, cache, logits
    return out, cache
