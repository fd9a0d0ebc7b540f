"""Paged multi-token attention (ops/paged_prefill.py): parity with a
dequantized-page reference, GQA, per-sequence offsets, window/sinks.

This kernel replaces the O(max_context) gather in chunked prefill /
speculative verify (VERDICT round-1 item #3): queries attend straight from
the paged INT8 cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.ops.paged_prefill import paged_prefill_attention
from quantizedmha_tpu.serving.kv_cache import PagedKVCacheState, write_pages


def _mk_cache(rng, kv_heads, n_pages_total, page, hd, lengths, tables):
    """Fill distinct physical pages per sequence with random K/V."""
    state = PagedKVCacheState.create(kv_heads, n_pages_total, page, hd)
    full_k, full_v = [], []
    for b, ln in enumerate(lengths):
        n_pages = -(-ln // page)
        n_tok = n_pages * page
        k = rng.normal(0, 0.5, (kv_heads, n_tok, hd)).astype(np.float32)
        v = rng.normal(0, 0.5, (kv_heads, n_tok, hd)).astype(np.float32)
        # zero rows past the true length so page scales aren't inflated
        k[:, ln:] = 0
        v[:, ln:] = 0
        state = write_pages(state, jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(tables[b][:n_pages]), page)
        full_k.append(k)
        full_v.append(v)
    return state, full_k, full_v


def _dequant_ref(state, table, n_pages, page, hd):
    """Dequantized K/V for one sequence from its pages: what the kernel
     'sees' — isolates kernel correctness from quantization error."""
    k = np.asarray(state.k_pages, np.float32)[:, table[:n_pages]]
    v = np.asarray(state.v_pages, np.float32)[:, table[:n_pages]]
    ks = np.asarray(state.k_scales, np.float32)[:, table[:n_pages]]
    vs = np.asarray(state.v_scales, np.float32)[:, table[:n_pages]]
    k = (k * ks[..., None, None]).reshape(k.shape[0], -1, hd)
    v = (v * vs[..., None, None]).reshape(v.shape[0], -1, hd)
    return k, v


def _ref_attention(q, k, v, q_start, length, *, window=None, sinks=0):
    """Causal softmax attention with global positions, GQA-expanded."""
    Hq, S, hd = q.shape
    Hkv = k.shape[0]
    group = Hq // Hkv
    k = np.repeat(k, group, axis=0)[:, : max(length, 1)]
    v = np.repeat(v, group, axis=0)[:, : max(length, 1)]
    scale = hd ** -0.5
    s = np.einsum("hqd,hkd->hqk", q, k) * scale
    qpos = q_start + np.arange(S)[None, :, None]
    kpos = np.arange(k.shape[1])[None, None, :]
    mask = (kpos <= qpos) & (kpos < length)
    if window is not None:
        in_win = kpos > qpos - window
        if sinks:
            in_win |= kpos < sinks
        mask &= in_win
    s = np.where(mask, s, -1e30)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("hqk,hkd->hqd", p, v)


@pytest.mark.parametrize("group", [1, 4])
def test_parity_vs_dequantized_reference(group):
    rng = np.random.default_rng(0)
    kv_heads, page, hd = 2, 16, 32
    lengths = [40, 64]
    tables = [[3, 5, 7, 9], [2, 4, 6, 8]]
    state, _, _ = _mk_cache(rng, kv_heads, 12, page, hd, lengths, tables)

    q_len = 24
    q_starts = [lengths[0] - q_len, lengths[1] - q_len]
    q = rng.normal(0, 0.5, (2, kv_heads * group, q_len, hd)).astype(np.float32)

    out = paged_prefill_attention(
        jnp.asarray(q), state.k_pages, state.v_pages,
        state.k_scales, state.v_scales,
        jnp.asarray(lengths, jnp.int32), jnp.asarray(q_starts, jnp.int32),
        jnp.asarray(tables, jnp.int32), block_q=16,
    )
    assert out.shape == q.shape
    for b in range(2):
        kd, vd = _dequant_ref(state, np.asarray(tables[b]),
                              -(-lengths[b] // page), page, hd)
        want = _ref_attention(q[b], kd, vd, q_starts[b], lengths[b])
        np.testing.assert_allclose(np.asarray(out)[b], want, atol=2e-2, rtol=2e-2)


def test_chunk_not_at_end_and_unaligned_qlen():
    """A middle chunk (prefix before AND cache longer than q covers) with a
    q_len that is not a block_q multiple."""
    rng = np.random.default_rng(1)
    kv_heads, page, hd = 2, 16, 32
    length = 80
    table = [[0, 1, 2, 3, 4]]
    state, _, _ = _mk_cache(rng, kv_heads, 6, page, hd, [length], table)

    q_len, q_start = 19, 32
    q = rng.normal(0, 0.5, (1, 4, q_len, hd)).astype(np.float32)
    # visible context for these queries: positions <= q_start+q_len-1 = 50
    vis = q_start + q_len
    out = paged_prefill_attention(
        jnp.asarray(q), state.k_pages, state.v_pages,
        state.k_scales, state.v_scales,
        jnp.asarray([vis], jnp.int32), jnp.asarray([q_start], jnp.int32),
        jnp.asarray(table, jnp.int32), block_q=16,
    )
    kd, vd = _dequant_ref(state, np.asarray(table[0]), 5, page, hd)
    want = _ref_attention(q[0], kd, vd, q_start, vis)
    np.testing.assert_allclose(np.asarray(out)[0], want, atol=2e-2, rtol=2e-2)


def test_window_and_sinks():
    rng = np.random.default_rng(2)
    kv_heads, page, hd = 1, 16, 32
    length = 96
    table = [[0, 1, 2, 3, 4, 5]]
    state, _, _ = _mk_cache(rng, kv_heads, 6, page, hd, [length], table)
    q_len, q_start = 32, 64
    q = rng.normal(0, 0.5, (1, 2, q_len, hd)).astype(np.float32)
    out = paged_prefill_attention(
        jnp.asarray(q), state.k_pages, state.v_pages,
        state.k_scales, state.v_scales,
        jnp.asarray([length], jnp.int32), jnp.asarray([q_start], jnp.int32),
        jnp.asarray(table, jnp.int32), block_q=16, window=24,
        attention_sinks=4,
    )
    kd, vd = _dequant_ref(state, np.asarray(table[0]), 6, page, hd)
    want = _ref_attention(q[0], kd, vd, q_start, length, window=24, sinks=4)
    np.testing.assert_allclose(np.asarray(out)[0], want, atol=2e-2, rtol=2e-2)


def test_sinks_without_window_raise():
    with pytest.raises(ValueError, match="window"):
        paged_prefill_attention(
            jnp.zeros((1, 2, 8, 32)), jnp.zeros((1, 4, 16, 32), jnp.int8),
            jnp.zeros((1, 4, 16, 32), jnp.int8), jnp.ones((1, 4)),
            jnp.ones((1, 4)), jnp.asarray([8]), jnp.asarray([0]),
            jnp.zeros((1, 4), jnp.int32), attention_sinks=2,
        )


def test_decode_agreement():
    """q_len=1 through the prefill kernel matches paged_decode_attention —
    the two paged kernels implement one contract."""
    from quantizedmha_tpu.ops.decode import paged_decode_attention

    rng = np.random.default_rng(3)
    kv_heads, page, hd = 2, 16, 32
    lengths = [33, 64]
    tables = [[1, 2, 3, 9], [4, 5, 6, 7]]
    state, _, _ = _mk_cache(rng, kv_heads, 10, page, hd, lengths, tables)
    q = rng.normal(0, 0.5, (2, 4, hd)).astype(np.float32)

    via_decode = paged_decode_attention(
        jnp.asarray(q), state.k_pages, state.v_pages,
        state.k_scales, state.v_scales,
        jnp.asarray(lengths, jnp.int32), jnp.asarray(tables, jnp.int32),
    )
    via_prefill = paged_prefill_attention(
        jnp.asarray(q)[:, :, None, :], state.k_pages, state.v_pages,
        state.k_scales, state.v_scales,
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray([lengths[0] - 1, lengths[1] - 1], jnp.int32),
        jnp.asarray(tables, jnp.int32), block_q=16,
    )[:, :, 0, :]
    np.testing.assert_allclose(
        np.asarray(via_decode), np.asarray(via_prefill), atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# INT4 multi-token kernel (paged_prefill_attention_int4)
# ---------------------------------------------------------------------------


def _mk_cache_int4(rng, kv_heads, page, hd, length, subs=4):
    """One sequence's worth of int4 pages (sequential table from 0)."""
    from quantizedmha_tpu.ops.quantize import (
        dequantize_kv_blocks_int4, quantize_kv_blocks_int4)

    n_pages = -(-length // page)
    n_tok = n_pages * page
    k = rng.normal(0, 0.5, (1, kv_heads, n_tok, hd)).astype(np.float32)
    v = rng.normal(0, 0.5, (1, kv_heads, n_tok, hd)).astype(np.float32)
    k[:, :, length:] = 0
    v[:, :, length:] = 0
    tile = page // subs
    kq, ks = quantize_kv_blocks_int4(jnp.asarray(k), page, scale_block=tile)
    vq, vs = quantize_kv_blocks_int4(jnp.asarray(v), page, scale_block=tile)
    kd = np.asarray(dequantize_kv_blocks_int4(kq, ks, tile))[0]
    vd = np.asarray(dequantize_kv_blocks_int4(vq, vs, tile))[0]
    pages_k = np.asarray(kq)[0].reshape(kv_heads, n_pages, page, hd // 2)
    pages_v = np.asarray(vq)[0].reshape(kv_heads, n_pages, page, hd // 2)
    scales_k = np.asarray(ks)[0].reshape(kv_heads, n_pages, subs)
    scales_v = np.asarray(vs)[0].reshape(kv_heads, n_pages, subs)
    return (jnp.asarray(pages_k), jnp.asarray(pages_v),
            jnp.asarray(scales_k), jnp.asarray(scales_v), kd, vd)


@pytest.mark.parametrize("group", [1, 4])
def test_int4_parity_vs_dequantized_reference(group):
    from quantizedmha_tpu.ops.paged_prefill import paged_prefill_attention_int4

    rng = np.random.default_rng(7)
    kv_heads, page, hd = 2, 32, 64
    length, q_len = 200, 48  # chunk [152, 200) of the context
    q_start = length - q_len
    kp, vp, ks, vs, kd, vd = _mk_cache_int4(rng, kv_heads, page, hd, length)
    n_pages = kp.shape[1]
    q = rng.normal(0, 0.5, (1, kv_heads * group, q_len, hd)).astype(np.float32)
    table = np.arange(n_pages, dtype=np.int32)[None]

    out = paged_prefill_attention_int4(
        jnp.asarray(q), kp, vp, ks, vs,
        jnp.asarray([length], np.int32), jnp.asarray([q_start], np.int32),
        jnp.asarray(table), block_q=16)
    want = _ref_attention(q[0], kd, vd, q_start, length)
    np.testing.assert_allclose(np.asarray(out[0]), want, rtol=2e-4, atol=2e-4)


def test_int4_window_and_sinks():
    from quantizedmha_tpu.ops.paged_prefill import paged_prefill_attention_int4

    rng = np.random.default_rng(8)
    kv_heads, page, hd = 2, 32, 64
    length, q_len = 160, 32
    q_start = length - q_len
    kp, vp, ks, vs, kd, vd = _mk_cache_int4(rng, kv_heads, page, hd, length)
    n_pages = kp.shape[1]
    q = rng.normal(0, 0.5, (1, kv_heads * 2, q_len, hd)).astype(np.float32)
    table = np.arange(n_pages, dtype=np.int32)[None]

    out = paged_prefill_attention_int4(
        jnp.asarray(q), kp, vp, ks, vs,
        jnp.asarray([length], np.int32), jnp.asarray([q_start], np.int32),
        jnp.asarray(table), block_q=16, window=48, attention_sinks=8)
    want = _ref_attention(q[0], kd, vd, q_start, length, window=48, sinks=8)
    np.testing.assert_allclose(np.asarray(out[0]), want, rtol=2e-4, atol=2e-4)


def test_int4_agrees_with_int4_decode_at_qlen1():
    from quantizedmha_tpu.ops.decode import paged_decode_attention_int4
    from quantizedmha_tpu.ops.paged_prefill import paged_prefill_attention_int4

    rng = np.random.default_rng(9)
    kv_heads, page, hd = 2, 32, 64
    length = 100
    kp, vp, ks, vs, kd, vd = _mk_cache_int4(rng, kv_heads, page, hd, length)
    n_pages = kp.shape[1]
    q = rng.normal(0, 0.5, (1, kv_heads * 4, 1, hd)).astype(np.float32)
    table = np.arange(n_pages, dtype=np.int32)[None]
    lengths = jnp.asarray([length], np.int32)

    out_p = paged_prefill_attention_int4(
        jnp.asarray(q), kp, vp, ks, vs, lengths,
        jnp.asarray([length - 1], np.int32), jnp.asarray(table))
    out_d = paged_decode_attention_int4(
        jnp.asarray(q[:, :, 0]), kp, vp, ks, vs, lengths, jnp.asarray(table))
    np.testing.assert_allclose(
        np.asarray(out_p[:, :, 0]), np.asarray(out_d), rtol=2e-5, atol=2e-5)
