"""Mixed-precision KV (INT8 sink pages + INT4 bulk) and decode lse merging.

Run 12 filed mixed pages as the resolution of the int4 accuracy negative;
serving/mixed_kv.py implements it as two kernel partials merged exactly
with the parallel/combine lse algebra. Goldens follow test_decode.py's
convention: dequantize what the cache actually stores and run exact
softmax attention — the kernels' arithmetic on stored payloads is exact,
so tolerances are kernel-arithmetic tolerances, not format tolerances.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.ops.decode import (
    paged_decode_attention,
    paged_decode_attention_int4,
)
from quantizedmha_tpu.ops.quantize import unpack_int4_halves
from quantizedmha_tpu.serving.mixed_kv import (
    MixedPagedKVState,
    append_token_int4,
    mixed_paged_decode_attention,
    quantize_page_int4,
    write_pages_mixed,
)

PAGE = 128
HD = 64
HKV = 2
HQ = 4


def _golden(q, k, v, length):
    """q: [Hq, D]; k/v: [Hkv, n, D] float64; exact softmax over :length."""
    hq, d = q.shape
    hkv = k.shape[0]
    group = hq // hkv
    qg = q.reshape(hkv, group, d).astype(np.float64)
    s = np.einsum("hgd,hnd->hgn", qg, k[:, :length].astype(np.float64)) * d**-0.5
    s -= s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    o = np.einsum("hgn,hnd->hgd", p, v[:, :length].astype(np.float64))
    return o.reshape(hq, d)


def _dequant8(pages, scales, table):
    x = np.asarray(pages)[:, table].astype(np.float64)
    x *= np.asarray(scales)[:, table][:, :, None, None]
    return x.reshape(x.shape[0], -1, x.shape[-1])


def _dequant4(pages, scales, table):
    lo, hi = unpack_int4_halves(jnp.asarray(np.asarray(pages)[:, table]))
    x = np.concatenate([np.asarray(lo), np.asarray(hi)], axis=-1).astype(np.float64)
    # scales: [Hkv, n4, subs] -> per-token rows within each page
    s = np.asarray(scales)[:, table]  # [Hkv, p, subs]
    h, p, subs = s.shape
    s_rows = np.repeat(s, PAGE // subs, axis=-1)  # [Hkv, p, PAGE]
    x *= s_rows[..., None]
    return x.reshape(h, -1, x.shape[-1])


def _fill_mixed(rng, lengths, boundary_pages=1, n8=4, n4=12, subs=4,
                sink_outliers=False):
    """Build a mixed cache + simple sequential page tables; returns
    (state, tables8, tables4, k_full, v_full)."""
    state = MixedPagedKVState.create(HKV, n8, n4, PAGE, HD, subs=subs)
    boundary = boundary_pages * PAGE
    tables8, tables4, k_full, v_full = [], [], [], []
    next8, next4 = 1, 1  # page 0 of each pool is the scrap page
    for n in lengths:
        n_pad = -(-n // PAGE) * PAGE
        k = rng.normal(0, 0.5, (HKV, n_pad, HD)).astype(np.float32)
        v = rng.normal(0, 0.5, (HKV, n_pad, HD)).astype(np.float32)
        if sink_outliers:
            # StreamingLLM-style: early (sink) tokens carry 8x outliers —
            # the case that wrecks a shared int4 page scale (run12).
            k[:, :16] *= 8.0
            v[:, :16] *= 8.0
        k[:, n:] = 0
        v[:, n:] = 0
        p_total = n_pad // PAGE
        p8 = min(p_total, boundary_pages)
        p4 = p_total - p8
        ids8 = np.arange(next8, next8 + p8, dtype=np.int32)
        ids4 = np.arange(next4, next4 + p4, dtype=np.int32)
        next8 += p8
        next4 += p4
        state = write_pages_mixed(
            state, jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(ids8), jnp.asarray(ids4))
        tables8.append(ids8)
        tables4.append(ids4)
        k_full.append(k)
        v_full.append(v)

    def pad_tables(rows, width):
        out = np.zeros((len(rows), width), np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return out

    max8 = max(boundary_pages, max(len(t) for t in tables8))
    max4 = max(1, max(len(t) for t in tables4))
    return (state, pad_tables(tables8, max8), pad_tables(tables4, max4),
            k_full, v_full, boundary)


def test_decode_save_residuals_lse_is_log_sum_exp(rng):
    """The int8 decode's lse output equals log-sum-exp of the scaled
    logits over the stored (dequantized) keys."""
    from quantizedmha_tpu.serving.kv_cache import PagedKVCacheState, write_pages

    n, n_pages = 200, 4
    n_pad = -(-n // PAGE) * PAGE
    k = rng.normal(0, 0.5, (HKV, n_pad, HD)).astype(np.float32)
    v = rng.normal(0, 0.5, (HKV, n_pad, HD)).astype(np.float32)
    k[:, n:] = 0
    v[:, n:] = 0
    state = PagedKVCacheState.create(HKV, n_pages, PAGE, HD)
    table = np.arange(n_pad // PAGE, dtype=np.int32)
    state = write_pages(state, jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(table), PAGE)
    q = rng.normal(0, 0.5, (1, HQ, HD)).astype(np.float32)
    out, lse = paged_decode_attention(
        jnp.asarray(q), state.k_pages, state.v_pages, state.k_scales,
        state.v_scales, jnp.asarray([n], np.int32),
        jnp.asarray(table[None]), save_residuals=True)
    assert lse.shape == (1, HQ)

    kk = _dequant8(state.k_pages, state.k_scales, table)
    qg = q[0].reshape(HKV, HQ // HKV, HD).astype(np.float64)
    s = np.einsum("hgd,hnd->hgn", qg, kk[:, :n]) * HD**-0.5
    want = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)
    np.testing.assert_allclose(
        np.asarray(lse)[0], want.reshape(HQ), rtol=2e-5, atol=2e-5)


def test_mixed_decode_matches_stored_golden(rng):
    """Mixed decode == exact attention over what each pool actually
    stores, across boundary-straddling and multi-page-bulk lengths."""
    lengths = [200, 300]
    state, t8, t4, k_full, v_full, boundary = _fill_mixed(rng, lengths)
    q = rng.normal(0, 0.5, (len(lengths), HQ, HD)).astype(np.float32)
    out = mixed_paged_decode_attention(
        jnp.asarray(q), state, jnp.asarray(lengths, np.int32),
        jnp.asarray(t8), jnp.asarray(t4), boundary)
    for b, n in enumerate(lengths):
        k8 = _dequant8(state.k8, state.k8_scales, t8[b][t8[b] > 0])
        v8 = _dequant8(state.v8, state.v8_scales, t8[b][t8[b] > 0])
        k4 = _dequant4(state.k4, state.k4_scales, t4[b][t4[b] > 0])
        v4 = _dequant4(state.v4, state.v4_scales, t4[b][t4[b] > 0])
        kk = np.concatenate([k8, k4], axis=1)
        vv = np.concatenate([v8, v4], axis=1)
        want = _golden(q[b], kk, vv, n)
        np.testing.assert_allclose(np.asarray(out[b]), want, rtol=2e-4, atol=2e-4)


def test_mixed_short_sequence_equals_pure_int8(rng):
    """A sequence shorter than the boundary produces an all-masked int4
    partial (lse = -inf) that must drop out of the merge EXACTLY."""
    lengths = [100]  # < boundary of 128
    state, t8, t4, k_full, v_full, boundary = _fill_mixed(rng, lengths)
    q = rng.normal(0, 0.5, (1, HQ, HD)).astype(np.float32)
    mixed = mixed_paged_decode_attention(
        jnp.asarray(q), state, jnp.asarray(lengths, np.int32),
        jnp.asarray(t8), jnp.asarray(t4), boundary)
    pure8 = paged_decode_attention(
        jnp.asarray(q), state.k8, state.v8, state.k8_scales, state.v8_scales,
        jnp.asarray(lengths, np.int32), jnp.asarray(t8))
    np.testing.assert_allclose(
        np.asarray(mixed), np.asarray(pure8), rtol=1e-6, atol=1e-6)


def test_mixed_beats_pure_int4_with_sink_outliers(rng):
    """Run 12's motivating case: 8x outliers in the sink tokens. The mixed
    cache (int8 sinks) must be materially closer to the float golden than
    an all-int4 cache."""
    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks_int4

    lengths = [384]
    state, t8, t4, k_full, v_full, boundary = _fill_mixed(
        rng, lengths, sink_outliers=True)
    q = rng.normal(0, 0.5, (1, HQ, HD)).astype(np.float32)
    n = lengths[0]
    mixed = mixed_paged_decode_attention(
        jnp.asarray(q), state, jnp.asarray(lengths, np.int32),
        jnp.asarray(t8), jnp.asarray(t4), boundary)

    # All-int4 cache over the same tokens (page-granular scales via subs=4,
    # same as the mixed bulk).
    k = k_full[0][None]  # [1, Hkv, n_pad, HD] for quantize_kv_blocks_int4
    v = v_full[0][None]
    kq, ks = quantize_kv_blocks_int4(jnp.asarray(k), PAGE, scale_block=PAGE // 4)
    vq, vs = quantize_kv_blocks_int4(jnp.asarray(v), PAGE, scale_block=PAGE // 4)
    n_pages = k.shape[2] // PAGE
    table = np.arange(n_pages, dtype=np.int32)[None]
    pure4 = paged_decode_attention_int4(
        jnp.asarray(q),
        kq[0].reshape(HKV, n_pages, PAGE, HD // 2),
        vq[0].reshape(HKV, n_pages, PAGE, HD // 2),
        ks[0].reshape(HKV, n_pages, 4),
        vs[0].reshape(HKV, n_pages, 4),
        jnp.asarray(lengths, np.int32), jnp.asarray(table))

    want = _golden(q[0], k_full[0].astype(np.float64),
                   v_full[0].astype(np.float64), n)
    err_mixed = np.abs(np.asarray(mixed[0]) - want).mean()
    err_int4 = np.abs(np.asarray(pure4[0]) - want).mean()
    assert err_mixed < err_int4 * 0.8, (
        f"mixed {err_mixed:.5f} not materially better than int4 {err_int4:.5f}")


def test_append_token_int4_roundtrip(rng):
    """Decode-time appends land nibble-packed in the int4 bulk and are
    read back by the mixed decode within int4 quantization error."""
    lengths = [256]  # exactly boundary(128) + one full int4 page
    state, t8, t4, k_full, v_full, boundary = _fill_mixed(rng, lengths)
    # Append 3 tokens into a fresh int4 page (id 2 in the pool).
    new_page = 2
    t4 = np.concatenate([t4, [[new_page]]], axis=1)
    k_toks = rng.normal(0, 0.5, (3, HKV, HD)).astype(np.float32)
    v_toks = rng.normal(0, 0.5, (3, HKV, HD)).astype(np.float32)
    for i in range(3):
        state = append_token_int4(
            state, jnp.asarray(k_toks[i]), jnp.asarray(v_toks[i]),
            jnp.asarray(new_page, jnp.int32), jnp.asarray(i, jnp.int32))
    n = lengths[0] + 3
    q = rng.normal(0, 0.5, (1, HQ, HD)).astype(np.float32)
    out = mixed_paged_decode_attention(
        jnp.asarray(q), state, jnp.asarray([n], np.int32),
        jnp.asarray(t8), jnp.asarray(t4), boundary)

    k_all = np.concatenate([k_full[0], k_toks.transpose(1, 0, 2)], axis=1)
    v_all = np.concatenate([v_full[0], v_toks.transpose(1, 0, 2)], axis=1)
    want = _golden(q[0], k_all.astype(np.float64), v_all.astype(np.float64), n)
    # Bulk is int4: format-level tolerance vs the FLOAT golden.
    np.testing.assert_allclose(np.asarray(out[0]), want, rtol=0.12, atol=0.12)


def test_quantize_page_int4_matches_blocks_helper(rng):
    """The per-page quantizer must produce the same layout as
    ops.quantize.quantize_kv_blocks_int4 (the decode kernel's contract)."""
    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks_int4

    x = rng.normal(0, 0.5, (HKV, PAGE, HD)).astype(np.float32)
    qp, sp = quantize_page_int4(jnp.asarray(x), subs=4)
    qb, sb = quantize_kv_blocks_int4(
        jnp.asarray(x[None]), PAGE, scale_block=PAGE // 4)
    np.testing.assert_array_equal(np.asarray(qp), np.asarray(qb)[0])
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(sb)[0].reshape(HKV, 4), rtol=1e-6)


def _golden_masked(q, k, v, visible):
    """Exact softmax attention over an explicit position-visibility mask."""
    hq, d = q.shape
    hkv = k.shape[0]
    group = hq // hkv
    qg = q.reshape(hkv, group, d).astype(np.float64)
    s = np.einsum("hgd,hnd->hgn", qg, k.astype(np.float64)) * d**-0.5
    s = np.where(visible[None, None, :], s, -np.inf)
    s -= s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    o = np.einsum("hgn,hnd->hgd", p, v.astype(np.float64))
    return o.reshape(hq, d)


def test_mixed_windowed_decode_and_trimmed_slot_safety(rng):
    """StreamingLLM serving shape: sinks == boundary, sliding window on the
    bulk. The masks of the two partials must compose to exactly
    sinks + window — and table slots the engine has trimmed (remapped to
    a scrap/garbage page) must be PROVABLY masked, not just unread."""
    n, window = 640, 256  # boundary/sinks = 128 (one page)
    state, t8, t4, k_full, v_full, boundary = _fill_mixed(
        rng, [n], n8=4, n4=12)
    q = rng.normal(0, 0.5, (1, HQ, HD)).astype(np.float32)
    out = mixed_paged_decode_attention(
        jnp.asarray(q), state, jnp.asarray([n], np.int32),
        jnp.asarray(t8), jnp.asarray(t4), boundary,
        window=window, attention_sinks=boundary)

    # Golden over the stored payloads with the exact visibility set:
    # sinks [0, 128) + window [n - 256, n).
    k8 = _dequant8(state.k8, state.k8_scales, t8[0][t8[0] > 0])
    v8 = _dequant8(state.v8, state.v8_scales, t8[0][t8[0] > 0])
    k4 = _dequant4(state.k4, state.k4_scales, t4[0][t4[0] > 0])
    v4 = _dequant4(state.v4, state.v4_scales, t4[0][t4[0] > 0])
    kk = np.concatenate([k8, k4], axis=1)[:, :n]
    vv = np.concatenate([v8, v4], axis=1)[:, :n]
    pos = np.arange(n)
    visible = (pos < boundary) | (pos >= n - window)
    want = _golden_masked(q[0], kk, vv, visible)
    np.testing.assert_allclose(np.asarray(out[0]), want, rtol=2e-4, atol=2e-4)

    # Trim simulation: int4 logical pages covering absolute [128, 384) are
    # wholly behind the window — remap their table slots to a GARBAGE page
    # (id 11, filled with +127 nibbles). Output must not move at all.
    garbage = jnp.full_like(state.k4[:, :1], 0x77)  # both nibbles = +7
    state2 = dataclasses.replace(
        state,
        k4=state.k4.at[:, 11].set(garbage[:, 0]),
        v4=state.v4.at[:, 11].set(garbage[:, 0]),
        k4_scales=state.k4_scales.at[:, 11].set(1.0),
        v4_scales=state.v4_scales.at[:, 11].set(1.0),
    )
    t4_trim = t4.copy()
    t4_trim[0, :2] = 11  # int4 logical pages 0,1 = absolute [128, 384)
    out2 = mixed_paged_decode_attention(
        jnp.asarray(q), state2, jnp.asarray([n], np.int32),
        jnp.asarray(t8), jnp.asarray(t4_trim), boundary,
        window=window, attention_sinks=boundary)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_mixed_windowed_requires_sinks_equal_boundary(rng):
    state, t8, t4, _, _, boundary = _fill_mixed(rng, [256])
    q = jnp.zeros((1, HQ, HD), jnp.float32)
    with pytest.raises(ValueError, match="boundary_tokens"):
        mixed_paged_decode_attention(
            q, state, jnp.asarray([256], np.int32),
            jnp.asarray(t8), jnp.asarray(t4), boundary,
            window=128, attention_sinks=0)


def test_append_token_mixed_routes_below_boundary(rng):
    """A prefill SHORTER than the boundary keeps decoding into the INT8
    pool: appended tokens must be readable (the int4-only append would
    silently drop them)."""
    from quantizedmha_tpu.serving.mixed_kv import append_token_mixed

    lengths = [100]  # < boundary 128: tokens 100.. belong to the int8 pool
    state, t8, t4, k_full, v_full, boundary = _fill_mixed(rng, lengths)
    page8 = int(t8[0, 0])  # the partially-filled int8 page
    k_toks = rng.normal(0, 0.5, (3, HKV, HD)).astype(np.float32)
    v_toks = rng.normal(0, 0.5, (3, HKV, HD)).astype(np.float32)
    for i in range(3):
        state = append_token_mixed(
            state, jnp.asarray(k_toks[i]), jnp.asarray(v_toks[i]),
            position=100 + i, boundary_tokens=boundary,
            page_id=jnp.asarray(page8, jnp.int32),
            slot=jnp.asarray(100 + i, jnp.int32))
    n = 103
    q = rng.normal(0, 0.5, (1, HQ, HD)).astype(np.float32)
    out = mixed_paged_decode_attention(
        jnp.asarray(q), state, jnp.asarray([n], np.int32),
        jnp.asarray(t8), jnp.asarray(t4), boundary)
    k_all = np.concatenate(
        [k_full[0][:, :100], k_toks.transpose(1, 0, 2)], axis=1)
    v_all = np.concatenate(
        [v_full[0][:, :100], v_toks.transpose(1, 0, 2)], axis=1)
    want = _golden(q[0], k_all.astype(np.float64), v_all.astype(np.float64), n)
    # int8-format tolerance (appends clamp into the page's existing scale)
    np.testing.assert_allclose(np.asarray(out[0]), want, rtol=2e-2, atol=2e-2)


def test_mixed_prefill_matches_stored_golden(rng):
    """q_len > 1 mixed attention: a chunk STRADDLING the boundary must see
    the int8 region for its early rows and both regions causally for the
    late ones."""
    from quantizedmha_tpu.serving.mixed_kv import mixed_paged_prefill_attention

    n = 320
    state, t8, t4, k_full, v_full, boundary = _fill_mixed(rng, [n])
    q_len, q_start = 64, 96  # rows at absolute [96, 160): straddles 128
    q = rng.normal(0, 0.5, (1, HQ, q_len, HD)).astype(np.float32)
    out = mixed_paged_prefill_attention(
        jnp.asarray(q), state, jnp.asarray([n], np.int32),
        jnp.asarray([q_start], np.int32),
        jnp.asarray(t8), jnp.asarray(t4), boundary, block_q=16)

    k8 = _dequant8(state.k8, state.k8_scales, t8[0][t8[0] > 0])
    v8 = _dequant8(state.v8, state.v8_scales, t8[0][t8[0] > 0])
    k4 = _dequant4(state.k4, state.k4_scales, t4[0][t4[0] > 0])
    v4 = _dequant4(state.v4, state.v4_scales, t4[0][t4[0] > 0])
    kk = np.concatenate([k8, k4], axis=1)
    vv = np.concatenate([v8, v4], axis=1)
    group = HQ // HKV
    for r in range(q_len):
        qpos = q_start + r
        want = _golden(q[0, :, r, :], kk, vv, qpos + 1)
        np.testing.assert_allclose(
            np.asarray(out[0, :, r, :]), want, rtol=3e-4, atol=3e-4)


def test_mixed_prefill_agrees_with_mixed_decode_at_qlen1(rng):
    from quantizedmha_tpu.serving.mixed_kv import mixed_paged_prefill_attention

    n = 300
    state, t8, t4, k_full, v_full, boundary = _fill_mixed(rng, [n])
    q = rng.normal(0, 0.5, (1, HQ, HD)).astype(np.float32)
    out_d = mixed_paged_decode_attention(
        jnp.asarray(q), state, jnp.asarray([n], np.int32),
        jnp.asarray(t8), jnp.asarray(t4), boundary)
    out_p = mixed_paged_prefill_attention(
        jnp.asarray(q)[:, :, None, :], state, jnp.asarray([n], np.int32),
        jnp.asarray([n - 1], np.int32),
        jnp.asarray(t8), jnp.asarray(t4), boundary)
    np.testing.assert_allclose(
        np.asarray(out_p[:, :, 0, :]), np.asarray(out_d),
        rtol=2e-5, atol=2e-5)


def test_mixed_prefill_windowed(rng):
    """Windowed mixed chunked prefill: sinks == boundary, exact two-frame
    window composition for q_len > 1."""
    from quantizedmha_tpu.serving.mixed_kv import mixed_paged_prefill_attention

    n, window = 640, 192
    state, t8, t4, k_full, v_full, boundary = _fill_mixed(rng, [n])
    q_len, q_start = 32, n - 32
    q = rng.normal(0, 0.5, (1, HQ, q_len, HD)).astype(np.float32)
    out = mixed_paged_prefill_attention(
        jnp.asarray(q), state, jnp.asarray([n], np.int32),
        jnp.asarray([q_start], np.int32),
        jnp.asarray(t8), jnp.asarray(t4), boundary, block_q=16,
        window=window, attention_sinks=boundary)

    k8 = _dequant8(state.k8, state.k8_scales, t8[0][t8[0] > 0])
    v8 = _dequant8(state.v8, state.v8_scales, t8[0][t8[0] > 0])
    k4 = _dequant4(state.k4, state.k4_scales, t4[0][t4[0] > 0])
    v4 = _dequant4(state.v4, state.v4_scales, t4[0][t4[0] > 0])
    kk = np.concatenate([k8, k4], axis=1)[:, :n]
    vv = np.concatenate([v8, v4], axis=1)[:, :n]
    pos = np.arange(n)
    for r in range(q_len):
        qpos = q_start + r
        visible = ((pos < boundary) | (pos > qpos - window)) & (pos <= qpos)
        want = _golden_masked(q[0, :, r, :], kk, vv, visible)
        np.testing.assert_allclose(
            np.asarray(out[0, :, r, :]), want, rtol=3e-4, atol=3e-4)


# --- Adapter wiring (llama_adapter mixed serving paths) -------------------


def test_adapter_mixed_matches_int8_when_boundary_covers_context(rng):
    """With boundary_tokens >= every context length, the mixed adapters
    must reproduce the pure-int8 adapters: identical int8-pool contents,
    an all-masked int4 partial that drops out of the lse merge, logits
    within merge-arithmetic tolerance at every step."""
    import jax

    from quantizedmha_tpu.models.llama import LlamaConfig, init_params
    from quantizedmha_tpu.serving import llama_adapter as la

    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(3))
    page, boundary = 8, 64
    n = 12  # two pages (+ padding), decode grows into page 3

    toks = np.zeros((1, 16), np.int32)
    toks[0, :n] = rng.integers(1, cfg.vocab_size, n)
    logits0, k_all, v_all = la.prefill_at(
        cfg, params, jnp.asarray(toks), jnp.int32(n - 1))
    keep = (jnp.arange(16) < n)[None, None, :, None]
    k_w, v_w = k_all * keep, v_all * keep

    cache8 = la.make_cache(cfg, 8, page)
    cache8 = la.write_prefill(cfg, cache8, k_w, v_w,
                              jnp.asarray([1, 2], jnp.int32), page_size=page)
    cm = la.make_cache_mixed(cfg, 8, 4, page)
    cm = la.write_prefill_mixed(
        cfg, cm, k_w, v_w, jnp.asarray([1, 2], jnp.int32),
        jnp.zeros((0,), jnp.int32), page_size=page)
    np.testing.assert_array_equal(np.asarray(cm.k8), np.asarray(cache8.k_pages))
    np.testing.assert_array_equal(np.asarray(cm.k8_scales),
                                  np.asarray(cache8.k_scales))

    table = np.zeros((1, 8), np.int32)
    table[0, :3] = [1, 2, 3]
    t8 = jnp.asarray(table)
    t4 = jnp.zeros((1, 4), jnp.int32)
    tok = jnp.asarray([int(jnp.argmax(logits0[0]))], jnp.int32)
    for step in range(5):
        pos = jnp.asarray([n + step], jnp.int32)
        pid = t8[0, (n + step) // page][None]
        slot = pos % page
        lens = pos + 1
        l8, cache8 = la.decode_step(
            cfg, params, cache8, tok, pos, pid, slot, lens, t8)
        lm, cm = la.decode_step_mixed(
            cfg, params, cm, tok, pos, pid, jnp.zeros(1, jnp.int32),
            slot, lens, t8, t4, boundary_tokens=boundary)
        np.testing.assert_allclose(np.asarray(lm), np.asarray(l8),
                                   rtol=1e-5, atol=1e-5)
        a, b = int(jnp.argmax(l8[0])), int(jnp.argmax(lm[0]))
        assert a == b
        tok = jnp.asarray([a], jnp.int32)


def test_adapter_prefill_chunk_mixed_matches_int8(rng):
    """Chunked prefill through the mixed cache (boundary covers the whole
    prompt): same logits per chunk as the int8 path, and the traced
    page routing writes the identical int8 pool."""
    import jax

    from quantizedmha_tpu.models.llama import LlamaConfig, init_params
    from quantizedmha_tpu.serving import llama_adapter as la

    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(4))
    page, boundary, C, n = 8, 64, 8, 24

    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, n)), jnp.int32)
    cache8 = la.make_cache(cfg, 8, page)
    cm = la.make_cache_mixed(cfg, 8, 4, page)
    table = np.zeros((8,), np.int32)
    table[:3] = [1, 2, 3]
    t8 = jnp.asarray(table)
    t4 = jnp.zeros((4,), jnp.int32)
    for c0 in range(0, n, C):
        chunk = tokens[:, c0:c0 + C]
        l8, cache8 = la.prefill_chunk(
            cfg, params, cache8, chunk, jnp.int32(c0), t8,
            jnp.int32(C - 1), page_size=page)
        lm, cm = la.prefill_chunk_mixed(
            cfg, params, cm, chunk, jnp.int32(c0), t8, t4,
            jnp.int32(C - 1), page_size=page, boundary_tokens=boundary)
        np.testing.assert_allclose(np.asarray(lm), np.asarray(l8),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cm.k8), np.asarray(cache8.k_pages))


def test_batched_int4_append_matches_single(rng):
    """append_tokens_batched_int4 == a loop of append_token_int4 (same
    sub-tile scale policy, nibble packing, distinct pages per lane)."""
    state = MixedPagedKVState.create(HKV, 2, 4, PAGE, HD)
    k = rng.normal(0, 0.5, (3, HKV, HD)).astype(np.float32)
    v = rng.normal(0, 0.5, (3, HKV, HD)).astype(np.float32)
    pages = np.asarray([1, 2, 3], np.int32)
    slots = np.asarray([0, 5, 32], np.int32)

    from quantizedmha_tpu.serving.mixed_kv import append_tokens_batched_int4

    got = append_tokens_batched_int4(
        state, jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(pages), jnp.asarray(slots))
    want = state
    for i in range(3):
        want = append_token_int4(
            want, jnp.asarray(k[i]), jnp.asarray(v[i]),
            jnp.asarray(pages[i]), jnp.asarray(slots[i]))
    np.testing.assert_array_equal(np.asarray(got.k4), np.asarray(want.k4))
    np.testing.assert_array_equal(np.asarray(got.v4_scales),
                                  np.asarray(want.v4_scales))


def test_batched_mixed_append_routes_by_position(rng):
    """append_tokens_batched_mixed: lanes below the boundary write the
    int8 pool (int4 side goes to scrap), lanes past it the reverse —
    matching append_token_mixed lane by lane on the real pages."""
    from quantizedmha_tpu.serving.mixed_kv import (
        append_token_mixed, append_tokens_batched_mixed)

    boundary = PAGE  # one int8 page per sequence
    state = MixedPagedKVState.create(HKV, 3, 4, PAGE, HD)
    k = rng.normal(0, 0.5, (2, HKV, HD)).astype(np.float32)
    v = rng.normal(0, 0.5, (2, HKV, HD)).astype(np.float32)
    positions = np.asarray([5, PAGE + 9], np.int32)  # below, past
    pid8 = np.asarray([1, 0], np.int32)
    pid4 = np.asarray([0, 2], np.int32)
    slots = positions % PAGE

    got = append_tokens_batched_mixed(
        state, jnp.asarray(k), jnp.asarray(v), jnp.asarray(positions),
        boundary, jnp.asarray(pid8), jnp.asarray(pid4), jnp.asarray(slots))
    want = append_token_mixed(
        state, jnp.asarray(k[0]), jnp.asarray(v[0]), position=5,
        boundary_tokens=boundary, page_id=jnp.asarray(1),
        slot=jnp.asarray(5))
    want = append_token_mixed(
        want, jnp.asarray(k[1]), jnp.asarray(v[1]), position=PAGE + 9,
        boundary_tokens=boundary, page_id=jnp.asarray(2),
        slot=jnp.asarray(9))
    np.testing.assert_array_equal(np.asarray(got.k8[:, 1]),
                                  np.asarray(want.k8[:, 1]))
    np.testing.assert_array_equal(np.asarray(got.k4[:, 2]),
                                  np.asarray(want.k4[:, 2]))
    np.testing.assert_array_equal(np.asarray(got.k8_scales[:, 1]),
                                  np.asarray(want.k8_scales[:, 1]))
    np.testing.assert_array_equal(np.asarray(got.k4_scales[:, 2]),
                                  np.asarray(want.k4_scales[:, 2]))
