"""Paged INT8 decode kernel + KV cache tests.

Golden: dequantize the pages in jnp and run exact softmax attention — the
kernel must match within int8 quantization error of the *cache write*, not
of the kernel itself (the kernel's arithmetic on the stored int8 is exact).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.ops.decode import paged_decode_attention
from quantizedmha_tpu.serving.kv_cache import (
    PageAllocator,
    PagedKVCacheState,
    append_token,
    quantize_page,
    write_pages,
)

PAGE = 128


def _setup_cache(rng, num_kv_heads=2, num_pages=16, head_dim=64, lengths=(200, 128)):
    state = PagedKVCacheState.create(num_kv_heads, num_pages, PAGE, head_dim)
    alloc = PageAllocator(num_pages, PAGE)
    k_full, v_full = [], []
    for sid, n in enumerate(lengths):
        n_pad = -(-n // PAGE) * PAGE
        k = rng.normal(0, 0.5, (num_kv_heads, n_pad, head_dim)).astype(np.float32)
        v = rng.normal(0, 0.5, (num_kv_heads, n_pad, head_dim)).astype(np.float32)
        k[:, n:] = 0
        v[:, n:] = 0
        pages = alloc.admit(sid, n)
        # admit() allocates ceil(n / PAGE) pages; write the padded tokens.
        state = write_pages(state, jnp.asarray(k), jnp.asarray(v), jnp.asarray(pages, jnp.int32), PAGE)
        k_full.append(k)
        v_full.append(v)
    return state, alloc, k_full, v_full


def _golden_decode(q, k, v, length):
    """q: [Hq, D]; k/v: [Hkv, n_pad, D] float; exact softmax over :length."""
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


def test_paged_decode_matches_dequantized_golden(rng):
    state, alloc, k_full, v_full = _setup_cache(rng)
    seq_ids = [0, 1]
    lengths = alloc.lengths_array(seq_ids)
    tables = alloc.block_table_array(seq_ids, max_pages=4)

    hq, d = 4, 64
    q = rng.normal(0, 0.5, (2, hq, d)).astype(np.float32)
    out = paged_decode_attention(
        jnp.asarray(q), state.k_pages, state.v_pages, state.k_scales,
        state.v_scales, jnp.asarray(lengths), jnp.asarray(tables),
    )
    assert out.shape == (2, hq, d)

    for b, sid in enumerate(seq_ids):
        # Dequantized golden: what the cache actually stores.
        table = alloc.tables[sid]
        kk = np.asarray(state.k_pages)[:, table].astype(np.float64)
        kk *= np.asarray(state.k_scales)[:, table][:, :, None, None]
        vv = np.asarray(state.v_pages)[:, table].astype(np.float64)
        vv *= np.asarray(state.v_scales)[:, table][:, :, None, None]
        kk = kk.reshape(kk.shape[0], -1, d)
        vv = vv.reshape(vv.shape[0], -1, d)
        want = _golden_decode(q[b], kk, vv, alloc.lengths[sid])
        got = np.asarray(out[b], np.float64)
        assert np.max(np.abs(got - want)) < 1e-4, f"seq {sid}: {np.max(np.abs(got - want))}"


def test_paged_decode_close_to_fp32_attention(rng):
    """End-to-end (quantization included) error budget vs unquantized."""
    state, alloc, k_full, v_full = _setup_cache(rng)
    lengths = alloc.lengths_array([0, 1])
    tables = alloc.block_table_array([0, 1], max_pages=4)
    q = rng.normal(0, 0.5, (2, 4, 64)).astype(np.float32)
    out = paged_decode_attention(
        jnp.asarray(q), state.k_pages, state.v_pages, state.k_scales,
        state.v_scales, jnp.asarray(lengths), jnp.asarray(tables),
    )
    for b in range(2):
        want = _golden_decode(q[b], k_full[b], v_full[b], alloc.lengths[[0, 1][b]])
        err = np.max(np.abs(np.asarray(out[b], np.float64) - want))
        assert err < 0.03, f"seq {b}: int8 cache error {err}"


def test_append_token_roundtrip(rng):
    state = PagedKVCacheState.create(2, 4, PAGE, 32)
    k_tok = jnp.asarray(rng.normal(0, 0.5, (2, 32)).astype(np.float32))
    v_tok = jnp.asarray(rng.normal(0, 0.5, (2, 32)).astype(np.float32))
    state = append_token(state, k_tok, v_tok, jnp.int32(2), jnp.int32(0))
    got = np.asarray(state.k_pages)[:, 2, 0].astype(np.float32) * np.asarray(state.k_scales)[:, 2, None]
    np.testing.assert_allclose(got, np.asarray(k_tok), atol=0.01)


def test_allocator_lifecycle():
    alloc = PageAllocator(num_pages=8, page_size=128)
    pages = alloc.admit(0, 300)  # 3 pages
    assert len(pages) == 3 and alloc.free_pages == 5
    # decode: token 300 goes in page 2 slot 44
    pid, slot, new = alloc.extend(0)
    assert (pid, slot, new) == (pages[2], 300 % 128, None)
    # fill page 2, next extend allocates page 3
    alloc.lengths[0] = 384
    pid, slot, new = alloc.extend(0)
    assert slot == 0 and new is not None and alloc.free_pages == 4
    alloc.release(0)
    assert alloc.free_pages == 8
    with pytest.raises(RuntimeError):
        alloc.admit(1, 128 * 100)


def test_quantize_page_roundtrip(rng):
    x = jnp.asarray(rng.normal(0, 2.0, (2, PAGE, 32)).astype(np.float32))
    q, s = quantize_page(x)
    got = q.astype(jnp.float32) * s[:, None, None]
    assert float(jnp.max(jnp.abs(got - x))) <= float(jnp.max(s)) * 0.5 + 1e-6


def test_paged_decode_sliding_window_and_softcap(rng):
    """Decode against the paged cache with a sliding window + soft-cap must
    match a jnp reference attending only the last W positions."""
    import jax
    from quantizedmha_tpu.ops.decode import paged_decode_attention
    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks

    hkv, hq, d, page, npages = 2, 4, 64, 16, 8
    length, W, cap = 100, 40, 25.0
    kf = jnp.asarray(rng.normal(0, .5, (1, hkv, npages * page, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(0, .5, (1, hkv, npages * page, d)), jnp.float32)
    q = jnp.asarray(rng.normal(0, .5, (1, hq, d)), jnp.float32)
    k8, ks = quantize_kv_blocks(kf, page)
    v8, vs = quantize_kv_blocks(vf, page)
    k_pages = k8[0].reshape(hkv, npages, page, d)
    v_pages = v8[0].reshape(hkv, npages, page, d)
    out = paged_decode_attention(
        q, k_pages, v_pages, ks[0], vs[0],
        jnp.asarray([length], jnp.int32),
        jnp.arange(npages, dtype=jnp.int32)[None, :],
        window=W, logit_softcap=cap,
    )
    # jnp reference over the DEQUANTIZED cache (isolates masking semantics).
    kd = (k_pages.astype(jnp.float32)
          * ks[0][:, :, None, None]).reshape(hkv, -1, d)
    vd = (v_pages.astype(jnp.float32)
          * vs[0][:, :, None, None]).reshape(hkv, -1, d)
    kd = jnp.repeat(kd, hq // hkv, 0)
    vd = jnp.repeat(vd, hq // hkv, 0)
    s = jnp.einsum("hd,hkd->hk", q[0] * d ** -0.5, kd)
    s = cap * jnp.tanh(s / cap)
    pos = jnp.arange(npages * page)
    s = jnp.where((pos < length) & (pos >= length - W), s, -jnp.inf)
    ref = jnp.einsum("hk,hkd->hd", jax.nn.softmax(s, -1), vd)
    assert np.abs(np.asarray(out[0]) - np.asarray(ref)).max() < 2e-2


def test_paged_decode_attention_sinks(rng):
    """Decode with window + sinks: the first pages stay visible."""
    import jax
    from quantizedmha_tpu.ops.decode import paged_decode_attention
    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks

    hkv, hq, d, page, npages = 2, 4, 64, 16, 8
    length, W, sinks = 100, 40, 8
    kf = jnp.asarray(rng.normal(0, .5, (1, hkv, npages * page, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(0, .5, (1, hkv, npages * page, d)), jnp.float32)
    q = jnp.asarray(rng.normal(0, .5, (1, hq, d)), jnp.float32)
    k8, ks = quantize_kv_blocks(kf, page)
    v8, vs = quantize_kv_blocks(vf, page)
    out = paged_decode_attention(
        q, k8[0].reshape(hkv, npages, page, d),
        v8[0].reshape(hkv, npages, page, d), ks[0], vs[0],
        jnp.asarray([length], jnp.int32),
        jnp.arange(npages, dtype=jnp.int32)[None, :],
        window=W, attention_sinks=sinks,
    )
    kd = (k8[0].reshape(hkv, npages, page, d).astype(jnp.float32)
          * ks[0][:, :, None, None]).reshape(hkv, -1, d)
    vd = (v8[0].reshape(hkv, npages, page, d).astype(jnp.float32)
          * vs[0][:, :, None, None]).reshape(hkv, -1, d)
    kd, vd = jnp.repeat(kd, hq // hkv, 0), jnp.repeat(vd, hq // hkv, 0)
    s = jnp.einsum("hd,hkd->hk", q[0] * d ** -0.5, kd)
    pos = jnp.arange(npages * page)
    vis = (pos < length) & ((pos >= length - W) | (pos < sinks))
    s = jnp.where(vis, s, -jnp.inf)
    ref = jnp.einsum("hk,hkd->hd", jax.nn.softmax(s, -1), vd)
    assert np.abs(np.asarray(out[0]) - np.asarray(ref)).max() < 2e-2


def test_paged_decode_int4_matches_dequant_reference(rng):
    """INT4 (nibble-packed, deinterleaved) decode kernel == jnp attention
    over the dequantized cache, exactly. Kept despite the measured latency
    negative (profiles/md/run8: the decode kernel is overhead-bound, not
    HBM-bound) for its 2x cache-capacity win."""
    import jax
    from quantizedmha_tpu.ops.decode import paged_decode_attention_int4
    from quantizedmha_tpu.ops.quantize import (
        dequantize_kv_blocks_int4,
        quantize_kv_blocks_int4,
    )

    hkv, hq, d, page, npages = 2, 4, 128, 16, 8
    length, W = 100, 40
    kf = jnp.asarray(rng.normal(0, .5, (1, hkv, npages * page, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(0, .5, (1, hkv, npages * page, d)), jnp.float32)
    q = jnp.asarray(rng.normal(0, .5, (1, hq, d)), jnp.float32)
    k4, ks = quantize_kv_blocks_int4(kf, page)
    v4, vs = quantize_kv_blocks_int4(vf, page)
    out = paged_decode_attention_int4(
        q, k4[0].reshape(hkv, npages, page, d // 2),
        v4[0].reshape(hkv, npages, page, d // 2), ks[0], vs[0],
        jnp.asarray([length], jnp.int32),
        jnp.arange(npages, dtype=jnp.int32)[None], window=W)
    kd = dequantize_kv_blocks_int4(k4, ks, page)[0]
    vd = dequantize_kv_blocks_int4(v4, vs, page)[0]
    kd, vd = jnp.repeat(kd, hq // hkv, 0), jnp.repeat(vd, hq // hkv, 0)
    s = jnp.einsum("hd,hkd->hk", q[0] * d ** -0.5, kd)
    pos = jnp.arange(npages * page)
    s = jnp.where((pos < length) & (pos >= length - W), s, -jnp.inf)
    ref = jnp.einsum("hk,hkd->hd", jax.nn.softmax(s, -1), vd)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_int4_quantize_roundtrip(rng):
    from quantizedmha_tpu.ops.quantize import (
        dequantize_kv_blocks_int4,
        quantize_kv_blocks_int4,
    )

    x = jnp.asarray(rng.normal(0, 2.0, (1, 2, 64, 64)), jnp.float32)
    p, s = quantize_kv_blocks_int4(x, 32)
    assert p.dtype == jnp.int8 and p.shape == (1, 2, 64, 32)
    deq = dequantize_kv_blocks_int4(p, s, 32)
    assert float(jnp.abs(deq - x).max()) <= float(s.max()) * 0.5 + 1e-6


def test_int4_decode_with_subpage_scales(rng):
    """Sub-page scale tiles (run12): the int4 kernel with
    [kvh, pages, subs] scales must match the dequantized-cache reference
    exactly as the per-page path does, and agree with it when the scales
    are constant across sub-tiles."""
    from quantizedmha_tpu.ops.decode import paged_decode_attention_int4
    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks_int4

    kvh, page, hd, n_pages = 2, 32, 32, 4
    S = page * n_pages
    k = jnp.asarray(rng.normal(0, 0.5, (1, kvh, S, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (1, kvh, S, hd)), jnp.float32)
    q = jnp.asarray(rng.normal(0, 0.5, (1, kvh * 2, hd)), jnp.float32)
    lengths = jnp.asarray([100], jnp.int32)
    tables = jnp.arange(n_pages, dtype=jnp.int32)[None]

    for subs in (1, 2, 4):
        tile = page // subs
        kq, ks = quantize_kv_blocks_int4(k, page, scale_block=tile)
        vq, vs = quantize_kv_blocks_int4(v, page, scale_block=tile)
        k_pages = kq[0].reshape(kvh, n_pages, page, hd // 2)
        v_pages = vq[0].reshape(kvh, n_pages, page, hd // 2)
        k_sc = ks[0].reshape(kvh, n_pages, subs)
        v_sc = vs[0].reshape(kvh, n_pages, subs)
        out = paged_decode_attention_int4(
            q, k_pages, v_pages,
            k_sc if subs > 1 else k_sc[..., 0],
            v_sc if subs > 1 else v_sc[..., 0],
            lengths, tables)
        # reference on the dequantized cache
        from quantizedmha_tpu.ops.quantize import dequantize_kv_blocks_int4

        kd = np.asarray(dequantize_kv_blocks_int4(kq, ks, tile))[0, :, :100]
        vd = np.asarray(dequantize_kv_blocks_int4(vq, vs, tile))[0, :, :100]
        kg = np.repeat(kd, 2, axis=0)
        vg = np.repeat(vd, 2, axis=0)
        s = np.einsum("hd,hkd->hk", np.asarray(q)[0], kg) / np.sqrt(hd)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("hk,hkd->hd", p, vg)
        np.testing.assert_allclose(np.asarray(out)[0], want,
                                   atol=2e-3, rtol=2e-2)


def test_padding_table_entries_never_read(rng):
    """Block-table PADDING may hold garbage physical ids whose pool scales
    are non-finite; the J>1 folded kernel must clamp its scale reads to the
    sequence's last owned page (ADVICE r3: p == 0 does not neutralize a
    non-finite v-scale — 0 * nan poisons pv)."""
    state, alloc, k_full, v_full = _setup_cache(rng)  # 200/128 toks = 2 pages each
    lengths = alloc.lengths_array([0, 1])
    tables = np.asarray(alloc.block_table_array([0, 1], max_pages=4))
    owned = {p for t in alloc.tables.values() for p in t}
    poison = max(set(range(state.k_pages.shape[1])) - owned)
    tables[:, 2:] = poison  # padding slots -> a page with nan scales
    k_scales = state.k_scales.at[:, poison].set(jnp.nan)
    v_scales = state.v_scales.at[:, poison].set(jnp.nan)

    q = rng.normal(0, 0.5, (2, 4, 64)).astype(np.float32)
    out = paged_decode_attention(
        jnp.asarray(q), state.k_pages, state.v_pages, k_scales, v_scales,
        jnp.asarray(lengths), jnp.asarray(tables), pages_per_step=4,
    )
    assert np.isfinite(np.asarray(out)).all()
    for b, sid in enumerate([0, 1]):
        table = alloc.tables[sid]
        kk = np.asarray(state.k_pages)[:, table].astype(np.float64)
        kk *= np.asarray(state.k_scales)[:, table][:, :, None, None]
        vv = np.asarray(state.v_pages)[:, table].astype(np.float64)
        vv *= np.asarray(state.v_scales)[:, table][:, :, None, None]
        kk = kk.reshape(kk.shape[0], -1, 64)
        vv = vv.reshape(vv.shape[0], -1, 64)
        want = _golden_decode(q[b], kk, vv, alloc.lengths[sid])
        assert np.max(np.abs(np.asarray(out[b], np.float64) - want)) < 1e-4


def test_pages_per_step_budget_guard(rng):
    """An explicit oversized fold must fail loudly at the call site, not as
    a VMEM blowout inside Mosaic (ADVICE r3)."""
    state, alloc, _, _ = _setup_cache(rng)
    lengths = alloc.lengths_array([0, 1])
    tables = alloc.block_table_array([0, 1], max_pages=4)
    q = jnp.asarray(rng.normal(0, 0.5, (2, 4, 64)).astype(np.float32))
    with pytest.raises(ValueError, match="per-step tile budget"):
        paged_decode_attention(
            q, state.k_pages, state.v_pages, state.k_scales, state.v_scales,
            jnp.asarray(lengths), jnp.asarray(tables), pages_per_step=32)


def test_stacked_layer_kernel_matches_per_layer(rng):
    """5-D layer-stacked pools + the prefetched `layer` scalar must read
    exactly the selected layer: parity vs the 4-D kernel on each layer's
    slice, across fold widths, windowing, and save_residuals."""
    states = []
    for seed in (0, 1, 2):
        r = np.random.default_rng(seed)
        s, alloc, _, _ = _setup_cache(r)
        states.append(s)
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    lengths = alloc.lengths_array([0, 1])
    tables = alloc.block_table_array([0, 1], max_pages=4)
    q = jnp.asarray(rng.normal(0, 0.5, (2, 4, 64)).astype(np.float32))

    for li in range(3):
        for kw in ({}, {"pages_per_step": 1},
                   {"window": 128, "attention_sinks": 0},
                   {"save_residuals": True}):
            got = paged_decode_attention(
                q, stack.k_pages, stack.v_pages, stack.k_scales,
                stack.v_scales, jnp.asarray(lengths), jnp.asarray(tables),
                layer=jnp.int32(li), **kw)
            want = paged_decode_attention(
                q, states[li].k_pages, states[li].v_pages,
                states[li].k_scales, states[li].v_scales,
                jnp.asarray(lengths), jnp.asarray(tables), **kw)
            if kw.get("save_residuals"):
                np.testing.assert_allclose(np.asarray(got[1]),
                                           np.asarray(want[1]), atol=1e-6)
                got, want = got[0], want[0]
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-6)


def test_stacked_kernel_arg_validation(rng):
    state, alloc, _, _ = _setup_cache(rng)
    lengths = jnp.asarray(alloc.lengths_array([0, 1]))
    tables = jnp.asarray(alloc.block_table_array([0, 1], max_pages=4))
    q = jnp.asarray(rng.normal(0, 0.5, (2, 4, 64)).astype(np.float32))
    with pytest.raises(ValueError, match="layer"):
        paged_decode_attention(
            q, state.k_pages, state.v_pages, state.k_scales, state.v_scales,
            lengths, tables, layer=jnp.int32(0))
    stack = jax.tree.map(lambda x: jnp.stack([x, x]), state)
    with pytest.raises(ValueError, match="layer"):
        paged_decode_attention(
            q, stack.k_pages, stack.v_pages, stack.k_scales, stack.v_scales,
            lengths, tables)


def test_append_tokens_batched_at_layer_matches_sliced(rng):
    """In-place [layer, ...] scatter append == the 4-D append on that
    layer's slice (quantization policy included: slot-0 scale fit, later
    tokens clamped into the existing scale)."""
    from quantizedmha_tpu.serving.kv_cache import (
        append_tokens_batched, append_tokens_batched_at_layer)

    states = []
    for seed in (3, 4):
        r = np.random.default_rng(seed)
        s, alloc, _, _ = _setup_cache(r)
        states.append(s)
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    B, hkv, d = 2, 2, 64
    pids = jnp.asarray([9, 10], jnp.int32)
    for li in (0, 1):
        for slots in (jnp.asarray([0, 0], jnp.int32),
                      jnp.asarray([1, 3], jnp.int32)):
            k = jnp.asarray(rng.normal(0, 0.5, (B, hkv, d)).astype(np.float32))
            v = jnp.asarray(rng.normal(0, 0.5, (B, hkv, d)).astype(np.float32))
            stack = append_tokens_batched_at_layer(
                stack, jnp.int32(li), k, v, pids, slots)
            states[li] = append_tokens_batched(states[li], k, v, pids, slots)
    for li in (0, 1):
        got = jax.tree.map(lambda x, li=li: x[li], stack)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(states[li])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --- head-folded kernel (round 5) ------------------------------------------

def test_hfold_matches_perhead_kernel(rng):
    """The head-folded grid (batch, page_step) must be numerically
    IDENTICAL to the (batch, kv_head, page) grid — same dots, same online
    softmax, different DMA schedule (run44). Covers windows/sinks/softcap,
    residuals, and layer-stacked pools with prerowed/columned scales."""
    B, Hq, Hkv, D, P, MP = 3, 8, 2, 64, 16, 6
    q = jnp.asarray(rng.normal(0, 1, (B, Hq, D)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 127, (Hkv, P, PAGE, D)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 127, (Hkv, P, PAGE, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.02, (Hkv, P)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.02, (Hkv, P)), jnp.float32)
    lengths = jnp.asarray([500, 1, 700], jnp.int32)
    tables = jnp.asarray(rng.integers(0, P, (B, MP)), jnp.int32)
    for kw in (dict(), dict(window=256, attention_sinks=4),
               dict(logit_softcap=30.0)):
        a = paged_decode_attention(q, kp, vp, ks, vs, lengths, tables,
                                   fold_kv_heads=False, **kw)
        b = paged_decode_attention(q, kp, vp, ks, vs, lengths, tables,
                                   fold_kv_heads=True, **kw)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ar, lse_a = paged_decode_attention(
        q, kp, vp, ks, vs, lengths, tables, fold_kv_heads=False,
        save_residuals=True)
    br, lse_b = paged_decode_attention(
        q, kp, vp, ks, vs, lengths, tables, fold_kv_heads=True,
        save_residuals=True)
    np.testing.assert_array_equal(np.asarray(ar), np.asarray(br))
    np.testing.assert_array_equal(np.asarray(lse_a), np.asarray(lse_b))
    # layer-stacked + the three accepted scale layouts
    L = 3
    kpL, vpL = jnp.stack([kp] * L), jnp.stack([vp] * L)
    ksL, vsL = jnp.stack([ks] * L), jnp.stack([vs] * L)
    ref = paged_decode_attention(q, kpL, vpL, ksL, vsL, lengths, tables,
                                 layer=jnp.int32(1), fold_kv_heads=False)
    for k_in, v_in, pre in (
            (ksL, vsL, False),                                   # raw
            (ksL[..., None], vsL[..., None], False),             # columned
            (jnp.swapaxes(ksL, -1, -2), jnp.swapaxes(vsL, -1, -2), True),
    ):
        got = paged_decode_attention(
            q, kpL, vpL, k_in, v_in, lengths, tables, layer=jnp.int32(1),
            fold_kv_heads=True, scales_prerowed=pre)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_hfold_pages_per_step_sweep(rng):
    state, alloc, k_full, v_full = _setup_cache(rng)
    lengths = alloc.lengths_array([0, 1])
    tables = alloc.block_table_array([0, 1], max_pages=4)
    q = rng.normal(0, 0.5, (2, 4, 64)).astype(np.float32)
    outs = [
        paged_decode_attention(
            jnp.asarray(q), state.k_pages, state.v_pages, state.k_scales,
            state.v_scales, jnp.asarray(lengths), jnp.asarray(tables),
            fold_kv_heads=True, pages_per_step=j)
        for j in (1, 2, 4)
    ]
    for o in outs[1:]:
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(o),
                                   atol=1e-5)


def test_hfold_seqs_per_step_identical(rng):
    """Folding S sequences per grid step (round 5) must be numerically
    IDENTICAL: each sequence keeps its own page operands, masks, and
    online-softmax state — only the DMA/step schedule changes."""
    B, Hq, Hkv, D, P, MP = 4, 8, 2, 64, 16, 6
    q = jnp.asarray(rng.normal(0, 1, (B, Hq, D)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 127, (Hkv, P, PAGE, D)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 127, (Hkv, P, PAGE, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.02, (Hkv, P)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.02, (Hkv, P)), jnp.float32)
    lengths = jnp.asarray([500, 1, 700, 260], jnp.int32)
    tables = jnp.asarray(rng.integers(0, P, (B, MP)), jnp.int32)
    ref = paged_decode_attention(q, kp, vp, ks, vs, lengths, tables,
                                 fold_kv_heads=False)
    for S in (1, 2, 4):
        for kw in (dict(), dict(window=256, attention_sinks=4)):
            got = paged_decode_attention(
                q, kp, vp, ks, vs, lengths, tables, fold_kv_heads=True,
                seqs_per_step=S, **kw)
            want = paged_decode_attention(
                q, kp, vp, ks, vs, lengths, tables, fold_kv_heads=False,
                **kw)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    with pytest.raises(ValueError, match="divide batch"):
        paged_decode_attention(q, kp, vp, ks, vs, lengths, tables,
                               fold_kv_heads=True, seqs_per_step=3)
