"""Hybrid (grouped) KV cache: per-window-group page pools.

A per-layer window pattern (Gemma-2 alternation, Qwen2 split) splits the
layers into groups by window value; make_cache_hybrid gives each group its
OWN page pool + block tables so the engine can recycle sliding-group pages
behind the window while full-attention groups keep theirs. These tests pin
the grouped serving paths TOKEN-EXACT against the single shared-pool path:
page contents quantize identically, so different physical page ids must
not change a single bit of the logits.

Reference scope anchor: the CUDA reference has no serving state at all
(its per-head slabs, include/launchers.h:27-33); paged KV + grouped pools
are north-star serving scope (SURVEY.md §7 stage 6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.serving.llama_adapter import (
    decode_loop,
    decode_step,
    group_key,
    make_cache,
    make_cache_hybrid,
    prefill,
    prefill_chunk,
    verify_step,
    window_groups,
    write_prefill,
    write_prefill_hybrid,
)

PAGE = 4


def _cfg(pattern):
    return LlamaConfig.tiny(
        num_layers=len(pattern), dtype=jnp.float32,
        window_pattern=pattern, attention_impl="reference")


def _setup(cfg, n_prompt, max_pages=8, seed=0):
    params = init_params(cfg, jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (1, n_prompt)), jnp.int32)
    _, k_all, v_all = prefill(cfg, params, tokens)
    pad = (-n_prompt) % PAGE
    if pad:  # write_pages wants page-aligned token counts (zeros are
        #      scale-neutral and identical in both paths)
        k_all = jnp.pad(k_all, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v_all = jnp.pad(v_all, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n_pages = -(-n_prompt // PAGE)
    n_tab = min(max_pages, n_pages + 3)  # slack pages for decode growth

    # Single shared pool: block table pages 0..n_tab-1, prompt in the
    # first n_pages of them.
    single = make_cache(cfg, 32, PAGE)
    ids = jnp.arange(n_tab, dtype=jnp.int32)
    single = write_prefill(
        cfg, single, k_all, v_all, ids[:n_pages], page_size=PAGE)
    table1 = jnp.zeros((1, max_pages), jnp.int32).at[0, :n_tab].set(ids)

    # Hybrid pools with DIFFERENT, shuffled physical ids per group.
    groups = window_groups(cfg)
    caches = make_cache_hybrid(cfg, {k: 16 for k in groups}, PAGE)
    gids = {}
    for k in sorted(groups):
        perm = rng.permutation(16)[:n_tab]  # distinct ids per group
        gids[k] = jnp.asarray(perm, jnp.int32)
    caches = write_prefill_hybrid(
        cfg, caches, k_all, v_all,
        {k: v[:n_pages] for k, v in gids.items()}, page_size=PAGE)
    tables = {
        k: jnp.zeros((1, max_pages), jnp.int32).at[0, :n_tab].set(gids[k])
        for k in groups}
    return params, tokens, single, table1, caches, tables, gids


@pytest.mark.parametrize("pattern", [
    (8, None, 8, None),   # Gemma-2 alternation -> periodic branch
    (None, None, 8, 8),   # Qwen2 split -> contiguous-runs branch
    (8, 8, 8, 8),         # uniform -> single-group branch
])
def test_decode_step_grouped_matches_single(pattern):
    cfg = _cfg(pattern)
    n_prompt = 11
    params, tokens, single, table1, caches, tables, _ = _setup(cfg, n_prompt)

    tok = jnp.asarray([7], jnp.int32)
    pos = jnp.asarray([n_prompt], jnp.int32)
    slots = pos % PAGE
    lens = pos + 1
    pid1 = table1[0, n_prompt // PAGE][None]
    logits1, _ = decode_step(
        cfg, params, single, tok, pos, pid1, slots, lens, table1)
    pids = {k: t[0, n_prompt // PAGE][None] for k, t in tables.items()}
    logits2, caches2 = decode_step(
        cfg, params, caches, tok, pos, pids, slots, lens, tables)
    np.testing.assert_array_equal(np.asarray(logits1), np.asarray(logits2))
    # The grouped result keeps each group's stack height.
    for k, idxs in window_groups(cfg).items():
        assert caches2[k].k_pages.shape[0] == len(idxs)


@pytest.mark.parametrize("pattern", [(8, None, 8, None), (None, None, 8, 8)])
def test_decode_loop_grouped_matches_single(pattern):
    cfg = _cfg(pattern)
    n_prompt = 10
    params, tokens, single, table1, caches, tables, _ = _setup(cfg, n_prompt)

    tok = jnp.asarray([3], jnp.int32)
    lens = jnp.asarray([n_prompt], jnp.int32)
    toks1, _ = decode_loop(
        cfg, params, single, tok, lens, table1,
        n_steps=6, page_size=PAGE)
    toks2, _ = decode_loop(
        cfg, params, caches, tok, lens, tables,
        n_steps=6, page_size=PAGE)
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))


def test_verify_step_grouped_matches_single():
    cfg = _cfg((8, None, 8, None))
    n_prompt = 9
    params, tokens, single, table1, caches, tables, _ = _setup(cfg, n_prompt)

    S = 3
    rng = np.random.default_rng(3)
    draft = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, S)), jnp.int32)
    pos0 = jnp.asarray([n_prompt], jnp.int32)
    sched_pos = n_prompt + np.arange(S)
    slot_sched = jnp.asarray(sched_pos % PAGE, jnp.int32)[None]
    ps1 = jnp.asarray(
        [np.asarray(table1[0])[p // PAGE] for p in sched_pos], jnp.int32)[None]
    logits1, _ = verify_step(
        cfg, params, single, draft, pos0, ps1, slot_sched, table1,
        page_size=PAGE)
    psg = {
        k: jnp.asarray(
            [np.asarray(t[0])[p // PAGE] for p in sched_pos], jnp.int32)[None]
        for k, t in tables.items()}
    logits2, _ = verify_step(
        cfg, params, caches, draft, pos0, psg, slot_sched, tables,
        page_size=PAGE)
    np.testing.assert_array_equal(np.asarray(logits1), np.asarray(logits2))


def test_prefill_chunk_grouped_matches_single():
    """Chunked prefill writes + attends per group; logits and the final
    cache contents (per layer, via a decode step) must match the single
    pool's."""
    cfg = _cfg((8, None, 8, None))
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    n_prompt, C = 16, 8
    tokens = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (1, n_prompt)), jnp.int32)
    n_pages = n_prompt // PAGE

    single = make_cache(cfg, 32, PAGE)
    table1 = jnp.zeros((1, 8), jnp.int32).at[0, :n_pages + 1].set(
        jnp.arange(n_pages + 1, dtype=jnp.int32))  # +1: decode growth page
    groups = window_groups(cfg)
    caches = make_cache_hybrid(cfg, {k: 16 for k in groups}, PAGE)
    tables = {}
    for j, k in enumerate(sorted(groups)):
        perm = rng.permutation(16)[:n_pages + 1]
        tables[k] = jnp.zeros((1, 8), jnp.int32).at[0, :n_pages + 1].set(
            jnp.asarray(perm, jnp.int32))

    for c0 in range(0, n_prompt, C):
        chunk = tokens[:, c0:c0 + C]
        logits1, single = prefill_chunk(
            cfg, params, single, chunk, jnp.asarray(c0, jnp.int32),
            table1[0], jnp.asarray(C - 1, jnp.int32), page_size=PAGE)
        logits2, caches = prefill_chunk(
            cfg, params, caches, chunk, jnp.asarray(c0, jnp.int32),
            {k: t[0] for k, t in tables.items()},
            jnp.asarray(C - 1, jnp.int32), page_size=PAGE)
        np.testing.assert_array_equal(
            np.asarray(logits1), np.asarray(logits2))

    # One decode step on top of the chunked caches agrees too.
    tok = jnp.asarray([5], jnp.int32)
    pos = jnp.asarray([n_prompt], jnp.int32)
    l1, _ = decode_step(
        cfg, params, single, tok, pos, table1[0, n_prompt // PAGE][None],
        pos % PAGE, pos + 1, table1)
    l2, _ = decode_step(
        cfg, params, caches, tok, pos,
        {k: t[0, n_prompt // PAGE][None] for k, t in tables.items()},
        pos % PAGE, pos + 1, tables)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_group_layout_and_validation():
    cfg = _cfg((8, None, 8, None))
    assert window_groups(cfg) == {"w8": [0, 2], "full": [1, 3]}
    assert group_key(None) == "full" and group_key(4096) == "w4096"
    with pytest.raises(ValueError, match="missing groups"):
        make_cache_hybrid(cfg, {"w8": 4}, PAGE)


# --- Engine integration ---------------------------------------------------

from quantizedmha_tpu.serving.engine import Engine, EngineConfig  # noqa: E402


def _mk_engines(pattern, hybrid_pages, num_pages=64, max_new=16,
                decode_chunk=1):
    cfg = _cfg(pattern)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mk = lambda hybrid: Engine(cfg, params, EngineConfig(
        num_pages=num_pages, page_size=PAGE, max_batch=2,
        max_pages_per_seq=16, prefill_buckets=(8, 16),
        max_new_tokens=max_new, decode_chunk=decode_chunk,
        hybrid_kv=hybrid, hybrid_pages=hybrid_pages if hybrid else None))
    return cfg, params, mk


@pytest.mark.parametrize("decode_chunk", [1, 4])
def test_engine_hybrid_matches_single_pool(decode_chunk):
    """Same requests through a hybrid-pool engine and a shared-pool engine
    produce identical tokens (page ids differ; page contents don't)."""
    _, _, mk = _mk_engines((8, None, 8, None), {"w8": 24, "full": 64},
                           decode_chunk=decode_chunk)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 200, n)) for n in (5, 9, 14)]

    e1 = mk(False)
    for p in prompts:
        e1.add_request(list(p))
    out1 = e1.run()

    e2 = mk(True)
    assert e2.hybrid
    for p in prompts:
        e2.add_request(list(p))
    out2 = e2.run()
    assert out1 == out2
    assert e2.metrics.counter("pages_trimmed") > 0


def test_engine_hybrid_sliding_pool_stays_small():
    """A sliding pool FAR too small for un-recycled generations serves
    fine: trims cap each sequence's sliding-pool pages at
    O(window + sinks), while the full pool grows with context."""
    # window 8 -> 2 live pages + current + sink slack; pool of 8 (incl
    # scrap) serves 2 concurrent sequences generating 24 tokens each,
    # which would need 2*(32/4)=16 pages un-recycled.
    _, _, mk = _mk_engines((8, None, 8, None), {"w8": 8, "full": 64},
                           max_new=24)
    e = mk(True)
    rng = np.random.default_rng(1)
    for n in (8, 7):
        e.add_request(list(rng.integers(1, 200, n)))
    out = e.run()
    assert all(len(v) == 24 for v in out.values())
    assert e.metrics.counter("pages_trimmed") > 0
    # Full pool really held everything: its allocator saw no trims.
    full_alloc = e.allocs["full"]
    assert all(p is not None
               for t in full_alloc.tables.values() for p in t)


def test_engine_hybrid_prefix_cache_shares_window_tail():
    """prefix_cache composes with hybrid_kv: a second request sharing a
    page-aligned prefix reuses the FULL group's pages outright, and the
    sliding group's pages only across the window tail — older sliding
    slots ride the scrap page, exactly like a window-trimmed live
    sequence. Token streams match the same schedule on a hybrid engine
    without the prefix cache (stream A bit-exact; B same length — its
    suffix attends the INT8-quantized prefix, decode's error budget)."""
    cfg = _cfg((8, None, 8, None))  # window 8, PAGE 4 -> tail = 2 pages
    params = init_params(cfg, jax.random.PRNGKey(2))
    mk = lambda prefix: Engine(cfg, params, EngineConfig(
        num_pages=64, page_size=PAGE, max_batch=2, max_pages_per_seq=16,
        prefill_buckets=(8, 16), max_new_tokens=4,
        hybrid_kv=True, hybrid_pages={"w8": 24, "full": 32},
        prefix_cache=prefix))
    rng = np.random.default_rng(3)
    prefix = rng.integers(1, 200, 16).tolist()  # 4 full pages
    pa, pb = prefix + [5, 6], prefix + [9, 10, 11]

    def drive(eng, probe=None):
        eng.add_request(list(pa))
        eng.step()  # admit A + 1 decode step: window still covers the tail
        if probe is not None:
            probe(eng)
        eng.add_request(list(pb))
        return eng.run()

    def probe(eng):
        # White-box: the resolved prefix shares A's full-group pages 0-3
        # outright; in the sliding group only the window-tail blocks 2-3
        # are real pages (0-1 become scrap placeholders for B).
        cached = eng._resolve_prefix(list(pb))
        assert set(cached) == {"w8", "full"}
        assert cached["full"] == eng.allocs["full"].tables[0][:4]
        assert [p is None for p in cached["w8"]] == [True, True, False, False]
        assert cached["w8"][2:] == eng.allocs["w8"].tables[0][2:4]

    want = drive(mk(False))
    eng = mk(True)
    got = drive(eng, probe)
    assert eng.metrics.counter("prefix_cache_hits") == 1
    assert eng.metrics.counter("prefix_tokens_reused") == 16
    assert got[0] == want[0]
    assert len(got[1]) == len(want[1])
    # Drain: all refs dropped, every group's prefix map invalidated, all
    # pages back in their pools.
    assert not any(eng._prefix_map.values())
    assert not any(eng._page_hash.values())
    for a in eng.allocs.values():
        assert not a.tables


def test_engine_hybrid_uniform_config_is_noop():
    """hybrid_kv on a uniform config quietly stays single-pool."""
    cfg = LlamaConfig.tiny(dtype=jnp.float32, attention_impl="reference")
    params = init_params(cfg, jax.random.PRNGKey(0))
    e = Engine(cfg, params, EngineConfig(
        num_pages=16, page_size=PAGE, prefill_buckets=(8,),
        max_new_tokens=4, hybrid_kv=True))
    assert not e.hybrid
    e.add_request([1, 2, 3])
    out = e.run()
    assert len(out[0]) == 4


def test_spec_engine_composes_with_hybrid():
    """Greedy speculation over a hybrid-pool pattern TARGET (and a hybrid
    pattern DRAFT) emits the same tokens as the plain shared-pool engine:
    speculation is lossless and hybrid pooling is physically invisible."""
    from quantizedmha_tpu.serving.speculative import SpecConfig, SpecDecodeEngine

    cfg = _cfg((8, None, 8, None))
    params = init_params(cfg, jax.random.PRNGKey(0))
    draft_cfg = _cfg((8, None))  # pattern draft -> draft pools go hybrid too
    draft_params = init_params(draft_cfg, jax.random.PRNGKey(7))
    ecfg = lambda hybrid: EngineConfig(
        num_pages=64, page_size=PAGE, max_batch=2, max_pages_per_seq=16,
        prefill_buckets=(8, 16), max_new_tokens=10,
        hybrid_kv=hybrid, hybrid_pages={"w8": 24} if hybrid else None)
    rng = np.random.default_rng(5)
    prompts = [list(rng.integers(1, 200, n)) for n in (6, 9)]

    ref = Engine(cfg, params, ecfg(False))
    for p in prompts:
        ref.add_request(list(p))
    want = ref.run()

    spec = SpecDecodeEngine(cfg, params, draft_cfg, draft_params,
                            ecfg(True), SpecConfig(num_draft_tokens=3))
    assert spec.hybrid and spec.draft_hybrid
    for p in prompts:
        spec.add_request(list(p))
    got = spec.run()
    assert got == want
    # Both sides really ran grouped pools and the sliding groups trimmed.
    assert spec.allocs is not None and spec.draft_allocs is not None


def test_hybrid_engine_composes_with_w4_weights():
    """W4 weights x hybrid per-window-group pools: weight quantization is
    orthogonal to the KV layout — the hybrid w4 engine must emit exactly
    the shared-pool w4 engine's tokens (hybrid invisibility holds with
    the quantized decode path)."""
    from quantizedmha_tpu.quant.weights import quantize_llama_params

    cfg = _cfg((8, None, 8, None))
    params = quantize_llama_params(
        init_params(cfg, jax.random.PRNGKey(0)), bits=4, group=32)
    ecfg = lambda hybrid: EngineConfig(
        num_pages=64, page_size=PAGE, max_batch=2, max_pages_per_seq=16,
        prefill_buckets=(8, 16), max_new_tokens=8,
        hybrid_kv=hybrid, hybrid_pages={"w8": 24} if hybrid else None)
    rng = np.random.default_rng(5)
    prompts = [list(rng.integers(1, 200, n)) for n in (6, 9)]

    ref = Engine(cfg, params, ecfg(False))
    for p in prompts:
        ref.add_request(list(p))
    want = ref.run()
    assert all(len(v) > 0 for v in want.values())

    eng = Engine(cfg, params, ecfg(True))
    for p in prompts:
        eng.add_request(list(p))
    assert eng.run() == want
