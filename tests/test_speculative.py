"""Speculative decoding tests.

The invariant that proves the acceptance/rollback machinery correct:
the emitted stream is IDENTICAL for every speculation length k, because all
emissions come from verify-path logits over identical prefixes (greedy).
Cross-kernel token agreement with the plain engine is NOT bit-exact by
design — verify runs the fused INT8 kernel (P quantized) while plain decode
runs the paged kernel (fp32 P) — so plain-engine comparisons are bounded,
not exact (the ~0.5% logit delta can flip near-ties on tiny random models).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.serving.engine import Engine, EngineConfig
from quantizedmha_tpu.serving.sampling import SamplingParams
from quantizedmha_tpu.serving.speculative import SpecConfig, SpecDecodeEngine


@pytest.fixture(scope="module")
def models():
    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    draft_cfg = LlamaConfig.tiny(num_layers=1, hidden_size=64,
                                 intermediate_size=128, dtype=jnp.float32)
    draft_params = init_params(draft_cfg, jax.random.PRNGKey(7))
    return cfg, params, draft_cfg, draft_params


def _ecfg(**kw):
    base = dict(num_pages=64, page_size=16, max_batch=3,
                prefill_buckets=(16, 32), max_new_tokens=10,
                max_pages_per_seq=8)
    base.update(kw)
    return EngineConfig(**base)


def _run_spec(models, k, prompts, **ecfg_kw):
    cfg, params, draft_cfg, draft_params = models
    eng = SpecDecodeEngine(cfg, params, draft_cfg, draft_params,
                           _ecfg(**ecfg_kw), SpecConfig(num_draft_tokens=k))
    for p in prompts:
        eng.add_request(p)
    return eng, eng.run()


def test_stream_invariant_under_k(models):
    """THE losslessness gate: the output must not depend on how far the
    draft speculates (k), only on the target model."""
    prompts = [[1, 2, 3, 4], [9, 8, 7], [11, 5]]
    _, base = _run_spec(models, 1, prompts)
    for k in (2, 3, 5):
        _, got = _run_spec(models, k, prompts)
        assert got == base, f"k={k} changed the output stream"


def test_matches_plain_engine_first_tokens(models):
    """Cross-kernel agreement: the first emitted token comes straight off
    the (shared) prefill logits and must match the plain engine; later
    tokens agree only within quantization noise (see module docstring)."""
    cfg, params, *_ = models
    prompts = [[1, 2, 3, 4], [9, 8, 7]]
    ref = Engine(cfg, params, _ecfg())
    for p in prompts:
        ref.add_request(p)
    want = ref.run()
    _, got = _run_spec(models, 3, prompts)
    for rid in want:
        assert got[rid][0] == want[rid][0]
        assert len(got[rid]) == len(want[rid])


def test_self_speculation_high_acceptance(models):
    """Draft == target: acceptance is limited only by the draft-kernel vs
    verify-kernel quantization delta on near-ties — it must be high."""
    cfg, params, *_ = models
    eng = SpecDecodeEngine(cfg, params, cfg, params,
                           _ecfg(max_new_tokens=16),
                           SpecConfig(num_draft_tokens=4))
    eng.add_request([1, 2, 3])
    out = eng.run()
    assert len(out[0]) == 16
    assert eng.acceptance_rate > 0.5, eng.acceptance_rate
    # speculation must beat one-token-per-round: fewer rounds than tokens
    assert eng.metrics.counter("spec_rounds") < 16


def test_eos_mid_block(models):
    """EOS inside an accepted block truncates the emission exactly there."""
    _, first_run = _run_spec(models, 3, [[1, 2, 3]])
    eos = first_run[0][2]
    eng, out = _run_spec(models, 3, [[1, 2, 3]], eos_id=eos)
    assert out[0][-1] == eos
    assert len(out[0]) == 3
    assert eng.alloc.free_pages == eng.ecfg.num_pages - 1  # all released


def test_continuous_batching_with_speculation(models):
    """More requests than max_batch: admission + page recycling + rollback
    interleave; output must still be k-invariant."""
    prompts = [[i + 1, i + 2, i + 3] for i in range(4)]
    _, base = _run_spec(models, 1, prompts, max_batch=2, max_new_tokens=6)
    _, got = _run_spec(models, 4, prompts, max_batch=2, max_new_tokens=6)
    assert got == base


def test_page_rollover_in_speculation(models):
    """Speculation block spanning a page boundary: rollback must free the
    overhang page and re-extend cleanly next round."""
    prompts = [list(range(1, 14))]  # 13 tokens; page_size 16 -> boundary soon
    _, base = _run_spec(models, 1, prompts, max_new_tokens=12)
    _, got = _run_spec(models, 5, prompts, max_new_tokens=12)
    assert got == base


def test_guards(models):
    cfg, params, draft_cfg, draft_params = models
    with pytest.raises(ValueError, match="exclusive"):
        SpecDecodeEngine(cfg, params, draft_cfg, draft_params,
                         _ecfg(decode_chunk=4))
    bad_draft = LlamaConfig.tiny(vocab_size=128)
    with pytest.raises(ValueError, match="vocab"):
        SpecDecodeEngine(cfg, params, bad_draft,
                         init_params(bad_draft, jax.random.PRNGKey(0)), _ecfg())


def test_speculation_headroom_guard_is_atomic(models):
    """Page-pool exhaustion during a speculation round must raise BEFORE
    any allocator or cache mutation in BOTH allocators (the same atomicity
    Engine.step guarantees for plain decode)."""
    cfg, params, draft_cfg, draft_params = models
    # 3 usable pages per pool (page 0 scrap): one 32-token prompt fills 2;
    # a k=4 round (S=5) crosses a page boundary needing a page per pool,
    # but two concurrent sequences can't both get one... use two prompts.
    eng = SpecDecodeEngine(
        cfg, params, draft_cfg, draft_params,
        _ecfg(num_pages=5, page_size=16, max_batch=2, prefill_buckets=(32,),
              max_new_tokens=16, max_pages_per_seq=4),
        SpecConfig(num_draft_tokens=4))
    eng.add_request(list(range(1, 33)))
    eng.add_request(list(range(2, 34)))
    # Admission takes 2 pages each (4 of 4 usable) in the TARGET pool; the
    # first spec round (S=5 tokens past 32) needs a new page per sequence.
    with pytest.raises(RuntimeError, match="page pool exhausted|out of pages"):
        for _ in range(32):
            eng.step()
    lengths = dict(eng.alloc.lengths)
    d_lengths = dict(eng.draft_alloc.lengths)
    assert lengths == d_lengths, "pools desynced by a partial reserve"
    assert set(lengths.values()) == {32}, f"partial mutation: {lengths}"


def test_spec_config_rejects_zero_draft_tokens(models):
    cfg, params, draft_cfg, draft_params = models
    with pytest.raises(ValueError, match="num_draft_tokens"):
        SpecDecodeEngine(cfg, params, draft_cfg, draft_params, _ecfg(),
                         SpecConfig(num_draft_tokens=0))


def test_adaptive_k_grows_under_self_speculation(models):
    """Self-speculation accepts ~everything, so adaptive k must climb from
    its floor toward max_k — and the stream still matches the plain engine
    exactly (k-invariance holds per round regardless of k)."""
    cfg, params, _, _ = models
    ecfg = _ecfg(max_new_tokens=24)
    eng = SpecDecodeEngine(cfg, params, cfg, params, ecfg,
                           SpecConfig(num_draft_tokens=2, adaptive=True,
                                      min_k=1, max_k=6))
    eng.add_request(list(range(1, 9)))
    out = eng.run()
    assert eng._k > 2, f"k never grew: {eng._k}"
    assert eng.metrics.counter("spec_k_changes") >= 1

    plain = Engine(cfg, params, ecfg)
    plain.add_request(list(range(1, 9)))
    assert out == plain.run()


def test_adaptive_k_validation(models):
    cfg, params, draft_cfg, draft_params = models
    with pytest.raises(ValueError, match="min_k"):
        SpecDecodeEngine(cfg, params, draft_cfg, draft_params, _ecfg(),
                         SpecConfig(num_draft_tokens=4, adaptive=True,
                                    min_k=1, max_k=3))


def test_no_draft_page_leak_when_finished_at_activation(models):
    """A request that finishes on its prefill token (max_new=1) must not
    leave orphaned draft-cache pages (regression: the draft prefill ran
    after the target had already released the sequence)."""
    cfg, params, draft_cfg, draft_params = models
    eng = SpecDecodeEngine(cfg, params, draft_cfg, draft_params, _ecfg())
    free_t0 = eng.alloc.free_pages
    free_d0 = eng.draft_alloc.free_pages
    eng.add_request([1, 2, 3], max_new=1)
    out = eng.run()
    assert len(out[0]) == 1
    assert eng.alloc.free_pages == free_t0
    assert eng.draft_alloc.free_pages == free_d0
    assert not eng.draft_alloc.tables


def test_speculation_trims_window_pages(models):
    """Sliding-window configs must recycle pages under speculation too
    (regression: _step_speculate never called the trim hook)."""
    cfg0, params0, _, _ = models
    import dataclasses as dc

    cfg = dc.replace(cfg0, sliding_window=24, attention_sinks=4)
    eng = SpecDecodeEngine(cfg, params0, cfg, params0,
                           _ecfg(page_size=8, max_new_tokens=24,
                                 max_pages_per_seq=12, num_pages=64),
                           SpecConfig(num_draft_tokens=3))
    eng.add_request(list(range(1, 28)))
    out = eng.run()
    assert len(out[0]) == 24
    assert eng.metrics.counter("pages_trimmed") > 0


def test_sampled_speculation_runs_and_completes(models):
    """temperature>0 speculation (rejection sampling): every request
    completes with the right count, pages recycle, and acceptance is
    sane."""
    cfg, params, draft_cfg, draft_params = models
    rng = np.random.default_rng(21)
    eng = SpecDecodeEngine(
        cfg, params, draft_cfg, draft_params,
        _ecfg(sampling=SamplingParams(temperature=0.8, top_k=40, seed=3),
              max_new_tokens=8),
        SpecConfig(num_draft_tokens=3))
    rids = [eng.add_request(rng.integers(0, cfg.vocab_size, n).tolist())
            for n in (10, 24)]
    out = eng.run()
    assert set(out) == set(rids)
    assert all(len(t) == 8 for t in out.values())
    assert 0.0 <= eng.acceptance_rate <= 1.0
    assert eng.alloc.free_pages == eng.ecfg.num_pages - 1
    assert eng.draft_alloc.free_pages == eng.ecfg.num_pages - 1


def test_sampled_self_speculation_accepts_everything(models):
    """Draft == target => q == p pointwise => min(1, p/q) = 1: rejection
    sampling must accept every draft token (up to the small numeric delta
    between the verify and decode attention kernels)."""
    cfg, params, _, _ = models
    eng = SpecDecodeEngine(
        cfg, params, cfg, params,
        _ecfg(sampling=SamplingParams(temperature=1.0, seed=11),
              max_new_tokens=12),
        SpecConfig(num_draft_tokens=4))
    eng.add_request([5, 9, 2, 1, 13, 8])
    out = eng.run()
    assert len(out[0]) == 12
    assert eng.acceptance_rate > 0.7, eng.acceptance_rate


def test_chunked_prefill_with_speculation(models):
    """Prompts longer than the largest bucket now speculate too: the target
    admits via chunked prefill and the draft mirrors it into its own cache.
    The stream must stay k-invariant and pages must fully recycle."""
    prompt = list(np.random.default_rng(31).integers(1, 200, 40))
    _, base = _run_spec(models, 1, [prompt], max_new_tokens=6)
    eng, got = _run_spec(models, 3, [prompt], max_new_tokens=6)
    assert got == base
    assert eng.alloc.free_pages == eng.ecfg.num_pages - 1
    assert eng.draft_alloc.free_pages == eng.ecfg.num_pages - 1


def test_interleaved_prefill_with_speculation(models):
    """interleaved_prefill composes with speculation: the target's chunks
    run one per step while active sequences keep speculating in between;
    draft pages reserve at dispatch, the draft mirror prefills when the
    final target chunk lands. Streams match blocking spec admission."""
    rng = np.random.default_rng(41)
    short = rng.integers(1, 200, 6).tolist()
    long = rng.integers(1, 200, 40).tolist()  # > max bucket 32 -> 2 chunks
    _, base = _run_spec(models, 3, [short, long], max_new_tokens=6)
    eng, got = _run_spec(models, 3, [short, long], max_new_tokens=6,
                         interleaved_prefill=True)
    assert got == base
    assert eng.metrics.counter("prefill_chunks_interleaved") == 2
    # Both pools fully recycle (the deferred mirror leaks nothing).
    assert eng.alloc.free_pages == eng.ecfg.num_pages - 1
    assert eng.draft_alloc.free_pages == eng.ecfg.num_pages - 1


def test_prefix_cache_with_speculation(models):
    """prefix_cache + speculation compose: the target shares page-aligned
    prefixes; the draft (independent cache) prefills fully. Output equals
    the non-cached spec engine's."""
    rng = np.random.default_rng(33)
    shared = rng.integers(1, 200, 16).tolist()
    prompts = [shared + [7, 8, 9], shared + [11, 12]]
    _, base = _run_spec(models, 2, prompts, max_new_tokens=5)
    eng, got = _run_spec(models, 2, prompts, max_new_tokens=5,
                         prefix_cache=True)
    assert got == base
    assert eng.metrics.counter("prefix_cache_hits") >= 1
    assert eng.draft_alloc.free_pages == eng.ecfg.num_pages - 1


def test_spec_composes_with_w4_weights(models):
    """INT4-quantized TARGET weights under speculation: the draft still
    speculates, the w4 target verifies (stacked Pallas path in decode,
    XLA dequant path at verify widths), and the stream is k-invariant —
    speculation must stay lossless w.r.t. the quantized target."""
    from quantizedmha_tpu.quant.weights import quantize_llama_params

    cfg, params, draft_cfg, draft_params = models
    qparams = quantize_llama_params(params, bits=4, group=32,
                                    lm_head_bits=8)
    prompts = [[1, 2, 3, 4], [9, 8, 7]]

    def run(k):
        eng = SpecDecodeEngine(cfg, qparams, draft_cfg, draft_params,
                               _ecfg(), SpecConfig(num_draft_tokens=k))
        for p in prompts:
            eng.add_request(p)
        return eng.run()

    base = run(1)
    assert all(len(v) > 0 for v in base.values())
    assert run(3) == base, "k changed the stream under a w4 target"
