"""Chunked-prefill tests: long prompts processed in fixed chunks through
the paged INT8 cache must track the full (unchunked) forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.models.llama import LlamaConfig, forward, init_params
from quantizedmha_tpu.serving import llama_adapter
from quantizedmha_tpu.serving.engine import Engine, EngineConfig
from quantizedmha_tpu.serving.kv_cache import PageAllocator


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


def test_prefill_chunk_logits_track_full_forward(model, rng):
    """Drive prefill_chunk directly over 3 chunks; final-token logits must
    match the dense forward within the INT8 error budget (intra-prompt
    attention runs over quantized K/V)."""
    cfg, params = model
    page_size, chunk, max_pages = 16, 32, 8
    n = 70  # 3 chunks: 32 + 32 + 6
    prompt = rng.integers(1, cfg.vocab_size, n).tolist()

    cache = llama_adapter.make_cache(cfg, 32, page_size)
    alloc = PageAllocator(32, page_size, scrap_page=0)
    alloc.admit(0, n)
    table = jnp.asarray(alloc.block_table_array([0], max_pages)[0], jnp.int32)

    logits = None
    for ci in range(-(-n // chunk)):
        part = prompt[ci * chunk:(ci + 1) * chunk]
        toks = np.zeros((1, chunk), np.int32)
        toks[0, :len(part)] = part
        logits, cache = llama_adapter.prefill_chunk(
            cfg, params, cache, jnp.asarray(toks), jnp.int32(ci * chunk),
            table, jnp.int32(len(part) - 1), page_size=page_size,
        )

    full = forward(cfg, params, jnp.asarray([prompt], jnp.int32))[0, -1]
    got = np.asarray(logits[0])
    want = np.asarray(full)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.05, (
        f"chunked logits drift {np.abs(got - want).max() / scale}")
    # top-1 agreement
    assert int(np.argmax(got)) == int(np.argmax(want))


def _ecfg(**kw):
    base = dict(num_pages=64, page_size=16, max_batch=2,
                prefill_buckets=(32,), max_new_tokens=4,
                max_pages_per_seq=8)
    base.update(kw)
    return EngineConfig(**base)


class TestEngineChunked:
    def test_long_prompt_admitted_and_generates(self, model, rng):
        cfg, params = model
        eng = Engine(cfg, params, _ecfg())
        long_prompt = rng.integers(1, cfg.vocab_size, 70).tolist()
        short_prompt = [1, 2, 3]
        eng.add_request(long_prompt)
        eng.add_request(short_prompt)
        out = eng.run()
        assert len(out[0]) == 4 and len(out[1]) == 4
        assert eng.metrics.counter("prefill_tokens") == 73

    def test_long_prompt_tracks_short_path_semantics(self, model, rng):
        """A prompt that fits one chunk exactly must produce the same first
        token through either admission path (modulo int8 cache error — use
        a prompt long enough to force chunking but compare against a
        bigger-bucket engine)."""
        cfg, params = model
        prompt = rng.integers(1, cfg.vocab_size, 40).tolist()
        chunked = Engine(cfg, params, _ecfg(prefill_buckets=(32,)))
        chunked.add_request(prompt)
        ref = Engine(cfg, params, _ecfg(prefill_buckets=(64,)))
        ref.add_request(prompt)
        got, want = chunked.run()[0], ref.run()[0]
        # int8 intra-prompt attention can flip late tokens on a tiny random
        # model; the first sampled token comes straight off the prefill
        # logits and must agree.
        assert got[0] == want[0]

    def test_page_budget_guard(self, model, rng):
        cfg, params = model
        eng = Engine(cfg, params, _ecfg(max_pages_per_seq=4))
        rid = eng.add_request(rng.integers(1, cfg.vocab_size, 100).tolist())
        out = eng.run()  # fails the request, not the engine
        assert out[rid] == [] and "max_pages_per_seq" in eng.failed[rid]


def test_tp_engine_chunked(model, rng):
    from quantizedmha_tpu.serving.sharded import TPEngine, make_tp_mesh

    cfg, params = model
    prompt = rng.integers(1, cfg.vocab_size, 70).tolist()
    ref = Engine(cfg, params, _ecfg())
    ref.add_request(prompt)
    want = ref.run()

    eng = TPEngine(cfg, params, _ecfg(), make_tp_mesh(2))
    eng.add_request(prompt)
    got = eng.run()
    assert got[0] == want[0]


def test_prefill_chunk_honors_sliding_window(rng):
    """A windowed config must produce windowed attention through the
    CHUNKED path too (regression: the serving paths used to silently
    ignore cfg.sliding_window while whole prefill honored it)."""
    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32,
                           sliding_window=24, logit_softcap=30.0)
    params = init_params(cfg, jax.random.PRNGKey(0))
    page_size, chunk, max_pages = 16, 32, 8
    n = 64
    prompt = rng.integers(1, cfg.vocab_size, n).tolist()

    cache = llama_adapter.make_cache(cfg, 32, page_size)
    alloc = PageAllocator(32, page_size, scrap_page=0)
    alloc.admit(0, n)
    table = jnp.asarray(alloc.block_table_array([0], max_pages)[0], jnp.int32)

    logits = None
    for ci in range(-(-n // chunk)):
        part = prompt[ci * chunk:(ci + 1) * chunk]
        toks = np.zeros((1, chunk), np.int32)
        toks[0, :len(part)] = part
        logits, cache = llama_adapter.prefill_chunk(
            cfg, params, cache, jnp.asarray(toks), jnp.int32(ci * chunk),
            table, jnp.int32(len(part) - 1), page_size=page_size,
        )

    full = forward(cfg, params, jnp.asarray([prompt], jnp.int32))[0, -1]
    got, want = np.asarray(logits[0]), np.asarray(full)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.05
    assert int(np.argmax(got)) == int(np.argmax(want))

    # And it must DIFFER from the unwindowed forward (the window is real).
    cfg_full = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
    unwindowed = forward(cfg_full, params, jnp.asarray([prompt], jnp.int32))[0, -1]
    assert np.abs(np.asarray(unwindowed) - want).max() / scale > 0.01
