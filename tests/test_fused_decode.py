"""Fused decode loop tests: chunked on-device generation must produce the
same token trajectories as step-at-a-time decode."""

import jax
import jax.numpy as jnp
import pytest

from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.serving.engine import Engine, EngineConfig


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _ecfg(**kw):
    base = dict(num_pages=64, page_size=16, max_batch=3,
                prefill_buckets=(16, 32), max_new_tokens=8,
                max_pages_per_seq=8)
    base.update(kw)
    return EngineConfig(**base)


@pytest.mark.parametrize("chunk", [2, 4, 8])
def test_fused_matches_unfused(model, chunk):
    cfg, params = model
    prompts = [[1, 2, 3, 4], [9, 8, 7], [5, 6]]

    ref = Engine(cfg, params, _ecfg(decode_chunk=1))
    for p in prompts:
        ref.add_request(p)
    want = ref.run()

    eng = Engine(cfg, params, _ecfg(decode_chunk=chunk))
    for p in prompts:
        eng.add_request(p)
    got = eng.run()
    assert got == want


def test_fused_eos_truncates(model):
    cfg, params = model
    # Find the first generated token and use it as a fake EOS: generation
    # must stop right there even though the chunk produced more.
    probe = Engine(cfg, params, _ecfg())
    probe.add_request([1, 2, 3])
    first = probe.run()[0][1]  # second generated token

    eng = Engine(cfg, params, _ecfg(decode_chunk=4, eos_id=first))
    eng.add_request([1, 2, 3])
    out = eng.run()[0]
    assert out[-1] == first
    assert len(out) <= 4


def test_fused_page_rollover(model):
    """Chunk spanning a page boundary: prompt fills most of a page so the
    chunk's appends cross into a freshly reserved page."""
    cfg, params = model
    eng = Engine(cfg, params, _ecfg(decode_chunk=4, page_size=16,
                                    max_new_tokens=8))
    eng.add_request(list(range(1, 15)))  # 14 tokens -> slot 14, 15, then new page
    ref = Engine(cfg, params, _ecfg(page_size=16, max_new_tokens=8))
    ref.add_request(list(range(1, 15)))
    assert eng.run() == ref.run()


def test_fused_chunk_overflow_guard(model):
    cfg, params = model
    eng = Engine(cfg, params, _ecfg(decode_chunk=8, max_pages_per_seq=2,
                                    page_size=16, max_new_tokens=64))
    eng.add_request(list(range(1, 16)))
    with pytest.raises(RuntimeError, match="max_pages_per_seq"):
        eng.run()


def test_fused_tp_engine(model):
    from quantizedmha_tpu.serving.sharded import TPEngine, make_tp_mesh

    cfg, params = model
    ref = Engine(cfg, params, _ecfg(decode_chunk=4))
    ref.add_request([1, 2, 3, 4])
    want = ref.run()

    eng = TPEngine(cfg, params, _ecfg(decode_chunk=4), make_tp_mesh(2))
    eng.add_request([1, 2, 3, 4])
    assert eng.run() == want
