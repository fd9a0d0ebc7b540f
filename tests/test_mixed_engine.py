"""Engine-level mixed-precision KV serving (EngineConfig.mixed_kv).

The serving wiring of serving/mixed_kv.py (run12/run13): INT8 pages for
positions below the boundary, nibble-packed INT4 past it, partial
softmaxes merged exactly by lse. These tests drive the whole engine —
bucketed prefill, chunked prefill, batched decode, window trims —
through the mixed cache mode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.serving.engine import Engine, EngineConfig

PAGE = 4


def _mk(cfg_kw=None, mixed=None, **ecfg_kw):
    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32, **(cfg_kw or {}))
    params = init_params(cfg, jax.random.PRNGKey(0))
    base = dict(num_pages=32, page_size=PAGE, max_batch=2,
                prefill_buckets=(8, 16), max_new_tokens=6,
                max_pages_per_seq=8)
    base.update(ecfg_kw)
    base["mixed_kv"] = mixed
    return cfg, params, EngineConfig(**base)


def test_engine_mixed_matches_plain_when_boundary_covers_context():
    """boundary >= every context: the int4 partial is empty and drops
    out of the lse merge exactly — streams match the plain int8 engine
    (same quantized pages, same appends; merge noise ~1e-7 is far below
    a tiny random model's logit gaps)."""
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 200, n).tolist() for n in (5, 9)]
    cfg, params, ecfg = _mk()

    ref = Engine(cfg, params, ecfg)
    for p in prompts:
        ref.add_request(list(p))
    want = ref.run()

    cfg2, params2, mcfg = _mk(
        mixed={"boundary_tokens": 64, "int8_pages": 32, "int4_pages": 8})
    eng = Engine(cfg2, params2, mcfg)
    assert eng.mixed
    for p in prompts:
        eng.add_request(list(p))
    got = eng.run()
    assert got == want
    # drained: every pool page recycled (page 0 = scrap stays reserved)
    assert eng.alloc.a8.free_pages == 31
    assert eng.alloc.a4.free_pages == 7


def test_engine_mixed_decodes_across_the_boundary():
    """Contexts crossing the boundary: decode appends route to the int4
    bulk (pool pages actually consumed mid-run), output is deterministic,
    and both pools fully recycle at drain."""
    rng = np.random.default_rng(12)
    prompt = rng.integers(1, 200, 6).tolist()
    mixed = {"boundary_tokens": 8, "int8_pages": 8, "int4_pages": 16}

    def run_once():
        cfg, params, ecfg = _mk(mixed=mixed, max_new_tokens=12)
        eng = Engine(cfg, params, ecfg)
        eng.add_request(list(prompt))
        used4 = 0
        while eng.queue or eng.active:
            eng.step()
            used4 = max(used4, 16 - 1 - eng.alloc.a4.free_pages)
        return eng, eng.run(), used4

    eng, out, used4 = run_once()
    assert len(out[0]) == 12  # context reaches 18 > boundary 8
    assert used4 >= 2         # int4 bulk pages were really in play
    assert eng.alloc.a8.free_pages == 7
    assert eng.alloc.a4.free_pages == 15
    _, again, _ = run_once()
    assert again == out


def test_engine_mixed_windowed_trims_int4_bulk():
    """Windowed mixed serving (attention_sinks == boundary_tokens): the
    int8 pool holds the always-visible sinks and never trims; int4 bulk
    pages behind the window recycle every step."""
    rng = np.random.default_rng(13)
    cfg, params, ecfg = _mk(
        cfg_kw=dict(sliding_window=8, attention_sinks=8),
        mixed={"boundary_tokens": 8, "int8_pages": 8, "int4_pages": 16},
        max_new_tokens=16)
    eng = Engine(cfg, params, ecfg)
    eng.add_request(rng.integers(1, 200, 6).tolist())
    out = eng.run()
    assert len(out[0]) == 16  # final context 22: sinks 8 + bulk 14
    assert eng.metrics.counter("pages_trimmed") > 0
    assert eng.alloc.a8.free_pages == 7   # sinks released only at drain
    assert eng.alloc.a4.free_pages == 15


def test_engine_mixed_chunked_prefill_and_interleave_parity():
    """Prompts beyond the largest bucket stream through the MIXED chunked
    prefill (traced page routing across the boundary). Interleaved
    admission is token-identical to blocking admission in mixed mode too
    (same jitted chunk program, same schedule)."""
    rng = np.random.default_rng(14)
    prompt = rng.integers(1, 200, 20).tolist()  # > bucket 16 -> chunks
    mixed = {"boundary_tokens": 8, "int8_pages": 8, "int4_pages": 16}

    def run(interleaved):
        cfg, params, ecfg = _mk(mixed=mixed, max_new_tokens=5)
        eng = Engine(cfg, params, dataclasses.replace(
            ecfg, interleaved_prefill=interleaved))
        eng.add_request(list(prompt))
        return eng, eng.run()

    eng_b, blocking = run(False)
    assert eng_b.metrics.counter("prefill_tokens") == 20
    eng_i, interleaved = run(True)
    assert interleaved == blocking
    assert eng_i.metrics.counter("prefill_chunks_interleaved") == 2


def test_engine_mixed_fused_decode_matches_stepwise():
    """decode_chunk > 1 over the mixed cache: the fused loop's in-scan
    pool routing (below = position < boundary per step) crosses the
    int8/int4 boundary mid-chunk and emits the same greedy streams as
    one-token-per-step mixed decode."""
    rng = np.random.default_rng(16)
    prompts = [rng.integers(1, 200, n).tolist() for n in (5, 7)]
    mixed = {"boundary_tokens": 8, "int8_pages": 8, "int4_pages": 16}

    def run(chunk):
        cfg, params, ecfg = _mk(mixed=mixed, max_new_tokens=12,
                                decode_chunk=chunk)
        eng = Engine(cfg, params, ecfg)
        for p in prompts:
            eng.add_request(list(p))
        return eng.run()

    base = run(1)
    assert run(4) == base  # boundary crossed at context 8, mid-chunk
    assert run(3) == base


def test_tp_engine_mixed_matches_single_device():
    """TP x mixed: both pools shard on kv heads under shard_map, the
    host-side pool routing is unchanged — token streams match the
    single-device mixed engine across the boundary crossing."""
    from quantizedmha_tpu.serving.sharded import TPEngine, make_tp_mesh

    rng = np.random.default_rng(15)
    prompts = [rng.integers(1, 200, n).tolist() for n in (5, 9)]
    mixed = {"boundary_tokens": 8, "int8_pages": 8, "int4_pages": 16}
    cfg, params, ecfg = _mk(mixed=mixed, max_new_tokens=8)

    ref = Engine(cfg, params, ecfg)
    for p in prompts:
        ref.add_request(list(p))
    want = ref.run()

    eng = TPEngine(cfg, params, ecfg, make_tp_mesh(2))
    assert eng.mixed
    for p in prompts:
        eng.add_request(list(p))
    got = eng.run()
    assert got == want
    assert eng.alloc.a4.free_pages == 15  # int4 bulk was used and drained


def test_tp_engine_mixed_fused_decode_matches_single_device():
    """TP x mixed x decode_chunk>1: _step_fused runs the SHARDED
    decode_loop_mixed program (previously this combination silently fell
    back to the replicated jit, all-gathering the Megatron-sharded
    weights every chunk) and emits the single-device mixed streams."""
    from quantizedmha_tpu.serving.sharded import TPEngine, make_tp_mesh

    rng = np.random.default_rng(17)
    prompts = [rng.integers(1, 200, n).tolist() for n in (5, 9)]
    mixed = {"boundary_tokens": 8, "int8_pages": 8, "int4_pages": 16}
    cfg, params, ecfg = _mk(mixed=mixed, max_new_tokens=8, decode_chunk=3)

    ref = Engine(cfg, params, ecfg)
    for p in prompts:
        ref.add_request(list(p))
    want = ref.run()

    eng = TPEngine(cfg, params, ecfg, make_tp_mesh(2))
    for p in prompts:
        eng.add_request(list(p))
    assert eng.run() == want


def test_engine_mixed_gates():
    mixed = {"boundary_tokens": 8, "int8_pages": 8, "int4_pages": 8}
    cfg, params, _ = _mk()
    with pytest.raises(ValueError, match="prefix_cache"):
        Engine(cfg, params, _mk(mixed=mixed, prefix_cache=True)[2])
    pcfg, pparams, pecfg = _mk(cfg_kw=dict(window_pattern=(8, None)),
                               mixed=mixed)
    with pytest.raises(ValueError, match="uniform"):
        Engine(pcfg, pparams, pecfg)
    wcfg, wparams, wecfg = _mk(
        cfg_kw=dict(sliding_window=8, attention_sinks=4), mixed=mixed)
    with pytest.raises(ValueError, match="attention_sinks"):
        Engine(wcfg, wparams, wecfg)

    from quantizedmha_tpu.serving.speculative import SpecDecodeEngine
    dcfg = LlamaConfig.tiny(num_layers=1, dtype=jnp.float32)
    with pytest.raises(ValueError, match="mixed_kv"):
        SpecDecodeEngine(cfg, params, dcfg,
                         init_params(dcfg, jax.random.PRNGKey(1)),
                         _mk(mixed=mixed)[2])
