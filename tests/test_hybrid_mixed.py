"""mixed_kv x hybrid_kv: grouped pools where the FULL-ATTENTION group is
mixed-precision (int8 sinks + int4 bulk) and sliding groups stay int8.

The composition targets Gemma-2-class patterns at long context (round-2
verdict #7): sliding layers already cap at O(window + sinks) via trims;
the full layers are the unbounded KV tenant, so the int4 capacity lever
lands exactly there. Parity strategy mirrors test_mixed_engine: with the
boundary covering the whole context the int4 pool is never touched and
the token streams must be EXACT against the plain hybrid engine; past the
boundary the engine must be self-consistent and its pool accounting
clean.

Reference scope anchor: no serving state exists in the CUDA reference
(per-head slabs, include/launchers.h:27-33); this is north-star scope.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.serving.engine import Engine, EngineConfig
from quantizedmha_tpu.serving.kv_cache import MixedPageAllocator

PAGE = 4
PATTERN = (8, None, 8, None)  # Gemma-2-style alternation, tiny windows

MIXED = dict(boundary_tokens=32, int8_pages=32, int4_pages=16)


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(num_layers=4, dtype=jnp.float32,
                           window_pattern=PATTERN,
                           attention_impl="reference")
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _mk(model, mixed_kv=None, **kw):
    cfg, params = model
    base = dict(
        num_pages=64, page_size=PAGE, max_batch=2, max_pages_per_seq=16,
        prefill_buckets=(8, 16), max_new_tokens=16,
        hybrid_kv=True, hybrid_pages={"w8": 24}, mixed_kv=mixed_kv)
    base.update(kw)
    return Engine(cfg, params, EngineConfig(**base))


@pytest.mark.parametrize("decode_chunk", [1, 4])
def test_hybrid_mixed_exact_vs_hybrid_inside_boundary(model, decode_chunk):
    """boundary_tokens=32 covers every context here, so the full group's
    int4 pool is never written: the int8 region quantizes identically to
    the plain hybrid engine's pages and tokens must match bit-exact."""
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 200, n)) for n in (5, 9, 14)]

    e1 = _mk(model, decode_chunk=decode_chunk)
    for p in prompts:
        e1.add_request(list(p))
    out1 = e1.run()

    e2 = _mk(model, mixed_kv=dict(MIXED), decode_chunk=decode_chunk)
    assert e2.hybrid_mixed and not e2.mixed
    assert isinstance(e2.allocs["full"], MixedPageAllocator)
    for p in prompts:
        e2.add_request(list(p))
    out2 = e2.run()
    assert out1 == out2
    # The int4 bulk really was idle, and everything drained clean.
    full = e2.allocs["full"]
    assert full.a4.free_pages == MIXED["int4_pages"] - 1  # scrap only
    assert full.a8.free_pages == MIXED["int8_pages"] - 1
    assert e2.metrics.counter("pages_trimmed") > 0  # w8 group recycled


def test_hybrid_mixed_crosses_boundary_deterministically(model):
    """boundary 8 < context: decode crosses into the int4 bulk of the
    full group mid-run. The engine must be deterministic and drain its
    pools; the sliding group keeps trimming behind its window."""
    mixed = dict(boundary_tokens=8, int8_pages=16, int4_pages=16)

    def run():
        e = _mk(model, mixed_kv=dict(mixed), max_new_tokens=20)
        rng = np.random.default_rng(1)
        for n in (9, 13):
            e.add_request(list(rng.integers(1, 200, n)))
        return e, e.run()

    e_a, out_a = run()
    e_b, out_b = run()
    assert out_a == out_b
    assert all(len(v) == 20 for v in out_a.values())
    full = e_a.allocs["full"]
    assert full.a8.free_pages == 15 and full.a4.free_pages == 15
    # int4 pages were genuinely used: final contexts 29/33 > boundary 8.
    assert e_a.metrics.counter("pages_trimmed") > 0


def test_hybrid_mixed_fused_decode_matches_stepwise(model):
    """decode_chunk > 1 routes the boundary crossing INSIDE the fused
    lax.scan (tuple tables + on-device pool routing) — token streams
    must match the stepwise engine exactly."""
    mixed = dict(boundary_tokens=8, int8_pages=16, int4_pages=16)
    outs = {}
    for chunk in (1, 4, 3):
        e = _mk(model, mixed_kv=dict(mixed), decode_chunk=chunk,
                max_new_tokens=12)
        rng = np.random.default_rng(2)
        for n in (6, 11):
            e.add_request(list(rng.integers(1, 200, n)))
        outs[chunk] = e.run()
    assert outs[4] == outs[1]
    assert outs[3] == outs[1]


def test_hybrid_mixed_chunked_prefill_and_interleave(model):
    """A prompt longer than the largest bucket runs the chunked prefill
    through BOTH pool kinds (routed mixed writes in the full group);
    interleaved admission must match blocking admission token-exact
    (greedy)."""
    mixed = dict(boundary_tokens=8, int8_pages=16, int4_pages=16)
    rng = np.random.default_rng(3)
    prompt = list(rng.integers(1, 200, 22))  # > max bucket 16 -> chunked

    e_b = _mk(model, mixed_kv=dict(mixed), max_new_tokens=8)
    e_b.add_request(list(prompt))
    blocking = e_b.run()

    e_i = _mk(model, mixed_kv=dict(mixed), max_new_tokens=8,
              interleaved_prefill=True)
    e_i.add_request(list(prompt))
    interleaved = e_i.run()
    assert interleaved == blocking
    assert e_i.metrics.counter("prefill_chunks_interleaved") >= 1


def test_hybrid_mixed_capacity_lever(model):
    """The point of the composition: the full group's int4 bulk absorbs
    context growth past the boundary, so an int8 sink pool FAR smaller
    than the total context still serves. 2 seqs to context ~36 with
    boundary 8: int8 needs only 2+2 pages + prefill transient; the int4
    pool carries (36-8)/4 = 7 pages per sequence at half the bytes."""
    mixed = dict(boundary_tokens=8, int8_pages=12, int4_pages=24)
    e = _mk(model, mixed_kv=dict(mixed), max_new_tokens=24)
    rng = np.random.default_rng(4)
    for n in (12, 11):
        e.add_request(list(rng.integers(1, 200, n)))
    out = e.run()
    assert all(len(v) == 24 for v in out.values())
    full = e.allocs["full"]
    assert full.a8.free_pages == 11 and full.a4.free_pages == 23


def test_hybrid_mixed_gates(model):
    cfg, params = model
    # No full-attention group: nothing to put the mixed split on.
    cfg_w = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32,
                             window_pattern=(8, 12),
                             attention_impl="reference")
    with pytest.raises(ValueError, match="full-attention"):
        Engine(cfg_w, init_params(cfg_w, jax.random.PRNGKey(0)),
               EngineConfig(num_pages=16, page_size=PAGE, max_batch=1,
                            prefill_buckets=(8,), hybrid_kv=True,
                            mixed_kv=dict(MIXED)))
    # prefix_cache stays gated for the mixed composition too.
    with pytest.raises(ValueError, match="prefix_cache"):
        _mk(model, mixed_kv=dict(MIXED), prefix_cache=True)
