"""Context-parallel prefill in the SERVING path (round-5 VERDICT #7).

llama_adapter.prefill_cp_at runs the per-layer ring attention under
shard_map with the prompt sequence sharded; the engine switches its
bucket-prefill program to it when EngineConfig.cp_mesh is set. Gates:
the CP prefill's logits and cache-insertion K/V match the single-chip
prefill, and an engine configured with a cp mesh emits the SAME token
streams as the plain engine.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from quantizedmha_tpu.harness.verify import assert_close
from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.parallel import make_mesh
from quantizedmha_tpu.serving import llama_adapter as LA


def _cfg(**kw):
    base = dict(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2,
        attention_impl="reference", dtype=jnp.float32)
    base.update(kw)
    return LlamaConfig(**base)


def _cp_prefill(cfg, mesh, params, toks, last):
    fn = functools.partial(LA.prefill_cp_at, cfg, axis_name="cp")
    kv = P(None, None, "cp", None)
    sm = jax.shard_map(
        lambda p, t, li: fn(p, t, li),
        mesh=mesh,
        in_specs=(P(), P(None, "cp"), P()),
        out_specs=(P(), kv, kv),
        check_vma=False,
    )
    return sm(params, toks, jnp.int32(last))


@pytest.mark.parametrize("window_kw", [
    {},
    {"sliding_window": 64, "attention_sinks": 8},
])
def test_prefill_cp_matches_single_chip(rng, window_kw):
    cfg = _cfg(**window_kw)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh((4,), ("cp",))
    n = 128
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, n)), jnp.int32)
    last = n - 9  # padded-bucket semantics: last REAL token inside shard 3

    ref_logits, ref_k, ref_v = LA.prefill_at(cfg, params, toks, jnp.int32(last))
    got_logits, got_k, got_v = _cp_prefill(cfg, mesh, params, toks, last)
    assert_close(got_logits, ref_logits, abs_tol=2e-3, rel_tol=2e-3,
                 what="cp prefill logits")
    assert_close(got_k, ref_k, abs_tol=2e-3, rel_tol=2e-3, what="cp prefill K")
    assert_close(got_v, ref_v, abs_tol=2e-3, rel_tol=2e-3, what="cp prefill V")


def test_engine_cp_prefill_same_tokens(rng):
    from quantizedmha_tpu.serving.engine import Engine, EngineConfig

    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(1))
    prompts = [rng.integers(1, cfg.vocab_size, 100).tolist() for _ in range(2)]

    def run(cp_mesh):
        ecfg = EngineConfig(
            num_pages=32, page_size=32, max_batch=2,
            prefill_buckets=(128,), max_new_tokens=8,
            max_pages_per_seq=8, decode_chunk=4, cp_mesh=cp_mesh)
        eng = Engine(cfg, params, ecfg)
        for pr in prompts:
            eng.add_request(list(pr), max_new=8)
        eng.run()
        return [eng.finished[rid] for rid in sorted(eng.finished)]

    plain = run(None)
    cp = run(make_mesh((4,), ("cp",)))
    assert plain == cp, f"token streams diverged: {plain} vs {cp}"


def test_engine_cp_rejects_indivisible_buckets():
    from quantizedmha_tpu.serving.engine import Engine, EngineConfig

    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(1))
    ecfg = EngineConfig(
        num_pages=32, page_size=4, max_batch=2,
        prefill_buckets=(36,), max_new_tokens=8, max_pages_per_seq=16,
        cp_mesh=make_mesh((8,), ("cp",)))  # 36 % 8 != 0
    with pytest.raises(ValueError, match="cp axis"):
        Engine(cfg, params, ecfg)
