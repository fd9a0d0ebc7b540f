"""TP-sharded serving tests on the virtual 8-device CPU mesh.

Gates the sharded engine's outputs against the single-device engine's:
same tokens, same logit path — TP sharding must be numerically invisible.
"""

import jax
import numpy as np
import pytest

from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.serving.engine import Engine, EngineConfig
from quantizedmha_tpu.serving.sharded import (
    TPEngine,
    local_config,
    make_tp_mesh,
    tp_param_specs,
)


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    # f32 so the trajectory comparison is immune to bf16 reduction-order
    # noise (sharded matmuls round differently; argmax over a tiny random
    # model's near-uniform logits would flip and cascade).
    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)  # H=4, Hkv=2
    params = init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(
        num_pages=32, page_size=16, max_batch=3,
        prefill_buckets=(16, 32), max_new_tokens=6,
    )
    return cfg, params, ecfg


def test_local_config_divides():
    cfg = LlamaConfig.tiny()
    l = local_config(cfg, 2)
    assert l.num_heads == 2 and l.num_kv_heads == 1
    with pytest.raises(ValueError, match="divide"):
        local_config(cfg, 8)


def test_param_specs_match_structure(setup):
    cfg, params, _ = setup
    specs = tp_param_specs()
    jax.tree.map(lambda x, s: None, params, specs,
                 is_leaf=lambda x: hasattr(x, "shape") or x is None)


@pytest.mark.parametrize("tp", [2])
def test_tp_engine_matches_single_device(setup, tp):
    cfg, params, ecfg = setup
    prompts = [[1, 2, 3, 4], [7, 8, 9], [11, 5]]

    ref = Engine(cfg, params, ecfg)
    for p in prompts:
        ref.add_request(p)
    want = ref.run()

    mesh = make_tp_mesh(tp)
    eng = TPEngine(cfg, params, ecfg, mesh)
    for p in prompts:
        eng.add_request(p)
    got = eng.run()

    assert set(got) == set(want)
    for rid in want:
        assert got[rid] == want[rid], f"req {rid}: {got[rid]} vs {want[rid]}"


def test_tp_engine_shards_are_real(setup):
    cfg, params, ecfg = setup
    mesh = make_tp_mesh(2)
    eng = TPEngine(cfg, params, ecfg, mesh)
    wq = eng.params["layers"]["wq"]
    assert len(wq.sharding.device_set) == 2
    # Each shard holds half the head columns.
    shard_shapes = {s.data.shape for s in wq.addressable_shards}
    full = wq.shape
    assert shard_shapes == {(full[0], full[1], full[2] // 2)}
    kp = eng.cache.k_pages
    assert {s.data.shape for s in kp.addressable_shards} == {
        (kp.shape[0], kp.shape[1] // 2, *kp.shape[2:])
    }


def test_tp_engine_continuous_batching_under_pressure(setup):
    """More requests than max_batch with a small page pool: exercises
    admission + recycling with sharded state."""
    cfg, params, _ = setup
    ecfg = EngineConfig(num_pages=12, page_size=16, max_batch=2,
                        prefill_buckets=(16,), max_new_tokens=4)
    mesh = make_tp_mesh(2)
    eng = TPEngine(cfg, params, ecfg, mesh)
    for i in range(4):
        eng.add_request([i + 1, i + 2, i + 3])
    out = eng.run()
    assert len(out) == 4
    assert all(len(toks) == 4 for toks in out.values())
    assert eng.metrics.counter("requests_finished") == 4


def test_tp_engine_windowed_matches_single_device():
    """Sliding window + sinks + soft-cap must survive TP sharding — the
    sharded engine's token streams equal the single-device engine's for a
    windowed config (both honor cfg via the same adapter paths)."""
    import jax.numpy as jnp

    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32,
                           sliding_window=12, attention_sinks=2,
                           logit_softcap=30.0)
    params = init_params(cfg, jax.random.PRNGKey(3))
    ecfg = EngineConfig(num_pages=32, page_size=8, max_batch=2,
                        prefill_buckets=(16, 32), max_new_tokens=6)
    prompts = [list(range(1, 20)), list(range(4, 18))]

    ref = Engine(cfg, params, ecfg)
    for p in prompts:
        ref.add_request(p)
    want = ref.run()

    eng = TPEngine(cfg, params, ecfg, mesh=make_tp_mesh(2))
    for p in prompts:
        eng.add_request(p)
    got = eng.run()
    assert got == want


def test_llama70b_tp8_sharding_plan_fits_v5p():
    """Ground the 70B north-star claim WITHOUT materializing anything:
    build the Llama-3-70B parameter tree abstractly (jax.eval_shape), apply
    the TP=8 Megatron sharding plan, and check (a) every sharded axis
    divides, (b) per-device bytes — bf16 weights + an INT8 paged KV cache
    for 8 x 8K-token sequences — fit a v5p chip's 96 GiB HBM."""
    import jax
    import jax.numpy as jnp

    from quantizedmha_tpu.models.llama import LlamaConfig, init_params

    cfg = LlamaConfig.llama3_70b()
    tp = 8
    lcfg = local_config(cfg, tp)  # raises if heads don't divide
    assert lcfg.num_heads == 8 and lcfg.num_kv_heads == 1

    abstract = jax.eval_shape(
        lambda key: init_params(cfg, key), jax.random.PRNGKey(0))
    specs = tp_param_specs()

    def sharded_bytes(leaf, spec):
        shape = list(leaf.shape)
        for axis_i, name in enumerate(spec):
            if name == "tp":
                assert shape[axis_i] % tp == 0, (shape, spec)
                shape[axis_i] //= tp
        n = 1
        for d in shape:
            n *= d
        return n * 2  # bf16

    total = sum(jax.tree_util.tree_leaves(
        jax.tree.map(sharded_bytes, abstract, specs,
                     is_leaf=lambda x: hasattr(x, "shape"))))
    # INT8 paged KV for 8 sequences x 8192 tokens, kv heads sharded /tp:
    # L * (Hkv/tp) * tokens * hd * 2 (K and V) bytes.
    kv = (cfg.num_layers * (cfg.num_kv_heads // tp) * 8 * 8192
          * cfg.hd * 2)
    per_device_gib = (total + kv) / 2**30
    assert per_device_gib < 90, f"{per_device_gib:.1f} GiB > v5p HBM budget"
    # Sanity floor: a 70B in bf16 is ~140 GiB total, so /8 ~ 17+ GiB.
    assert per_device_gib > 15


def test_tp_engine_gemma2_pattern_matches_single_device():
    """Gemma-2-class config (alternating windows + sandwich norms + GeGLU
    + softcaps) through TPEngine: the new param-spec rows (post-norms
    replicate) and the per-layer window scan must be TP-invisible."""
    import jax.numpy as jnp

    cfg = LlamaConfig.tiny(
        num_layers=2, dtype=jnp.float32,
        window_pattern=(16, None), sandwich_norms=True, rms_plus_one=True,
        embed_scale=True, hidden_act="gelu_tanh",
        query_pre_attn_scalar=32.0, logit_softcap=30.0,
        final_logit_softcap=15.0)
    params = init_params(cfg, jax.random.PRNGKey(3))
    ecfg = EngineConfig(
        num_pages=32, page_size=16, max_batch=2,
        prefill_buckets=(16, 32), max_new_tokens=5,
    )
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]

    ref = Engine(cfg, params, ecfg)
    for p in prompts:
        ref.add_request(list(p))
    want = ref.run()

    eng = TPEngine(cfg, params, ecfg, make_tp_mesh(2))
    for p in prompts:
        eng.add_request(list(p))
    got = eng.run()
    assert got == want


def test_tp_engine_hybrid_matches_single_device():
    """TP x hybrid: grouped pools under shard_map (dict cache specs,
    per-group tables/page ids) emit the same tokens as the plain
    single-device shared-pool engine."""
    import jax.numpy as jnp

    # Geometry mirrors tests/test_hybrid_cache.py::_mk_engines: window 8
    # over page_size 4 with 16 generated tokens pushes whole pages behind
    # the window, so the trim path runs under shard_map too.
    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32,
                           window_pattern=(8, None))
    params = init_params(cfg, jax.random.PRNGKey(4))
    mk = lambda hybrid: EngineConfig(
        num_pages=32, page_size=4, max_batch=2, max_pages_per_seq=16,
        prefill_buckets=(8,), max_new_tokens=16,
        hybrid_kv=hybrid, hybrid_pages={"w8": 16} if hybrid else None)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]

    ref = Engine(cfg, params, mk(False))
    for p in prompts:
        ref.add_request(list(p))
    want = ref.run()

    eng = TPEngine(cfg, params, mk(True), make_tp_mesh(2))
    assert eng.hybrid
    for p in prompts:
        eng.add_request(list(p))
    got = eng.run()
    assert got == want
    assert eng.metrics.counter("pages_trimmed") > 0


def test_tp_spec_engine_matches_single_device():
    """TP x speculation: draft loop, target verification, prefills and
    cache writes all under shard_map (both models sharded); token streams
    match the single-device SpecDecodeEngine for greedy AND rejection-
    sampling decoding, and speculation still pays off (rounds < tokens)."""
    import jax.numpy as jnp

    from quantizedmha_tpu.serving.sampling import SamplingParams
    from quantizedmha_tpu.serving.sharded import TPSpecDecodeEngine
    from quantizedmha_tpu.serving.speculative import SpecConfig, SpecDecodeEngine

    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)  # H=4, Hkv=2
    draft_cfg = LlamaConfig.tiny(num_layers=1, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    draft_params = init_params(draft_cfg, jax.random.PRNGKey(1))
    prompts = [[1, 2, 3, 4], [9, 8, 7]]

    for sampling in (None,
                     SamplingParams(temperature=0.8, top_k=8, seed=5)):
        ecfg = EngineConfig(num_pages=32, page_size=16, max_batch=2,
                            prefill_buckets=(16,), max_new_tokens=8,
                            sampling=sampling or SamplingParams())
        scfg = SpecConfig(num_draft_tokens=3)

        ref = SpecDecodeEngine(cfg, params, draft_cfg, draft_params,
                               ecfg, scfg)
        for p in prompts:
            ref.add_request(list(p))
        want = ref.run()

        eng = TPSpecDecodeEngine(cfg, params, draft_cfg, draft_params,
                                 ecfg, make_tp_mesh(2), scfg)
        for p in prompts:
            eng.add_request(list(p))
        got = eng.run()
        assert got == want, f"sampling={sampling}"
        assert eng.metrics.counter("spec_rounds") == \
            ref.metrics.counter("spec_rounds")
        assert eng.metrics.counter("spec_rounds") < 8  # drafts accepted


def test_tp_engine_prefix_cache_matches_single_device(setup):
    """prefix_cache under TP: shared-prefix admission runs the sharded
    chunked-prefill program over refcount-shared pages; tokens match the
    single-device prefix-cache engine and the hit actually fires."""
    import dataclasses

    cfg, params, ecfg = setup
    ecfg = dataclasses.replace(ecfg, prefix_cache=True)
    rng = np.random.default_rng(7)
    shared = rng.integers(1, cfg.vocab_size, 16).tolist()  # one full page
    prompts = [shared + [5, 6, 7], shared + [9, 10]]

    def drive(eng):
        eng.add_request(list(prompts[0]))
        eng.step()  # owner live: its pages stay referenced for sharing
        eng.add_request(list(prompts[1]))
        return eng.run()

    ref = Engine(cfg, params, ecfg)
    want = drive(ref)
    assert ref.metrics.counter("prefix_cache_hits") == 1

    eng = TPEngine(cfg, params, ecfg, make_tp_mesh(2))
    got = drive(eng)
    assert got == want
    assert eng.metrics.counter("prefix_cache_hits") == 1
    assert eng.metrics.counter("prefix_tokens_reused") == 16


def test_llama70b_dims_tp8_engine_decode_and_memory():
    """The 70B claim's mechanical half (round-3 verdict): a REAL TPEngine
    decode at Llama-3-70B layer dimensions — hidden 8192, 64 q heads,
    8 kv heads, head_dim 128 (local shard: 8 q / 1 kv head, the GQA-8
    paged-decode grid) — on the 8-way mesh, 2 layers deep, with live
    per-device buffer accounting cross-checked against the analytic
    sharding plan that test_llama70b_tp8_sharding_plan_fits_v5p scales to
    the full 80 layers. MLP width is cut to keep the CPU-mesh test fast
    (the decode kernel and the sharding structure don't depend on it; the
    analytic plan uses the true 28672)."""
    import jax.numpy as jnp

    tp = 8
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=8192, intermediate_size=2048,
        num_layers=2, num_heads=64, num_kv_heads=8, head_dim=128,
        dtype=jnp.float32, attention_impl="flash_int8")
    params = init_params(cfg, jax.random.PRNGKey(7))
    ecfg = EngineConfig(num_pages=16, page_size=8, max_batch=2,
                        prefill_buckets=(8,), max_new_tokens=3,
                        decode_chunk=3)
    prompts = [[1, 2, 3, 4, 5], [7, 8, 9]]

    ref = Engine(cfg, params, ecfg)
    for p in prompts:
        ref.add_request(list(p))
    want = ref.run()

    eng = TPEngine(cfg, params, ecfg, make_tp_mesh(tp))
    for p in prompts:
        eng.add_request(list(p))
    got = eng.run()
    assert got == want
    assert all(len(t) == 3 for t in got.values())

    # Live per-device accounting: each param leaf's addressable shard
    # bytes must equal the analytic plan (leaf bytes / tp on sharded axes,
    # full bytes on replicated ones) — the formula the v5p-fit test
    # trusts at full scale.
    specs = tp_param_specs()

    def analytic(leaf, spec):
        n = leaf.size * leaf.dtype.itemsize
        return n // tp if "tp" in tuple(spec) else n

    from quantizedmha_tpu.serving.sharded import expand_param_specs

    especs = expand_param_specs(eng.params, specs)
    pairs = []
    jax.tree.map(lambda l, s: pairs.append((l, s)), eng.params, especs)
    assert pairs
    total_live = sum(l.addressable_shards[0].data.nbytes for l, _ in pairs)
    total_plan = sum(analytic(l, s) for l, s in pairs)
    assert total_live == total_plan
    # Cache shard: kv heads /8 -> 1 local head of int8 pages.
    kv_local = eng.cache.k_pages.addressable_shards[0].data
    assert kv_local.shape[1] == 1 and kv_local.shape[-1] == 128
