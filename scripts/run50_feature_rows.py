#!/usr/bin/env python
"""run50 — chip perf rows for round-4 feature compositions (VERDICT r5
#6): speculative decoding with a W4A16 target, and the prefix-cache hit
path. (The mixed_kv row is scripts/run17_mixed_serving.py, re-run in the
same chip batch.) 0.2B-class models — the rows certify the FEATURES'
current speed, not 8B scale.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.models.llama import LlamaConfig, init_params  # noqa: E402
from quantizedmha_tpu.quant.weights import (  # noqa: E402
    fuse_w4_projections,
    quantize_llama_params,
)
from quantizedmha_tpu.serving.engine import Engine, EngineConfig  # noqa: E402
from quantizedmha_tpu.serving.speculative import (  # noqa: E402
    SpecConfig,
    SpecDecodeEngine,
)


def _drain(eng, n_req=8, prompt_len=100, max_new=64, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n_req):
        eng.add_request(list(rng.integers(1, 32000, prompt_len)),
                        max_new=max_new)
    eng.step()  # compile + admissions
    toks0 = eng.metrics.counter("tokens_generated")
    t0 = time.perf_counter()
    eng.run()
    dt = time.perf_counter() - t0
    toks = eng.metrics.counter("tokens_generated") - toks0
    return toks / dt, eng


def main():
    out = {}

    # --- speculative decoding, W4A16 target (run6 last measured this in
    # round 2, bf16 target only; round 4 added the w4 composition with
    # CPU tests — this is its first chip number).
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=1024, intermediate_size=2816,
        num_layers=8, num_heads=16, num_kv_heads=8, dtype=jnp.bfloat16,
        weight_quant_mode="w4a16",
    )
    params = quantize_llama_params(
        init_params(cfg, jax.random.PRNGKey(0)), bits=4)
    params = dict(params, layers=fuse_w4_projections(params["layers"]))
    draft_cfg = LlamaConfig(
        vocab_size=32000, hidden_size=256, intermediate_size=704,
        num_layers=2, num_heads=8, num_kv_heads=4, dtype=jnp.bfloat16,
    )
    draft_params = init_params(draft_cfg, jax.random.PRNGKey(1))
    base = dict(num_pages=512, page_size=64, max_batch=8,
                prefill_buckets=(128,), max_new_tokens=64,
                max_pages_per_seq=16)

    tps_c1, _ = _drain(Engine(cfg, params, EngineConfig(**base)),
                       max_new=64)
    out["w4_target_plain_chunk1_tok_s"] = round(tps_c1, 1)
    tps_plain, _ = _drain(Engine(cfg, params, EngineConfig(
        **base, decode_chunk=8)), max_new=64)
    out["w4_target_fused_chunk8_tok_s"] = round(tps_plain, 1)
    tps_spec, eng = _drain(SpecDecodeEngine(
        cfg, params, draft_cfg, draft_params, EngineConfig(**base),
        SpecConfig(num_draft_tokens=4)), max_new=64)
    out["w4_target_spec_k4_tok_s"] = round(tps_spec, 1)
    out["w4_target_spec_acceptance"] = round(eng.acceptance_rate, 3)
    tps_self, eng = _drain(SpecDecodeEngine(
        cfg, params, cfg, params, EngineConfig(**base),
        SpecConfig(num_draft_tokens=4)), max_new=64)
    out["w4_target_selfspec_k4_tok_s"] = round(tps_self, 1)
    out["w4_target_selfspec_acceptance"] = round(eng.acceptance_rate, 3)
    print(json.dumps({k: v for k, v in out.items()}), flush=True)

    # --- prefix-cache hit path: same engine config, all prompts share a
    # 512-token page-aligned prefix; the second wave should skip the
    # shared pages' prefill work. Metric: warm TTFT with cold vs hit
    # prefixes + the engine's own hit counters.
    cfgp = LlamaConfig(
        vocab_size=32000, hidden_size=1024, intermediate_size=2816,
        num_layers=8, num_heads=16, num_kv_heads=8, dtype=jnp.bfloat16,
    )
    pparams = init_params(cfgp, jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    shared = list(rng.integers(1, 32000, 512))

    ecfg = EngineConfig(
        num_pages=512, page_size=64, max_batch=8, prefill_buckets=(1024,),
        max_new_tokens=256, max_pages_per_seq=24, decode_chunk=8,
        prefix_cache=True)
    eng = Engine(cfgp, pparams, ecfg)

    def ttft_one(prompt, max_new=16, drain=True):
        """TTFT of one request. Prefix reuse needs the DONOR's pages
        resident (page release evicts the digest map), so hit probes run
        while a long-lived donor request is still decoding."""
        before = eng.metrics.counter("tokens_generated")
        t0 = time.perf_counter()
        eng.add_request(prompt, max_new=max_new)
        while (eng.metrics.counter("tokens_generated") == before
               and (eng.queue or eng.active or eng.prefilling)):
            eng.step()
        dt = time.perf_counter() - t0
        if drain:
            eng.run()
        return dt

    cold = shared + list(rng.integers(1, 32000, 300))
    t_compile = ttft_one(cold)           # compile + cold (donor drains)
    # Long-lived donor holds the shared pages while the probes run.
    ttft_one(shared + list(rng.integers(1, 32000, 300)), max_new=256,
             drain=False)
    warm_miss = ttft_one(list(rng.integers(1, 32000, 812)), drain=False)
    warm_hit = ttft_one(shared + list(rng.integers(1, 32000, 300)),
                        drain=False)
    warm_hit2 = ttft_one(shared + list(rng.integers(1, 32000, 300)),
                         drain=False)
    eng.run()
    out2 = {
        "prefix_first_req_s": round(t_compile, 3),
        "prefix_miss_ttft_s": round(warm_miss, 3),
        "prefix_hit_ttft_s": round(warm_hit, 3),
        "prefix_hit2_ttft_s": round(warm_hit2, 3),
        "prefix_cache_hits": int(eng.metrics.counter("prefix_cache_hits")),
        "prefix_tokens_reused": int(
            eng.metrics.counter("prefix_tokens_reused")),
    }
    print(json.dumps(out2), flush=True)
    out.update(out2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
