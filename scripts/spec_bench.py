#!/usr/bin/env python
"""Speculative-decoding throughput on the real chip: 0.2B-class target,
~8M-param draft, vs plain decode and vs the fused-chunk loop."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.serving.engine import Engine, EngineConfig
from quantizedmha_tpu.serving.speculative import SpecConfig, SpecDecodeEngine


def run(eng, label, n_req=8, prompt_len=100, max_new=64):
    rng = np.random.default_rng(0)
    for _ in range(n_req):
        eng.add_request(list(rng.integers(1, 32000, prompt_len)), max_new=max_new)
    eng.step()  # compile
    t0 = time.perf_counter()
    toks0 = eng.metrics.counter("tokens_generated")
    eng.run()
    dt = time.perf_counter() - t0
    toks = eng.metrics.counter("tokens_generated") - toks0
    extra = ""
    if hasattr(eng, "acceptance_rate"):
        extra = f" acceptance={eng.acceptance_rate:.2f}"
    print(f"{label}: {toks:.0f} tok in {dt:.2f}s -> {toks / dt:.1f} tok/s{extra}",
          flush=True)


def main():
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=1024, intermediate_size=2816,
        num_layers=8, num_heads=16, num_kv_heads=8, dtype=jnp.bfloat16,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    draft_cfg = LlamaConfig(
        vocab_size=32000, hidden_size=256, intermediate_size=704,
        num_layers=2, num_heads=8, num_kv_heads=4, dtype=jnp.bfloat16,
    )
    draft_params = init_params(draft_cfg, jax.random.PRNGKey(1))
    base = dict(num_pages=512, page_size=64, max_batch=8,
                prefill_buckets=(128,), max_new_tokens=64, max_pages_per_seq=16)

    run(Engine(cfg, params, EngineConfig(**base)), "plain step decode")
    run(Engine(cfg, params, EngineConfig(**base, decode_chunk=8)),
        "fused chunk=8")
    run(SpecDecodeEngine(cfg, params, draft_cfg, draft_params,
                         EngineConfig(**base), SpecConfig(num_draft_tokens=4)),
        "speculative k=4 (random-weight draft)")
    # Self-speculation shows the ceiling when the draft is perfect.
    run(SpecDecodeEngine(cfg, params, cfg, params,
                         EngineConfig(**base), SpecConfig(num_draft_tokens=4)),
        "speculative k=4 (draft == target)")


if __name__ == "__main__":
    main()
