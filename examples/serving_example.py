#!/usr/bin/env python
"""End-to-end serving example: continuous batching with a windowed model.

Builds a tiny random Llama-family model with a Mistral-style sliding
window + StreamingLLM attention sinks, starts the continuous-batching
engine (paged INT8 KV cache, rolling-window page recycling), submits a few
requests, and prints the generated streams plus engine metrics.

This is a runnable tour of the serving stack — swap `LlamaConfig.tiny()`
for `LlamaConfig.llama3_8b()` / `mistral_7b()` with real weights for
production shapes.

Usage: python examples/serving_example.py [--requests 3] [--max-new 24]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=3)
    p.add_argument("--max-new", type=int, default=24)
    p.add_argument("--decode-chunk", type=int, default=4,
                   help=">1 = fused multi-token decode loop")
    args = p.parse_args()

    from quantizedmha_tpu.models.llama import LlamaConfig, init_params
    from quantizedmha_tpu.serving.engine import Engine, EngineConfig

    cfg = LlamaConfig.tiny(
        num_layers=2,
        sliding_window=32,   # Mistral-style window
        attention_sinks=4,   # StreamingLLM sinks
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(
        num_pages=128, page_size=16, max_batch=4,
        prefill_buckets=(32, 64), max_new_tokens=args.max_new,
        decode_chunk=args.decode_chunk,
    )
    eng = Engine(cfg, params, ecfg)

    rng = np.random.default_rng(7)
    for i in range(args.requests):
        prompt = rng.integers(1, cfg.vocab_size, 20 + 5 * i).tolist()
        rid = eng.add_request(prompt)
        print(f"request {rid}: {len(prompt)}-token prompt")

    results = eng.run()
    for rid, toks in sorted(results.items()):
        print(f"request {rid} -> {len(toks)} tokens: {toks[:12]}...")
    print()
    print(eng.metrics.render())


if __name__ == "__main__":
    main()
