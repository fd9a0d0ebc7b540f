#!/usr/bin/env python
"""Decode tokens/s benchmark of the continuous-batching engine on the real
chip (the BASELINE.json "tokens/s" serving metric at 1 chip).

Model: a 0.2B-class Llama (8 layers, hidden 1024, H=16/Hkv=8, vocab 32000)
— big enough that decode is device-bound, small enough to compile fast.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.serving.engine import Engine, EngineConfig


def main():
    import sys
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=1024, intermediate_size=2816,
        num_layers=8, num_heads=16, num_kv_heads=8, dtype=jnp.bfloat16,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(
        num_pages=512, page_size=64, max_batch=8,
        prefill_buckets=(128,), max_new_tokens=64,
        max_pages_per_seq=16, decode_chunk=chunk,
    )
    eng = Engine(cfg, params, ecfg)

    rng = np.random.default_rng(0)
    for _ in range(8):
        eng.add_request(list(rng.integers(1, 32000, 100)), max_new=64)

    # Warm: first step compiles prefill + decode.
    eng.step()
    eng.step()

    t0 = time.perf_counter()
    steps0 = eng.metrics.counter("decode_steps")
    toks0 = eng.metrics.counter("tokens_generated")
    eng.run()
    dt = time.perf_counter() - t0
    steps = eng.metrics.counter("decode_steps") - steps0
    toks = eng.metrics.counter("tokens_generated") - toks0
    print(f"decode: {steps:.0f} steps, {toks:.0f} tokens in {dt:.2f}s "
          f"-> {toks / dt:.1f} tok/s (batch {ecfg.max_batch}, chunk {chunk})", flush=True)
    print(eng.metrics.render(), flush=True)


if __name__ == "__main__":
    main()
