#!/usr/bin/env python
"""Tokens/s TP scaling-efficiency harness (BASELINE.json: >=85% from 1 host
to 2+). Measures continuous-batching decode throughput at tp=1 vs tp=N on
whatever devices exist.

On real multi-chip TPU this measures true scaling (psums ride ICI). On this
repo's CI there is one real chip + virtual CPU devices, so the harness is
exercised on the CPU mesh — numbers there validate the MACHINERY, not the
hardware scaling.

Usage: python scripts/scaling_bench.py [--tp 2] [--layers 4] [--hidden 512]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(cfg, params, ecfg, mesh=None) -> float:
    from quantizedmha_tpu.serving.engine import Engine
    from quantizedmha_tpu.serving.sharded import TPEngine

    eng = Engine(cfg, params, ecfg) if mesh is None else TPEngine(cfg, params, ecfg, mesh)
    rng = np.random.default_rng(0)
    for _ in range(ecfg.max_batch):
        eng.add_request(list(rng.integers(1, cfg.vocab_size, 48)), max_new=32)
    eng.step()  # compile
    t0 = time.perf_counter()
    toks0 = eng.metrics.counter("tokens_generated")
    eng.run()
    dt = time.perf_counter() - t0
    return (eng.metrics.counter("tokens_generated") - toks0) / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tp", type=int, default=2)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--chunk", type=int, default=8)
    args = p.parse_args()

    from quantizedmha_tpu.models.llama import LlamaConfig, init_params
    from quantizedmha_tpu.serving.engine import EngineConfig
    from quantizedmha_tpu.serving.sharded import make_tp_mesh

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=args.hidden,
        intermediate_size=args.hidden * 11 // 4,
        num_layers=args.layers, num_heads=8, num_kv_heads=4,
        dtype=jnp.bfloat16,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(num_pages=128, page_size=16, max_batch=8,
                        prefill_buckets=(64,), max_new_tokens=32,
                        max_pages_per_seq=8, decode_chunk=args.chunk)

    base = measure(cfg, params, ecfg)
    print(f"tp=1: {base:.1f} tok/s", flush=True)
    tp_rate = measure(cfg, params, ecfg, make_tp_mesh(args.tp))
    eff = tp_rate / base  # same GLOBAL batch: TP speeds up each step
    print(f"tp={args.tp}: {tp_rate:.1f} tok/s | per-step speedup {eff:.2f}x "
          f"(ideal {args.tp}x; >= {0.85 * args.tp:.2f}x is the 85% target)")


if __name__ == "__main__":
    main()
