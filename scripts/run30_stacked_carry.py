#!/usr/bin/env python
"""run30 — carry-threaded layer-stacked KV cache vs the xs/ys layer scan.

run23's xprof named ~0.5 ms/step of 'nested-scan carry copies' in the
fused 8B decode chunk: decode_step scanned the layer-stacked cache as
scan XS/YS, so XLA materialized a pool/L-sized dynamic-slice per layer in
and a dynamic-update-slice back out. This round threads the cache through
the scan CARRY instead — in-place [layer, ...] scatter appends
(kv_cache.append_tokens_batched_at_layer) and a prefetched `layer` scalar
in the decode kernel (ops/decode.py stacked=True) so the kernel reads one
layer's pages out of the whole 5-D stack without slicing it.

Same-process interleaved A/B (see CLAUDE.md chip-state rule): the
llama_adapter.STACKED_CARRY switch flips the decode_step routing between
engine builds; A = old xs/ys path, B = carry path, pattern A B A B on the
8B-shape serving bench (batch 8, chunk 32 — the bench.py serving row
config) plus a batch-1 pair.
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.harness.serving_bench import (  # noqa: E402
    dataclasses_replace,
    device_init_int8_params,
    run_decode_bench,
)
from quantizedmha_tpu.models.llama import LlamaConfig  # noqa: E402
from quantizedmha_tpu.serving import llama_adapter  # noqa: E402


def main():
    layers = int(sys.argv[1]) if len(sys.argv) > 1 else None
    cfg = LlamaConfig.llama3_8b()
    cfg = dataclasses_replace(cfg, attention_impl="flash_int8")
    if layers:
        cfg = dataclasses_replace(cfg, num_layers=layers)
    t0 = time.perf_counter()
    params = device_init_int8_params(cfg)
    print(f"params in {time.perf_counter() - t0:.0f}s", flush=True)

    def one(stacked, batch):
        llama_adapter.STACKED_CARRY = stacked
        row = run_decode_bench(cfg, params, batch=batch, prompt_len=256,
                               max_new=96, chunk=32)
        row["stacked_carry"] = stacked
        print(json.dumps(row), flush=True)
        return row

    # Interleave: old, new, old, new at batch 8; then a batch-1 pair.
    rows = [one(False, 8), one(True, 8), one(False, 8), one(True, 8),
            one(False, 1), one(True, 1)]
    llama_adapter.STACKED_CARRY = True

    for b in (8, 1):
        old = [r["decode_ms_per_step"] for r in rows
               if r["batch"] == b and not r["stacked_carry"]]
        new = [r["decode_ms_per_step"] for r in rows
               if r["batch"] == b and r["stacked_carry"]]
        print(f"batch {b}: old {old} ms/step, new {new} ms/step, "
              f"speedup {min(old) / min(new):.3f}x", flush=True)


if __name__ == "__main__":
    main()
