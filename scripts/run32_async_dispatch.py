#!/usr/bin/env python
"""run32 — depth-1 pipelined chunk dispatch (EngineConfig.async_dispatch).

run28 measured a ~2.3 ms/step host gap at chunk 16 (~40 ms of tunnel
round-trip per chunk) that chunk=32 amortizes to ~1.2 ms/step. Async
dispatch overlaps that round-trip with the NEXT chunk's device compute
instead of amortizing it: chunk N+1 is enqueued (token feed gathered
on-device from chunk N's unsynced output) before chunk N's host sync.

Same-process interleaved A/B (sync, async, sync, async) at the bench.py
serving row config (8B shape, batch 8, chunk 32, prompt 256, max_new 96)
plus a batch-1 pair. max_new 128 at batch 8 widens the measured window to
3 collected chunks per mode.
"""

import json
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


def main():
    cfg = LlamaConfig.llama3_8b()
    cfg = dataclasses_replace(cfg, attention_impl="flash_int8")
    t0 = time.perf_counter()
    params = device_init_int8_params(cfg)
    print(f"params in {time.perf_counter() - t0:.0f}s", flush=True)

    def one(async_dispatch, batch):
        row = run_decode_bench(cfg, params, batch=batch, prompt_len=256,
                               max_new=128, chunk=32,
                               async_dispatch=async_dispatch)
        print(json.dumps(row), flush=True)
        return row

    rows = [one(False, 8), one(True, 8), one(False, 8), one(True, 8),
            one(False, 1), one(True, 1)]
    for b in (8, 1):
        sync = [r["decode_ms_per_step"] for r in rows
                if r["batch"] == b and not r["async_dispatch"]]
        asyn = [r["decode_ms_per_step"] for r in rows
                if r["batch"] == b and r["async_dispatch"]]
        print(f"batch {b}: sync {sync} ms/step, async {asyn} ms/step, "
              f"speedup {min(sync) / min(asyn):.3f}x", flush=True)


if __name__ == "__main__":
    main()
