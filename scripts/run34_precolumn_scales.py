#!/usr/bin/env python
"""run34 — pre-columned scale planes in the fused-chunk carry.

run33's trace named ~0.65 ms/step of copies re-materializing the decode
kernel's scale-column layout ([L, Hkv, pages] -> [L, Hkv, pages, 1]) per
layer per step. decode_loop now makes that layout change ONCE per chunk
(carrying the columned planes through both scans). Same-process
interleaved A/B at the bench serving config.
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
from quantizedmha_tpu.serving import llama_adapter  # noqa: E402


def main():
    cfg = dataclasses_replace(
        LlamaConfig.llama3_8b(), attention_impl="flash_int8")
    t0 = time.perf_counter()
    params = device_init_int8_params(cfg)
    print(f"params in {time.perf_counter() - t0:.0f}s", flush=True)

    def one(pre_col, batch):
        llama_adapter.PRECOLUMN_SCALES = pre_col
        row = run_decode_bench(cfg, params, batch=batch, prompt_len=256,
                               max_new=128, chunk=32, async_dispatch=True)
        row["precolumn"] = pre_col
        print(json.dumps(row), flush=True)
        return row

    rows = [one(False, 8), one(True, 8), one(False, 8), one(True, 8),
            one(False, 1), one(True, 1)]
    llama_adapter.PRECOLUMN_SCALES = True
    for b in (8, 1):
        old = [r["decode_ms_per_step"] for r in rows
               if r["batch"] == b and not r["precolumn"]]
        new = [r["decode_ms_per_step"] for r in rows
               if r["batch"] == b and r["precolumn"]]
        print(f"batch {b}: percall {old} ms/step, precol {new} ms/step, "
              f"speedup {min(old) / min(new):.3f}x", flush=True)


if __name__ == "__main__":
    main()
