#!/usr/bin/env python
"""run37 — end-to-end decode throughput: w8a16 vs w4a16 (Pallas fused
dequant-matmul, 512x2048 tiles) vs w4a16 + int8 lm_head.

Same process, SEQUENTIAL per config (all three param sets together are
~17 GiB — over the v5e's 16; each set is freed before the next loads, so
the A/B is same-process but not interleaved: chip-state drift is mostly
cross-process, and each config gets two separated measurements to expose
any residual drift). Per-matmul micro-benches (run36f) measured w4/w8 =
1.20-1.35x on the big shapes — the step-level composite should land
between those and expose any scan/fusion regressions."""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.harness.serving_bench import (  # noqa: E402
    dataclasses_replace,
    device_init_quant_params,
    run_decode_bench,
)
from quantizedmha_tpu.models.llama import LlamaConfig  # noqa: E402


def main():
    cfg = dataclasses_replace(
        LlamaConfig.llama3_8b(), attention_impl="flash_int8")
    kw = {"w8": dict(bits=8), "w4": dict(bits=4),
          "w4lmh8": dict(bits=4, lm_head_bits=8)}

    rows = []
    for tag in ("w8", "w4", "w4lmh8"):
        t0 = time.perf_counter()
        params = device_init_quant_params(cfg, **kw[tag])
        print(f"{tag} params in {time.perf_counter() - t0:.0f}s",
              flush=True)
        for batch in (8, 1, 8, 1):
            row = run_decode_bench(params=params, cfg=cfg, batch=batch,
                                   prompt_len=256, max_new=128, chunk=32,
                                   async_dispatch=True)
            row["tag"] = tag
            rows.append(row)
            print(json.dumps(row), flush=True)
        del params  # free ~4-8 GiB of HBM before the next config
    for batch in (8, 1):
        base = max(r["decode_toks_per_s"] for r in rows
                   if r["batch"] == batch and r["tag"] == "w8")
        for tag in ("w4", "w4lmh8"):
            best = max(r["decode_toks_per_s"] for r in rows
                       if r["batch"] == batch and r["tag"] == tag)
            print(f"batch {batch}: {tag} {best} tok/s vs w8 {base} "
                  f"-> {best / base:.3f}x", flush=True)


if __name__ == "__main__":
    main()
