#!/usr/bin/env python
"""run35 — w4a16 (packed-nibble int4 weights) vs w8a16 decode throughput.

Decode is weight-bandwidth-bound (run33: matmul stream = 79% of the step);
halving weight bytes should move the batch-8 step from ~15.2 ms toward its
new ~6.1 ms weight + KV floor IF XLA keeps the packed buffer as the only
weight-shaped HBM tenant (the unpack shifts must fuse into the matmul
operand read, or at worst materialize activation-shaped tiles). Same
process, both param sets resident (8.2 + 4.3 GiB fits v5e's 16), rows
interleaved.
"""

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
    t0 = time.perf_counter()
    params = {8: device_init_quant_params(cfg, bits=8),
              4: device_init_quant_params(cfg, bits=4)}
    print(f"params in {time.perf_counter() - t0:.0f}s", flush=True)

    def one(bits, batch):
        row = run_decode_bench(cfg, params[bits], batch=batch,
                               prompt_len=256, max_new=128, chunk=32,
                               async_dispatch=True)
        row["weight_bits"] = bits
        print(json.dumps(row), flush=True)
        return row

    rows = [one(8, 8), one(4, 8), one(8, 8), one(4, 8),
            one(8, 1), one(4, 1)]
    for b in (8, 1):
        w8 = [r["decode_toks_per_s"] for r in rows
              if r["batch"] == b and r["weight_bits"] == 8]
        w4 = [r["decode_toks_per_s"] for r in rows
              if r["batch"] == b and r["weight_bits"] == 4]
        print(f"batch {b}: w8 {w8} tok/s, w4 {w4} tok/s, "
              f"speedup {max(w4) / max(w8):.3f}x", flush=True)


if __name__ == "__main__":
    main()
