#!/usr/bin/env python
"""Perf investigation on the real chip: component timings + block sweeps
for the headline workload (N=8192, d_model=1024, h=32, d=32)."""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.api import solve
from quantizedmha_tpu.harness.timing import benchmark
from quantizedmha_tpu.ops.flash_attention_int8 import (
    flash_attention_int8_prequant,
    flash_attention_int8_t,
)
from quantizedmha_tpu.ops.quantize import quantize_kv_blocks

N, DM, H = 8192, 1024, 32
D = DM // H


def main():
    rng = np.random.default_rng(42)
    q2 = jnp.asarray(rng.normal(0, 0.5, (N, DM)), jnp.float32)
    k2 = jnp.asarray(rng.normal(0, 0.5, (N, DM)), jnp.float32)
    v2 = jnp.asarray(rng.normal(0, 0.5, (N, DM)), jnp.float32)
    q = jnp.asarray(q2.reshape(N, H, D).transpose(1, 0, 2)[None])
    k = jnp.asarray(k2.reshape(N, H, D).transpose(1, 0, 2)[None])
    v = jnp.asarray(v2.reshape(N, H, D).transpose(1, 0, 2)[None])

    results = {}

    def bench(name, fn, *args, **kw):
        t = benchmark(fn, *args, warmup=3, runs=16, repeats=3, **kw)
        results[name] = round(t.median_ms, 3)
        print(f"{name:>40}: {t.median_ms:8.3f} ms (spread {t.spread:.2f})", flush=True)
        return t.median_ms

    # 1. Full solve path (what bench.py times).
    f_solve = jax.jit(lambda a, b, c: solve(a, b, c, DM, H, kernel="fa_int8"))
    bench("solve fa_int8 (headline)", f_solve, q2, k2, v2)

    # 2. Shaped kernel without the ABI reshapes.
    f_shaped = jax.jit(lambda a, b, c: flash_attention_int8_t(a, b, c))
    bench("fa_int8_t shaped [1,32,8192,32]", f_shaped, q, k, v)

    # 3. Quantize prepass alone.
    f_qz = jax.jit(lambda a: quantize_kv_blocks(a, 512))
    bench("quantize_kv_blocks(512) K", f_qz, k)

    # 4. Block sweeps for the transposed kernel.
    for bq in (1024, 2048, 4096, 8192):
        for bkv in (256, 512, 1024, 2048):
            if bq * bkv * 6 > 14 * 1024 * 1024:
                continue
            name = f"fa_int8_t bq={bq} bkv={bkv}"
            try:
                f = jax.jit(lambda a, b, c, bq=bq, bkv=bkv: flash_attention_int8_t(
                    a, b, c, block_q=bq, block_kv=bkv))
                bench(name, f, q, k, v)
            except Exception as e:
                print(f"{name:>40}: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
