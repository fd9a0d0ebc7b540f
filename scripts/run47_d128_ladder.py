#!/usr/bin/env python
"""run47 — the d=128 bench row (transposed int8, non-causal, b1 h8 n4k):
block geometry + summode revisit (VERDICT r5 item #3).

run27 shipped bq=2048 because bq=4096 blows scoped VMEM at 32K; but the
bench row is 4K, where 4096 compiled and measured 0.539 vs 0.565. This
ladder re-prices: bq in {2048, 4096}, bkv in {512, 1024}, summode
{default, vpu}, plus long-N (16K) compile/latency checks for a
shape-aware cap and the new long-N bench row. Each variant reports
max-abs error vs the fp32 reference (bkv doubles the quant block, so
accuracy is part of the decision).
"""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.harness.timing import benchmark  # noqa: E402
from quantizedmha_tpu.ops.flash_attention_int8 import (  # noqa: E402
    flash_attention_int8_t,
)
from quantizedmha_tpu.reference.mha import mha_reference_shaped  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    results = {}
    S = 4096
    q = jnp.asarray(rng.normal(0, 0.5, (1, 8, S, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (1, 8, S, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (1, 8, S, 128)), jnp.float32)
    ref = np.asarray(mha_reference_shaped(q[:, :2], k[:, :2], v[:, :2]))

    cases = {
        "bq2048_bkv512": dict(block_q=2048, block_kv=512),
        "bq4096_bkv512": dict(block_q=4096, block_kv=512),
        "bq2048_bkv1024": dict(block_q=2048, block_kv=1024),
        "bq4096_bkv1024": dict(block_q=4096, block_kv=1024),
        "bq4096_bkv512_vpusum": dict(block_q=4096, block_kv=512,
                                     summode="vpu"),
    }
    for name, kw in cases.items():
        fn = jax.jit(functools.partial(flash_attention_int8_t, **kw))
        try:
            t = benchmark(fn, q, k, v, warmup=3, runs=16, repeats=4)
            err = float(np.max(np.abs(
                np.asarray(fn(q[:, :2], k[:, :2], v[:, :2])) - ref)))
            results[name] = {"ms": round(t.median_ms, 4),
                             "max_abs_err": round(err, 5)}
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {str(e)[:140]}"
        print(json.dumps({name: results[name]}), flush=True)

    # long-N: 16K compile + latency at candidate configs
    S2 = 16384
    q2 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S2, 128)), jnp.float32)
    k2 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S2, 128)), jnp.float32)
    v2 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S2, 128)), jnp.float32)
    for name, kw in {
        "n16k_bq2048_bkv512": dict(block_q=2048, block_kv=512),
        "n16k_bq4096_bkv512": dict(block_q=4096, block_kv=512),
        "n16k_bq4096_bkv1024": dict(block_q=4096, block_kv=1024),
    }.items():
        fn = jax.jit(functools.partial(flash_attention_int8_t, **kw))
        try:
            t = benchmark(fn, q2, k2, v2, warmup=2, runs=6, repeats=3)
            results[name] = {"ms": round(t.median_ms, 3)}
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {str(e)[:140]}"
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
