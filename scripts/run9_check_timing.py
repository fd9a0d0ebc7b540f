#!/usr/bin/env python
"""Cross-check the run9 measurement anomaly: script baseline at n4k_d64
measured 0.195 ms (~90% of int8 SoL — implausible) vs round-1's 0.923 ms.
Compare the production kernel and the script's baseline copy under (a) the
harness two-point benchmark, (b) the script's interleaved batches at k2=32
and k2=256, all in ONE process."""

import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.harness.timing import benchmark
from quantizedmha_tpu.ops.flash_attention_int8 import flash_attention_int8
import importlib.util
spec = importlib.util.spec_from_file_location("ladder", "scripts/run9_ladder.py")
ladder = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ladder)

B, H, S, D = 1, 16, 4096, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
k = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
v = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)

prod = jax.jit(lambda q, k, v: flash_attention_int8(q, k, v))
script = ladder.build_int8_t((B, H, S, D))

o1 = np.asarray(prod(q, k, v), np.float32)
o2 = np.asarray(script(q, k, v), np.float32)
print("outputs agree:", np.max(np.abs(o1 - o2)) < 1e-3,
      "max_abs_diff:", float(np.max(np.abs(o1 - o2))))

def batch(fn, n):
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(q, k, v)
    np.asarray(out[(0,) * out.ndim])
    return time.perf_counter() - t0

for name, fn in (("prod", prod), ("script", script)):
    batch(fn, 4)  # warm
    t = benchmark(fn, q, k, v, warmup=2, runs=24, repeats=5)
    # two-point at k2=32 and k2=256, interleaved
    e32, e256, raw256 = [], [], []
    for _ in range(5):
        t1 = batch(fn, 2)
        t2 = batch(fn, 32)
        e32.append((t2 - t1) / 30)
        t1 = batch(fn, 2)
        t2 = batch(fn, 256)
        e256.append((t2 - t1) / 254)
        raw256.append(t2 / 256)
    import statistics as st
    print(f"{name}: harness median={t.median_ms:.3f} best={t.best_ms:.3f} | "
          f"k32 fit={st.median(e32)*1e3:.3f} | k256 fit={st.median(e256)*1e3:.3f} | "
          f"raw256={st.median(raw256)*1e3:.3f}")
