#!/usr/bin/env python
"""Quick headline measurement with extra repeats."""

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.api import solve
from quantizedmha_tpu.harness.timing import benchmark
from quantizedmha_tpu.ops.flash_attention_int8 import flash_attention_int8_t

N, DM, H = 8192, 1024, 32
D = DM // H

rng = np.random.default_rng(42)
q2 = jnp.asarray(rng.normal(0, 0.5, (N, DM)), jnp.float32)
k2 = jnp.asarray(rng.normal(0, 0.5, (N, DM)), jnp.float32)
v2 = jnp.asarray(rng.normal(0, 0.5, (N, DM)), jnp.float32)
q = jnp.asarray(q2.reshape(N, H, D).transpose(1, 0, 2)[None])
k = jnp.asarray(k2.reshape(N, H, D).transpose(1, 0, 2)[None])
v = jnp.asarray(v2.reshape(N, H, D).transpose(1, 0, 2)[None])

f_solve = jax.jit(lambda a, b, c: solve(a, b, c, DM, H, kernel="fa_int8"))
f_shaped = jax.jit(lambda a, b, c: flash_attention_int8_t(a, b, c))

for name, fn, args in [("solve", f_solve, (q2, k2, v2)),
                       ("shaped", f_shaped, (q, k, v))]:
    t = benchmark(fn, *args, warmup=4, runs=32, repeats=7)
    print(f"{name:>8}: {t.median_ms:.3f} ms  spread={t.spread:.3f}", flush=True)
