#!/usr/bin/env python
"""Run 20 — why does the committed headline (6.8-6.9 ms) sit ~15% above
the same kernel's same-process sweep numbers (run9: 5.54-5.89 ms)?

Round-2 verdict weak #1: the headline of record random-walks with
cross-process chip state. This probe characterizes the WITHIN-process
trajectory so bench.py's median-of-k-interleaved-fits can be judged:

  phase A: 6 consecutive headline fits right after compile (bench.py's
           old position in the process lifetime);
  phase B: ~45 s of sustained matmul load (does the chip "warm up"?);
  phase C: 6 more fits;
  phase D: the raw pre-shaped kernel vs the production solve() wrapper,
           interleaved (the run15 ABI question, re-verified in-process).

If C < A materially, early-process fits are biased slow and the bench
should warm before fitting. If A ~ C ~ 6.8 while run9-style round-robin
measurement reads 5.5-5.9, the delta is METHOD (shared-batch round-robin
vs isolated fits), not chip state — also actionable.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.api import solve
from quantizedmha_tpu.configs import ReferenceWorkload
from quantizedmha_tpu.harness.timing import benchmark
from quantizedmha_tpu.ops.flash_attention_int8 import flash_attention_int8


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    rng = np.random.default_rng(42)
    wl = ReferenceWorkload()
    N, d_model, h = wl.seq_len, wl.d_model, wl.num_heads
    q = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)
    solve_int8 = jax.jit(
        lambda q, k, v: solve(q, k, v, d_model, h, kernel="fa_int8"))

    # Pre-shaped inputs for the raw kernel (the ABI A/B).
    qs = q.reshape(N, h, d_model // h).transpose(1, 0, 2)[None]
    ks = k.reshape(N, h, d_model // h).transpose(1, 0, 2)[None]
    vs = v.reshape(N, h, d_model // h).transpose(1, 0, 2)[None]
    raw_int8 = jax.jit(lambda q, k, v: flash_attention_int8(q, k, v))

    t0 = time.time()

    def fit(fn, *args):
        t = benchmark(fn, *args, warmup=2, runs=32, repeats=5)
        return round(t.median_ms, 3), round(time.time() - t0, 1)

    out = {"phase_a": [], "phase_c": [], "phase_d": {}}
    print("phase A: fits right after compile")
    for i in range(6):
        ms, ts = fit(solve_int8, q, k, v)
        out["phase_a"].append(ms)
        print(f"  A{i}: {ms} ms @t={ts}s", flush=True)

    print("phase B: ~45 s sustained matmul load")
    big = jnp.asarray(rng.normal(0, 1, (8192, 8192)), jnp.bfloat16)

    @jax.jit
    def loadfn(x):
        # ~50 chained matmuls per dispatch, one host sync per call:
        # an unsynced enqueue loop floods the tunnel's queue and hangs
        # (first run of this probe died exactly there).
        def body(_, y):
            return (y @ big) * (1.0 / 90.0)

        return jax.lax.fori_loop(0, 50, body, x)

    tb = time.time()
    r = big
    while time.time() - tb < 45:
        r = loadfn(r)
        np.asarray(r[0, 0])

    print("phase C: fits after sustained load")
    for i in range(6):
        ms, ts = fit(solve_int8, q, k, v)
        out["phase_c"].append(ms)
        print(f"  C{i}: {ms} ms @t={ts}s", flush=True)

    print("phase D: raw kernel vs production wrapper, interleaved x4")
    raws, prods = [], []
    for i in range(4):
        ms, _ = fit(raw_int8, qs, ks, vs)
        raws.append(ms)
        ms, _ = fit(solve_int8, q, k, v)
        prods.append(ms)
    out["phase_d"] = {"raw_kernel_ms": raws, "production_solve_ms": prods}
    print(f"  raw {raws} vs solve {prods}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
