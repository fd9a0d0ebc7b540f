#!/usr/bin/env python
"""run26 — MXU-sum l in the bf16/f32 flash forward (run25's sibling).

run25 moved the softmax denominator into the P·V matmul in the INT8
transposed orientation (1.28-1.34x). The bf16/f32 flash fwd has the same
sum pass over LANES; at head_dim <= 64 the PV output's lane dim pads to
128 anyway, so a ones-column on V is free MXU work. This A/Bs the
production `_fwd` (summode knob, default still "vpu") interleaved in one
process, plus an accuracy check vs the f32 reference.

Chip job — run only when no other chip work is live (CLAUDE.md).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import importlib  # noqa: E402

fa = importlib.import_module("quantizedmha_tpu.ops.flash_attention")
from quantizedmha_tpu.harness.timing import benchmark  # noqa: E402
from quantizedmha_tpu.reference.mha import mha_reference_shaped  # noqa: E402

WORKLOADS = {
    "bf16_n4k_d64": ((1, 16, 4096, 64), jnp.bfloat16),
    "f32_n4k_d64": ((1, 16, 4096, 64), jnp.float32),
    "bf16_n8k_d32": ((1, 32, 8192, 32), jnp.bfloat16),
}


def main():
    rng = np.random.default_rng(42)
    out = {}
    for name, ((B, H, S, D), dt) in WORKLOADS.items():
        q, k, v = (jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), dt)
                   for _ in range(3))
        sm = D ** -0.5
        fns = {
            m: jax.jit(lambda q, k, v, m=m: fa._fwd(
                q, k, v, sm_scale=sm, causal=False, block_q=None,
                block_kv=None, save_residuals=False, summode=m)[0])
            for m in ("vpu", "mxu")
        }
        r = {m: [] for m in fns}
        for _ in range(4):
            for m, fn in fns.items():
                r[m].append(round(
                    benchmark(fn, q, k, v, warmup=2, runs=16,
                              repeats=3).median_ms, 3))
        med = {m: sorted(t)[len(t) // 2] for m, t in r.items()}
        out[name] = {**r, "median": med,
                     "mxu_speedup": round(med["vpu"] / med["mxu"], 3)}
        # accuracy: 2-head slice vs the f32 reference
        sl = (slice(None), slice(0, 2), slice(0, 1024))
        ref = np.asarray(mha_reference_shaped(
            q[sl].astype(jnp.float32), k[sl].astype(jnp.float32),
            v[sl].astype(jnp.float32)))
        for m, fn in fns.items():
            o = np.asarray(fn(q[sl], k[sl], v[sl])).astype(np.float32)
            out[name][f"max_abs_{m}"] = round(float(np.abs(o - ref).max()), 6)
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
