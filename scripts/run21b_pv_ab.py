#!/usr/bin/env python
"""run21b — definitive pv_dtype A/B on the PRODUCTION kernel.

run21 adopted bf16 P·V as the transposed-orientation default off a 1.05×
(d64) / 1.12× (d32 headline) win measured on the run9_ladder experimental
kernel copy. A later re-run of the same ladder read the d64 point at
0.68× — a contradiction large enough to be a routing/chip-state artifact
or a real regression. This script settles it on the kernel users actually
run (`flash_attention_int8(..., pv_dtype=...)`), interleaved A/B/A/B in
one process (CLAUDE.md: cross-process chip state is one-sided ±8-30%).

Chip job — run only when no other chip work is live.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.harness.timing import benchmark  # noqa: E402
from quantizedmha_tpu.ops.flash_attention_int8 import (  # noqa: E402
    flash_attention_int8,
)

WORKLOADS = {
    "n4k_d64": (1, 16, 4096, 64),
    "n8k_d32": (1, 32, 8192, 32),
}


def main():
    rng = np.random.default_rng(42)
    out = {}
    for name, (B, H, S, D) in WORKLOADS.items():
        q, k, v = (jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
                   for _ in range(3))
        fns = {
            "int8": jax.jit(lambda q, k, v: flash_attention_int8(
                q, k, v, pv_dtype="int8")),
            "bf16": jax.jit(lambda q, k, v: flash_attention_int8(
                q, k, v, pv_dtype="bf16")),
            # run25 candidate: l as a ones-row of the bf16 PV matmul
            # (deletes the VPU sum(p) pass at d <= 64).
            "bf16_mxusum": jax.jit(lambda q, k, v: flash_attention_int8(
                q, k, v, pv_dtype="bf16", summode="mxu")),
        }
        r = {m: [] for m in fns}
        for _ in range(4):  # interleaved: alternating fits, same process
            for m, fn in fns.items():
                r[m].append(round(
                    benchmark(fn, q, k, v, warmup=2, runs=16,
                              repeats=3).median_ms, 3))
        med = {m: sorted(t)[len(t) // 2] for m, t in r.items()}
        out[name] = {
            **r, "median": med,
            "bf16_speedup": round(med["int8"] / med["bf16"], 3),
            "mxusum_speedup_vs_bf16": round(
                med["bf16"] / med["bf16_mxusum"], 3),
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
