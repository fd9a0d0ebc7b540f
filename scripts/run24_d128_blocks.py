#!/usr/bin/env python
"""run24 — d=128 block-shape sweep: chasing the 16% achievable gap.

run19's decomposition left d=128 at 84% of the modeled achievable floor
and localized the headroom to the exp transcendental (~0.114 ms, 19%),
hypothesizing it "stops pipelining behind the pass structure" with fewer
score rows per grid cell. Block shape is the lever that changes rows per
grid cell without touching the algorithm — this sweep runs the PRODUCTION
standard-orientation kernel over the VMEM-feasible (block_q, block_kv)
grid, interleaved in one process.

Chip job — run only when no other chip work is live (CLAUDE.md).
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
from quantizedmha_tpu.profiling.roofline import (  # noqa: E402
    attention_achievable,
    detect_chip,
)

B, H, S, D = 1, 8, 4096, 128
# scores tile (f32) + P copy must stay under ~10 MB VMEM (pick_blocks rule:
# bq*bkv*6 bytes); (1024,1024) is today's default.
COMBOS = [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
          (2048, 512), (512, 2048), (2048, 256), (256, 2048)]


def main():
    rng = np.random.default_rng(42)
    q, k, v = (jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
               for _ in range(3))
    chip = detect_chip()

    fns = {
        f"bq{bq}_bkv{bkv}": jax.jit(
            lambda q, k, v, bq=bq, bkv=bkv: flash_attention_int8(
                q, k, v, block_q=bq, block_kv=bkv))
        for bq, bkv in COMBOS
    }
    results = {name: [] for name in fns}
    for rnd in range(3):  # interleaved rounds
        for name, fn in fns.items():
            t = benchmark(fn, q, k, v, warmup=2, runs=16, repeats=3)
            results[name].append(round(t.median_ms, 3))
            print(f"round {rnd}: {name} {t.median_ms:.3f} ms", flush=True)

    table = {}
    for name, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        ach = attention_achievable(
            med * 1e-3, batch=B, heads=H, q_len=S, kv_len=S, head_dim=D,
            dtype="int8", chip=chip)
        table[name] = {"ms": med, "fits": ts,
                       "pct_achievable": round(ach.pct_of_achievable, 1)}
        print(name, json.dumps(table[name]), flush=True)
    print(json.dumps(table))


if __name__ == "__main__":
    main()
