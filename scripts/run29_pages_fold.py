#!/usr/bin/env python
"""Run 29 — paged-decode pages-per-step fold A/B.

run28's xprof decomposition showed the decode attention kernel at ~33% of
its data floor at serving context (ctx 288): virtually all of its 2.97
ms/step is per-grid-step fixed cost (~0.4 us x batch x kv_heads x pages x
layers), not HBM reads. The fold processes J pages per grid step — J
offset-indexed page operands concatenated into one [J*page_size, head_dim]
score tile, per-page scales riding the score/P columns — amortizing the
fixed cost J-fold.

This script A/Bs J in {1, 2, 4} on the paged int8 decode kernel, in one
process, interleaved (chip-state discipline per
.claude/skills/verify/SKILL.md), at three contexts:
  - serving-short (the run28 shape: B=8, ctx 288, table width 4),
  - mid (ctx 2048),
  - long (B=1, ctx 32K — where DMA bytes, not grid steps, dominate; the
    fold must at least not regress here).
Parity: J=2/4 outputs vs J=1 (max-abs; exact softmax algebra says the
only deltas are f32 reduction-order level).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.harness.timing import benchmark
from quantizedmha_tpu.ops.decode import paged_decode_attention


def make_case(rng, B, ctx, MP, Hkv=8, G=4, D=128, PS=128):
    NP = B * MP + 2
    q = jnp.asarray(rng.normal(0, 0.5, (B, Hkv * G, D)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 128, (Hkv, NP, PS, D)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, (Hkv, NP, PS, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(1e-3, 2e-3, (Hkv, NP)), jnp.float32)
    vs = jnp.asarray(rng.uniform(1e-3, 2e-3, (Hkv, NP)), jnp.float32)
    lengths = jnp.full((B,), ctx, jnp.int32)
    tables = jnp.asarray(
        rng.permutation(NP - 1)[: B * MP].reshape(B, MP) + 1, jnp.int32)
    return (q, kp, vp, ks, vs, lengths, tables)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    rng = np.random.default_rng(0)

    cases = {
        "short_b8_ctx288_mp4": make_case(rng, 8, 288, 4),
        "mid_b8_ctx2048_mp17": make_case(rng, 8, 2048, 17),
        "long_b1_ctx32k_mp256": make_case(rng, 1, 32768, 256),
    }
    out = {}
    for name, args in cases.items():
        fns = {
            J: jax.jit(lambda *a, J=J: paged_decode_attention(
                *a, pages_per_step=J))
            for J in (1, 2, 4)
        }
        outs = {J: np.asarray(f(*args)) for J, f in fns.items()}
        parity = {f"j{J}_vs_j1_max_abs": float(
            np.abs(outs[J] - outs[1]).max()) for J in (2, 4)}
        rounds = {J: [] for J in fns}
        for _ in range(3):  # interleaved
            for J, f in fns.items():
                rounds[J].append(
                    benchmark(f, *args, warmup=1, runs=16, repeats=3).median_ms)
        out[name] = {**{f"j{J}_ms": r for J, r in rounds.items()}, **parity}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
