#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: end-to-end latency of the fused INT8 attention on the
reference's own published workload — N=8192, d_model=1024, h=32 (d=32),
FP32 in/out, all heads (reference include/config.h:22-28) — against the
reference's best kernel, fa_tc_int8_b at 7.70 ms on an NVIDIA L4
(reference README.md:19). vs_baseline > 1 means we beat it.

Round-3 robustness (round-2 verdict weak #1): the headline is the MEDIAN
OF K INDEPENDENT FITS interleaved through the whole process — chip state
on the tunneled v5e drifts one-sidedly between/within processes, so a
single early fit random-walks the number of record; the spread of the K
fits is printed so a bad-chip-state round is visible instead of silent.

Extra context (secondary metrics, achievable-model scores, the serving
row, correctness gates) goes into "extra".
"""

import json
import os
import subprocess
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
from quantizedmha_tpu.profiling.roofline import (
    attention_achievable,
    attention_flops,
    detect_chip,
    roofline,
)

REFERENCE_INT8_MS = 7.70  # fa_tc_int8_b on L4, reference README.md:19
SERVING_TIMEOUT_S = 420   # subprocess budget for the 8B serving rows


def serving_row() -> dict:
    """Llama-8B-shape decode tok/s + % of HBM SoL at batch 8 AND batch 1,
    in a SUBPROCESS with a timeout: 8B-scale jobs have wedged this
    machine's tunneled backend before (.claude/skills/verify/SKILL.md) —
    a hang must degrade this row, never the headline. Two configs: the
    w8a16 row (round-3 continuity) and the w4a16 + int8-lm_head row
    (round 4: Pallas fused dequant-matmul, runs 35-37)."""
    # chunk=32 after run28's sweep (8/16/32 -> 381/409/431 tok/s);
    # async_dispatch after run32 (the per-chunk host round-trip overlaps
    # the next chunk's compute instead of amortizing: +7.3%/+7.5%). The
    # costs — EOS overshoot up to 2*chunk-1 steps per finished sequence,
    # one chunk of extra result latency — are throughput-row tradeoffs,
    # stated here.
    base = [sys.executable, "-m", "quantizedmha_tpu.harness.serving_bench",
            "--json", "--prompt-len", "256",
            "--max-new", "96", "--chunk", "32", "--async-dispatch"]
    extras: dict = {}
    for tag, extra_args, prefix in (
            ("w8", ["--batch", "8", "1"], ""),
            ("w4", ["--batch", "8", "1", "32",
                    "--weight-bits", "4", "--lm-head-bits", "8"], "w4_")):
        try:
            proc = subprocess.run(
                base + extra_args, capture_output=True, text=True,
                timeout=SERVING_TIMEOUT_S,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            if proc.returncode != 0:
                extras[f"serving_error_{tag}"] = (proc.stderr or "")[-300:]
                continue
            out = json.loads(proc.stdout.strip().splitlines()[-1])
            row = out["sweep"][0]
            extras.update({
                f"{prefix}decode_toks_per_s": row["decode_toks_per_s"],
                f"{prefix}decode_pct_hbm_sol": row["decode_pct_hbm_sol"],
                f"{prefix}decode_ms_per_tok": row["decode_ms_per_tok"],
                f"{prefix}hbm_bytes_per_tok": row["hbm_bytes_per_tok"],
                f"{prefix}serving_model": out["model"],
                f"{prefix}first_step_s": row["first_step_s"],
                f"{prefix}ttft_warm_s": row.get("ttft_warm_s"),
            })
            if not prefix:
                extras["serving_batch"] = row["batch"]
            if len(out["sweep"]) > 1:
                b1 = out["sweep"][1]
                extras[f"{prefix}decode_b1_toks_per_s"] = (
                    b1["decode_toks_per_s"])
                extras[f"{prefix}decode_b1_pct_hbm_sol"] = (
                    b1["decode_pct_hbm_sol"])
            if len(out["sweep"]) > 2:  # w4 throughput row at batch 32
                b32 = out["sweep"][2]
                extras[f"{prefix}decode_b32_toks_per_s"] = (
                    b32["decode_toks_per_s"])
                extras[f"{prefix}decode_b32_pct_hbm_sol"] = (
                    b32["decode_pct_hbm_sol"])
        except subprocess.TimeoutExpired:
            extras[f"serving_error_{tag}"] = (
                f"timeout after {SERVING_TIMEOUT_S}s")
        except Exception as e:  # noqa: BLE001 — the row is best-effort
            extras[f"serving_error_{tag}"] = f"{type(e).__name__}: {e}"
    return extras


def main():
    # Persistent compile cache: bench compiles ~6 kernels; on a warm cache
    # the run fits comfortably inside the driver's timeout even when the
    # chip/compile-helper is having a slow day.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    rng = np.random.default_rng(42)
    chip = detect_chip()

    # --- Headline: the reference's exact workload, its ABI (flat [N, d_model]).
    wl = ReferenceWorkload()
    N, d_model, h = wl.seq_len, wl.d_model, wl.num_heads
    q = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)

    solve_int8 = jax.jit(lambda q, k, v: solve(q, k, v, d_model, h, kernel="fa_int8"))

    def headline_fit():
        return benchmark(solve_int8, q, k, v, warmup=3, runs=32, repeats=5)

    fits = [headline_fit()]  # fit 1: cold-ish chip state

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
    fits.append(headline_fit())  # fit 2

    flops = attention_flops(B, H, S, S, D)
    rl_int8 = roofline(t_int8.median_s, flops, 0, dtype="int8", chip=chip)
    rl_bf16 = roofline(t_bf16.median_s, flops, 0, dtype="bf16", chip=chip)
    # Composite achievable-time scores (run9 productized): % of the
    # shape's achievable floor, not of the shape-blind raw-MXU peak.
    # d=64 routes to the transposed orientation whose default pipeline is
    # bf16 P-V (run21) + MXU-sum l (run25) — the floor model charges that
    # pipeline (3 VPU passes, PV at the bf16 rate).
    ach_int8 = attention_achievable(
        t_int8.median_s, batch=B, heads=H, q_len=S, kv_len=S, head_dim=D,
        dtype="int8_bf16pv", chip=chip)
    ach_bf16 = attention_achievable(
        t_bf16.median_s, batch=B, heads=H, q_len=S, kv_len=S, head_dim=D,
        dtype="bf16", chip=chip)

    # --- d=128 SoL row (same total FLOPs as the d=64 config): at head_dim
    # 128 the QK contraction fills the MXU, separating kernel quality from
    # the d<=64 shape tax (run9, profiles/md/run9_mxu_gap/notes.md).
    q128 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S, 128)), jnp.float32)
    k128 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S, 128)), jnp.float32)
    v128 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S, 128)), jnp.float32)
    t_128 = benchmark(fa_int8, q128, k128, v128, warmup=3, runs=24, repeats=5)
    rl_128 = roofline(
        t_128.median_s, attention_flops(1, 8, S, S, 128), 0,
        dtype="int8", chip=chip)
    # Long-N d=128 row (VERDICT r5 #3): at 16K the QK/PV matmuls amortize
    # everything else — the shape where raw MXU % peaks (run47: 41%).
    S16 = 16384
    q16 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S16, 128)), jnp.float32)
    k16 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S16, 128)), jnp.float32)
    v16 = jnp.asarray(rng.normal(0, 0.5, (1, 8, S16, 128)), jnp.float32)
    t_16k = benchmark(fa_int8, q16, k16, v16, warmup=2, runs=6, repeats=3)
    rl_16k = roofline(
        t_16k.median_s, attention_flops(1, 8, S16, S16, 128), 0,
        dtype="int8", chip=chip)
    ach_16k = attention_achievable(
        t_16k.median_s, batch=1, heads=8, q_len=S16, kv_len=S16,
        head_dim=128, dtype="int8_bf16pv", chip=chip)

    # d=128 routes to the transposed orientation since run27 — the same
    # bf16-P-V + MXU-sum pipeline as d<=64 (3 VPU passes, PV at bf16 rate).
    ach_128 = attention_achievable(
        t_128.median_s, batch=1, heads=8, q_len=S, kv_len=S, head_dim=128,
        dtype="int8_bf16pv", chip=chip)
    fits.append(headline_fit())  # fit 3

    # --- Long-context extra: 32K causal sliding-window (shrunk O(seq*W)
    # grids in both the bf16 and int8 orientations).
    Sw = 32768
    qw = jnp.asarray(rng.normal(0, 0.5, (1, 8, Sw, 128)), jnp.bfloat16)
    kw = jnp.asarray(rng.normal(0, 0.5, (1, 8, Sw, 128)), jnp.bfloat16)
    vw = jnp.asarray(rng.normal(0, 0.5, (1, 8, Sw, 128)), jnp.bfloat16)
    fa_win = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, causal=True, window=4096, attention_sinks=64))
    t_win = benchmark(fa_win, qw, kw, vw, warmup=2, runs=8, repeats=3)
    qwf, kwf, vwf = (x.astype(jnp.float32) for x in (qw, kw, vw))
    fa_win_i8 = jax.jit(lambda q, k, v: flash_attention_int8(
        q, k, v, causal=True, window=4096, attention_sinks=64))
    t_win_i8 = benchmark(fa_win_i8, qwf, kwf, vwf, warmup=2, runs=8, repeats=3)
    fits.append(headline_fit())  # fit 4

    # --- Correctness gate 1: INT8 max-abs err vs FP32 golden, RANDOM
    # inputs (the reference's blind spot — SURVEY §4.4).
    from quantizedmha_tpu.reference.mha import mha_reference_shaped

    small = slice(0, 1024)
    ref_small = mha_reference_shaped(qs[:, :2, small], ks[:, :2, small], vs[:, :2, small])
    int8_small = flash_attention_int8(qs[:, :2, small], ks[:, :2, small], vs[:, :2, small])
    gate = compare(int8_small, ref_small, abs_tol=1e-1, rel_tol=1e-1)

    # --- Correctness gate 2: the reference's OWN metric — constant-1.0
    # inputs at its workload, where the exact answer is 1.0 everywhere
    # (any row-stochastic attention times V=1 gives 1; RoPE cancels).
    # The reference's int8_b deviates 0.3-0.4% here from its SMEM unions
    # (reference profiles/md/run7/notes.md:41-53); apples-to-apples our
    # random-input max_rel (~1.6e-2) is a tiny-|ref|-denominator artifact,
    # THIS row is the like-for-like budget.
    ones = jnp.ones((N, d_model), jnp.float32)
    const_out = np.asarray(solve_int8(ones, ones, ones))
    const_dev = float(np.abs(const_out - 1.0).max())
    fits.append(headline_fit())  # fit 5: warmed chip state

    # --- Serving row (subprocess; best-effort).
    serving = serving_row()

    # Headline statistic: median of the K interleaved fits' medians.
    med = sorted(f.median_ms for f in fits)[len(fits) // 2]
    spread = (max(f.median_ms for f in fits) - min(f.median_ms for f in fits)) / med
    ach_head = attention_achievable(
        med * 1e-3, batch=1, heads=h, q_len=N, kv_len=N,
        head_dim=d_model // h, dtype="int8_bf16pv", chip=chip)
    result = {
        "metric": "fused_int8_mha_ms_reference_workload_N8192_h32_d32",
        "value": round(med, 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_INT8_MS / med, 3),
        "extra": {
            "chip": chip.name,
            "headline_note": "reference fa_tc_int8_b = 7.70 ms on L4 (README.md:19); vs_baseline = ref_ms / ours; value = median of 5 interleaved fits",
            "headline_fits_ms": [round(f.median_ms, 3) for f in fits],
            "headline_spread": round(spread, 3),
            "headline_best_ms": round(min(f.best_ms for f in fits), 3),
            "headline_pct_achievable": round(ach_head.pct_of_achievable, 1),
            "int8_n4k_d64_ms": round(t_int8.median_ms, 3),
            "int8_n4k_d64_tflops": round(rl_int8.tflops_achieved, 2),
            "int8_pct_mxu_sol": round(rl_int8.pct_of_compute_sol, 1),
            "int8_n4k_d64_pct_achievable": round(ach_int8.pct_of_achievable, 1),
            "bf16_n4k_d64_ms": round(t_bf16.median_ms, 3),
            "bf16_n4k_d64_tflops": round(rl_bf16.tflops_achieved, 2),
            "bf16_pct_mxu_sol": round(rl_bf16.pct_of_compute_sol, 1),
            "bf16_n4k_d64_pct_achievable": round(ach_bf16.pct_of_achievable, 1),
            "int8_n4k_d128_ms": round(t_128.median_ms, 3),
            "int8_n4k_d128_pct_mxu_sol": round(rl_128.pct_of_compute_sol, 1),
            "int8_n4k_d128_pct_achievable": round(ach_128.pct_of_achievable, 1),
            "int8_n16k_d128_ms": round(t_16k.median_ms, 3),
            "int8_n16k_d128_pct_mxu_sol": round(rl_16k.pct_of_compute_sol, 1),
            "int8_n16k_d128_pct_achievable": round(
                ach_16k.pct_of_achievable, 1),
            "windowed_32k_w4k_bf16_ms": round(t_win.median_ms, 3),
            "windowed_32k_w4k_int8_ms": round(t_win_i8.median_ms, 3),
            "int8_vs_fp32_max_abs_err": round(gate.max_abs, 5),
            "int8_vs_fp32_max_rel_err": round(gate.max_rel, 5),
            "const_input_max_dev": round(const_dev, 6),
            "const_input_note": "reference's own gate metric; its int8_b deviates 3-4e-3 (run7/notes.md:41-53)",
            **serving,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
