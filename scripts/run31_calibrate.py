#!/usr/bin/env python
"""run31 — recalibrate the achievable-floor model on the PRODUCTION kernels.

Round-3 verdict weak #1: BENCH_r03 printed int8 d=64 at 105.6% of the
"achievable floor" — the model (roofline.attention_achievable) is not a
floor. Its constants came from run19's LADDER variants; CLAUDE.md's own
rule says perf constants must come from the production kernels.

Method (no kernel surgery): at fixed (h, d, dtype, mask) the kernel cost
decomposes as

    t(S) = A + B*S + C*pairs(S)        pairs = h * S^2 (visible pairs)

A = fixed dispatch/grid overhead, B*S = everything linear in S (HBM
streaming of Q/K/V/O, per-row work), C*pairs = the per-score-element
marginal cost (MXU MACs + VPU softmax passes). An S-sweep {1024, 2048,
4096, 8192} over-determines (A, B, C) by one point -> the least-squares
residual is the printed error bar. The VPU seconds-per-pair constant is
then C minus the ANALYTIC MXU per-pair cost, per pipeline family:

    int8_t_*   transposed fused-row int8 (bf16 PV + MXU-sum; run25/27
               route all non-causal shapes here)
    int8_std   standard orientation (causal d=128 routes here)
    bf16_*     bf16 flash

Usage:
    python scripts/run31_calibrate.py FAMILY [...]   # subset (compile warm-up)
    python scripts/run31_calibrate.py                # all families, one process

Run family-by-family first (each stays under the 570 s tunnel budget while
cold-compiling), then the full pass: the persistent compile cache makes it
pure measurement, all in ONE process (chip-state discipline, CLAUDE.md).
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.harness.timing import benchmark  # noqa: E402
from quantizedmha_tpu.ops.flash_attention import flash_attention  # noqa: E402
from quantizedmha_tpu.ops.flash_attention_int8 import (  # noqa: E402
    flash_attention_int8,
)
from quantizedmha_tpu.profiling.roofline import (  # noqa: E402
    detect_chip,
    visible_pairs,
)

S_SWEEP = (1024, 2048, 4096, 8192)

# family -> (dtype, h, d, causal)
FAMILIES = {
    "int8_t_d32": ("int8", 32, 32, False),
    "int8_t_d64": ("int8", 16, 64, False),
    "int8_t_d128": ("int8", 8, 128, False),
    "int8_std_d128c": ("int8", 8, 128, True),
    "bf16_d64": ("bf16", 16, 64, False),
    "bf16_d128": ("bf16", 8, 128, False),
}


def make_fn(dtype, causal):
    if dtype == "int8":
        return jax.jit(lambda q, k, v: flash_attention_int8(
            q, k, v, causal=causal))
    return jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=causal))


def mxu_per_pair(chip, dtype, d, family):
    """Analytic MXU seconds per visible score element for this pipeline."""
    int8 = chip.int8_tops * 1e12
    bf16 = chip.bf16_tflops * 1e12
    qk_eff = min(d, 128) / 128.0
    if dtype == "int8":
        # QK int8 x int8 at contraction depth d; PV rides bf16 in the
        # fused-row pipeline AND the standard orientation post-run21.
        return 2.0 * d / (int8 * qk_eff) + 2.0 * d / bf16
    return 2.0 * d / (bf16 * qk_eff) + 2.0 * d / bf16


def main():
    chip = detect_chip()
    names = sys.argv[1:] or list(FAMILIES)
    rng = np.random.default_rng(0)

    cases = []  # (family, S, fn, args)
    for name in names:
        dtype, h, d, causal = FAMILIES[name]
        fn = make_fn(dtype, causal)
        for S in S_SWEEP:
            el = jnp.float32 if dtype == "int8" else jnp.bfloat16
            q = jnp.asarray(rng.normal(0, 0.5, (1, h, S, d)), el)
            k = jnp.asarray(rng.normal(0, 0.5, (1, h, S, d)), el)
            v = jnp.asarray(rng.normal(0, 0.5, (1, h, S, d)), el)
            cases.append((name, S, fn, (q, k, v)))

    # Warm every case first (compile), then 3 interleaved measurement
    # rounds over all cases — chip-state drift lands evenly.
    meds = {}
    for rnd in range(3):
        for name, S, fn, args in cases:
            t = benchmark(fn, *args, warmup=2 if rnd == 0 else 1,
                          runs=16, repeats=3)
            meds.setdefault((name, S), []).append(t.median_ms)
            print(f"round{rnd} {name} S={S}: {t.median_ms:.3f} ms",
                  flush=True)

    out = {"chip": chip.name, "families": {}}
    for name in names:
        dtype, h, d, causal = FAMILIES[name]
        ss = np.asarray(S_SWEEP, np.float64)
        t = np.asarray([sorted(meds[(name, S)])[1] for S in S_SWEEP]) * 1e-3
        pairs = np.asarray([
            visible_pairs(1, h, S, S, causal=causal) for S in S_SWEEP])
        X = np.stack([np.ones_like(ss), ss, pairs], axis=1)
        coef, res, *_ = np.linalg.lstsq(X, t, rcond=None)
        A, B, C = coef
        fitted = X @ coef
        resid = float(np.max(np.abs(fitted - t) / t))
        mxu_pp = mxu_per_pair(chip, dtype, d, name)
        vpu_pp = C - mxu_pp
        eff_passes = vpu_pp * 3.2e12  # in run19's pass vocabulary
        row = {
            "A_ms": round(A * 1e3, 4), "B_s_per_tok_ns": round(B * 1e9, 3),
            "C_pairs_ps": round(C * 1e12, 4),
            "mxu_pp_ps": round(mxu_pp * 1e12, 4),
            "vpu_pp_ps": round(vpu_pp * 1e12, 4),
            "eff_passes_at_3p2e12": round(eff_passes, 2),
            "fit_max_rel_resid": round(resid, 4),
            "measured_ms": [round(x * 1e3, 3) for x in t],
        }
        out["families"][name] = row
        print(f"{name}: C={row['C_pairs_ps']} ps/pair (mxu {row['mxu_pp_ps']}"
              f" + vpu {row['vpu_pp_ps']}), eff passes "
              f"{row['eff_passes_at_3p2e12']}, resid {resid:.1%}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
