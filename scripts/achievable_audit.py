#!/usr/bin/env python
"""Generate profiles/reports/achievable_audit.md — the public audit of
the composite "achievable floor" metric (VERDICT r4 missing #1 / next #4):
per bench row, the MXU / VPU / HBM term decomposition, the raw-MXU SoL %
printed beside the composite %, and the empirical cross-checks that pin
each model term to a measured control.

Usage: python scripts/achievable_audit.py [BENCH_rNN.json]
(default: the newest BENCH_r*.json in the repo root).
"""

import glob
import json
import pathlib
import sys

from quantizedmha_tpu.profiling.roofline import (
    _SOFTMAX_PASSES,
    attention_achievable,
    attention_flops,
    detect_chip,
    roofline,
    visible_pairs,
    vpu_eff_ops,
)

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main():
    if len(sys.argv) > 1:
        bench_path = pathlib.Path(sys.argv[1])
    else:
        bench_path = pathlib.Path(
            sorted(glob.glob(str(ROOT / "BENCH_r*.json")))[-1])
    bench = json.loads(bench_path.read_text())
    if "parsed" in bench:  # driver BENCH_rNN.json wrapper around the line
        bench = bench["parsed"]
    ex = bench["extra"]
    chip = detect_chip()

    rows = [
        # (label, extra key for ms, shape kwargs, dtype)
        ("headline n8k d32 h32", bench["value"],
         dict(batch=1, heads=32, q_len=8192, kv_len=8192, head_dim=32),
         "int8_bf16pv"),
        ("int8 n4k d64 h16", ex["int8_n4k_d64_ms"],
         dict(batch=1, heads=16, q_len=4096, kv_len=4096, head_dim=64),
         "int8_bf16pv"),
        ("bf16 n4k d64 h16", ex["bf16_n4k_d64_ms"],
         dict(batch=1, heads=16, q_len=4096, kv_len=4096, head_dim=64),
         "bf16"),
        ("int8 n4k d128 h8", ex["int8_n4k_d128_ms"],
         dict(batch=1, heads=8, q_len=4096, kv_len=4096, head_dim=128),
         "int8_bf16pv"),
    ]
    if "int8_n16k_d128_ms" in ex:
        rows.append(
            ("int8 n16k d128 h8 (long-N)", ex["int8_n16k_d128_ms"],
             dict(batch=1, heads=8, q_len=16384, kv_len=16384,
                  head_dim=128), "int8_bf16pv"))

    lines = [
        "# Achievable-floor audit (round 5)",
        "",
        f"Source: `{bench_path.name}`, chip model `{chip.name}` "
        f"({chip.int8_tops} int8 TOPS / {chip.bf16_tflops} bf16 TFLOPs / "
        f"{chip.hbm_gbps} GB/s, VPU eff {vpu_eff_ops(chip)/1e12:.2f} "
        "Tops/s for softmax passes).",
        "",
        "## The model",
        "",
        "`t_achievable = t_MXU + t_VPU + t_HBM` "
        "(profiling/roofline.attention_achievable):",
        "",
        "- `t_MXU = 2*pairs*d / (peak_int8 * min(d,128)/128)  +  "
        "2*pairs*d / peak_PV` — each matmul charged at its OWN peak "
        "(int8 QK, bf16 P*V in the shipped pipeline), with the "
        "contraction-depth tax `min(d,128)/128`: a d<128 contraction "
        "cannot fill the 128-deep MXU pipeline, which is a property of "
        "the SHAPE, not the kernel.",
        "- `t_VPU = passes * pairs / vpu_eff` — the per-score-element "
        "softmax pipeline. Pass counts per dtype: "
        f"`{_SOFTMAX_PASSES}`. The shipped int8 pipeline is 3 passes "
        "(dequant-fma, max, exp) because run21 moved P to bf16 (deleting "
        "round+cast) and run25 moved the l-sum onto the MXU as a fused "
        "ones-row.",
        "- `t_HBM = minimum traffic / bandwidth` — read Q,K,V, write O "
        "once (f32 at the solve() ABI).",
        "",
        "The three terms are SUMMED, not maxed: within one (q, kv) tile "
        "the dataflow is serial (QK -> softmax -> PV), so zero overlap "
        "is the per-tile critical path. Cross-TILE software pipelining "
        "can and does overlap them — which is why a good kernel can "
        "exceed 100% of this floor (see d=64 below). The floor is "
        "therefore conservative in the kernel's favor at d<=64 and the "
        "composite % is an efficiency score, NOT a physics bound.",
        "",
        "## Per-row decomposition",
        "",
        "| bench row | measured ms | t_MXU ms | t_VPU ms | t_HBM ms | "
        "t_ach ms | % achievable | raw MXU SoL % |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for label, ms, shape, dtype in rows:
        ach = attention_achievable(ms * 1e-3, dtype=dtype, chip=chip,
                                   **shape)
        rl = roofline(
            ms * 1e-3,
            attention_flops(shape["batch"], shape["heads"], shape["q_len"],
                            shape["kv_len"], shape["head_dim"]),
            0, dtype="int8" if dtype.startswith("int8") else dtype,
            chip=chip)
        lines.append(
            f"| {label} | {ms:.3f} | {ach.t_mxu_s*1e3:.3f} | "
            f"{ach.t_vpu_s*1e3:.3f} | {ach.t_hbm_s*1e3:.3f} | "
            f"{ach.t_achievable_s*1e3:.3f} | "
            f"{ach.pct_of_achievable:.1f} | {rl.pct_of_compute_sol:.1f} |")

    pairs_d128 = visible_pairs(1, 8, 4096, 4096)
    mxu_d128 = 2 * pairs_d128 * 128 / (chip.int8_tops * 1e12) \
        + 2 * pairs_d128 * 128 / (chip.bf16_tflops * 1e12)
    vpu_d128 = 3.0 * pairs_d128 / vpu_eff_ops(chip)
    lines += [
        "",
        "## Why the raw-MXU north star (>=70%) is not reachable at these "
        "shapes — with the arithmetic in the open",
        "",
        "Per visible score element the kernel does `4d` MXU MACs "
        "(2d QK + 2d PV) against ~3 VPU ops. At d=128 that is "
        f"t_MXU = {mxu_d128*1e3:.3f} ms vs t_VPU = {vpu_d128*1e3:.3f} ms "
        "for the n4k row: even with PERFECT overlap "
        "(t = max(MXU, VPU)), MXU utilization cannot exceed "
        f"{100*mxu_d128/max(mxu_d128, vpu_d128):.0f}% x the overlap "
        "efficiency; at d=32 (headline) the QK depth tax alone caps raw "
        "MXU at 25% before the VPU is even counted. 70% raw MXU SoL "
        "at these head dims would require beating the VPU's exp "
        "throughput with math that does not exist on this chip. The "
        "reference's own numbers agree: its README table tops out at "
        "~5% of A100-class tensor-core peak on the same shapes "
        "(/root/reference/README.md:9-19 — 7.70 ms for 68.7 GFLOP).",
        "",
        "## Cross-checks pinning each term to a measurement",
        "",
        "xprof cannot see INSIDE a Pallas kernel (one custom-call = one "
        "trace op), so the decomposition is pinned by kernel-ablation "
        "controls — same harness, same chip, one term changed at a time:",
        "",
        "- **t_HBM**: run36e/run43 DMA-only controls — the w4 kernel "
        "stripped to bare block DMA measures 41.6-43.0 us vs its 35.8 us "
        "bytes/bandwidth floor (profiles/raw_r5/run43_w4_scale_ladder.out)"
        " — the HBM term is real and the residual ~18% is grid/ramp "
        "overhead, consistent across tile schedules (tiled layout "
        "changed nothing, run43b).",
        "- **t_VPU (pass counting)**: run43's ladder prices ONE extra "
        "weight-shaped VPU pass at ~2.6 us on a 29.4 MB operand "
        "(fold_noraw removed one fnma pass: 57.9 -> 55.3 us); run21 "
        "deleted 2 passes (round+cast) for +7%; run25 moved the l-sum "
        "pass to the MXU for +4.4% — each matches the "
        "`passes * pairs / vpu_eff` term within chip variance.",
        "- **t_MXU (dtype rates)**: run21's int8-vs-bf16 P*V A/B and "
        "run36e's dot-vs-no-dot controls move time exactly by the "
        "charged matmul-rate difference.",
        "- **Timing methodology**: the two-point-fit harness numbers "
        "match xprof device-op sums in situ (run42: gate/up/down "
        "58.4/57.5/58.5 us traced vs 57.7-61.5 us micro-benched).",
        "- **The floor is beatable where overlap wins**: int8 n4k d64 "
        "measures >100% of achievable (cross-tile pipelining overlaps "
        "what the per-tile model serializes) — evidence the model does "
        "not smuggle slack.",
        "",
        "Regenerate: `python scripts/achievable_audit.py BENCH_rNN.json`.",
        "",
    ]
    out = "\n".join(lines)
    path = ROOT / "profiles" / "reports" / "achievable_audit.md"
    path.write_text(out)
    print(out)


if __name__ == "__main__":
    main()
