"""Roofline / speed-of-light reporting.

The reference's profiling story is Nsight Compute: per-kernel SM%, DRAM%,
bank conflicts, occupancy (reference profiles/md, tools/compare_ncu.py).
TPU has no NCU; the equivalent first-order analysis is a roofline against
the chip's MXU and HBM peaks — this module computes attention FLOPs/bytes
and the % of speed-of-light, the BASELINE.json ">=70% of MXU SoL" metric.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

# Peak specs by device kind. Values are per chip.
#   (bf16 TFLOP/s, int8 TOP/s, HBM GB/s)
_CHIP_SPECS = {
    "TPU v5 lite": (197.0, 394.0, 819.0),      # v5e
    "TPU v5e": (197.0, 394.0, 819.0),
    "TPU v5": (459.0, 918.0, 2765.0),          # v5p
    "TPU v5p": (459.0, 918.0, 2765.0),
    "TPU v4": (275.0, 275.0, 1228.0),
    "TPU v6 lite": (918.0, 1836.0, 1640.0),    # v6e (Trillium)
    "TPU v6e": (918.0, 1836.0, 1640.0),
}
_DEFAULT_SPEC = (197.0, 394.0, 819.0)


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    bf16_tflops: float
    int8_tops: float
    hbm_gbps: float

    def peak_for(self, dtype: str) -> float:
        if dtype in ("int8",):
            return self.int8_tops
        if dtype in ("bf16", "bfloat16", "fp16"):
            return self.bf16_tflops
        # fp32 on the MXU runs as multi-pass bf16 (~1/8 throughput on v5e).
        return self.bf16_tflops / 8.0


def detect_chip() -> ChipSpec:
    kind = jax.devices()[0].device_kind
    for key, spec in _CHIP_SPECS.items():
        if kind.startswith(key):
            return ChipSpec(kind, *spec)
    return ChipSpec(kind, *_DEFAULT_SPEC)


def visible_pairs(batch: int, heads: int, q_len: int, kv_len: int,
                  causal: bool = False, window=None, sinks: int = 0) -> float:
    """Number of VISIBLE (q, kv) score elements: full, causal
    (end-aligned), and causal sliding-window (+ attention sinks) masks.
    The common denominator of the FLOP count and the VPU-pass model."""
    import numpy as np

    if not causal:
        return batch * heads * float(q_len) * kv_len
    qpos = np.arange(q_len, dtype=np.int64) + (kv_len - q_len)  # end-aligned
    visible = np.minimum(qpos + 1, kv_len)
    if window is not None:
        # last `window` positions, plus any sink cols [0, sinks) that fall
        # strictly before the window start (qpos + 1 - window).
        in_win = np.minimum(qpos + 1, window) + np.clip(
            np.minimum(sinks, qpos + 1 - window), 0, None)
        visible = np.minimum(visible, in_win)
    return batch * heads * float(visible.sum())


def attention_flops(batch: int, heads: int, q_len: int, kv_len: int,
                    head_dim: int, causal: bool = False,
                    window=None, sinks: int = 0) -> float:
    """FLOPs of the two attention matmuls (QK^T and PV), 2*N*M*d each,
    counting only visible (q, kv) pairs."""
    per_pair = 2.0 * 2.0 * head_dim  # two matmuls, 2 FLOPs/MAC each
    return visible_pairs(batch, heads, q_len, kv_len, causal, window,
                         sinks) * per_pair


def attention_bytes(batch: int, heads: int, q_len: int, kv_len: int,
                    head_dim: int, bytes_per_el: int = 4, *,
                    q_bytes: Optional[int] = None,
                    kv_bytes: Optional[int] = None,
                    o_bytes: Optional[int] = None) -> float:
    """Minimum HBM traffic of fused attention: read Q,K,V + write O once.
    Per-tensor byte widths matter for mixed-precision kernels: fa_int8
    reads fp32 Q and writes fp32 O around its int8 K/V."""
    qb = q_bytes if q_bytes is not None else bytes_per_el
    kb = kv_bytes if kv_bytes is not None else bytes_per_el
    ob = o_bytes if o_bytes is not None else bytes_per_el
    return float(
        batch * heads * (q_len * qb + 2 * kv_len * kb + q_len * ob) * head_dim
    )


# -- composite achievable-time model (run9 productized) ----------------------
#
# "% of raw MXU SoL" is the honest *upper* bound but a shape-blind target:
# at head_dim <= 64 the QK contraction fills only d/128 of the MXU's
# contraction depth, and the online-softmax pipeline is a serial chain of
# full [block_kv x block_q] VPU sweeps whose cost is d-INDEPENDENT — so the
# reachable fraction of MXU SoL varies ~3x with shape alone
# (profiles/md/run9_mxu_gap/notes.md:71-89). This model computes the
# ACHIEVABLE kernel time for the shape and scores quality against that:
#
#   t_mxu  = qk_flops / (peak * min(d,128)/128)   # contraction-depth tax
#          + pv_flops / peak                       # PV contracts over the
#                                                  # kv block: full depth
#   t_vpu  = passes * visible_pairs / vpu_eff_ops  # serial softmax sweeps
#   t_hbm  = min traffic / HBM bw                  # streamed SERIALLY too
#   t_ach  = t_mxu + t_vpu + t_hbm                 # everything serializes
#                                                  # on this target
#
# The all-serial sum is measured, not assumed: run19's fresh decomposition
# (profiles/raw_r3/run19_decompose.out) shows softmax=skip ~= t_mxu + t_hbm
# (d=64: 0.343 predicted vs 0.342 measured) and baseline ~= the full sum
# (d=64: 0.846 vs 0.844; d=32: 5.94 vs 6.37; d=128: 0.51 vs 0.61) across
# three shapes — MXU, VPU and DMA time are additive (run9 fact 3, now
# substantiated at 3 shapes x 3 variants rather than 2 points).
#
# Constants (calibrated on v5e against run9's measured decomposition at the
# reference headline shape: softmax ~4 ms over 2.147e9 score elements =>
# ~3.2e12 effective VPU elementwise ops/s at ~6 passes/element for the
# int8 pipeline; cross-checked by run19):
_VPU_EFF_OPS = {  # effective elementwise ops/s of the serial softmax chain
    "TPU v5 lite": 3.2e12,
    "TPU v5e": 3.2e12,
    "TPU v5": 7.4e12,      # scaled by clock/core ratio vs v5e; uncalibrated
    "TPU v4": 3.1e12,      # uncalibrated
    "TPU v6 lite": 7.3e12,  # uncalibrated
    "TPU v6e": 7.3e12,
}
_DEFAULT_VPU_EFF_OPS = 3.2e12
# Serial VPU passes per score element by kernel PIPELINE (the algorithmic
# minimum — the floor; run19 measures EFFECTIVE passes 1-2 higher at
# small-element shapes, which is exactly the headroom pct_of_achievable
# tracks): "int8" = dequant-fma, max, exp(sub), sum, round, int8-cast
# (the standard d>=128 orientation); "int8_bf16pv" = the transposed
# d<=64 default pipeline — run21 deleted the round + cast (P rides the
# PV matmul as bf16) and run25 deleted the sum (l rides the PV matmul as
# a ones-row: dequant-fma, max, exp remain); bf16/f32 flash = scale,
# max, exp, sum.
_SOFTMAX_PASSES = {"int8": 6.0, "int4": 6.0, "int8_bf16pv": 3.0,
                   "bf16": 4.0, "fp32": 4.0,
                   "float32": 4.0, "bfloat16": 4.0}


def vpu_eff_ops(chip: "ChipSpec") -> float:
    for key, v in _VPU_EFF_OPS.items():
        if chip.name.startswith(key):
            return v
    return _DEFAULT_VPU_EFF_OPS


@dataclasses.dataclass(frozen=True)
class AchievableReport:
    t_measured_s: float
    t_achievable_s: float
    pct_of_achievable: float
    t_mxu_s: float      # matmul floor at this shape (contraction-depth tax)
    t_vpu_s: float      # serial softmax-pipeline floor
    t_hbm_s: float      # minimum-traffic floor (usually hidden)
    chip: str
    dtype: str

    def __str__(self) -> str:
        return (
            f"{self.t_measured_s * 1e3:.3f} ms = {self.pct_of_achievable:.1f}% of "
            f"achievable {self.t_achievable_s * 1e3:.3f} ms "
            f"(mxu {self.t_mxu_s * 1e3:.3f} + vpu {self.t_vpu_s * 1e3:.3f} | "
            f"hbm {self.t_hbm_s * 1e3:.3f}) [{self.dtype} on {self.chip}]"
        )


def attention_achievable(
    time_s: float,
    *,
    batch: int,
    heads: int,
    q_len: int,
    kv_len: int,
    head_dim: int,
    dtype: str = "int8",
    chip: Optional["ChipSpec"] = None,
    causal: bool = False,
    window=None,
    sinks: int = 0,
    passes: Optional[float] = None,
    io_bytes: Optional[float] = None,
) -> AchievableReport:
    """Score a measured fused-attention time against the composite
    achievable-time model above. `passes` overrides the per-dtype softmax
    pass count; `io_bytes` overrides the minimum-HBM-traffic estimate."""
    chip = chip or detect_chip()
    pairs = visible_pairs(batch, heads, q_len, kv_len, causal, window, sinks)
    peak = chip.peak_for("int8" if dtype.startswith("int8") else dtype) * 1e12
    # int8_bf16pv: QK runs int8 x int8, but P rides the PV matmul as bf16
    # (half rate) — the floor charges each matmul its own peak.
    pv_peak = (chip.bf16_tflops * 1e12 if dtype == "int8_bf16pv" else peak)
    qk_flops = pv_flops = 2.0 * pairs * head_dim
    qk_eff = min(head_dim, 128) / 128.0
    t_mxu = qk_flops / (peak * qk_eff) + pv_flops / pv_peak
    n_passes = passes if passes is not None else _SOFTMAX_PASSES.get(
        dtype, 4.0)
    t_vpu = n_passes * pairs / vpu_eff_ops(chip)
    if io_bytes is None:
        # fa_int8 reads fp32 Q/K/V and writes fp32 O (quantization is
        # in-kernel); the bf16 path moves 2-byte elements.
        el = 4 if dtype in ("int8", "int4", "int8_bf16pv", "fp32",
                            "float32") else 2
        io_bytes = attention_bytes(batch, heads, q_len, kv_len, head_dim, el)
    t_hbm = io_bytes / (chip.hbm_gbps * 1e9)
    t_ach = t_mxu + t_vpu + t_hbm
    return AchievableReport(
        t_measured_s=time_s,
        t_achievable_s=t_ach,
        pct_of_achievable=100.0 * t_ach / time_s if time_s else 0.0,
        t_mxu_s=t_mxu,
        t_vpu_s=t_vpu,
        t_hbm_s=t_hbm,
        chip=chip.name,
        dtype=dtype,
    )


@dataclasses.dataclass(frozen=True)
class RooflineReport:
    tflops_achieved: float
    pct_of_compute_sol: float
    pct_of_memory_sol: float
    compute_bound: bool
    chip: str
    dtype: str

    def __str__(self) -> str:
        bound = "compute" if self.compute_bound else "memory"
        return (
            f"{self.tflops_achieved:.1f} TFLOP/s = {self.pct_of_compute_sol:.1f}% of "
            f"{self.dtype} MXU SoL, {self.pct_of_memory_sol:.1f}% of HBM SoL "
            f"({bound}-bound) on {self.chip}"
        )


def roofline(
    time_s: float,
    flops: float,
    bytes_moved: float,
    dtype: str = "bf16",
    chip: Optional[ChipSpec] = None,
) -> RooflineReport:
    chip = chip or detect_chip()
    peak_tflops = chip.peak_for(dtype)
    achieved = flops / time_s / 1e12
    mem_sol_t = bytes_moved / (chip.hbm_gbps * 1e9)
    comp_sol_t = flops / (peak_tflops * 1e12)
    return RooflineReport(
        tflops_achieved=achieved,
        pct_of_compute_sol=100.0 * comp_sol_t / time_s,
        pct_of_memory_sol=100.0 * mem_sol_t / time_s,
        compute_bound=comp_sol_t > mem_sol_t,
        chip=chip.name,
        dtype=dtype,
    )
