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


def attention_flops(batch: int, heads: int, q_len: int, kv_len: int,
                    head_dim: int, causal: bool = False,
                    window=None, sinks: int = 0) -> float:
    """FLOPs of the two attention matmuls (QK^T and PV), 2*N*M*d each,
    counting only VISIBLE (q, kv) pairs: full, causal (end-aligned), and
    causal sliding-window (+ attention sinks) masks."""
    import numpy as np

    per_pair = 2.0 * 2.0 * head_dim  # two matmuls, 2 FLOPs/MAC each
    if not causal:
        return batch * heads * float(q_len) * kv_len * per_pair
    qpos = np.arange(q_len, dtype=np.int64) + (kv_len - q_len)  # end-aligned
    visible = np.minimum(qpos + 1, kv_len)
    if window is not None:
        # last `window` positions, plus any sink cols [0, sinks) that fall
        # strictly before the window start (qpos + 1 - window).
        in_win = np.minimum(qpos + 1, window) + np.clip(
            np.minimum(sinks, qpos + 1 - window), 0, None)
        visible = np.minimum(visible, in_win)
    return batch * heads * float(visible.sum()) * per_pair


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
