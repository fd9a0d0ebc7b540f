"""Profiling suite (the reference's NCU workflow, tools/ and profiles/ reborn).

- `roofline`:    achieved TFLOP/s vs MXU/HBM speed-of-light (NCU SoL% analog).
- `trace`:       xprof capture around the timed loop (`ncu --export` analog).
- `device_info`: hardware-limits dump (tools/device_info.cu analog).
- `compare`:     markdown diff of two bench reports (tools/compare_ncu.py analog).
"""

from quantizedmha_tpu.profiling.compare import compare_files, compare_reports
from quantizedmha_tpu.profiling.device_info import (
    device_info as get_device_info,
    dump as dump_device_info,
)
from quantizedmha_tpu.profiling import device_info  # noqa: F401 — keep submodule name
from quantizedmha_tpu.profiling.roofline import (
    ChipSpec,
    RooflineReport,
    attention_bytes,
    attention_flops,
    detect_chip,
    roofline,
)
from quantizedmha_tpu.profiling.memory import MemoryBudget, memory_budget
from quantizedmha_tpu.profiling.trace import TraceCapture, annotate, capture
from quantizedmha_tpu.profiling.trace_summary import OpStat, TraceSummary, summarize_trace

__all__ = [
    "compare_files",
    "compare_reports",
    "get_device_info",
    "dump_device_info",
    "ChipSpec",
    "RooflineReport",
    "attention_bytes",
    "attention_flops",
    "detect_chip",
    "roofline",
    "TraceCapture",
    "annotate",
    "capture",
    "MemoryBudget",
    "memory_budget",
    "OpStat",
    "TraceSummary",
    "summarize_trace",
]
