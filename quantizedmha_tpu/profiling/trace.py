"""xprof trace capture — the `ncu --export` workflow reborn.

The reference's profiling loop was: run `bin/profile_<kernel>` under
`ncu --set full --export`, then export to txt and diff with compare_ncu.py
(reference README.md:142-156). The TPU equivalent is an xprof trace captured
with `jax.profiler` around the same timed loop; traces open in
XProf/TensorBoard ("Trace Viewer" + "Framework Op Stats") and the JSON
summary written next to each trace feeds tools/compare_bench.py.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import pathlib
import time
from typing import Callable, Optional

import jax


@dataclasses.dataclass(frozen=True)
class TraceCapture:
    trace_dir: str
    wall_s: float
    iters: int
    files: list

    @property
    def per_iter_ms(self) -> float:
        return self.wall_s / self.iters * 1e3


def capture(
    fn: Callable,
    *args,
    trace_dir="profiles/traces/run",
    iters: int = 5,
    warmup: int = 2,
    host_tracer_level: int = 2,
) -> TraceCapture:
    """Run `fn(*args)` under an xprof trace.

    Compiles/warms first so the trace contains steady-state device work, not
    compilation (the reference likewise profiled after warmup,
    drivers/main.cu:130-147).
    """
    from quantizedmha_tpu.harness.timing import _sync

    trace_dir = str(trace_dir)
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    # Close with a host scalar fetch: on the tunneled backend
    # block_until_ready can return before execution finishes (CLAUDE.md),
    # which would both skew wall_s and end the profiler trace early.
    _sync(out)

    os.makedirs(trace_dir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
    wall = time.perf_counter() - t0

    files = sorted(
        os.path.relpath(p, trace_dir)
        for p in glob.glob(os.path.join(trace_dir, "**", "*"), recursive=True)
        if os.path.isfile(p)
    )
    cap = TraceCapture(trace_dir=trace_dir, wall_s=wall, iters=iters, files=files)
    summary = {
        "trace_dir": trace_dir,
        "iters": iters,
        "wall_s": wall,
        "per_iter_ms": cap.per_iter_ms,
        "files": files,
    }
    pathlib.Path(trace_dir, "capture_summary.json").write_text(
        json.dumps(summary, indent=2)
    )
    return cap


def annotate(name: str):
    """Named trace region (the `cudaProfilerStart/Stop` bracket analog,
    usable as decorator or context manager)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_profile(path: Optional[str] = None) -> bytes:
    """Snapshot the device memory profile (pprof format)."""
    prof = jax.profiler.device_memory_profile()
    if path:
        pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
        pathlib.Path(path).write_bytes(prof)
    return prof
