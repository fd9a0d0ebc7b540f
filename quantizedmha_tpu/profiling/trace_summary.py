"""xprof trace summarization — the NCU per-kernel table analog.

The reference's workflow exported NCU runs to text tables and diffed them
(tools/compare_ncu.py over profiles/txt). Here `jax.profiler` traces are
parsed straight from their `*.xplane.pb` protos (schema ships with the
baked-in TF wheel; no tensorboard server needed) into per-op time tables:
which XLA/Mosaic ops the device actually spent time in, sorted by total
duration — the first question every NCU session answered.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import List, Optional


@dataclasses.dataclass(frozen=True)
class OpStat:
    name: str
    count: int
    total_ms: float

    @property
    def avg_us(self) -> float:
        return self.total_ms * 1e3 / self.count if self.count else 0.0


@dataclasses.dataclass(frozen=True)
class TraceSummary:
    trace_dir: str
    plane: str  # which device plane was summarized
    total_ms: float
    ops: List[OpStat]  # sorted by total time, descending

    def to_markdown(self, top: int = 20) -> str:
        lines = [
            f"# Trace summary — `{self.plane}`",
            "",
            f"trace: `{self.trace_dir}` | total device-op time "
            f"{self.total_ms:.3f} ms",
            "",
            "| op | count | total ms | avg µs | % |",
            "|---|---|---|---|---|",
        ]
        for op in self.ops[:top]:
            pct = 100.0 * op.total_ms / self.total_ms if self.total_ms else 0.0
            lines.append(
                f"| `{op.name[:60]}` | {op.count} | {op.total_ms:.3f} | "
                f"{op.avg_us:.1f} | {pct:.1f} |"
            )
        return "\n".join(lines)


def _load_xplane_proto():
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415
        return xplane_pb2
    except Exception as e:  # noqa: BLE001 — optional dependency surface
        raise ImportError(
            "xplane proto unavailable (needs the TF wheel's "
            "tensorflow.tsl.profiler.protobuf.xplane_pb2); trace files can "
            f"still be opened in XProf/TensorBoard: {e}"
        ) from e


def summarize_trace(
    trace_dir: str,
    *,
    plane_filter: Optional[str] = None,
) -> TraceSummary:
    """Aggregate per-op device time from the newest xplane.pb under
    `trace_dir` (as written by profiling.trace.capture / jax.profiler.trace).

    plane_filter: substring to pick the device plane (default: prefer TPU,
    then GPU, then the busiest plane — on CPU-only runs that is the host).
    """
    xplane_pb2 = _load_xplane_proto()
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    def plane_score(plane) -> tuple:
        name = plane.name.lower()
        pref = 2 if "tpu" in name else 1 if "gpu" in name else 0
        events = sum(len(line.events) for line in plane.lines)
        return (pref, events)

    planes = list(xs.planes)
    if plane_filter:
        planes = [p for p in planes if plane_filter.lower() in p.name.lower()]
        if not planes:
            raise ValueError(f"no plane matching {plane_filter!r}")
    plane = max(planes, key=plane_score)

    meta = {m.id: m.name for m in plane.event_metadata.values()}
    # Aggregate ONE line: a plane carries nested views of the same device
    # time ("XLA Modules" events already contain their "XLA Ops" children),
    # so summing every line double-counts. Prefer the op-granular line,
    # falling back to the busiest.
    def line_score(line) -> tuple:
        return ("op" in line.name.lower(), len(line.events))

    lines = [ln for ln in plane.lines if ln.events]
    agg = {}
    if lines:
        best = max(lines, key=line_score)
        for ev in best.events:
            name = meta.get(ev.metadata_id, f"op#{ev.metadata_id}")
            cnt, tot = agg.get(name, (0, 0))
            agg[name] = (cnt + 1, tot + ev.duration_ps)
    ops = sorted(
        (OpStat(name=n, count=c, total_ms=ps / 1e9) for n, (c, ps) in agg.items()),
        key=lambda o: -o.total_ms,
    )
    return TraceSummary(
        trace_dir=trace_dir,
        plane=plane.name,
        total_ms=sum(o.total_ms for o in ops),
        ops=ops,
    )
