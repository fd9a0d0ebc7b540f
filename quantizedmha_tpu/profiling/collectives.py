"""Collective audit: count + size the XLA collectives in a compiled module.

The multi-chip story (TP/CP/ring in quantizedmha_tpu.parallel and
serving.sharded) makes claims like "2 all-reduces per layer" and "ring
attention rotates int8 payloads (~4x less ICI than f32)". On a single-chip
dev box those claims can't be timed — but they CAN be verified exactly, by
parsing the compiled HLO for collective ops and their operand shapes. This
is the single-chip analog of profiling an interconnect: the op count and
byte volume per step are compile-time facts.

Reference parity note: the CUDA reference has no communication at all
(SURVEY.md section 2.3); this tool audits the capability we added.
"""

from __future__ import annotations

import dataclasses
import re
from collections import Counter
from typing import Dict, Optional

_COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "u64": 8,
}

# e.g. "f32[4,128,64]{...} all-reduce(", "bf16[2048]{0} collective-permute("
# `(?:-start)?` admits the async form TPU compilation emits (each
# collective becomes a start/done pair); `-done` lines deliberately do
# NOT match — they name the same collective and would double-count.
_OP_ONLY_RE = re.compile(
    r"\s(" + "|".join(_COLLECTIVE_OPS) + r")(?:-start)?\(")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


@dataclasses.dataclass(frozen=True)
class CollectiveReport:
    counts: Dict[str, int]          # op kind -> #occurrences in the module
    bytes_by_kind: Dict[str, int]   # op kind -> total payload bytes
    total_bytes: int

    def __str__(self) -> str:
        if not self.counts:
            return "no collectives"
        parts = [
            f"{kind} x{self.counts[kind]} ({self.bytes_by_kind[kind] / 2**20:.2f} MiB)"
            for kind in sorted(self.counts)
        ]
        return ", ".join(parts) + f" | total {self.total_bytes / 2**20:.2f} MiB"


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def audit_hlo(hlo_text: str) -> CollectiveReport:
    """Count collectives and sum their result-payload bytes in HLO text.

    Counts are STATIC occurrences in the module: a collective inside a
    while/scan body appears once here but executes once per iteration
    (e.g. ring attention shows 2 collective-permutes — the K and V
    rotations — that each run n_devices-1 times per step)."""
    counts: Counter = Counter()
    bytes_by_kind: Counter = Counter()
    for line in hlo_text.splitlines():
        m = _OP_ONLY_RE.search(line)
        if not m:
            continue
        kind = m.group(1)
        counts[kind] += 1
        # Payload = the LARGEST shape left of the op name. Sync form has
        # only the result there; the async "-start" form has an
        # (operand, result, ...context) tuple whose largest element is the
        # gathered/permuted result (first-tuple-element parsing understated
        # all-gather by the group-size factor). Known bias: async
        # reduce-scatter-start reports its operand (on-wire) size where the
        # sync form reports the smaller result.
        shapes = _SHAPE_RE.findall(line[: m.start(1)])
        if shapes:
            bytes_by_kind[kind] += max(
                _shape_bytes(dt, dims) for dt, dims in shapes)
    return CollectiveReport(
        counts=dict(counts),
        bytes_by_kind=dict(bytes_by_kind),
        total_bytes=sum(bytes_by_kind.values()),
    )


def audit_fn(fn, *args, static_argnames=None, **kwargs) -> CollectiveReport:
    """Compile `fn(*args, **kwargs)` (jit if it isn't already) and audit the
    optimized HLO. Works on the virtual CPU mesh — the collectives XLA
    inserts there are the ones it inserts on a real TPU mesh."""
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(
        fn, static_argnames=static_argnames)
    lowered = jitted.lower(*args, **kwargs)
    compiled = lowered.compile()
    text = "\n".join(
        m.to_string() for m in compiled.runtime_executable().hlo_modules()
    ) if hasattr(compiled, "runtime_executable") else compiled.as_text()
    return audit_hlo(text)
