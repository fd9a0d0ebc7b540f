"""Multi-host scaffolding: process-group init + DCN-aware hybrid meshes.

The reference is a single-process, single-GPU repo — its only concurrency
is two CUDA streams (reference include/config.h:19, launchers.h:41-64) and
it has no communication backend at all (SURVEY.md section 2.3). The
TPU-native replacement for "a comm backend" is:

  * `jax.distributed.initialize` once per process (this module's
    `initialize_multihost`) — the PJRT/XLA equivalent of NCCL/MPI init:
    after it, `jax.devices()` spans every host's chips and XLA programs
    compile SPMD across all of them.
  * a HYBRID mesh whose leading axes map to DCN (the data-center network
    between hosts) and trailing axes to ICI (the chip-to-chip torus within
    a slice). Collectives over a trailing axis ride ICI (fast, ~100s of
    GB/s); collectives over a leading axis cross DCN (slow, ~10s of
    GB/s) — so parallelism strategies place DP/PP on DCN axes and TP/CP on
    ICI axes (the scaling-book recipe).

Single-host processes (including the virtual CPU mesh the tests run on)
get the same API: the "dcn" axes are then just the leading mesh dims, so
sharding/collective structure — which is what the audit verifies — is
identical to the multi-host layout.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> int:
    """Bring up the JAX process group (idempotent). Returns process_count.

    On TPU pods the runtime discovers everything from the metadata server,
    so all arguments may be None. On CPU/GPU clusters pass them explicitly
    or via env (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID).
    A plain single-process run (no coordinator anywhere) is a no-op —
    the same code path then works on one host without ceremony.
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return jax.process_count()
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None)
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None)
    if coordinator_address is None and num_processes in (None, 1):
        # Single process, nothing to coordinate.
        _initialized = True
        return 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return jax.process_count()


def hybrid_mesh(
    dcn_sizes: Sequence[int],
    ici_sizes: Sequence[int],
    dcn_names: Sequence[str],
    ici_names: Sequence[str],
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh whose leading axes span hosts (DCN) and trailing axes span the
    chips within a host/slice (ICI).

    Example: hybrid_mesh((2,), (4,), ("dp",), ("tp",)) on 2 hosts x 4 chips
    -> Mesh("dp", "tp") where the "tp" collectives never leave a host.

    Multi-process: delegates to mesh_utils.create_hybrid_device_mesh, which
    orders devices so each ICI sub-mesh is one process's chips. Single
    process: the leading axes are still the slow-axis CONVENTION (the
    sharding and collective structure is identical), built by reshape.
    """
    if len(dcn_sizes) != len(dcn_names) or len(ici_sizes) != len(ici_names):
        raise ValueError("axis sizes and names must pair up")
    names = tuple(dcn_names) + tuple(ici_names)
    shape = tuple(dcn_sizes) + tuple(ici_sizes)
    n = int(np.prod(shape))
    if devices is None and jax.process_count() > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=tuple(ici_sizes),
            dcn_mesh_shape=tuple(dcn_sizes) + (1,) * (len(ici_sizes) - len(dcn_sizes))
            if len(dcn_sizes) < len(ici_sizes) else tuple(dcn_sizes),
        )
        return Mesh(arr.reshape(shape), axis_names=names)
    devices = list(devices if devices is not None else jax.devices())
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names=names)


# ---------------------------------------------------------------------------
# DCN-aware collective audit.
# ---------------------------------------------------------------------------

# -start lines carry the replica groups; -done lines reference the same
# op and MUST NOT count again (async collectives — the normal TPU form —
# compile to a start/done pair per collective), so `-done` is NOT in the
# optional suffix: "all-reduce-done(" cannot match "all-reduce(?:-start)?\(".
_OP_RE = re.compile(
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(")
_LITERAL_GROUPS_RE = re.compile(
    r"replica_groups=\{(\{[^}]*\}(?:,\{[^}]*\})*)?\}")
# iota v2 syntax: replica_groups=[num_groups,group_size]<=[shape]T(perm)?
_IOTA_GROUPS_RE = re.compile(
    r"replica_groups=\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?")
_PAIRS_RE = re.compile(
    r"source_target_pairs=\{(\{[^}]*\}(?:,\{[^}]*\})*)\}")


def _groups_cross(groups, granule_size: int) -> bool:
    for ids in groups:
        if len({i // granule_size for i in ids}) > 1:
            return True
    return False


def _iota_groups(m) -> list:
    num_groups, group_size = int(m.group(1)), int(m.group(2))
    shape = [int(x) for x in m.group(3).split(",")]
    order = np.arange(int(np.prod(shape))).reshape(shape)
    if m.group(4):
        perm = [int(x) for x in m.group(4).split(",")]
        order = order.transpose(perm)
    flat = order.reshape(-1)
    return [list(flat[g * group_size:(g + 1) * group_size])
            for g in range(num_groups)]


def _iter_collectives(hlo_text: str, granule_size: int):
    """Yield (kind, crosses_granule, line) for every collective op line.
    Classification rules: see classify_collectives."""
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        kind = m.group(1)
        groups = None
        lit = _LITERAL_GROUPS_RE.search(line)
        iota = _IOTA_GROUPS_RE.search(line)
        pairs = _PAIRS_RE.search(line)
        if iota:
            groups = _iota_groups(iota)
        elif lit is not None and lit.group(1):
            groups = [
                [int(x) for x in grp.split(",") if x.strip()]
                for grp in re.findall(r"\{([^}]*)\}", lit.group(1))
            ]
        elif pairs is not None:
            groups = [
                [int(x) for x in grp.split(",") if x.strip()]
                for grp in re.findall(r"\{([^}]*)\}", pairs.group(1))
            ]
        if groups is None:
            crosses = True  # empty/unknown groups = all devices; conservative
        else:
            crosses = _groups_cross(groups, granule_size)
        yield kind, crosses, line


def classify_collectives(hlo_text: str, granule_size: int) -> Dict[str, Dict[str, int]]:
    """Split the module's collectives into ICI vs DCN traffic classes.

    granule_size: #devices per ICI domain (= chips per host in a hybrid
    mesh). A collective whose replica group (or permute pair) stays within
    one granule (all ids share id // granule_size) rides ICI; one that
    crosses granules pays DCN. Handles literal `{{0,1},{2,3}}` groups, the
    iota v2 `[g,s]<=[shape]T(perm)` form, permute source_target_pairs, and
    empty groups (= all devices, classed DCN when devices span granules).
    Returns {"ici": {kind: n}, "dcn": {kind: n}}.
    """
    out = {"ici": {}, "dcn": {}}
    for kind, crosses, _ in _iter_collectives(hlo_text, granule_size):
        bucket = out["dcn" if crosses else "ici"]
        bucket[kind] = bucket.get(kind, 0) + 1
    return out


# Result-shape tokens on a collective line, e.g. `%ar = bf16[4096,1024]
# all-reduce-start(...)`. Tuple results list each member shape.
_SHAPE_RE = re.compile(
    r"\b(pred|f64|f32|bf16|f16|f8e4m3fn|f8e5m2|s64|s32|s16|s8|u64|u32|u16|u8)"
    r"\[([\d,]*)\]")
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4,
    "f64": 8, "s64": 8, "u64": 8,
}


def _line_result_bytes(line: str) -> int:
    """Bytes of the op's RESULT shape(s): the `ty[dims]` tokens between '='
    and the opcode (async start ops tuple the operand/result buffers —
    counting the whole tuple double-counts, so take the LARGEST member:
    the payload; for plain ops it is the single result)."""
    eq = line.find("=")
    op = _OP_RE.search(line)
    if op is None:
        return 0
    seg = line[eq + 1:op.start()] if eq >= 0 else line[:op.start()]
    best = 0
    for dt, dims in _SHAPE_RE.findall(seg):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        best = max(best, n * _DTYPE_BYTES[dt])
    return best


def collective_bytes(hlo_text: str, granule_size: int) -> Dict[str, int]:
    """Sum the RESULT bytes of every collective, split ICI vs DCN (same
    classification as classify_collectives). The result size is the
    first-order wire traffic of all-reduce/all-gather/permute on a ring —
    good enough to model the DCN cost of a step, which is what the
    1->N-host scaling-efficiency model consumes."""
    out = {"ici": 0, "dcn": 0}
    for kind, crosses, line in _iter_collectives(hlo_text, granule_size):
        out["dcn" if crosses else "ici"] += _line_result_bytes(line)
    return out


def audit_bytes_by_axis(fn, *args, granule_size: int, **kwargs) -> Dict[str, int]:
    """collective_bytes of fn's compiled HLO (audit_fn_by_axis's byte
    twin)."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = jitted.lower(*args, **kwargs).compile()
    text = "\n".join(
        m.to_string() for m in compiled.runtime_executable().hlo_modules()
    ) if hasattr(compiled, "runtime_executable") else compiled.as_text()
    return collective_bytes(text, granule_size)


def model_scaling_efficiency(step_time_s: float, dcn_bytes_per_step: float,
                             *, dcn_gbps: float = 25.0,
                             latency_s: float = 10e-6) -> float:
    """Modeled 1 -> N host THROUGHPUT scaling efficiency for a step whose
    per-host work is constant (DP over the DCN axis: each host keeps its
    own batch shard / engine replica): the N-host step pays the audited
    per-step DCN traffic at `dcn_gbps` (+ one launch latency when any DCN
    collective exists) on top of the single-host step time.

        efficiency = N * tput_1 / (N * tput_N') = t_1 / (t_1 + t_dcn)

    With ZERO audited DCN bytes (serving decode: TP activations psum on
    ICI, no cross-host collective per token) the model returns exactly
    1.0 — the scaling-book ideal for DP-on-DCN serving. dcn_gbps default
    is a conservative per-host DCN figure (scaling-book's 'tens of
    GB/s')."""
    if dcn_bytes_per_step <= 0:
        return 1.0
    t_dcn = dcn_bytes_per_step / (dcn_gbps * 1e9) + latency_s
    return step_time_s / (step_time_s + t_dcn)


def audit_fn_by_axis(fn, *args, granule_size: int, **kwargs) -> Dict[str, Dict[str, int]]:
    """Compile fn and classify its collectives as ICI vs DCN (see
    classify_collectives). Works on the virtual CPU mesh — XLA inserts the
    same collectives there as on real hardware."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    compiled = jitted.lower(*args, **kwargs).compile()
    text = "\n".join(
        m.to_string() for m in compiled.runtime_executable().hlo_modules()
    ) if hasattr(compiled, "runtime_executable") else compiled.as_text()
    return classify_collectives(text, granule_size)
