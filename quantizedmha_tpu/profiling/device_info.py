"""Device info dump — tools/device_info.cu reborn.

The reference dumped occupancy-relevant GPU hardware limits (SM count, SMEM
per block, clocks, L2 size) to profiles/txt/device_info.txt
(tools/device_info.cu:6-36). The TPU equivalents that bound kernel design
are: device kind, core/chip count, HBM capacity + live usage, VMEM size,
and the roofline peaks (MXU bf16/int8 TFLOPs, HBM GB/s) used by
profiling.roofline.
"""

from __future__ import annotations

import json
import pathlib
from typing import Optional

import jax

from quantizedmha_tpu.profiling.roofline import detect_chip

# VMEM per core (the SMEM-per-SM analog: the budget that bounds Pallas
# block sizes). ~16 MiB on every generation this repo targets (v4-v6e), and
# what ops.flash_attention.pick_blocks tunes against — a per-generation
# table would be dead weight until a chip actually differs.
_DEFAULT_VMEM = 16 * 2**20


def device_info(device: Optional[jax.Device] = None) -> dict:
    """Hardware facts for the given (default: first) device."""
    dev = device or jax.devices()[0]
    info = {
        "platform": dev.platform,
        "device_kind": dev.device_kind,
        "id": dev.id,
        "process_index": dev.process_index,
        "num_devices": jax.device_count(),
        "num_local_devices": jax.local_device_count(),
        "coords": getattr(dev, "coords", None),
        "core_on_chip": getattr(dev, "core_on_chip", None),
    }
    try:
        stats = dev.memory_stats() or {}
    except Exception:  # noqa: BLE001 — backend may not implement memory_stats
        stats = {}
    if stats:
        info["hbm_bytes_limit"] = stats.get("bytes_limit")
        info["hbm_bytes_in_use"] = stats.get("bytes_in_use")
        info["hbm_peak_bytes_in_use"] = stats.get("peak_bytes_in_use")
    chip = detect_chip()
    info["vmem_bytes_per_core"] = _DEFAULT_VMEM
    info["peak_bf16_tflops"] = chip.bf16_tflops
    info["peak_int8_tops"] = chip.int8_tops
    info["peak_hbm_gbps"] = chip.hbm_gbps
    return info


def format_info(info: dict) -> str:
    lines = ["=== TPU device info (tools/device_info.cu analog) ==="]
    for key, val in info.items():
        if isinstance(val, int) and "bytes" in key:
            lines.append(f"{key:>26}: {val} ({val / 2**30:.2f} GiB)")
        else:
            lines.append(f"{key:>26}: {val}")
    return "\n".join(lines) + "\n"


def dump(path="profiles/txt/device_info.txt") -> pathlib.Path:
    """Write the dump where the reference kept it (profiles/txt/)."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    info = device_info()
    path.write_text(format_info(info))
    path.with_suffix(".json").write_text(json.dumps(info, indent=2, default=str))
    return path


if __name__ == "__main__":
    print(format_info(device_info()), end="")
    dump()
