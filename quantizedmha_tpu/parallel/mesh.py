"""Device-mesh construction.

The reference has no multi-device layer at all — its only concurrency is two
CUDA streams round-robining heads on one GPU (reference include/config.h:19,
launchers.h:41-64). The TPU-native replacement is a jax.sharding.Mesh over
ICI with named axes; XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Sequence[int],
    axis_names: Sequence[str],
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh of the given logical shape over the available devices.

    Example: make_mesh((2, 4), ("dp", "tp")) on 8 chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(tuple(axis_sizes))
    return Mesh(arr, axis_names=tuple(axis_names))


def infer_dp_tp(n_devices: int, num_kv_heads: int) -> Tuple[int, int]:
    """Largest tp that divides both the device count and the KV head count
    (GQA co-location: each chip owns whole KV heads, boom guide sec 14)."""
    tp = 1
    for cand in range(min(n_devices, num_kv_heads), 0, -1):
        if n_devices % cand == 0 and num_kv_heads % cand == 0:
            tp = cand
            break
    return n_devices // tp, tp
