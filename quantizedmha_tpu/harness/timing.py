"""Benchmark timing core.

The reference's measured hot loop is `warmup x W; runs x R` around `solve()`
with a device sync per run (reference drivers/main.cu:130-147). On a
tunneled/async PJRT backend `block_until_ready` can return before execution
finishes, so this harness times a *batch* of K enqueued executions closed by
a host-side scalar fetch (the only reliable sync), and cancels the constant
tunnel/sync overhead with a two-point fit:

    t(K2) - t(K1) = (K2 - K1) * t_kernel

The device executes enqueued programs in order, so waiting on the last
output's scalar implies all K executions completed.
"""

from __future__ import annotations

import dataclasses
import statistics
import time
from typing import Callable, List

import numpy as np


def _sync(out) -> None:
    """Force completion: fetch one scalar of the first array leaf to host."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    leaf = leaves[0]
    # Index down to a scalar on device, then transfer it.
    idx = tuple(0 for _ in leaf.shape)
    np.asarray(leaf[idx] if idx else leaf)


@dataclasses.dataclass(frozen=True)
class Timing:
    times_s: List[float]  # per-run kernel time estimates

    @property
    def median_s(self) -> float:
        return statistics.median(self.times_s)

    @property
    def mean_s(self) -> float:
        return statistics.fmean(self.times_s)

    @property
    def min_s(self) -> float:
        return min(self.times_s)

    @property
    def median_ms(self) -> float:
        return self.median_s * 1e3

    def __str__(self) -> str:
        return (
            f"median {self.median_s * 1e3:.3f} ms  mean {self.mean_s * 1e3:.3f} ms  "
            f"min {self.min_s * 1e3:.3f} ms  ({len(self.times_s)} estimates)"
        )


def _timed_batch(fn: Callable, args, k: int) -> float:
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn(*args)
    _sync(out)
    return time.perf_counter() - t0


def benchmark(
    fn: Callable,
    *args,
    warmup: int = 2,
    runs: int = 16,
    repeats: int = 3,
) -> Timing:
    """Estimate per-execution latency of `fn(*args)`.

    warmup: executions before timing (includes compile).
    runs:   K2 of the two-point fit (K1 = max(1, runs // 4)).
    repeats: independent two-point estimates; the median is the headline.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    _sync(out)

    k1 = max(1, runs // 4)
    estimates = []
    for _ in range(repeats):
        t1 = _timed_batch(fn, args, k1)
        t2 = _timed_batch(fn, args, runs)
        estimates.append(max((t2 - t1) / (runs - k1), 1e-9))
    return Timing(estimates)
