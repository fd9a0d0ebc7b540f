"""Benchmark timing core.

The reference's measured hot loop is `warmup x W; runs x R` around `solve()`
with a device sync per run (reference drivers/main.cu:130-147). On a
tunneled/async PJRT backend `block_until_ready` can return before execution
finishes, so this harness times *batches* of K enqueued executions closed by
a host-side scalar fetch (the only reliable sync), and cancels the constant
tunnel/sync overhead with a robust two-point fit:

    t_kernel = (median t(K2) - median t(K1)) / (K2 - K1)

The device executes enqueued programs in order, so waiting on the last
output's scalar implies all K executions completed. Medians are taken per
batch size before differencing because tunnel jitter is spiky and one-sided.
"""

from __future__ import annotations

import dataclasses
import statistics
import time
import warnings
from typing import Callable, List

import numpy as np


def _sync(out) -> None:
    """Force completion: fetch one scalar of the first array leaf to host."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    leaf = leaves[0]
    idx = tuple(0 for _ in leaf.shape)
    np.asarray(leaf[idx] if idx else leaf)


@dataclasses.dataclass(frozen=True)
class Timing:
    estimate_s: float       # robust per-run estimate (the headline)
    pair_estimates_s: List[float]  # raw per-pair estimates (spread diagnostic)
    best_s: float = 0.0     # min-batch fit (see best_ms)

    @property
    def median_s(self) -> float:
        return self.estimate_s

    @property
    def median_ms(self) -> float:
        return self.estimate_s * 1e3

    @property
    def best_ms(self) -> float:
        """(min t(K2) - min t(K1)) / (K2 - K1): both mins are robust to the
        tunnel's one-sided positive spikes. NOT the min over per-pair
        estimates — a spike landing in a pair's small-K batch deflates that
        pair's estimate, and min-over-pairs would select exactly those
        deflated pairs, publishing a number faster than the kernel."""
        if self.best_s > 0.0:
            return self.best_s * 1e3
        return self.estimate_s * 1e3

    @property
    def spread(self) -> float:
        """Relative spread of the raw pair estimates (noise indicator)."""
        if len(self.pair_estimates_s) < 2:
            return 0.0
        lo, hi = min(self.pair_estimates_s), max(self.pair_estimates_s)
        return (hi - lo) / self.estimate_s if self.estimate_s else 0.0

    def __str__(self) -> str:
        return (
            f"{self.estimate_s * 1e3:.3f} ms "
            f"(pairs: {', '.join(f'{t * 1e3:.3f}' for t in self.pair_estimates_s)})"
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
    min_signal_s: float = 0.15,
) -> Timing:
    """Estimate per-execution latency of `fn(*args)`.

    warmup: executions before timing (includes compile).
    runs:   K2 of the two-point fit (K1 = max(1, runs // 4)).
    repeats: batch-time samples per K; medians are differenced.
    min_signal_s: floor on the (K2-K1) * per-run compute inside each fit.
      The tunnel's per-sync overhead is ~40 ms AND spiky; a fit whose
      signal is comparable to that jitter can collapse to ~0 (measured:
      a 0.9 ms kernel reported 0.016 ms at runs=24). After warmup a rough
      per-call estimate scales `runs` up (capped at 512) until the fit
      carries at least this much real work.
    """
    if runs < 2:
        raise ValueError(f"runs must be >= 2 for the two-point fit, got {runs}")
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    _sync(out)

    if min_signal_s > 0:
        # Difference two sizing batches so the constant sync overhead
        # cancels (using a single batch's mean would fold ~5 ms/call of
        # overhead into the estimate and undersize `runs`).
        t8 = _timed_batch(fn, args, 8)
        t24 = _timed_batch(fn, args, 24)
        est0 = max((t24 - t8) / 16, t24 / 24 / 4, 1e-7)
        need = int(min_signal_s / est0) + 1
        runs = max(runs, min(need + max(1, need // 4), 512))
    k1 = max(1, runs // 4)
    t1s, t2s = [], []
    # A tunnel spike landing in a small-K batch can push median t(K1) above
    # median t(K2), collapsing the fit to the clamp floor and reporting a
    # nonsense ~0 latency. Resample (up to 2 extra rounds of batches) until
    # the difference is positive rather than silently clamping.
    for _attempt in range(3):
        for _ in range(repeats):
            t1s.append(_timed_batch(fn, args, k1))
            t2s.append(_timed_batch(fn, args, runs))
        raw = (statistics.median(t2s) - statistics.median(t1s)) / (runs - k1)
        if raw > 0:
            break
    else:
        warnings.warn(
            "benchmark: two-point fit non-positive after 3 resample rounds "
            "(tunnel noise swamped the measurement); reporting the clamp "
            "floor — treat this Timing as unreliable.",
            RuntimeWarning,
            stacklevel=2,
        )
    est = max(raw, 1e-9)
    pairs = [max((t2 - t1) / (runs - k1), 1e-9) for t1, t2 in zip(t1s, t2s)]
    best = max((min(t2s) - min(t1s)) / (runs - k1), 1e-9)
    return Timing(est, pairs, best)
