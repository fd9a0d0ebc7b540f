#!/usr/bin/env python
"""Run 15 — zero-copy reference-ABI layout for the headline kernel.

Run 7's headline xprof (profiles/reports/headline_trace_summary.md) shows
the Pallas custom-call at 5.91 ms of the 6.13 ms jit total: the remaining
~0.2-0.4 ms is the ABI wrapper — per-head split/transpose copy chains and
the int8 relayout around the kernel. The transposed-score kernel natively
consumes Q and V head-transposed ([1, h, d, N]), which is a FREE reshape
of the flat [N, d_model] matrices' transposes — so `solve(abi_fast=True)`
feeds it one whole-matrix transpose per operand, quantizes V directly in
that layout, and reshapes the kernel's transposed output straight back to
[N, d_model] (api.py). Output is bitwise the standard route's
(tests/test_api.py::test_abi_fast_bitwise_matches_standard).

This script measures the end-to-end headline A/B, interleaved in ONE
process (profiles/md/run3: chip-state variance across processes is
one-sided +8-30 %).

Run ONLY when no other chip job is live:
  python scripts/run15_abi_zero_copy.py
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.api import solve
from quantizedmha_tpu.configs import ReferenceWorkload
from quantizedmha_tpu.harness.timing import benchmark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=32)
    args = ap.parse_args()

    wl = ReferenceWorkload()
    N, d_model, h = wl.seq_len, wl.d_model, wl.num_heads
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (N, d_model)), jnp.float32)

    fast = jax.jit(lambda q, k, v: solve(
        q, k, v, d_model, h, kernel="fa_int8", abi_fast=True))
    std = jax.jit(lambda q, k, v: solve(
        q, k, v, d_model, h, kernel="fa_int8", abi_fast=False))

    same = bool(jnp.all(fast(q, k, v) == std(q, k, v)))
    if not same:
        raise SystemExit("abi_fast output is not bitwise-identical on chip")

    t_f1 = benchmark(fast, q, k, v, warmup=2, runs=args.runs)
    t_s1 = benchmark(std, q, k, v, warmup=2, runs=args.runs)
    t_f2 = benchmark(fast, q, k, v, warmup=0, runs=args.runs)
    t_s2 = benchmark(std, q, k, v, warmup=0, runs=args.runs)
    fast_ms = min(t_f1.median_ms, t_f2.median_ms)
    std_ms = min(t_s1.median_ms, t_s2.median_ms)

    print(json.dumps({
        "workload": {"N": N, "d_model": d_model, "heads": h,
                     "kernel": "fa_int8 (transposed orientation)"},
        "abi_fast_ms": round(fast_ms, 3),
        "standard_ms": round(std_ms, 3),
        "saved_ms": round(std_ms - fast_ms, 3),
        "bitwise_equal": True,
        "samples": {
            "fast": [round(t_f1.median_ms, 3), round(t_f2.median_ms, 3)],
            "std": [round(t_s1.median_ms, 3), round(t_s2.median_ms, 3)],
        },
    }))


if __name__ == "__main__":
    main()
