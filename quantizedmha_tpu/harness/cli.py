"""Benchmark CLI — the reference's `bin/profile_<kernel>` reborn.

The reference built ONE binary PER kernel (`make KERNEEL=fa` → `bin/profile_fa`,
Makefile:39-53) with the problem shape baked in at compile time
(include/config.h:22-28) and runtime flags only for
`--kernel --warmup --runs --check --no-check --random` (drivers/main.cu:45-59).
Here kernel selection AND the problem shape are runtime flags on one program,
and the run has the same two phases as main.cu:38-157:

  1. check phase   — run `solve`, verify against the jnp golden reference
                     with tol = max(abs, rel*|ref|) (main.cu:73-104). Golden
                     outputs are cached in `.cache/` exactly like
                     main.cu:15-19/87-94. Default inputs are RANDOM (the
                     reference checked on constant 1.0 inputs, which SURVEY.md
                     §4.4 shows is blind to wrong attention weights;
                     `--constant` restores reference semantics).
  2. profile phase — warmup + timed runs (main.cu:130-147), reporting ms,
                     achieved TFLOP/s and % of MXU/HBM speed-of-light, with
                     optional xprof trace capture (`--trace DIR` replaces
                     `ncu --export`).

Results can be dumped as JSON (`--json FILE`) for `tools/compare_bench.py`,
the side-by-side diff tool replacing tools/compare_ncu.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
from typing import Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="qmha-bench",
        description="Verify + benchmark the attention kernel ladder.",
    )
    # Reference flags (main.cu:45-59).
    p.add_argument("--kernel", default="fa_int8",
                   help="kernel name or 'all' to sweep the ladder")
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--runs", type=int, default=16)
    p.add_argument("--repeats", type=int, default=3,
                   help="timing samples per batch size (robust median fit)")
    chk = p.add_mutually_exclusive_group()
    chk.add_argument("--check", dest="check", action="store_true", default=True)
    chk.add_argument("--no-check", dest="check", action="store_false")
    inp = p.add_mutually_exclusive_group()
    inp.add_argument("--random", dest="random", action="store_true", default=True,
                     help="random inputs for BOTH phases (default; fixes the "
                          "reference's constant-input verification blindness)")
    inp.add_argument("--constant", dest="random", action="store_false",
                     help="constant-1.0 check inputs (reference main.cu:76 parity)")
    # Problem shape — runtime here, compile-time in the reference (config.h).
    p.add_argument("--n", type=int, default=8192, help="sequence length N")
    p.add_argument("--d-model", type=int, default=1024)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--causal", action="store_true")
    p.add_argument("--window", type=int, default=None,
                   help="sliding-window size (requires --causal)")
    p.add_argument("--softcap", type=float, default=None,
                   help="Gemma-2-style logit soft-cap")
    p.add_argument("--sinks", type=int, default=0,
                   help="StreamingLLM attention sinks (requires --window)")
    p.add_argument("--rope", action="store_true",
                   help="apply RoPE to Q,K in kernel AND golden (the reference's "
                        "golden applied RoPE but its kernels did not, SURVEY §4.4)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--abs-tol", type=float, default=1e-3)
    p.add_argument("--rel-tol", type=float, default=1e-3)
    p.add_argument("--int8-tol", type=float, default=4e-2,
                   help="abs/rel tolerance used for int8 kernels (quantization "
                        "error budget; reference measured ~0.4%% deviation)")
    p.add_argument("--bf16-tol", type=float, default=8e-3,
                   help="abs/rel tolerance for bf16 kernels (bf16 has ~3 "
                        "decimal digits; the fp32 default tol would flag "
                        "plain rounding as a failure)")
    p.add_argument("--block-q", type=int, default=None)
    p.add_argument("--block-kv", type=int, default=None)
    p.add_argument("--cache-dir", default=".cache",
                   help="golden/input binary cache (main.cu:15-19 parity)")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture an xprof trace of the timed loop into DIR")
    p.add_argument("--json", dest="json_out", default=None, metavar="FILE",
                   help="write machine-readable results (for compare_bench.py)")
    p.add_argument("--interpret", action="store_true",
                   help="run Pallas kernels in interpreter mode (debugging)")
    return p


@dataclasses.dataclass
class KernelResult:
    kernel: str
    ms: Optional[float] = None
    tflops: Optional[float] = None
    pct_mxu_sol: Optional[float] = None
    pct_hbm_sol: Optional[float] = None
    check: Optional[dict] = None
    error: Optional[str] = None
    skipped: Optional[str] = None  # deliberate skip — not a failure


def _dtype_for(kernel: str) -> str:
    if "int8" in kernel:
        return "int8"
    if "bf16" in kernel:
        return "bf16"
    return "fp32"


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # Import lazily so `--help` stays instant even on a cold JAX install.
    import jax
    import jax.numpy as jnp

    from quantizedmha_tpu.api import KERNELS, solve
    from quantizedmha_tpu.harness.data import cached_inputs, cached_reference
    from quantizedmha_tpu.harness.timing import benchmark
    from quantizedmha_tpu.harness.verify import compare
    from quantizedmha_tpu.profiling.roofline import (
        attention_bytes,
        attention_flops,
        detect_chip,
        roofline,
    )

    if args.window is not None and not args.causal:
        print("error: --window requires --causal", file=sys.stderr)
        return 2
    if args.sinks and args.window is None:
        print("error: --sinks require --window", file=sys.stderr)
        return 2
    kernels = list(KERNELS) if args.kernel == "all" else [args.kernel]
    for k in kernels:
        if k not in KERNELS:
            print(f"error: unknown kernel {k!r}; choose from {KERNELS}", file=sys.stderr)
            return 2

    n, d_model, h = args.n, args.d_model, args.heads
    chip = detect_chip()
    print(f"device: {chip.name} | workload: N={n} d_model={d_model} h={h} "
          f"(d={d_model // h}) causal={args.causal} rope={args.rope}"
          + (f" window={args.window}" if args.window else "")
          + (f" softcap={args.softcap}" if args.softcap else "")
          + (f" sinks={args.sinks}" if args.sinks else ""))
    masked_kw = dict(window=args.window, logit_softcap=args.softcap,
                     attention_sinks=args.sinks)

    cache = pathlib.Path(args.cache_dir)
    data = cached_inputs(cache, n, d_model, seed=args.seed, random=args.random)
    q = jnp.asarray(data.q)
    k_ = jnp.asarray(data.k)
    v = jnp.asarray(data.v)

    golden = None
    if args.check:
        key = (f"N{n}_d{d_model}_h{h}_s{args.seed}"
               f"_{'rand' if args.random else 'const'}"
               f"{'_causal' if args.causal else ''}{'_rope' if args.rope else ''}"
               + (f"_w{args.window}" if args.window else "")
               + (f"_cap{args.softcap}" if args.softcap else "")
               + (f"_sink{args.sinks}" if args.sinks else ""))
        golden = cached_reference(
            cache, key, (n, d_model),
            lambda: np.asarray(
                solve(q, k_, v, d_model, h, kernel="reference",
                      causal=args.causal, use_rope=args.rope, **masked_kw)
            ),
        )

    results = []
    for kernel in kernels:
        res = KernelResult(kernel=kernel)
        results.append(res)
        if kernel == "unfused" and (args.window or args.softcap):
            res.skipped = "unfused kernel has no window/softcap support"
            print(f"[{kernel:>10}] skipped: {res.skipped}")
            continue
        fn = jax.jit(
            lambda q, k, v, kern=kernel: solve(
                q, k, v, d_model, h, kernel=kern, causal=args.causal,
                use_rope=args.rope, block_q=args.block_q, block_kv=args.block_kv,
                interpret=args.interpret or None, **masked_kw,
            )
        )
        try:
            out = fn(q, k_, v)
            out.block_until_ready()
        except Exception as e:  # noqa: BLE001 — surface per-kernel failures
            res.error = f"{type(e).__name__}: {e}"
            print(f"[{kernel:>10}] FAILED to compile/run: {res.error}")
            continue

        if args.check:
            tol = None
            if "int8" in kernel:
                tol = args.int8_tol
            elif "bf16" in kernel:
                tol = args.bf16_tol
            report = compare(
                np.asarray(out), golden,
                abs_tol=tol or args.abs_tol, rel_tol=tol or args.rel_tol,
            )
            res.check = dataclasses.asdict(report)
            print(f"[{kernel:>10}] check {report}")
            if not report.ok:
                continue  # don't publish timings for wrong kernels

        timing = benchmark(fn, q, k_, v, warmup=args.warmup, runs=args.runs,
                           repeats=args.repeats)
        if args.trace:
            tdir = pathlib.Path(args.trace) / kernel
            with jax.profiler.trace(str(tdir)):
                for _ in range(max(args.warmup, 1)):
                    out = fn(q, k_, v)
                out.block_until_ready()
            print(f"[{kernel:>10}] xprof trace -> {tdir}")

        flops = attention_flops(1, h, n, n, d_model // h, causal=args.causal,
                                window=args.window, sinks=args.sinks)
        # Mixed precision: fa_int8 reads fp32 Q and writes fp32 O around
        # its int8 K/V; charging 1 B everywhere understates traffic ~2.5x.
        dt = _dtype_for(kernel)
        if dt == "int8":
            byts = attention_bytes(1, h, n, n, d_model // h,
                                   q_bytes=4, kv_bytes=1, o_bytes=4)
        else:
            byts = attention_bytes(1, h, n, n, d_model // h,
                                   bytes_per_el={"bf16": 2}.get(dt, 4))
        rl = roofline(timing.median_s, flops, byts, dtype=_dtype_for(kernel), chip=chip)
        res.ms = timing.median_ms
        res.tflops = rl.tflops_achieved
        res.pct_mxu_sol = rl.pct_of_compute_sol
        res.pct_hbm_sol = rl.pct_of_memory_sol
        print(f"[{kernel:>10}] {timing.median_ms:8.3f} ms | {rl}")

    if args.json_out:
        payload = {
            "device": chip.name,
            "workload": {"n": n, "d_model": d_model, "heads": h,
                         "causal": args.causal, "rope": args.rope,
                         "window": args.window, "softcap": args.softcap,
                         "sinks": args.sinks,
                         "random": args.random, "seed": args.seed},
            "results": [dataclasses.asdict(r) for r in results],
        }
        pathlib.Path(args.json_out).write_text(json.dumps(payload, indent=2))
        print(f"wrote {args.json_out}")

    failed = [r for r in results
              if r.error or (r.check and not (r.check["n_mismatch"] == 0
                                              and r.check["n_nonfinite"] == 0))]
    return 1 if failed else 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    main()
