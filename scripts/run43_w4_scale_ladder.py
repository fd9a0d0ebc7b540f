#!/usr/bin/env python
"""run43 — where do the w4 kernel's extra ~16us go, and what removes them?

run42's trace matched run40's micro numbers (gate/up ~58us in situ AND in
micro vs the 35.8us packed floor), so the gap is INSIDE the kernel, not a
serving-side anomaly. run36e's 41.3us "control" was a 1-VPU-pass
convert+dot; production does ~8 weight-shaped passes (convert, floor-mul,
fnma, 2 scale folds, 2 downcasts). run40 measured folded-scales vs
short-dots at only 2us apart -> the pass COUNT is the suspect, at ~2-3us
per weight-shaped pass at 512x2048 tiles.

Ladder (gate/up shape 4096x14336, R=8, group=128, bf16 activations):
  dma_512x2048   : DMA-only control at production tiles (true floor+grid)
  noscale        : convert+dot, 1 pass (run36e b_512x2048 re-baseline)
  fold_asis      : production folded math, kernel only (no caller bias)
  fold_noraw     : xe@(p*s) + (y-16*xe)@(hi*s) — drops the fnma pass (7)
  fold_bf16      : folds + downcasts done as bf16 muls (6 passes, 2 half-
                   rate) — NUMERICS CHANGE (scale rounds to bf16), measure
                   first, judge accuracy separately
  fold_1024x2048 : production math, 14 grid steps (2 MB packed tiles)
  fold_512x7168  : production math, 8 grid steps (3.5 MB packed tiles)
  prod           : the real ops.w4_matmul (incl. caller bias subtract)

All chained x32 through a data dependency (run36e pattern) and timed with
harness.timing.benchmark; medians are per-call.
"""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.harness.timing import benchmark  # noqa: E402
from quantizedmha_tpu.profiling.roofline import detect_chip  # noqa: E402
from quantizedmha_tpu.ops.w4_matmul import w4_matmul  # noqa: E402

K, N, R = 4096, 14336, 8
K2 = K // 2
GROUP = 128
GN = K // GROUP
CHAIN = 32


def _mk(kind, bk2, bn):
    k_steps = K2 // bk2
    gpb = (2 * bk2) // GROUP
    rows_per_group = GROUP // 2

    def kernel(xe_ref, y_ref, packed_ref, scale_ref, out_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        p = packed_ref[...]
        if kind == "dma":
            acc_ref[...] += p[:R, :].astype(jnp.float32)
        elif kind == "noscale":
            pf = p.astype(jnp.bfloat16)
            acc_ref[...] += jax.lax.dot_general(
                xe_ref[...], pf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            xe = xe_ref[...]
            y = y_ref[...]
            pf = p.astype(jnp.float32)
            s3 = scale_ref[pl.dslice(k * gpb, gpb), :][:, None, :]
            acc = acc_ref[...]
            if kind == "fold_asis":
                hi_f = jnp.floor(pf * (1.0 / 16.0))
                lob_f = pf - 16.0 * hi_f
                wlo = (lob_f.reshape(gpb, rows_per_group, bn) * s3).reshape(
                    bk2, bn).astype(jnp.bfloat16)
                whi = (hi_f.reshape(gpb, rows_per_group, bn) * s3).reshape(
                    bk2, bn).astype(jnp.bfloat16)
                acc += jax.lax.dot_general(
                    xe, wlo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc += jax.lax.dot_general(
                    y, whi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif kind == "fold_noraw":
                # y here carries y16 = y - 16*xe (precomputed outside):
                # out = xe@(p*s) + y16@(hi*s) — no fnma/lob pass.
                hi_f = jnp.floor(pf * (1.0 / 16.0))
                ps = (pf.reshape(gpb, rows_per_group, bn) * s3).reshape(
                    bk2, bn).astype(jnp.bfloat16)
                his = (hi_f.reshape(gpb, rows_per_group, bn) * s3).reshape(
                    bk2, bn).astype(jnp.bfloat16)
                acc += jax.lax.dot_general(
                    xe, ps, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc += jax.lax.dot_general(
                    y, his, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif kind == "fold_bf16":
                hi_f = jnp.floor(pf * (1.0 / 16.0))
                lob = (pf - 16.0 * hi_f).astype(jnp.bfloat16)
                hi = hi_f.astype(jnp.bfloat16)
                s3b = s3.astype(jnp.bfloat16)
                wlo = (lob.reshape(gpb, rows_per_group, bn) * s3b).reshape(
                    bk2, bn)
                whi = (hi.reshape(gpb, rows_per_group, bn) * s3b).reshape(
                    bk2, bn)
                acc += jax.lax.dot_general(
                    xe, wlo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc += jax.lax.dot_general(
                    y, whi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc_ref[...] = acc

        if kind in ("dma", "noscale"):
            @pl.when(k == k_steps - 1)
            def _():
                out_ref[...] = acc_ref[...]
        else:
            @pl.when(k == k_steps - 1)
            def _():
                out_ref[...] = acc_ref[...]

    def call(xe, y, packed, scale):
        return pl.pallas_call(
            kernel,
            grid=(N // bn, k_steps),
            in_specs=[
                pl.BlockSpec((R, bk2), lambda n, k: (0, k)),
                pl.BlockSpec((R, bk2), lambda n, k: (0, k)),
                pl.BlockSpec((bk2, bn), lambda n, k: (k, n)),
                pl.BlockSpec((GN, bn), lambda n, k: (0, n)),
            ],
            out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((R, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(xe, y, packed, scale)

    return call


def main():
    rng = np.random.default_rng(0)
    bw = detect_chip().hbm_gbps * 1e9
    xe = jnp.asarray(rng.normal(0, 1, (R, K2)), jnp.bfloat16)
    yy = jnp.asarray(rng.normal(0, 1, (R, K2)), jnp.bfloat16)
    y16 = (yy.astype(jnp.float32) - 16.0 * xe.astype(jnp.float32)).astype(
        jnp.bfloat16)
    packed = jnp.asarray(rng.integers(-120, 120, (K2, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.008, 0.02, (GN, N)), jnp.float32)
    x_full = jnp.asarray(rng.normal(0, 1, (R, K)), jnp.bfloat16)

    def chained(op, *extra):
        def f(x0):
            def body(i, carry):
                x0, s = carry
                out = op(x0 * (1.0 + s), *extra)
                return x0, out.reshape(-1)[0] * 0.0
            return jax.lax.fori_loop(0, CHAIN, body,
                                     (x0, jnp.float32(0.0)))[1]
        return jax.jit(f)

    cases = {
        "dma_512x2048": (_mk("dma", 512, 2048), (yy, packed, scale), xe),
        "noscale": (_mk("noscale", 512, 2048), (yy, packed, scale), xe),
        "fold_asis": (_mk("fold_asis", 512, 2048), (yy, packed, scale), xe),
        "fold_noraw": (_mk("fold_noraw", 512, 2048), (y16, packed, scale), xe),
        "fold_bf16": (_mk("fold_bf16", 512, 2048), (yy, packed, scale), xe),
        "fold_1024x2048": (_mk("fold_asis", 1024, 2048), (yy, packed, scale), xe),
        "fold_512x7168": (_mk("fold_asis", 512, 7168), (yy, packed, scale), xe),
        "prod": (
            functools.partial(w4_matmul, packed=packed, scale=scale,
                              group=GROUP),
            (), x_full),
    }
    results = {"floor_ms": round(K * N / 2 / bw * 1e3, 4)}
    for name, (op, extra, x0) in cases.items():
        try:
            t = benchmark(chained(op, *extra), x0, warmup=2, runs=6,
                          repeats=3)
            results[name] = round(t.median_ms / CHAIN, 4)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {str(e)[:140]}"
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
