#!/usr/bin/env python
"""run54 — w4 kernel: halves-packing A/B + k-outer grid probe.

Halves packing (round 5) moves the activation split out of XLA (free
static slices) — kernel-side cost should be identical to pairs (same op
count); this verifies on the real serving shapes. The k-outer probe
re-orders the grid to (k, n) with a full-width [R, N] f32 accumulator
scratch: the weight stream becomes contiguous row-bands (the (n, k)
production order jumps 14336-byte strides every 2 KB), a candidate for
the 41.6-vs-35.8us DMA-practice gap run43 measured.
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
from quantizedmha_tpu.ops.w4_matmul import w4_matmul  # noqa: E402
from quantizedmha_tpu.quant.weights import quantize_weight4  # noqa: E402

R = 8
GROUP = 128
CHAIN = 32


def _mk_kouter(K, N, bk2, bn):
    """fold_asis math, grid (k, n) with n minor + full-width accumulator."""
    K2 = K // 2
    GN = K // GROUP
    k_steps = K2 // bk2
    n_steps = N // bn
    gpb = (2 * bk2) // GROUP
    rpg = GROUP // 2

    def kernel(xe_ref, y_ref, packed_ref, scale_ref, out_ref, acc_ref):
        k = pl.program_id(0)
        n = pl.program_id(1)

        @pl.when(jnp.logical_and(k == 0, n == 0))
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        xe = xe_ref[...]
        y = y_ref[...]
        pf = packed_ref[...].astype(jnp.float32)
        hi_f = jnp.floor(pf * (1.0 / 16.0))
        lob_f = pf - 16.0 * hi_f
        s3 = scale_ref[pl.dslice(k * gpb, gpb), :][:, None, :]
        wlo = (lob_f.reshape(gpb, rpg, bn) * s3).reshape(
            bk2, bn).astype(jnp.bfloat16)
        whi = (hi_f.reshape(gpb, rpg, bn) * s3).reshape(
            bk2, bn).astype(jnp.bfloat16)
        acc = acc_ref[:, pl.dslice(n * bn, bn)]
        acc += jax.lax.dot_general(
            xe, wlo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            y, whi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:, pl.dslice(n * bn, bn)] = acc

        @pl.when(k == k_steps - 1)
        def _():
            out_ref[...] = acc_ref[:, pl.dslice(n * bn, bn)]

    def call(xe, y, packed, scale):
        return pl.pallas_call(
            kernel,
            grid=(k_steps, n_steps),
            in_specs=[
                pl.BlockSpec((R, bk2), lambda k, n: (0, k)),
                pl.BlockSpec((R, bk2), lambda k, n: (0, k)),
                pl.BlockSpec((bk2, bn), lambda k, n: (k, n)),
                pl.BlockSpec((GN, bn), lambda k, n: (0, n)),
            ],
            out_specs=pl.BlockSpec((R, bn), lambda k, n: (0, n)),
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((R, N), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(xe, y, packed, scale)

    return call


def main():
    rng = np.random.default_rng(0)
    results = {}

    def chained(op):
        def f(x0):
            def body(i, carry):
                x0, s = carry
                out = op(x0 * (1.0 + s))
                return x0, out.reshape(-1)[0].astype(jnp.float32) * 0.0
            return jax.lax.fori_loop(0, CHAIN, body,
                                     (x0, jnp.float32(0.0)))[1]
        return jax.jit(f)

    for sname, (K, N) in {"gateup": (4096, 28672), "down": (14336, 4096),
                          "qkv": (4096, 6144)}.items():
        w = jnp.asarray(rng.normal(0, 0.05, (K, N)), jnp.float32)
        x = jnp.asarray(rng.normal(0, 1, (R, K)), jnp.bfloat16)
        for packing in ("pairs", "halves"):
            qw = quantize_weight4(w, group=GROUP, packing=packing)
            op = functools.partial(w4_matmul, packed=qw.packed,
                                   scale=qw.scale, group=GROUP,
                                   packing=packing)
            try:
                t = benchmark(chained(op), x, warmup=2, runs=6, repeats=3)
                results[f"{sname}_{packing}"] = round(
                    t.median_ms / CHAIN * 1e3, 1)
            except Exception as e:  # noqa: BLE001
                results[f"{sname}_{packing}"] = f"FAIL: {str(e)[:120]}"
            print(json.dumps(
                {f"{sname}_{packing}": results[f"{sname}_{packing}"]}),
                flush=True)
        # k-outer probe (pairs layout, fold_asis math)
        qw = quantize_weight4(w, group=GROUP, packing="pairs")
        K2 = K // 2
        xr = x.reshape(R, K2, 2)
        xe, y = xr[:, :, 0], xr[:, :, 1]
        ko = _mk_kouter(K, N, 512, 2048)

        def op2(x0, xe=xe, y=y, qw=qw, ko=ko):
            return ko(x0, y, qw.packed, qw.scale)
        try:
            t = benchmark(chained(op2), xe, warmup=2, runs=6, repeats=3)
            results[f"{sname}_kouter"] = round(t.median_ms / CHAIN * 1e3, 1)
        except Exception as e:  # noqa: BLE001
            results[f"{sname}_kouter"] = f"FAIL: {str(e)[:120]}"
        print(json.dumps({f"{sname}_kouter": results[f"{sname}_kouter"]}),
              flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
