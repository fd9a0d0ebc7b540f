#!/usr/bin/env python
"""run36e — decompose the w4 kernel's 93us irreducible (run36d variant b)
on gate/up (4096x14336, R=8; packed floor 35.8us):

  h_dma_only      : full-tile DMA, compute touches 8 rows (pure stream)
  g_convert_sum   : convert i8->bf16 + tree-add to 8 rows (no dot)
  b_256x512       : convert + dot at production tiles (784 grid steps)
  b_512x1024      : same, 56 grid steps (grid-overhead probe)
  b_256x2048      : same, 196 steps, wide lanes
  b_512x2048      : same, 28 steps, 1 MB tiles
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

K, N, R = 4096, 14336, 8
K2 = K // 2
CHAIN = 32


def _mk(kind, bk2, bn):
    k_steps = K2 // bk2

    def kernel(xe_ref, packed_ref, out_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        p = packed_ref[...]
        if kind == "dma":
            acc_ref[...] += p[:R, :].astype(jnp.float32)
        elif kind == "convert":
            pf = p.astype(jnp.bfloat16)
            s = pf.reshape(bk2 // R, R, bn)
            tot = s[0]
            for i in range(1, bk2 // R):
                tot = tot + s[i]
            acc_ref[...] += tot.astype(jnp.float32)
        else:  # convert + dot
            pf = p.astype(jnp.bfloat16)
            acc_ref[...] += jax.lax.dot_general(
                xe_ref[...], pf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(k == k_steps - 1)
        def _():
            out_ref[...] = acc_ref[...]

    def call(xe, packed):
        return pl.pallas_call(
            kernel,
            grid=(N // bn, k_steps),
            in_specs=[
                pl.BlockSpec((R, bk2), lambda n, k: (0, k)),
                pl.BlockSpec((bk2, bn), lambda n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((R, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(xe, packed)

    return call


def main():
    rng = np.random.default_rng(0)
    bw = detect_chip().hbm_gbps * 1e9
    xe = jnp.asarray(rng.normal(0, 1, (R, K2)), jnp.bfloat16)
    packed = jnp.asarray(rng.integers(-120, 120, (K2, N)), jnp.int8)

    def chained(op):
        def f(x0):
            def body(i, carry):
                x0, s = carry
                out = op(x0 * (1.0 + s), packed)
                return x0, out.sum() * 0.0
            return jax.lax.fori_loop(0, CHAIN, body,
                                     (x0, jnp.float32(0.0)))[1]
        return jax.jit(f)

    cases = {
        "h_dma_only": _mk("dma", 256, 512),
        "g_convert_sum": _mk("convert", 256, 512),
        "b_256x512": _mk("dot", 256, 512),
        "b_512x1024": _mk("dot", 512, 1024),
        "b_256x2048": _mk("dot", 256, 2048),
        "b_512x2048": _mk("dot", 512, 2048),
    }
    results = {"floor_ms": round(K * N / 2 / bw * 1e3, 4)}
    for name, op in cases.items():
        try:
            t = benchmark(chained(op), xe, warmup=2, runs=6, repeats=3)
            results[name] = round(t.median_ms / CHAIN, 4)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {str(e)[:140]}"
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
