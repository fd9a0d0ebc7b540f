#!/usr/bin/env python
"""run36d — w4 kernel bottleneck ladder on the gate/up shape (4096x14336,
R=8). Variants isolate the cost structure of the fused dequant-matmul:

  a. production v2b (float unpack, 8 small dots, activation-shaped scales)
  b. CONTROL convert+dot only (xe@convert(p) — wrong numerics): the
     irreducible convert + dot + DMA pipeline at packed byte volume
  c. CONTROL dot only (pre-converted bf16 half-plane resident? NOT
     possible at matched bytes — skipped)
  d. native-s4 bitcast unpack: p -> bitcast int4 [bk2, bn, 2] -> convert
     -> ONE dot contracting (k, pair) — hardware nibble unpack, exact
     (plain two's-complement packing for this variant)
  e. single dot per plane over the whole bk2 with scales folded
     weight-shaped (1 extra op/byte, 6 fewer dots/step)

Each variant chained 32x in-jit (dispatch amortization, run36 lesson).
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
from quantizedmha_tpu.profiling.roofline import detect_chip  # noqa: E402

K, N, R, GROUP = 4096, 14336, 8, 128
BK2, BN = 256, 512
K2 = K // 2
GPB = 2 * BK2 // GROUP
CHAIN = 32


def _kernel_b(xe_ref, packed_ref, out_ref, acc_ref, *, k_steps):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pf = packed_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        xe_ref[...], pf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == k_steps - 1)
    def _():
        out_ref[...] = acc_ref[...]


def variant_b(xe, packed):
    k_steps = K2 // BK2
    return pl.pallas_call(
        functools.partial(_kernel_b, k_steps=k_steps),
        grid=(N // BN, k_steps),
        in_specs=[
            pl.BlockSpec((R, BK2), lambda n, k: (0, k)),
            pl.BlockSpec((BK2, BN), lambda n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((R, BN), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xe, packed)


def _kernel_d(x2_ref, packed_ref, scale_ref, out_ref, acc_ref, *, k_steps):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p4 = jax.lax.bitcast_convert_type(packed_ref[...], jnp.int4)
    w = p4.astype(jnp.bfloat16)             # [BK2, BN, 2]
    x2 = x2_ref[...].reshape(R, BK2, 2)     # pairs on the minor dim
    acc = acc_ref[...]
    half = GROUP // 2
    for g in range(GPB):
        sl = slice(g * half, (g + 1) * half)
        partial = jax.lax.dot_general(
            x2[:, sl], w[sl], (((1, 2), (0, 2)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += partial * scale_ref[pl.dslice(k * GPB + g, 1), :]
    acc_ref[...] = acc

    @pl.when(k == k_steps - 1)
    def _():
        out_ref[...] = acc_ref[...]


def variant_d(x, packed, scale):
    k_steps = K2 // BK2
    gn = K // GROUP
    return pl.pallas_call(
        functools.partial(_kernel_d, k_steps=k_steps),
        grid=(N // BN, k_steps),
        in_specs=[
            pl.BlockSpec((R, 2 * BK2), lambda n, k: (0, k)),
            pl.BlockSpec((BK2, BN), lambda n, k: (k, n)),
            pl.BlockSpec((gn, BN), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((R, BN), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, packed, scale)


def _kernel_e(xe_ref, y_ref, packed_ref, scale_ref, out_ref, acc_ref, *,
              k_steps):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pf = packed_ref[...].astype(jnp.bfloat16)
    hi = jnp.floor(pf * jnp.bfloat16(1.0 / 16.0))
    lob = pf - jnp.bfloat16(16.0) * hi
    # fold scales weight-shaped: one extra mult per plane, 2 dots total
    half = GROUP // 2
    sw_rows = []
    for g in range(GPB):
        row = scale_ref[pl.dslice(k * GPB + g, 1), :]
        sw_rows.append(jnp.broadcast_to(row, (half, BN)))
    sw = jnp.concatenate(sw_rows, axis=0).astype(jnp.bfloat16)  # [BK2, BN]
    acc_ref[...] += jax.lax.dot_general(
        xe_ref[...], lob * sw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        y_ref[...], hi * sw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == k_steps - 1)
    def _():
        out_ref[...] = acc_ref[...]


def variant_e(xe, y, packed, scale):
    k_steps = K2 // BK2
    gn = K // GROUP
    return pl.pallas_call(
        functools.partial(_kernel_e, k_steps=k_steps),
        grid=(N // BN, k_steps),
        in_specs=[
            pl.BlockSpec((R, BK2), lambda n, k: (0, k)),
            pl.BlockSpec((R, BK2), lambda n, k: (0, k)),
            pl.BlockSpec((BK2, BN), lambda n, k: (k, n)),
            pl.BlockSpec((gn, BN), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((R, BN), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(xe, y, packed, scale)


def main():
    rng = np.random.default_rng(0)
    bw = detect_chip().hbm_gbps * 1e9
    floor_ms = (K * N / 2) / bw * 1e3
    x = jnp.asarray(rng.normal(0, 1, (R, K)), jnp.bfloat16)
    xr = x.reshape(R, K2, 2)
    xe, y = xr[:, :, 0], xr[:, :, 1]
    packed = jnp.asarray(rng.integers(-120, 120, (K2, N)), jnp.int8)
    scale = jnp.asarray(rng.uniform(1e-4, 3e-4, (K // GROUP, N)),
                        jnp.float32)

    def chained(op):
        def f(x0):
            def body(i, carry):
                x0, s = carry
                out = op(x0 * (1.0 + s))
                return x0, out.astype(jnp.float32).sum() * 0.0
            return jax.lax.fori_loop(0, CHAIN, body, (x0, jnp.float32(0.0)))[1]
        return jax.jit(f)

    variants = {
        "a_production": chained(
            lambda xx: w4_matmul(xx, packed, scale, group=GROUP)),
        "b_convert_dot_only": chained(lambda xx: variant_b(
            xx.reshape(R, K2, 2)[:, :, 0], packed)),
        "d_s4_bitcast": chained(lambda xx: variant_d(xx, packed, scale)),
        "e_single_dot_wscale": chained(lambda xx: variant_e(
            xx.reshape(R, K2, 2)[:, :, 0], xx.reshape(R, K2, 2)[:, :, 1],
            packed, scale)),
    }
    results = {}
    for name, fn in variants.items():
        try:
            t = benchmark(fn, x, warmup=2, runs=6, repeats=3)
            results[name] = round(t.median_ms / CHAIN, 4)
        except Exception as e:  # noqa: BLE001 — ladder rungs may not compile
            results[name] = f"FAIL: {str(e)[:160]}"
        print(json.dumps({name: results[name]}), flush=True)
    # second interleaved pass for the survivors
    for name, fn in variants.items():
        if isinstance(results[name], float):
            t = benchmark(fn, x, warmup=2, runs=6, repeats=3)
            results[name + "_rep2"] = round(t.median_ms / CHAIN, 4)
    print(json.dumps({"floor_ms": round(floor_ms, 4), **results}),
          flush=True)


if __name__ == "__main__":
    main()
