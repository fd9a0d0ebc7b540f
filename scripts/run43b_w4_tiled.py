#!/usr/bin/env python
"""run43b — decompose the w4 kernel's DMA gap and price the fused shapes.

run43: dma-only at production tiles = 43.0us vs the 35.8us packed floor
(20% lost to the transfer schedule before any compute), fold math adds
+14us, fold_noraw saves 2.6. Two suspects for the DMA gap: (a) the packed
block is a STRIDED region of the row-major [K2, N] array (512 rows x 2 KB
contiguous chunks, 14336-byte stride), (b) the [gn, bn] scale operand
re-fetches 256 KB per n-step. Controls here:

  dma_rowmajor   : run43's dma control (re-baseline)
  dma_noscale_op : same minus the scale operand
  dma_tiled      : packed PRE-TILED [n_t, k_t, bk2, bn] -> every block DMA
                   is 1 MB contiguous
  noraw_tiled    : fold_noraw compute on the tiled layout (production
                   candidate)
  noraw_tiled_1024 : same at 1024x2048 (14 steps)
  [shape rows]   : noraw_tiled at the FUSED serving shapes —
                   qkv 4096x6144, gateup 4096x28672, down 14336x4096,
                   wo 4096x4096 — the per-layer w4 bill after call fusion.
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

R = 8
GROUP = 128
CHAIN = 32


def _mk(kind, K, N, bk2, bn, *, scale_op=True, tiled=False):
    K2 = K // 2
    GN = K // GROUP
    k_steps = K2 // bk2
    gpb = (2 * bk2) // GROUP
    rows_per_group = GROUP // 2

    def kernel(*refs):
        if scale_op:
            xe_ref, y_ref, packed_ref, scale_ref, out_ref, acc_ref = refs
        else:
            xe_ref, y_ref, packed_ref, out_ref, acc_ref = refs
            scale_ref = None
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        p = packed_ref[0, 0] if tiled else packed_ref[...]
        if kind == "dma":
            acc_ref[...] += p[:R, :].astype(jnp.float32)
        else:  # noraw: xe@(p*s) + y16@(hi*s)
            xe = xe_ref[...]
            y16 = y_ref[...]
            pf = p.astype(jnp.float32)
            hi_f = jnp.floor(pf * (1.0 / 16.0))
            s3 = scale_ref[pl.dslice(k * gpb, gpb), :][:, None, :]
            ps = (pf.reshape(gpb, rows_per_group, bn) * s3).reshape(
                bk2, bn).astype(jnp.bfloat16)
            his = (hi_f.reshape(gpb, rows_per_group, bn) * s3).reshape(
                bk2, bn).astype(jnp.bfloat16)
            acc = acc_ref[...]
            acc += jax.lax.dot_general(
                xe, ps, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                y16, his, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] = acc

        @pl.when(k == k_steps - 1)
        def _():
            out_ref[...] = acc_ref[...]

    if tiled:
        packed_spec = pl.BlockSpec((1, 1, bk2, bn), lambda n, k: (n, k, 0, 0))
    else:
        packed_spec = pl.BlockSpec((bk2, bn), lambda n, k: (k, n))
    in_specs = [
        pl.BlockSpec((R, bk2), lambda n, k: (0, k)),
        pl.BlockSpec((R, bk2), lambda n, k: (0, k)),
        packed_spec,
    ]
    if scale_op:
        in_specs.append(pl.BlockSpec((GN, bn), lambda n, k: (0, n)))

    def call(xe, y, packed, scale):
        args = (xe, y, packed) + ((scale,) if scale_op else ())
        return pl.pallas_call(
            kernel,
            grid=(N // bn, k_steps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((R, bn), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((R, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(*args)

    return call


def _tile(packed, bk2, bn):
    K2, N = packed.shape
    t = packed.reshape(K2 // bk2, bk2, N // bn, bn)
    return jnp.asarray(np.ascontiguousarray(
        np.asarray(t).transpose(2, 0, 1, 3)))


def main():
    rng = np.random.default_rng(0)
    bw = detect_chip().hbm_gbps * 1e9

    def chained(op, *extra):
        def f(x0):
            def body(i, carry):
                x0, s = carry
                out = op(x0 * (1.0 + s), *extra)
                return x0, out.reshape(-1)[0] * 0.0
            return jax.lax.fori_loop(0, CHAIN, body,
                                     (x0, jnp.float32(0.0)))[1]
        return jax.jit(f)

    results = {}

    def run(name, op, x0, extra):
        try:
            t = benchmark(chained(op, *extra), x0, warmup=2, runs=6,
                          repeats=3)
            results[name] = round(t.median_ms / CHAIN, 4)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {str(e)[:140]}"
        print(json.dumps({name: results[name]}), flush=True)

    def mats(K, N):
        K2 = K // 2
        xe = jnp.asarray(rng.normal(0, 1, (R, K2)), jnp.bfloat16)
        yy = jnp.asarray(rng.normal(0, 1, (R, K2)), jnp.bfloat16)
        y16 = (yy.astype(jnp.float32) - 16.0 * xe.astype(jnp.float32)
               ).astype(jnp.bfloat16)
        packed = jnp.asarray(rng.integers(-120, 120, (K2, N)), jnp.int8)
        scale = jnp.asarray(
            rng.uniform(0.008, 0.02, (K // GROUP, N)), jnp.float32)
        return xe, y16, packed, scale

    # --- gate shape decomposition ---
    K, N = 4096, 14336
    xe, y16, packed, scale = mats(K, N)
    tiled = _tile(packed, 512, 2048)
    run("dma_rowmajor", _mk("dma", K, N, 512, 2048), xe,
        (y16, packed, scale))
    run("dma_noscale_op", _mk("dma", K, N, 512, 2048, scale_op=False), xe,
        (y16, packed))
    run("dma_tiled", _mk("dma", K, N, 512, 2048, tiled=True), xe,
        (y16, tiled, scale))
    run("noraw_tiled", _mk("noraw", K, N, 512, 2048, tiled=True), xe,
        (y16, tiled, scale))
    tiled1024 = _tile(packed, 1024, 2048)
    run("noraw_tiled_1024", _mk("noraw", K, N, 1024, 2048, tiled=True), xe,
        (y16, tiled1024, scale))
    results["gate_floor_us"] = round(K * N / 2 / bw * 1e6, 1)

    # --- fused serving shapes (production candidate kernel) ---
    for name, (Ks, Ns) in {
        "qkv_4096x6144": (4096, 6144),
        "gateup_4096x28672": (4096, 28672),
        "down_14336x4096": (14336, 4096),
        "wo_4096x4096": (4096, 4096),
    }.items():
        xe, y16, packed, scale = mats(Ks, Ns)
        bn = min(2048, Ns)
        t = _tile(packed, 512, bn)
        run(name, _mk("noraw", Ks, Ns, 512, bn, tiled=True), xe,
            (y16, t, scale))
        results[name + "_floor_us"] = round(Ks * Ns / 2 / bw * 1e6, 1)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
