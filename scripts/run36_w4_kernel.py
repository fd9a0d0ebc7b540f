#!/usr/bin/env python
"""run36 — Pallas w4 dequant-matmul vs w8a16 XLA matmul, per 8B shape.

Interleaved same-process A/B at the decode row count (R=8). Floors: the
w4 kernel's HBM traffic is in*out/2 packed bytes (+ scales); w8a16's is
in*out bytes. A kernel at its floor beats w8 by ~2x per matmul."""

import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.harness.timing import benchmark  # noqa: E402
from quantizedmha_tpu.ops.w4_matmul import w4_matmul  # noqa: E402
from quantizedmha_tpu.profiling.roofline import detect_chip  # noqa: E402
from quantizedmha_tpu.quant.weights import (  # noqa: E402
    QuantizedWeight,
    qdense,
)

SHAPES = [("wq/wo", 4096, 4096), ("wk/wv", 4096, 1024),
          ("gate/up", 4096, 14336), ("down", 14336, 4096)]
R = 8


def main():
    rng = np.random.default_rng(0)
    bw = detect_chip().hbm_gbps * 1e9
    for name, k, n in SHAPES:
        x = jnp.asarray(rng.normal(0, 1, (R, k)), jnp.bfloat16)
        packed = jnp.asarray(rng.integers(-120, 120, (k // 2, n)), jnp.int8)
        scale = jnp.asarray(rng.uniform(1e-4, 3e-4, (k // 128, n)),
                            jnp.float32)
        w8 = QuantizedWeight(
            values=jnp.asarray(rng.integers(-64, 64, (k, n)), jnp.int8),
            scale=scale[0])

        # Chain CHAIN calls inside ONE jit with a data dependence — a
        # single sub-ms op per dispatch measures dispatch overhead, not
        # the kernel (w8's one-op fit sits at 8x its floor for the same
        # reason; run20 lesson).
        CHAIN = 32

        def chained(op):
            def f(x):
                def body(i, carry):
                    x, s = carry
                    out = op(x * (1.0 + s))
                    return x, out.astype(jnp.float32).sum() * 0.0
                return jax.lax.fori_loop(
                    0, CHAIN, body, (x, jnp.float32(0.0)))[1]
            return jax.jit(f)

        f4 = chained(lambda x: w4_matmul(x, packed, scale, group=128))
        f8 = chained(lambda x: qdense(x, w8, mode="w8a16"))

        rows = {}
        for tag, fn in [("w8", f8), ("w4", f4), ("w8b", f8), ("w4b", f4)]:
            t = benchmark(fn, x, warmup=3, runs=8, repeats=3)
            rows[tag] = t.median_ms / CHAIN
        floor4 = (k * n / 2 + scale.nbytes) / bw * 1e3
        floor8 = k * n / bw * 1e3
        print(json.dumps({
            "shape": name, "k": k, "n": n,
            "w8_ms": round(min(rows["w8"], rows["w8b"]), 4),
            "w4_ms": round(min(rows["w4"], rows["w4b"]), 4),
            "w8_floor_ms": round(floor8, 4),
            "w4_floor_ms": round(floor4, 4),
            "w4_pct_floor": round(100 * floor4 /
                                  min(rows["w4"], rows["w4b"]), 1),
            "speedup": round(min(rows["w8"], rows["w8b"]) /
                             min(rows["w4"], rows["w4b"]), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
