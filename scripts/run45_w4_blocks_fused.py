#!/usr/bin/env python
"""run45 — production w4_matmul block-size sweep on the FUSED serving
shapes (qkv = wq|wk|wv concat, gateup = w_gate|w_up concat).

run43/43b verdicts feeding this: fold_noraw is numerically dead (raw-byte
dot rounds at |p|<=127 vs |lo|<=7 — 9x the error, CPU probe), the tiled
HBM layout is DMA-neutral, and bk2=1024 saves ~2us on the gate shape. So
the remaining production knobs are block geometry per shape + call
fusion. This sweeps the REAL ops.w4_matmul (folded-scale path) over
block_k2 in {512, 1024, max} and block_n in {2048, 4096} on each fused
shape, chained x32, R=8.
"""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.harness.timing import benchmark  # noqa: E402
from quantizedmha_tpu.profiling.roofline import detect_chip  # noqa: E402
from quantizedmha_tpu.ops.w4_matmul import w4_matmul  # noqa: E402

R = 8
GROUP = 128
CHAIN = 32

SHAPES = {
    "qkv": (4096, 6144),
    "wo": (4096, 4096),
    "gateup": (4096, 28672),
    "down": (14336, 4096),
}


def main():
    rng = np.random.default_rng(0)
    bw = detect_chip().hbm_gbps * 1e9
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

    for sname, (K, N) in SHAPES.items():
        K2 = K // 2
        x = jnp.asarray(rng.normal(0, 1, (R, K)), jnp.bfloat16)
        packed = jnp.asarray(rng.integers(-120, 120, (K2, N)), jnp.int8)
        scale = jnp.asarray(
            rng.uniform(0.008, 0.02, (K // GROUP, N)), jnp.float32)
        results[f"{sname}_floor_us"] = round(K * N / 2 / bw * 1e6, 1)
        for bk2 in (512, 1024, 2048):
            if K2 % bk2:
                continue
            for bn in (2048, 4096):
                if N % bn:
                    continue
                name = f"{sname}_{bk2}x{bn}"
                op = functools.partial(
                    w4_matmul, packed=packed, scale=scale, group=GROUP,
                    block_k2=bk2, block_n=bn)
                try:
                    t = benchmark(chained(op), x, warmup=2, runs=6,
                                  repeats=3)
                    results[name] = round(t.median_ms / CHAIN * 1e3, 1)
                except Exception as e:  # noqa: BLE001
                    results[name] = f"FAIL: {str(e)[:120]}"
                print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
