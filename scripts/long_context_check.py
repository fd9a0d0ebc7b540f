#!/usr/bin/env python
"""Long-context gate on the real chip: causal INT8 fused attention at 32K
(BASELINE.json config "INT8 ... seq up to 32K, causal mask").

The O(N^2)-memory jnp golden cannot run at 32K, so the INT8 kernel is gated
against the FP32 fused flash kernel (itself golden-gated at smaller N).
"""

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.harness.timing import benchmark
from quantizedmha_tpu.harness.verify import compare
from quantizedmha_tpu.ops.flash_attention import flash_attention
from quantizedmha_tpu.ops.flash_attention_int8 import flash_attention_int8
from quantizedmha_tpu.profiling.roofline import attention_flops, detect_chip, roofline


def main():
    rng = np.random.default_rng(0)
    B, H, S, D = 1, 8, 32768, 64
    q = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)

    f_int8 = jax.jit(lambda a, b, c: flash_attention_int8(a, b, c, causal=True))
    f_fp32 = jax.jit(lambda a, b, c: flash_attention(a, b, c, causal=True))

    out8 = f_int8(q, k, v)
    out32 = f_fp32(q, k, v)
    rep = compare(np.asarray(out8), np.asarray(out32), abs_tol=4e-2, rel_tol=4e-2)
    print(f"32K causal int8-vs-fp32 gate: {rep}", flush=True)

    t8 = benchmark(f_int8, q, k, v, warmup=2, runs=8, repeats=3)
    flops = attention_flops(B, H, S, S, D, causal=True)
    chip = detect_chip()
    rl = roofline(t8.median_s, flops, 0, dtype="int8", chip=chip)
    print(f"int8 causal 32K (B{B} H{H} D{D}): {t8.median_ms:.2f} ms | {rl}", flush=True)

    t32 = benchmark(f_fp32, q, k, v, warmup=2, runs=4, repeats=2)
    print(f"fp32 causal 32K: {t32.median_ms:.2f} ms", flush=True)
    assert rep.ok, "int8 32K gate failed"

    # 128K sliding-window gate: O(seq * W) shrunk-grid path at 4x the
    # context, bf16 (the practical long-context serving config). Gated
    # against the fp32 windowed kernel on a strided row subset.
    del q, k, v
    S128, W = 131072, 4096
    q = jnp.asarray(rng.normal(0, 0.5, (B, H, S128, D)), jnp.bfloat16)
    kk = jnp.asarray(rng.normal(0, 0.5, (B, H, S128, D)), jnp.bfloat16)
    vv = jnp.asarray(rng.normal(0, 0.5, (B, H, S128, D)), jnp.bfloat16)
    f_win = jax.jit(lambda a, b, c: flash_attention(
        a, b, c, causal=True, window=W, attention_sinks=64))
    out = f_win(q, kk, vv)
    ref = flash_attention(q.astype(jnp.float32)[:, :, -8192:],
                          kk.astype(jnp.float32), vv.astype(jnp.float32),
                          causal=True, window=W, attention_sinks=64,
                          save_residuals=False, q_offset=None, kv_offset=None)
    repw = compare(np.asarray(out[:, :, -8192:], np.float32),
                   np.asarray(ref), abs_tol=3e-2, rel_tol=3e-2)
    print(f"128K windowed bf16-vs-fp32 tail gate: {repw}", flush=True)
    tw = benchmark(f_win, q, kk, vv, warmup=2, runs=8, repeats=3)
    wflops = attention_flops(B, H, S128, S128, D, causal=True,
                             window=W, sinks=64)
    rlw = roofline(tw.median_s, wflops, 0, dtype="bf16", chip=chip)
    print(f"bf16 windowed 128K (W={W}, sinks=64): {tw.median_ms:.2f} ms | {rlw}",
          flush=True)
    assert repw.ok, "128K windowed gate failed"


if __name__ == "__main__":
    main()
