#!/usr/bin/env python
"""run61 — hfold seqs-per-step A/B at the serving shape (round-5 cont.).

run42: the (batch, kv_head, page) grid costs 60.3us/layer at batch 8 for
~6 MB of page reads (64 grid steps x ~0.9us fixed each, ~40ns of DMA per
step). The hfold kernel folds all kv heads into one strided page DMA and
unrolls the per-head softmax chain over resident tiles: grid
(batch, page_step) = 8 steps. Same-process interleaved A/B, llama3-8B
serving shape (Hkv=8, group=4, d=128, page=128, ctx 352, stacked L=4
pools with the production layer-scalar indexing + prerowed/columned scale
layouts), batches 8 and 32, J in {1, 2, 4}.
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
from quantizedmha_tpu.ops.decode import paged_decode_attention  # noqa: E402

HKV, GROUP, D, PS, MP, L, CTX = 8, 4, 128, 128, 4, 4, 352
CHAIN = 32


def main():
    rng = np.random.default_rng(0)
    bw = detect_chip().hbm_gbps * 1e9
    results = {}
    for B in (8, 32):
        P = B * MP + 8
        q = jnp.asarray(rng.normal(0, 1, (B, HKV * GROUP, D)), jnp.bfloat16)
        kp = jnp.asarray(rng.integers(-127, 127, (L, HKV, P, PS, D)), jnp.int8)
        vp = jnp.asarray(rng.integers(-127, 127, (L, HKV, P, PS, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.02, (L, HKV, P)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.02, (L, HKV, P)), jnp.float32)
        lengths = jnp.full((B,), CTX, jnp.int32)
        tables = jnp.asarray(
            rng.permutation(P)[:B * MP].reshape(B, MP), jnp.int32)
        ks_col, vs_col = ks[..., None], vs[..., None]
        ks_row = jnp.swapaxes(ks, -1, -2)
        vs_row = jnp.swapaxes(vs, -1, -2)

        def chained(_unused, J, ksx, vsx, prerowed, S=1):
            def f(q0):
                def body(i, carry):
                    q0, s = carry
                    out = paged_decode_attention(
                        q0 * (1.0 + s), kp, vp, ksx, vsx, lengths, tables,
                        layer=(i % L).astype(jnp.int32), fold_kv_heads=True,
                        pages_per_step=J, scales_prerowed=prerowed,
                        seqs_per_step=S)
                    return q0, out.reshape(-1)[0].astype(jnp.float32) * 0.0
                return jax.lax.fori_loop(
                    0, CHAIN, body, (q0, jnp.float32(0.0)))[1]
            return jax.jit(f)

        cases = {
            f"b{B}_S1_J4": chained(False, 4, ks_row, vs_row, True, 1),
            f"b{B}_S2_J4": chained(False, 4, ks_row, vs_row, True, 2),
            f"b{B}_S4_J4": chained(False, 4, ks_row, vs_row, True, 4),
            f"b{B}_S2_J2": chained(False, 2, ks_row, vs_row, True, 2),
        }
        for name, f in cases.items():
            try:
                t = benchmark(f, q, warmup=2, runs=6, repeats=3)
                results[name] = round(t.median_ms / CHAIN * 1e3, 2)  # us
            except Exception as e:  # noqa: BLE001
                results[name] = f"FAIL: {str(e)[:160]}"
            print(json.dumps({name: results[name]}), flush=True)
        # bytes actually needed: K+V pages covering ctx per sequence
        need = B * HKV * (-(-CTX // PS)) * PS * D * 2
        results[f"b{B}_floor_us"] = round(need / bw * 1e6, 2)
    # correctness spot check on-chip (hfold vs old, absolute)
    a = paged_decode_attention(q, kp, vp, ks, vs, lengths, tables,
                               layer=jnp.int32(1), fold_kv_heads=True,
                               seqs_per_step=1)
    b = paged_decode_attention(q, kp, vp, ks, vs, lengths, tables,
                               layer=jnp.int32(1), fold_kv_heads=True,
                               seqs_per_step=2)
    results["chip_max_abs_diff"] = float(jnp.max(jnp.abs(
        a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
