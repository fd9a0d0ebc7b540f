#!/usr/bin/env python
"""On-TPU compiled kernel unit tests (`make chip-unit`).

The reference compiles its WMMA helper into a standalone device test
binary (reference tests/test_fa_tc.cu:17-18, 30-43) so kernel bugs
surface without the full driver. This is the TPU analog: one TINY case
per Pallas kernel family, Mosaic-compiled on the REAL chip (no interpret
mode — the CPU suite already covers interpret), gated on numerics
against the jnp reference. Run in each round's chip batch; exits
non-zero on any failure.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.reference.mha import mha_reference_shaped  # noqa: E402


def _check(name, got, want, tol, failures):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    err = float(np.max(np.abs(got - want)))
    ok = err < tol and np.isfinite(err)
    print(f"{'PASS' if ok else 'FAIL'} {name}: max_abs_err={err:.2e} "
          f"(tol {tol:g})", flush=True)
    if not ok:
        failures.append(name)


def main():
    rng = np.random.default_rng(0)
    failures = []
    t0 = time.time()
    B, H, S, D = 1, 2, 256, 64
    q = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
    ref = mha_reference_shaped(q, k, v, causal=True)

    from quantizedmha_tpu.ops.flash_attention import flash_attention
    _check("flash_fp32", flash_attention(q, k, v, causal=True), ref,
           2e-5, failures)
    _check("flash_bf16",
           flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                           v.astype(jnp.bfloat16), causal=True),
           ref, 2e-2, failures)

    # backward: compiled VJP vs jnp reference VJP
    def loss(f):
        return lambda q, k, v: (f(q, k, v) ** 2).sum()

    gf = jax.grad(loss(lambda q, k, v: flash_attention(q, k, v, causal=True)),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda q, k, v: mha_reference_shaped(q, k, v, causal=True)),
                  argnums=(0, 1, 2))(q, k, v)
    for gi, gw, nm in zip(gf, gr, "qkv"):
        _check(f"flash_bwd_d{nm}", gi, gw, 5e-4, failures)

    from quantizedmha_tpu.ops.flash_attention_int8 import (
        flash_attention_int8, flash_attention_int8_t)
    _check("int8_standard", flash_attention_int8(q, k, v, causal=True),
           ref, 4e-2, failures)
    _check("int8_transposed", flash_attention_int8_t(q, k, v, causal=True),
           ref, 4e-2, failures)

    from quantizedmha_tpu.ops.unfused import unfused_mha
    _check("unfused", unfused_mha(q, k, v, causal=True), ref, 2e-4, failures)

    # paged decode: int8 pools, per-head AND head-folded grids + int4
    from quantizedmha_tpu.ops.decode import (
        paged_decode_attention, paged_decode_attention_int4)
    Hkv, P, PS, MP = 2, 8, 128, 4
    qd = jnp.asarray(rng.normal(0, 0.5, (2, 4, D)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 127, (Hkv, P, PS, D)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 127, (Hkv, P, PS, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.01, (Hkv, P)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.01, (Hkv, P)), jnp.float32)
    lengths = jnp.asarray([300, 129], jnp.int32)
    tables = jnp.asarray(rng.permutation(P).reshape(2, MP), jnp.int32)

    def decode_golden(b):
        t = np.asarray(tables[b])
        L = int(lengths[b])
        kk = (np.asarray(kp)[:, t].astype(np.float64)
              * np.asarray(ks)[:, t][:, :, None, None]).reshape(Hkv, -1, D)
        vv = (np.asarray(vp)[:, t].astype(np.float64)
              * np.asarray(vs)[:, t][:, :, None, None]).reshape(Hkv, -1, D)
        qg = np.asarray(qd[b], np.float64).reshape(Hkv, 2, D)
        s = np.einsum("hgd,hnd->hgn", qg, kk[:, :L]) * D**-0.5
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        return np.einsum("hgn,hnd->hgd", p, vv[:, :L]).reshape(4, D)

    # Paged-kernel tolerance: the int8 paths pin precision=DEFAULT (the
    # MXU consumes the f32-dequantized operands through bf16 passes;
    # HIGHEST breaks Mosaic int8 matmuls — CLAUDE.md), so on-chip f32
    # dots carry ~1e-3 relative error that interpret-mode CPU runs don't.
    want = np.stack([decode_golden(0), decode_golden(1)])
    for fold in (False, True):
        got = paged_decode_attention(qd, kp, vp, ks, vs, lengths, tables,
                                     fold_kv_heads=fold)
        _check(f"paged_decode_fold={fold}", got, want, 3e-3, failures)

    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks_int4
    kf = jnp.asarray(rng.normal(0, 0.5, (Hkv, P * PS, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(0, 0.5, (Hkv, P * PS, D)), jnp.float32)
    kp4, ks4 = quantize_kv_blocks_int4(kf[None], PS)
    vp4, vs4 = quantize_kv_blocks_int4(vf[None], PS)
    kp4 = kp4[0].reshape(Hkv, P, PS, D // 2)
    vp4 = vp4[0].reshape(Hkv, P, PS, D // 2)
    got4 = paged_decode_attention_int4(
        qd, kp4, vp4, ks4[0], vs4[0], lengths, tables)
    # int4 golden: attention over the int4-dequantized cache
    from quantizedmha_tpu.ops.quantize import dequantize_kv_blocks_int4
    kk4 = dequantize_kv_blocks_int4(kp4.reshape(1, Hkv, P * PS, D // 2),
                                    ks4, PS)[0]
    vv4 = dequantize_kv_blocks_int4(vp4.reshape(1, Hkv, P * PS, D // 2),
                                    vs4, PS)[0]

    def golden4(b):
        t = np.asarray(tables[b])
        L = int(lengths[b])
        kk = np.asarray(kk4, np.float64).reshape(Hkv, P, PS, D)[
            :, t].reshape(Hkv, -1, D)
        vv = np.asarray(vv4, np.float64).reshape(Hkv, P, PS, D)[
            :, t].reshape(Hkv, -1, D)
        qg = np.asarray(qd[b], np.float64).reshape(Hkv, 2, D)
        s = np.einsum("hgd,hnd->hgn", qg, kk[:, :L]) * D**-0.5
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        return np.einsum("hgn,hnd->hgd", p, vv[:, :L]).reshape(4, D)

    _check("paged_decode_int4", got4,
           np.stack([golden4(0), golden4(1)]), 3e-3, failures)

    # paged prefill straight from the int8 pools
    from quantizedmha_tpu.ops.paged_prefill import paged_prefill_attention
    S2 = 128
    qp = jnp.asarray(rng.normal(0, 0.5, (2, 4, S2, D)), jnp.float32)
    q_starts = (lengths - S2).astype(jnp.int32)
    gotp = paged_prefill_attention(qp, kp, vp, ks, vs, lengths, q_starts,
                                   tables, block_q=128)

    def goldenp(b):
        t = np.asarray(tables[b])
        L = int(lengths[b])
        kk = (np.asarray(kp)[:, t].astype(np.float64)
              * np.asarray(ks)[:, t][:, :, None, None]).reshape(Hkv, -1, D)
        vv = (np.asarray(vp)[:, t].astype(np.float64)
              * np.asarray(vs)[:, t][:, :, None, None]).reshape(Hkv, -1, D)
        qg = np.asarray(qp[b], np.float64).reshape(Hkv, 2, S2, D)
        s = np.einsum("hgqd,hnd->hgqn", qg, kk) * D**-0.5
        pos_q = int(q_starts[b]) + np.arange(S2)
        mask = np.arange(kk.shape[1])[None, :] <= pos_q[:, None]
        mask &= np.arange(kk.shape[1])[None, :] < L
        s = np.where(mask[None, None], s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        return np.einsum("hgqn,hnd->hgqd", p, vv).reshape(4, S2, D)

    _check("paged_prefill", gotp,
           np.stack([goldenp(0), goldenp(1)]), 3e-3, failures)

    # w4 fused dequant-matmul (stacked + unstacked)
    from quantizedmha_tpu.ops.w4_matmul import w4_matmul
    from quantizedmha_tpu.quant.weights import (
        dequantize_weight4, quantize_weight4)
    K, N = 512, 256
    x8 = jnp.asarray(rng.normal(0, 1, (8, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (K, N)), jnp.float32)
    qw = quantize_weight4(w, group=128)
    wantw = x8.astype(jnp.float32) @ dequantize_weight4(qw)
    _check("w4_matmul", w4_matmul(x8, qw.packed, qw.scale, group=128),
           wantw, 0.02 * float(jnp.abs(wantw).max()), failures)
    stacked = quantize_weight4(jnp.stack([w, w * 0.5]), group=128)
    _check("w4_matmul_stacked",
           w4_matmul(x8, stacked.packed, stacked.scale, group=128,
                     layer=jnp.int32(1)),
           x8.astype(jnp.float32) @ dequantize_weight4(qw) * 0.5,
           0.02 * float(jnp.abs(wantw).max()), failures)

    print(f"\nchip-unit: {13 + 2 - len(failures)} families checked in "
          f"{time.time() - t0:.0f}s; failures: {failures or 'none'}",
          flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
