#!/usr/bin/env python
"""Run 13 — mixed-precision KV pages: int8 sinks + int4 bulk.

Run 12's conclusion: int4's error floor is the format, not the scale
granularity — and the filed fix was mixed precision, keeping the pages
where outliers concentrate (attention sinks / early context) at int8.
This study measures that fix with run12's exact methodology (same shapes,
same 8x sink outliers, attention-output error vs the f32 reference) plus
the capacity math, and cross-checks the real kernel composition
(serving.mixed_kv.mixed_paged_decode_attention) against the dequant-math
prediction.

Runs on CPU (numerics only; run8 covers int4 kernel latency).
"""

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from quantizedmha_tpu.ops.quantize import (  # noqa: E402
    dequantize_kv_blocks_int4,
    quantize_kv_blocks,
    quantize_kv_blocks_int4,
)

H, S, D, PAGE = 4, 1024, 128, 256
TILE = 64  # int4 scale tile (run12's sweet spot — finer buys nothing)


def attention(q, k, v):
    s = np.einsum("hqd,hkd->hqk", q, k) / np.sqrt(q.shape[-1])
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hqk,hkd->hqd", p, v)


def dequant8(kk):
    kq, ks = quantize_kv_blocks(jnp.asarray(kk), PAGE)
    return np.asarray(kq, np.float32) * np.repeat(np.asarray(ks), PAGE, -1)[..., None]


def dequant4(kk):
    kq, ks = quantize_kv_blocks_int4(jnp.asarray(kk), PAGE, scale_block=TILE)
    return np.asarray(dequantize_kv_blocks_int4(kq, ks, TILE))


def main():
    rng = np.random.default_rng(0)
    k = rng.normal(0, 0.5, (1, H, S, D)).astype(np.float32)
    v = rng.normal(0, 0.5, (1, H, S, D)).astype(np.float32)
    k[:, :, :4] *= 8.0  # StreamingLLM sink outliers (run12's setup)
    v[:, :, :4] *= 8.0
    q = rng.normal(0, 0.5, (H, 8, D)).astype(np.float32)

    ref = attention(q, k[0], v[0])
    ref_rms = float(np.sqrt(np.mean(ref ** 2)))

    def err(kd, vd):
        out = attention(q, kd[0], vd[0])
        return (float(np.max(np.abs(out - ref))) / ref_rms,
                float(np.mean(np.abs(out - ref))) / ref_rms)

    def bytes_per_tok_at(s, n8_toks, fmt):
        if fmt == "int8":
            return D * 2 * 1.0
        if fmt == "int4":
            return D * 2 * 0.5
        return D * 2 * (n8_toks * 1.0 + (s - n8_toks) * 0.5) / s

    print(f"H={H} S={S} D={D} page={PAGE}, int4 tile={TILE}; sinks 0..3 at 8x")
    print(f"{'format':>22} | {'max/rms':>8} | {'mean/rms':>8} | KV B/tok | B/tok @32K")
    rows = [
        ("int8 (baseline)", dequant8(k), dequant8(v), "int8"),
        ("int4 (run12 best)", dequant4(k), dequant4(v), "int4"),
    ]
    # Mixed: first page int8, bulk int4 — exactly what mixed_kv stores.
    km = np.concatenate([dequant8(k[:, :, :PAGE]), dequant4(k[:, :, PAGE:])], axis=2)
    vm = np.concatenate([dequant8(v[:, :, :PAGE]), dequant4(v[:, :, PAGE:])], axis=2)
    rows.append(("mixed (int8 sinks)", km, vm, "mixed"))
    for name, kd, vd, fmt in rows:
        mx, mn = err(kd, vd)
        b = bytes_per_tok_at(S, PAGE, fmt) / (D * 2)
        b32 = bytes_per_tok_at(32768, PAGE, fmt) / (D * 2)
        print(f"{name:>22} | {mx:8.4f} | {mn:8.4f} | {b:8.3f} | {b32:8.3f}")

    # Kernel-composition cross-check: the shipped mixed decode (interpret
    # mode on CPU) must match the dequant-math prediction for the LAST
    # token's attention within kernel arithmetic tolerance.
    from quantizedmha_tpu.serving.mixed_kv import (
        MixedPagedKVState, mixed_paged_decode_attention, write_pages_mixed)

    state = MixedPagedKVState.create(H, 2, S // PAGE, PAGE, D, subs=PAGE // TILE)
    ids8 = jnp.asarray([1], jnp.int32)
    ids4 = jnp.asarray(np.arange(1, S // PAGE), jnp.int32)
    state = write_pages_mixed(
        state, jnp.asarray(k[0]), jnp.asarray(v[0]), ids8, ids4)
    qd = q[:, :1, :].reshape(1, H, D)  # one decode token per head group...
    # (H kv heads, group=1: q rows map 1:1 onto kv heads)
    out = mixed_paged_decode_attention(
        jnp.asarray(qd), state, jnp.asarray([S], np.int32),
        np.asarray(ids8)[None], np.asarray(ids4)[None], PAGE)
    pred = attention(q[:, :1, :], km[0], vm[0]).reshape(1, H, D)
    d_kernel = float(np.max(np.abs(np.asarray(out) - pred)))
    print(f"kernel-vs-dequant-math max abs diff: {d_kernel:.2e} "
          f"(kernel arithmetic only; must be ~1e-5)")


if __name__ == "__main__":
    main()
