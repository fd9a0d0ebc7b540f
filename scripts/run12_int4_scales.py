#!/usr/bin/env python
"""Run 12 — int4 scale-tile granularity vs accuracy (decoupled from pages).

VERDICT round-1 weak #8: int4 decode was an unresolved negative and the
page-size=scale-tile coupling (page 256 => one max-abs scale per 256
tokens) was unexamined. int4 has 3 magnitude bits; one outlier token in a
page forces every other token's K/V into a handful of levels. This study
quantizes the SAME 256-token pages with scale tiles {256, 128, 64, 32}
(quantize_kv_blocks_int4's new scale_block) and measures attention-output
error vs the f32 reference. Scales are f32 per (head, tile): at tile 32
that's 0.2% of the cache bytes — accuracy is free, bandwidth unchanged.

Runs on CPU (numerics only; no kernel timing).
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


def attention(q, k, v):
    s = np.einsum("hqd,hkd->hqk", q, k) / np.sqrt(q.shape[-1])
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hqk,hkd->hqd", p, v)


def main():
    rng = np.random.default_rng(0)
    H, S, D, PAGE = 4, 1024, 128, 256
    k = rng.normal(0, 0.5, (1, H, S, D)).astype(np.float32)
    v = rng.normal(0, 0.5, (1, H, S, D)).astype(np.float32)
    # Realistic outlier structure: the first few (attention-sink) tokens
    # carry ~8x K/V magnitude (StreamingLLM's observation). Under
    # page=scale coupling they poison the whole first page's scale; a
    # finer scale tile quarantines them.
    k[:, :, :4] *= 8.0
    v[:, :, :4] *= 8.0
    q = rng.normal(0, 0.5, (H, 8, D)).astype(np.float32)

    ref = attention(q, k[0], v[0])
    ref_rms = float(np.sqrt(np.mean(ref ** 2)))

    def err(kd, vd):
        out = attention(q, kd[0], vd[0])
        return (float(np.max(np.abs(out - ref))) / ref_rms,
                float(np.mean(np.abs(out - ref))) / ref_rms)

    print(f"H={H} S={S} D={D} storage page={PAGE}; sink tokens 0..3 at 8x")
    print(f"{'format':>17} | {'scale tile':>10} | {'max/rms':>8} | {'mean/rms':>8} | scale B/token")
    kq8, ks8 = quantize_kv_blocks(jnp.asarray(k), PAGE)
    kd8 = np.asarray(kq8, np.float32) * np.repeat(np.asarray(ks8), PAGE, -1)[..., None]
    vq8, vs8 = quantize_kv_blocks(jnp.asarray(v), PAGE)
    vd8 = np.asarray(vq8, np.float32) * np.repeat(np.asarray(vs8), PAGE, -1)[..., None]
    m8, a8 = err(kd8, vd8)
    print(f"{'int8 (baseline)':>17} | {PAGE:>10} | {m8:8.4f} | {a8:8.4f} | 0.016")
    for tile in (256, 128, 64, 32, 16):
        kq, ks = quantize_kv_blocks_int4(jnp.asarray(k), PAGE, scale_block=tile)
        vq, vs = quantize_kv_blocks_int4(jnp.asarray(v), PAGE, scale_block=tile)
        kd = np.asarray(dequantize_kv_blocks_int4(kq, ks, tile))
        vd = np.asarray(dequantize_kv_blocks_int4(vq, vs, tile))
        mx, mn = err(kd, vd)
        per_tok = 4.0 / tile
        print(f"{'int4':>17} | {tile:>10} | {mx:8.4f} | {mn:8.4f} | {per_tok:.3f}")


if __name__ == "__main__":
    main()
