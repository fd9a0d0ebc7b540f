#!/usr/bin/env python
"""Llama-3-8B-shape INT8 decode on ONE v5e chip.

BASELINE.json's serving config targets 8B decode with an INT8 KV cache.
A v5e chip has 16 GB HBM — bf16 8B weights (16 GB) don't fit, but the
framework's INT8 weight quantization (quant/weights.py) brings the layer
stack to ~6.5 GB (embed/lm_head stay bf16), leaving room for the paged INT8
KV cache and activations.

Weights are random (numerics demo, not a quality demo): initialized
per-tensor on HOST, quantized by the native C++ quantizer, and device_put
as int8 — host/device peak memory stays bounded.
"""

import gc
import time

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.models.llama import LlamaConfig
from quantizedmha_tpu.quant.weights import QuantizedWeight
from quantizedmha_tpu.serving.engine import Engine, EngineConfig


def host_init_int8_params(cfg: LlamaConfig, seed: int = 0):
    """Random params with layer matmuls quantized to int8 host-side, ONE
    LAYER at a time (peak host memory = one f32 layer tensor; float32 RNG —
    the float64 default is 10x slower and 2x the memory)."""
    rng = np.random.default_rng(seed)
    hd = cfg.hd
    L = cfg.num_layers

    def dev_int8(per_layer_shape, scale=0.02):
        vals = np.empty((L, *per_layer_shape), np.int8)
        scales = np.empty((L, per_layer_shape[-1]), np.float32)
        for layer in range(L):
            w = rng.standard_normal(per_layer_shape, dtype=np.float32) * scale
            amax = np.abs(w).max(axis=0)
            s = np.maximum(amax, 1e-8) / 127.0
            np.clip(np.round(w / s[None, :]), -127, 127, out=w)
            vals[layer] = w.astype(np.int8)
            scales[layer] = s
            del w
        gc.collect()
        return QuantizedWeight(values=jax.device_put(vals),
                               scale=jax.device_put(scales))

    def dev_bf16(shape, scale=0.02):
        w = rng.standard_normal(shape, dtype=np.float32) * scale
        out = jax.device_put(jnp.asarray(w, jnp.bfloat16))
        del w
        gc.collect()
        return out

    L = cfg.num_layers
    layers = dict(
        attn_norm=jax.device_put(jnp.ones((L, cfg.hidden_size), cfg.dtype)),
        mlp_norm=jax.device_put(jnp.ones((L, cfg.hidden_size), cfg.dtype)),
        wq=dev_int8((cfg.hidden_size, cfg.num_heads * hd)),
        wk=dev_int8((cfg.hidden_size, cfg.num_kv_heads * hd)),
        wv=dev_int8((cfg.hidden_size, cfg.num_kv_heads * hd)),
        wo=dev_int8((cfg.num_heads * hd, cfg.hidden_size)),
        w_gate=dev_int8((cfg.hidden_size, cfg.intermediate_size)),
        w_up=dev_int8((cfg.hidden_size, cfg.intermediate_size)),
        w_down=dev_int8((cfg.intermediate_size, cfg.hidden_size)),
    )
    return dict(
        embed=dev_bf16((cfg.vocab_size, cfg.hidden_size)),
        layers=layers,
        final_norm=jax.device_put(jnp.ones((cfg.hidden_size,), cfg.dtype)),
        lm_head=dev_bf16((cfg.hidden_size, cfg.vocab_size)),
    )


def main():
    cfg = LlamaConfig.llama3_8b()
    print(f"config: {cfg.num_layers}L hidden={cfg.hidden_size} "
          f"H={cfg.num_heads}/Hkv={cfg.num_kv_heads} vocab={cfg.vocab_size}")
    t0 = time.perf_counter()
    params = host_init_int8_params(cfg)
    gb = sum(x.size * x.dtype.itemsize
             for x in jax.tree_util.tree_leaves(params)) / 2**30
    print(f"params on device: {gb:.2f} GiB (int8 layers + bf16 embed/head) "
          f"in {time.perf_counter() - t0:.0f}s", flush=True)

    ecfg = EngineConfig(num_pages=64, page_size=64, max_batch=4,
                        prefill_buckets=(128,), max_new_tokens=32,
                        max_pages_per_seq=8, decode_chunk=8)
    eng = Engine(cfg, params, ecfg)
    rng = np.random.default_rng(0)
    for _ in range(4):
        eng.add_request(list(rng.integers(1, cfg.vocab_size, 100)), max_new=32)

    t0 = time.perf_counter()
    eng.step()  # compiles prefill + fused decode
    print(f"first step (compile) {time.perf_counter() - t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    toks0 = eng.metrics.counter("tokens_generated")
    eng.run()
    dt = time.perf_counter() - t0
    toks = eng.metrics.counter("tokens_generated") - toks0
    print(f"8B INT8 decode: {toks:.0f} tokens in {dt:.2f}s -> "
          f"{toks / dt:.1f} tok/s (batch {ecfg.max_batch}, chunk "
          f"{ecfg.decode_chunk}, 1x v5e)", flush=True)
    print(eng.metrics.render())


if __name__ == "__main__":
    main()
