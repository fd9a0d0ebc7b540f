"""Model-level serving benchmark: continuous-batching decode throughput
with an HBM speed-of-light denominator.

The reference publishes kernel-ms only (reference README.md:9-19); the
north star (SURVEY §7 stage 6) is a tokens/s serving metric. Decode of a
large LM is weight/KV HBM-bandwidth-bound, so the honest quality score is
tokens/s as a % of the HBM speed-of-light for the model's bytes/token:

    step_bytes  = weight bytes read once per step (layers + lm_head)
                + B * (KV bytes read at the current context + KV written)
    SoL ms/step = step_bytes / HBM bandwidth
    pct_hbm_sol = SoL ms/step / measured ms/step

Weights are Llama-3-8B-shape, random, quantized to INT8 (w8a16), and
initialized ON DEVICE via jitted PRNG — an 8.5 GiB host->device transfer
has repeatedly wedged this machine's tunneled backend
(.claude/skills/verify/SKILL.md), device-side init avoids the transfer
entirely. Invoked by bench.py as a SUBPROCESS with a timeout so a chip
hang degrades the serving row, never the headline.
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.models.llama import LlamaConfig
from quantizedmha_tpu.quant.weights import QuantizedWeight, QuantizedWeight4
from quantizedmha_tpu.serving.engine import Engine, EngineConfig

_W4_GROUP = 128  # one MXU contraction tile per scale group


def device_init_quant_params(cfg: LlamaConfig, seed: int = 0,
                             bits: int = 8,
                             group: int = _W4_GROUP,
                             lm_head_bits: int | None = None,
                             packing: str = "halves") -> Dict[str, Any]:
    """Random 8B-shape params with int8 (per-channel) or int4 (group-wise)
    layer matmuls, generated on device. lm_head_bits=8 quantizes the
    output projection per-channel too (it is ~18% of the w4 decode
    weight bytes at llama3's 128K vocab).

    Values are small uniform ints with small scales — decode throughput
    only depends on byte layout, not weight values. Each tensor is its own
    jit so XLA never materializes two copies."""
    key = jax.random.PRNGKey(seed)
    keys = iter(jax.random.split(key, 32))
    hd = cfg.hd
    L = cfg.num_layers

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def _int8(k, shape):
        return jax.random.randint(k, shape, -64, 65, jnp.int8)

    @functools.partial(jax.jit, static_argnums=1)
    def _packed4(k, shape):
        # Sample each nibble in [-7, 7] and encode with the quantizer's
        # convention: low nibble biased (+8), high two's complement.
        klo, khi = jax.random.split(k)
        lo = jax.random.randint(klo, shape, -7, 8, jnp.int8)
        hi = jax.random.randint(khi, shape, -7, 8, jnp.int8)
        return ((lo + 8) & jnp.int8(0x0F)) | (hi << 4)

    @functools.partial(jax.jit, static_argnums=1)
    def _scale(k, shape):
        return jax.random.uniform(k, shape, jnp.float32, 1e-4, 3e-4)

    @functools.partial(jax.jit, static_argnums=1)
    def _bf16(k, shape):
        return (jax.random.normal(k, shape, jnp.bfloat16) * 0.02).astype(
            jnp.bfloat16)

    def qw(per_layer_shape):
        if bits == 4:
            in_dim, out_dim = per_layer_shape
            if in_dim % (2 * group):
                raise ValueError(
                    f"in_dim {in_dim} needs 2*group ({2 * group}) | in_dim")
            v = _packed4(next(keys), (L, in_dim // 2, out_dim))
            s = _scale(next(keys), (L, in_dim // group, out_dim))
            # Random bytes are layout-agnostic; the packing tag routes the
            # kernel's activation split (halves: free static slices — the
            # single-chip serving default; pairs: the TP-shardable layout).
            return QuantizedWeight4(packed=v, scale=s, group=group,
                                    packing=packing)
        v = _int8(next(keys), (L, *per_layer_shape))
        s = _scale(next(keys), (L, per_layer_shape[-1]))
        return QuantizedWeight(values=v, scale=s)

    layers = dict(
        attn_norm=jnp.ones((L, cfg.hidden_size), cfg.dtype),
        mlp_norm=jnp.ones((L, cfg.hidden_size), cfg.dtype),
        wq=qw((cfg.hidden_size, cfg.num_heads * hd)),
        wk=qw((cfg.hidden_size, cfg.num_kv_heads * hd)),
        wv=qw((cfg.hidden_size, cfg.num_kv_heads * hd)),
        wo=qw((cfg.num_heads * hd, cfg.hidden_size)),
        w_gate=qw((cfg.hidden_size, cfg.intermediate_size)),
        w_up=qw((cfg.hidden_size, cfg.intermediate_size)),
        w_down=qw((cfg.intermediate_size, cfg.hidden_size)),
    )
    if lm_head_bits == 8:
        lm_head = QuantizedWeight(
            values=_int8(next(keys), (cfg.hidden_size, cfg.vocab_size)),
            scale=_scale(next(keys), (cfg.vocab_size,)))
    else:
        lm_head = _bf16(next(keys), (cfg.hidden_size, cfg.vocab_size))
    return dict(
        embed=_bf16(next(keys), (cfg.vocab_size, cfg.hidden_size)),
        layers=layers,
        final_norm=jnp.ones((cfg.hidden_size,), cfg.dtype),
        lm_head=lm_head,
    )


def device_init_int8_params(cfg: LlamaConfig, seed: int = 0) -> Dict[str, Any]:
    return device_init_quant_params(cfg, seed=seed, bits=8)


def _leaf_bytes(tree) -> int:
    # One implementation with quant.weights.weight_bytes: INT4 is stored
    # nibble-packed in int8 leaves, so itemsize is already the HBM truth.
    from quantizedmha_tpu.quant.weights import weight_bytes
    return weight_bytes(tree)


def decode_step_bytes(cfg: LlamaConfig, params: Dict[str, Any],
                      batch: int, ctx: int, page_size: int) -> float:
    """Minimum HBM traffic of ONE batched decode step (the SoL
    denominator): every layer weight + the lm_head read once; per
    sequence, the INT8 K/V of `ctx` cached positions read (page
    granularity — the paged kernel DMAs whole pages) + one position
    written. The embedding table contributes only a B-row gather
    (negligible) and is excluded."""
    weight_bytes = _leaf_bytes(params["layers"]) + _leaf_bytes(
        params["lm_head"]) + _leaf_bytes(params["final_norm"])
    pages = -(-ctx // page_size)
    kv_read = (cfg.num_layers * 2 * pages * page_size
               * cfg.num_kv_heads * cfg.hd)  # int8: 1 byte/el
    kv_write = cfg.num_layers * 2 * cfg.num_kv_heads * cfg.hd
    return float(weight_bytes + batch * (kv_read + kv_write))


def run_decode_bench(cfg: LlamaConfig, params: Dict[str, Any], *,
                     batch: int = 8, prompt_len: int = 512,
                     max_new: int = 64, chunk: int = 16,
                     page_size: int = 128, num_pages: int | None = None,
                     hbm_gbps: float | None = None,
                     async_dispatch: bool = False) -> Dict[str, Any]:
    """Measure continuous-batching decode tok/s at one batch size.

    All prompts are equal-length with equal budgets so the batch stays
    full for the whole measured window (throughput at THIS batch size,
    not a drain tail). The first engine step carries admissions + the
    compile; measurement starts after it, on a host-synced boundary
    (the fused loop's np.asarray is the per-step sync)."""
    from quantizedmha_tpu.profiling.roofline import detect_chip

    # Page pool sized to the workload (one 8B page is 8.4 MB across the
    # 32 layers — an oversized pool burns HBM the weights need).
    mpps = -(-(prompt_len + max_new + chunk + 1) // page_size)
    if num_pages is None:
        num_pages = batch * mpps + 2  # + scrap page + slack
    ecfg = EngineConfig(
        num_pages=num_pages, page_size=page_size, max_batch=batch,
        prefill_buckets=(prompt_len,), max_new_tokens=max_new,
        max_pages_per_seq=mpps, decode_chunk=chunk,
        async_dispatch=async_dispatch,
    )
    eng = Engine(cfg, params, ecfg)
    rng = np.random.default_rng(0)
    for _ in range(batch):
        eng.add_request(
            rng.integers(1, cfg.vocab_size, prompt_len).tolist(),
            max_new=max_new)

    t0 = time.perf_counter()
    eng.step()  # admissions (B prefills) + first fused decode chunk
    # async_dispatch: the first step only ENQUEUES chunk 1; step again so
    # the measured window starts at a collected-chunk boundary in both
    # modes (same counters, same sync-edge semantics).
    while (eng.metrics.counter("tokens_generated") == 0
           and (eng.active or eng.prefilling)):
        eng.step()
    t_first = time.perf_counter() - t0

    toks0 = eng.metrics.counter("tokens_generated")
    steps0 = eng.metrics.counter("decode_steps")
    t0 = time.perf_counter()
    eng.run()
    dt = time.perf_counter() - t0
    toks = eng.metrics.counter("tokens_generated") - toks0
    steps = eng.metrics.counter("decode_steps") - steps0

    # Warm TTFT: with programs compiled and the engine drained, time one
    # fresh request from admission to its first visible token (prefill +
    # first fused chunk + host turnaround — what a user waits at low
    # load). first_step_s above is the COLD version of the same edge and
    # is dominated by compile; both are reported (VERDICT r4 weak #6: the
    # 66s first step was invisible in the headline metrics).
    toks_before = eng.metrics.counter("tokens_generated")
    t1 = time.perf_counter()
    eng.add_request(
        rng.integers(1, cfg.vocab_size, prompt_len).tolist(),
        max_new=max_new)
    while (eng.metrics.counter("tokens_generated") == toks_before
           and (eng.queue or eng.active or eng.prefilling)):
        eng.step()
    ttft_warm = time.perf_counter() - t1
    eng.run()  # drain the TTFT request before reporting

    toks_per_s = toks / dt
    ms_per_step = dt * 1e3 / max(steps, 1)
    # SoL at the mean context of the measured window.
    ctx_mid = prompt_len + chunk + (max_new - chunk) // 2
    step_bytes = decode_step_bytes(cfg, params, batch, ctx_mid, page_size)
    bw = (hbm_gbps if hbm_gbps is not None else detect_chip().hbm_gbps) * 1e9
    sol_ms = step_bytes / bw * 1e3
    return {
        "batch": batch,
        "prompt_len": prompt_len,
        "max_new": max_new,
        "decode_chunk": chunk,
        "async_dispatch": async_dispatch,
        "decode_toks_per_s": round(toks_per_s, 1),
        "decode_ms_per_step": round(ms_per_step, 3),
        "decode_ms_per_tok": round(ms_per_step / batch, 3),
        "hbm_bytes_per_step": step_bytes,
        "hbm_bytes_per_tok": round(step_bytes / batch),
        "decode_sol_ms_per_step": round(sol_ms, 3),
        "decode_pct_hbm_sol": round(100.0 * sol_ms / ms_per_step, 1),
        "first_step_s": round(t_first, 1),
        "ttft_warm_s": round(ttft_warm, 3),
        "measured_tokens": int(toks),
    }


def model_matmul_params(cfg: LlamaConfig) -> float:
    """Parameter count of the per-token matmuls (layers + lm_head):
    the 2*P*tokens FLOP denominator for prefill."""
    hd = cfg.hd
    per_layer = (
        cfg.hidden_size * cfg.num_heads * hd          # wq
        + 2 * cfg.hidden_size * cfg.num_kv_heads * hd  # wk, wv
        + cfg.num_heads * hd * cfg.hidden_size         # wo
        + 3 * cfg.hidden_size * cfg.intermediate_size  # gate, up, down
    )
    return float(cfg.num_layers * per_layer
                 + cfg.hidden_size * cfg.vocab_size)   # lm_head


def run_prefill_bench(cfg: LlamaConfig, params: Dict[str, Any], *,
                      prompt_len: int = 2048) -> Dict[str, Any]:
    """Prefill TFLOP/s vs MXU SoL (w8a16: matmuls execute in bf16)."""
    import functools

    from quantizedmha_tpu.harness.timing import benchmark
    from quantizedmha_tpu.profiling.roofline import (
        attention_flops,
        detect_chip,
        roofline,
    )
    from quantizedmha_tpu.serving import llama_adapter

    prefill = jax.jit(functools.partial(llama_adapter.prefill_at, cfg))
    toks = jnp.asarray(
        np.random.default_rng(0).integers(1, cfg.vocab_size,
                                          (1, prompt_len)), jnp.int32)
    t = benchmark(prefill, params, toks, jnp.int32(prompt_len - 1),
                  warmup=2, runs=8, repeats=3)
    flops = (2.0 * model_matmul_params(cfg) * prompt_len
             + attention_flops(1, cfg.num_heads, prompt_len, prompt_len,
                               cfg.hd, causal=True))
    rl = roofline(t.median_s, flops, 0, dtype="bf16", chip=detect_chip())
    return {
        "prefill_len": prompt_len,
        "prefill_ms": round(t.median_ms, 2),
        "prefill_tflops": round(rl.tflops_achieved, 1),
        "prefill_pct_mxu_sol": round(rl.pct_of_compute_sol, 1),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", action="store_true",
                    help="print ONE JSON line (bench.py subprocess mode)")
    ap.add_argument("--batch", type=int, nargs="+", default=[8])
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--async-dispatch", action="store_true",
                    help="depth-1 pipelined chunk dispatch (see "
                         "EngineConfig.async_dispatch)")
    ap.add_argument("--prefill", action="store_true",
                    help="also measure prefill TFLOP/s at 2048 tokens")
    ap.add_argument("--layers", type=int, default=None,
                    help="override num_layers (scaled-down debugging)")
    ap.add_argument("--weight-bits", type=int, choices=(4, 8), default=8,
                    help="layer-matmul weight precision (8: per-channel "
                         "w8a16; 4: group-128 w4a16 — halves weight HBM)")
    ap.add_argument("--lm-head-bits", type=int, choices=(8,), default=None,
                    help="quantize the output projection to int8 "
                         "per-channel (off: bf16)")
    ap.add_argument("--packing", choices=("halves", "pairs"),
                    default="halves",
                    help="int4 nibble layout (halves: free activation "
                         "split, single-chip default; pairs: TP-shardable)")
    ap.add_argument("--no-fuse-proj", action="store_true",
                    help="keep wq/wk/wv and w_gate/w_up as separate "
                         "kernel launches (A/B control; w4 fuses by "
                         "default — run43b)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    cfg = LlamaConfig.llama3_8b()
    cfg = dataclasses_replace(cfg, attention_impl="flash_int8")
    if args.layers:
        cfg = dataclasses_replace(cfg, num_layers=args.layers)
    t0 = time.perf_counter()
    params = device_init_quant_params(cfg, bits=args.weight_bits,
                                      lm_head_bits=args.lm_head_bits,
                                      packing=args.packing)
    if args.weight_bits == 4 and not args.no_fuse_proj:
        from quantizedmha_tpu.quant.weights import fuse_w4_projections
        params = dict(params,
                      layers=fuse_w4_projections(params["layers"]))
    gib = _leaf_bytes(params) / 2**30
    if not args.json:
        print(f"params on device: {gib:.2f} GiB in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

    name = f"llama3-8b-shape-int{args.weight_bits}"
    if args.lm_head_bits:
        name += f"-lmh{args.lm_head_bits}"
    out = {"model": name, "params_gib": round(gib, 2), "sweep": []}
    for b in args.batch:
        row = run_decode_bench(cfg, params, batch=b,
                               prompt_len=args.prompt_len,
                               max_new=args.max_new, chunk=args.chunk,
                               async_dispatch=args.async_dispatch)
        out["sweep"].append(row)
        if not args.json:
            print(json.dumps(row), flush=True)
    if args.prefill:
        out["prefill"] = run_prefill_bench(cfg, params)
        if not args.json:
            print(json.dumps(out["prefill"]), flush=True)
    if args.json:
        print(json.dumps(out), flush=True)


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


if __name__ == "__main__":
    main()
