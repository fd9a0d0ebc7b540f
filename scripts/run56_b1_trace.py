#!/usr/bin/env python
"""run56 — xprof decomposition of the BATCH-1 w4a16+lmh8 decode step.

run55 left batch-1 at 8.8 ms/step vs its 5.2 ms weight floor (59.1% of
HBM SoL; the round-5 target was 65%). The w4 kernels' ~1.38x practice
gap accounts for ~1.7 ms; ~1.4 ms is unexplained (sampling? dispatch?
copies?). This names it. Two steady-state async steps, w4 fused halves
weights + hfold decode, batch 1.

Chip job — run only when no other chip work is live.
Output: profiles/reports/decode_b1_trace_summary.md
"""

import pathlib
import re
import time

import jax
import jax.numpy as jnp  # noqa: F401
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.harness.serving_bench import (  # noqa: E402
    dataclasses_replace,
    decode_step_bytes,
    device_init_quant_params,
)
from quantizedmha_tpu.models.llama import LlamaConfig  # noqa: E402
from quantizedmha_tpu.profiling.roofline import detect_chip  # noqa: E402
from quantizedmha_tpu.profiling.trace_summary import summarize_trace  # noqa: E402
from quantizedmha_tpu.quant.weights import fuse_w4_projections  # noqa: E402
from quantizedmha_tpu.serving.engine import Engine, EngineConfig  # noqa: E402

BATCH, PROMPT, MAX_NEW, CHUNK, PAGE = 1, 256, 160, 32, 128
TRACE_STEPS = 2


def classify(op_name: str) -> str:
    n = op_name.lower()
    if n.startswith("%while") or n.startswith("%call") or (
            n.startswith("%conditional")):
        return None
    if ("closed_call" in n or "custom-call" in n or "tpu_custom_call" in n
            or "_lambda_" in n):
        return "pallas kernels (w4 matmul + paged attention)"
    if "dynamic-update-slice" in n or "dynamic_update" in n or "scatter" in n:
        return "KV-cache writes"
    if re.search(r"fusion|convolution|\bdot\b|matmul", n):
        return "matmuls + fused elementwise"
    if "copy" in n or "bitcast" in n or "transpose" in n or "reshape" in n:
        return "copies/layout"
    if "rng" in n or "sort" in n or "iota" in n or "reduce" in n:
        return "sampling/reductions"
    return "other"


def main():
    cfg = dataclasses_replace(
        LlamaConfig.llama3_8b(), attention_impl="flash_int8")
    t0 = time.perf_counter()
    params = device_init_quant_params(cfg, bits=4, lm_head_bits=8)
    params = dict(params, layers=fuse_w4_projections(params["layers"]))
    print(f"params on device in {time.perf_counter() - t0:.0f}s", flush=True)

    mpps = -(-(PROMPT + MAX_NEW + 2 * CHUNK + 1) // PAGE)
    ecfg = EngineConfig(
        num_pages=BATCH * mpps + 2, page_size=PAGE, max_batch=BATCH,
        prefill_buckets=(PROMPT,), max_new_tokens=MAX_NEW,
        max_pages_per_seq=mpps, decode_chunk=CHUNK, async_dispatch=True,
    )
    eng = Engine(cfg, params, ecfg)
    rng = np.random.default_rng(0)
    for _ in range(BATCH):
        eng.add_request(
            rng.integers(1, cfg.vocab_size, PROMPT).tolist(), max_new=MAX_NEW)

    while not eng.active or eng.prefilling or eng.queue:
        eng.step()
    eng.step()  # steady state: one chunk in flight, warm programs
    print("steady state reached; tracing", TRACE_STEPS, "steps", flush=True)

    trace_dir = "/tmp/decode_b1_trace"
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(TRACE_STEPS):
            eng.step()
    wall = time.perf_counter() - t0
    steps = TRACE_STEPS * CHUNK

    s = summarize_trace(trace_dir)
    md = s.to_markdown(top=30)

    groups = {}
    outer_ms = sum(op.total_ms for op in s.ops
                   if op.name.lower().startswith("%while"))
    for op in s.ops:
        g = classify(op.name)
        if g is None:
            continue
        groups[g] = groups.get(g, 0.0) + op.total_ms
    ctx = PROMPT + 3 * CHUNK
    step_bytes = decode_step_bytes(cfg, params, BATCH, ctx, PAGE)
    chip = detect_chip()
    sol_ms = step_bytes / (chip.hbm_gbps * 1e9) * 1e3

    lines = [
        "", "",
        f"## Rollup per decode step ({TRACE_STEPS} async steps x "
        f"{CHUNK}-step chunks; device-op ms / {steps})",
        "",
        "| role | ms/step | % of device time | x of HBM SoL |",
        "|---|---|---|---|",
    ]
    for g, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
        per_step = ms / steps
        lines.append(
            f"| {g} | {per_step:.3f} | {100 * ms / s.total_ms:.1f} | "
            f"{per_step / sol_ms:.2f} |")
    lines += [
        "",
        f"(workload: llama3-8B-shape w4a16+lmh8 FUSED qkv/gateup + hfold "
        f"attention, batch={BATCH}, prompt={PROMPT}, chunk={CHUNK}, "
        f"async, page={PAGE}, live ctx ~{ctx}; {TRACE_STEPS} steps = "
        f"{wall * 1e3:.1f} ms wall; outer while sum = {outer_ms:.1f} ms "
        f"-> {outer_ms / steps:.2f} ms/step device; HBM SoL floor "
        f"{sol_ms:.2f} ms/step on {chip.name})",
    ]
    out = md + "\n".join(lines) + "\n"
    pathlib.Path(
        "profiles/reports/decode_b1_trace_summary.md").write_text(out)
    print(out)


if __name__ == "__main__":
    main()
