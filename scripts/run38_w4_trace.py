#!/usr/bin/env python
"""run38 — xprof of the W4A16 decode steady state (why is end-to-end 0.77x of w8 when per-matmul wins 1.2-1.35x? suspect: scan slice of stacked packed weights materializes a dense copy per layer for each pallas operand).

run32 left batch 8 at 65.9% of HBM SoL (15.25 ms/step vs the 10.06 ms
floor). This traces TWO steady-state engine steps (each = enqueue chunk
N+1 + sync chunk N; chunk 32, async_dispatch, stacked carry) and rolls
the per-op table up per decode step so the remaining ~5 ms/step has
names. Successor to run23 (which traced the chunk-16 SYNC loop before
the round-4 changes).

Chip job — run only when no other chip work is live (CLAUDE.md).
Output: profiles/reports/decode_w4_fixed_trace_summary.md
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
from quantizedmha_tpu.serving.engine import Engine, EngineConfig  # noqa: E402

BATCH, PROMPT, MAX_NEW, CHUNK, PAGE = 8, 256, 160, 32, 128
TRACE_STEPS = 2


def classify(op_name: str) -> str:
    n = op_name.lower()
    if n.startswith("%while") or n.startswith("%call") or (
            n.startswith("%conditional")):
        return None
    if ("closed_call" in n or "custom-call" in n or "tpu_custom_call" in n
            or "_lambda_" in n):
        return "attention kernel (paged int8)"
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

    trace_dir = "/tmp/decode_w4_trace_fixed"
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(TRACE_STEPS):
            eng.step()
    wall = time.perf_counter() - t0
    steps = TRACE_STEPS * CHUNK

    s = summarize_trace(trace_dir)
    md = s.to_markdown(top=25)

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
        f"(workload: llama3-8B-shape int4 w4a16+lmh8, batch={BATCH}, "
        f"prompt={PROMPT}, chunk={CHUNK}, async, page={PAGE}, live ctx "
        f"~{ctx}; {TRACE_STEPS} steps = {wall * 1e3:.1f} ms wall; outer "
        f"while sum = {outer_ms:.1f} ms -> {outer_ms / steps:.2f} ms/step "
        f"device; HBM SoL floor {sol_ms:.2f} ms/step on {chip.name})",
    ]
    out = md + "\n".join(lines) + "\n"
    pathlib.Path(
        "profiles/reports/decode_w4_fixed_trace_summary.md").write_text(out)
    print(out)


if __name__ == "__main__":
    main()
