#!/usr/bin/env python
"""run23 — per-op xprof decomposition of the MODEL-LEVEL fused decode chunk.

run18 measured the Llama-8B-shape continuous-batching decode at 46-54% of
HBM speed-of-light (batch 8/4) and attributed the gap to "non-matmul
per-step work" by subtraction. This script replaces the subtraction with a
trace: capture one fused decode chunk (16 steps, one dispatch, the
production Engine._decode_loop) on the real chip and roll the per-op table
up into {weight matmuls, attention kernel, norms/rope/elementwise,
sampling, copies} so the gap has names.

The reference's analog is its NCU per-kernel tables
(/root/reference/profiles/md/run7/ncu_details.md) — but at model level,
which the reference never profiled.

Chip job — run only when no other chip work is live (CLAUDE.md).
Output: profiles/reports/decode_step_trace_summary.md
"""

import pathlib
import re
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.harness.serving_bench import (  # noqa: E402
    dataclasses_replace,
    decode_step_bytes,
    device_init_int8_params,
)
from quantizedmha_tpu.models.llama import LlamaConfig  # noqa: E402
from quantizedmha_tpu.profiling.roofline import detect_chip  # noqa: E402
from quantizedmha_tpu.profiling.trace_summary import summarize_trace  # noqa: E402
from quantizedmha_tpu.serving.engine import Engine, EngineConfig  # noqa: E402

BATCH, PROMPT, MAX_NEW, CHUNK, PAGE = 8, 256, 96, 16, 128


def classify(op_name: str) -> str:
    """Bucket an XLA/Mosaic LEAF op by its role in the decode step.
    Returns None for container ops (while/call wrappers) whose time is the
    SUM of their children — counting them double-counts the step."""
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
    params = device_init_int8_params(cfg)
    print(f"params on device in {time.perf_counter() - t0:.0f}s", flush=True)

    mpps = -(-(PROMPT + MAX_NEW + CHUNK + 1) // PAGE)
    ecfg = EngineConfig(
        num_pages=BATCH * mpps + 2, page_size=PAGE, max_batch=BATCH,
        prefill_buckets=(PROMPT,), max_new_tokens=MAX_NEW,
        max_pages_per_seq=mpps, decode_chunk=CHUNK,
    )
    eng = Engine(cfg, params, ecfg)
    rng = np.random.default_rng(0)
    for _ in range(BATCH):
        eng.add_request(
            rng.integers(1, cfg.vocab_size, PROMPT).tolist(), max_new=MAX_NEW)

    # Admissions + prefills + first fused decode chunk: compiles everything.
    while not eng.active or eng.prefilling or eng.queue:
        eng.step()
    eng.step()  # one steady-state decode chunk, warm
    print("steady state reached; tracing one fused chunk", flush=True)

    trace_dir = "/tmp/decode_step_trace"
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        eng.step()  # one fused chunk: CHUNK decode steps, one host sync
    wall = time.perf_counter() - t0

    s = summarize_trace(trace_dir)
    md = s.to_markdown(top=25)

    # Rollup by role, normalized per decode STEP (the chunk is CHUNK
    # steps). Container ops (while wrappers) are EXCLUDED — their time is
    # the sum of their children; the outermost while is the denominator.
    groups = {}
    outer_ms = max((op.total_ms for op in s.ops
                    if op.name.lower().startswith("%while")), default=0.0)
    for op in s.ops:
        g = classify(op.name)
        if g is None:
            continue
        groups[g] = groups.get(g, 0.0) + op.total_ms
    ctx = PROMPT + CHUNK * 2  # live context at the traced chunk
    step_bytes = decode_step_bytes(cfg, params, BATCH, ctx, PAGE)
    chip = detect_chip()
    sol_ms = step_bytes / (chip.hbm_gbps * 1e9) * 1e3

    lines = [
        "", "",
        "## Rollup per decode step (chunk of "
        f"{CHUNK} steps; device-op ms / {CHUNK})",
        "",
        "| role | ms/step | % of device time | x of HBM SoL |",
        "|---|---|---|---|",
    ]
    for g, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
        per_step = ms / CHUNK
        lines.append(
            f"| {g} | {per_step:.3f} | {100 * ms / s.total_ms:.1f} | "
            f"{per_step / sol_ms:.2f} |")
    lines += [
        "",
        f"(workload: llama3-8B-shape int8 w8a16, batch={BATCH}, "
        f"prompt={PROMPT}, chunk={CHUNK}, page={PAGE}, live ctx ~{ctx}; "
        f"one fused chunk = {wall * 1e3:.1f} ms wall incl. host; "
        f"outer while = {outer_ms:.1f} ms -> "
        f"{outer_ms / CHUNK:.2f} ms/step device; "
        f"HBM SoL floor {sol_ms:.2f} ms/step on {chip.name})",
    ]
    out = md + "\n".join(lines) + "\n"
    pathlib.Path("profiles/reports/decode_step_trace_summary.md").write_text(out)
    print(out)


if __name__ == "__main__":
    main()
