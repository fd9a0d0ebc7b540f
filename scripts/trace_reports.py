#!/usr/bin/env python
"""Commit-grade xprof trace summaries for the decode and ring paths.

VERDICT round-1 item 10 ("fatten the measured corpus") asks for per-op
xprof breakdowns beyond the headline kernel — the reference committed an
NCU table per profiled kernel (e.g. /root/reference/profiles/md/run7/
ncu_details.md). This script captures and summarizes:

  --case decode   paged INT8 GQA decode on the real chip (run10's shape:
                  page=128, max_pages=256 table, live 8K context)
                  -> profiles/reports/decode_trace_summary.md
  --case ring     ring attention over an 8-device virtual CPU mesh
                  (ppermute overlap visible in the op table; plane is the
                  host CPU — noted in the artifact)
                  -> profiles/reports/ring_trace_summary.md

Run decode ONLY when no other chip job is live (CLAUDE.md).
"""

import argparse
import os
import pathlib
import sys


def _decode_case():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from quantizedmha_tpu.ops.decode import paged_decode_attention
    from quantizedmha_tpu.profiling import trace as tr
    from quantizedmha_tpu.profiling.trace_summary import summarize_trace

    PAGE, MAX_PAGES = 128, 256
    BATCH, KVH, GROUP, HD = 2, 4, 4, 128
    LIVE = 8192

    rng = np.random.default_rng(0)
    n_pages_total = BATCH * MAX_PAGES + 1
    k_pages = jnp.asarray(
        rng.integers(-127, 128, (KVH, n_pages_total, PAGE, HD)), jnp.int8)
    v_pages = jnp.asarray(
        rng.integers(-127, 128, (KVH, n_pages_total, PAGE, HD)), jnp.int8)
    k_scales = jnp.asarray(
        rng.uniform(0.001, 0.01, (KVH, n_pages_total)), jnp.float32)
    v_scales = jnp.asarray(
        rng.uniform(0.001, 0.01, (KVH, n_pages_total)), jnp.float32)
    tables = jnp.asarray(
        np.arange(BATCH * MAX_PAGES).reshape(BATCH, MAX_PAGES) + 1, jnp.int32)
    q = jnp.asarray(rng.normal(0, 0.5, (BATCH, KVH * GROUP, HD)), jnp.float32)
    lengths = jnp.full((BATCH,), LIVE, jnp.int32)

    fn = jax.jit(lambda *a: paged_decode_attention(*a))
    trace_dir = "/tmp/decode_trace"
    cap = tr.capture(fn, q, k_pages, v_pages, k_scales, v_scales, lengths,
                     tables, trace_dir=trace_dir, iters=8, warmup=3)
    s = summarize_trace(trace_dir)
    md = s.to_markdown(top=15)
    md += (
        f"\n\n(workload: paged INT8 GQA decode, batch={BATCH} kvh={KVH} "
        f"group={GROUP} d={HD}, page={PAGE}, max_pages={MAX_PAGES} table, "
        f"live context {LIVE}; {cap.iters} iters, "
        f"{cap.per_iter_ms:.3f} ms/iter wall on v5e)\n"
    )
    pathlib.Path("profiles/reports/decode_trace_summary.md").write_text(md)
    print(md)


def _ring_case():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import functools

    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from quantizedmha_tpu.parallel.ring import ring_attention
    from quantizedmha_tpu.profiling import trace as tr
    from quantizedmha_tpu.profiling.trace_summary import summarize_trace

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("cp",))
    rng = np.random.default_rng(0)
    B, H, S, D = 1, 4, 4096, 64
    q, k, v = (rng.normal(0, 0.5, (B, H, S, D)).astype(np.float32)
               for _ in range(3))

    fn = jax.jit(jax.shard_map(
        functools.partial(ring_attention, axis_name="cp", causal=True),
        mesh=mesh,
        in_specs=(P(None, None, "cp", None),) * 3,
        out_specs=P(None, None, "cp", None),
        check_vma=False,
    ))
    trace_dir = "/tmp/ring_trace"
    cap = tr.capture(fn, q, k, v, trace_dir=trace_dir, iters=4, warmup=2)
    s = summarize_trace(trace_dir)
    md = s.to_markdown(top=15)
    md += (
        f"\n\n(workload: causal ring attention, B={B} H={H} S={S} D={D} "
        f"sharded over an 8-device VIRTUAL CPU mesh — collective/compute "
        f"structure is representative, absolute times are host times; "
        f"{cap.iters} iters, {cap.per_iter_ms:.3f} ms/iter wall)\n"
    )
    pathlib.Path("profiles/reports/ring_trace_summary.md").write_text(md)
    print(md)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", choices=["decode", "ring"], required=True)
    args = ap.parse_args()
    if args.case == "decode":
        _decode_case()
    else:
        _ring_case()


if __name__ == "__main__":
    sys.exit(main())
