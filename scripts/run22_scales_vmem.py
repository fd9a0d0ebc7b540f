#!/usr/bin/env python
"""Run 22 — paged-decode scales: SMEM -> whole-table VMEM A/B.

The run17-r3 re-run exposed a scaling wall: SMEM words cost ~32 B each on
this target, so per-(head, page) scale tables blow the 1 MiB SMEM budget
at ~1.5K pool pages (mixed decode at 256+256 pages compiled to "Used
2.00M of 1.00M smem"). The fix moves the paged kernels' scales to a
whole-table VMEM operand read by dynamic-sublane slice + an iota-select
over the head lanes (Mosaic has neither dynamic lane indexing nor 1-wide
lane blocks).

This script (a) compiles the mixed decode at a PRODUCTION pool size that
the SMEM design could never hold, (b) A/Bs the new read path against the
old SMEM kernel (loaded from git) on the serving-shape int8 decode, in
one process, interleaved.
"""

import importlib.util
import json
import subprocess
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.harness.timing import benchmark


def load_old_decode():
    """ops/decode.py as of the last SMEM-scales commit, loaded side-by-side."""
    src = subprocess.run(
        ["git", "show", "ef0140f:quantizedmha_tpu/ops/decode.py"],
        capture_output=True, text=True, cwd="/root/repo", check=True).stdout
    f = tempfile.NamedTemporaryFile(
        "w", suffix="_old_decode.py", delete=False)
    f.write(src)
    f.close()
    spec = importlib.util.spec_from_file_location("old_decode", f.name)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from quantizedmha_tpu.ops import decode as new_decode
    old = load_old_decode()

    # Serving-ish shape: 8 kv heads x GQA 4, d=128, 2K-page pool (the SMEM
    # design capped out ~1.5K pages across the mixed kernels; a single
    # int8 kernel at 2K pages was ~64 KB nominal -> ~2 MB padded, so this
    # size is ALSO past the old single-kernel wall at 4096+).
    B, Hkv, G, D, PS, NP, MP = 4, 8, 4, 128, 128, 2048, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 0.5, (B, Hkv * G, D)), jnp.float32)
    kp = jnp.asarray(rng.integers(-127, 128, (Hkv, NP, PS, D)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, (Hkv, NP, PS, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(1e-3, 2e-3, (Hkv, NP)), jnp.float32)
    vs = jnp.asarray(rng.uniform(1e-3, 2e-3, (Hkv, NP)), jnp.float32)
    lengths = jnp.full((B,), MP * PS - 3, jnp.int32)
    tables = jnp.asarray(
        rng.permutation(NP - 1)[: B * MP].reshape(B, MP) + 1, jnp.int32)

    new_fn = jax.jit(lambda *a: new_decode.paged_decode_attention(*a))
    old_fn = jax.jit(lambda *a: old.paged_decode_attention(*a))
    args = (q, kp, vp, ks, vs, lengths, tables)

    o_new = np.asarray(new_fn(*args))
    o_old = np.asarray(old_fn(*args))
    bitwise = bool((o_new == o_old).all())
    max_abs = float(np.abs(o_new - o_old).max())

    rounds_new, rounds_old = [], []
    for _ in range(3):  # interleaved A/B
        rounds_new.append(benchmark(new_fn, *args, warmup=1, runs=16,
                                    repeats=3).median_ms)
        rounds_old.append(benchmark(old_fn, *args, warmup=1, runs=16,
                                    repeats=3).median_ms)

    print(json.dumps({
        "shape": {"B": B, "Hkv": Hkv, "G": G, "D": D, "page": PS,
                  "pool_pages": NP, "ctx": int(MP * PS - 3)},
        "vmem_scales_ms": rounds_new,
        "smem_scales_ms": rounds_old,
        "bitwise_equal": bitwise,
        "max_abs_delta": max_abs,
    }))


if __name__ == "__main__":
    main()
