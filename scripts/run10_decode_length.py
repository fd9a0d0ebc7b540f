#!/usr/bin/env python
"""Run 10 — decode cost must scale with TRUE context length, not table size.

VERDICT round-1 weak #2: pl.when skipped only the compute; the BlockSpec
index map still DMA'd every page in the (fixed-size) block table, so
decode cost scaled with max_pages. The fix clamps the index map so
out-of-context steps re-reference an adjacent needed page (Pallas elides
repeated-block copies). This script measures both variants at a fixed
max_pages=256 table with live lengths {1K, 8K, 32K}, one process,
interleaved.
"""

import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import quantizedmha_tpu.ops.decode as dec

PAGE = 128
MAX_PAGES = 256          # table spans 32K positions
BATCH, KVH, GROUP, HD = 2, 4, 4, 128
LENGTHS = [1024, 8192, 32768]


def make_fn():
    return jax.jit(lambda q, kp, vp, ks, vs, L, T: dec.paged_decode_attention(
        q, kp, vp, ks, vs, L, T))


class unclamped_maps:
    """Monkeypatch the index-map factory for the DURATION OF TRACING —
    jit traces at first call, so the patch must wrap the warm-up calls,
    not the jit construction (first version of this script got that wrong
    and measured the clamped kernel twice)."""

    def __enter__(self):
        self._real = dec._make_clamped_page_idx
        dec._make_clamped_page_idx = (
            lambda page_size, window, sinks:
            lambda b, h, i, L, T: (h, T[b, i], 0, 0))

    def __exit__(self, *exc):
        dec._make_clamped_page_idx = self._real


def main():
    rng = np.random.default_rng(0)
    n_pages_total = BATCH * MAX_PAGES + 1
    k_pages = jnp.asarray(
        rng.integers(-127, 128, (KVH, n_pages_total, PAGE, HD)), jnp.int8)
    v_pages = jnp.asarray(
        rng.integers(-127, 128, (KVH, n_pages_total, PAGE, HD)), jnp.int8)
    k_scales = jnp.asarray(rng.uniform(0.001, 0.01, (KVH, n_pages_total)), jnp.float32)
    v_scales = jnp.asarray(rng.uniform(0.001, 0.01, (KVH, n_pages_total)), jnp.float32)
    tables = jnp.asarray(
        np.arange(BATCH * MAX_PAGES).reshape(BATCH, MAX_PAGES) + 1, jnp.int32)
    q = jnp.asarray(rng.normal(0, 0.5, (BATCH, KVH * GROUP, HD)), jnp.float32)
    print("data on device", flush=True)

    fns = {"clamped": make_fn(), "unclamped": make_fn()}

    def sync(o):
        np.asarray(o[0, 0, 0])

    def batch(fn, L, n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(q, k_pages, v_pages, k_scales, v_scales, L, tables)
        sync(o)
        return time.perf_counter() - t0

    Ls = {ln: jnp.full((BATCH,), ln, jnp.int32) for ln in LENGTHS}
    for name, fn in fns.items():
        import contextlib
        ctx = unclamped_maps() if name == "unclamped" else contextlib.nullcontext()
        with ctx:
            for L in Ls.values():
                t0 = time.perf_counter()
                sync(fn(q, k_pages, v_pages, k_scales, v_scales, L, tables))
                print(f"warm {name}: {time.perf_counter()-t0:.1f}s", flush=True)

    # shared pacing from the slowest case (unclamped @32K)
    t_est = batch(fns["unclamped"], Ls[32768], 8) / 8
    k1, k2 = 2, min(max(8, int(0.15 / max(t_est, 1e-5))), 512)
    res = {}
    t1s = {(n, ln): [] for n in fns for ln in LENGTHS}
    t2s = {(n, ln): [] for n in fns for ln in LENGTHS}
    for _ in range(5):
        for name, fn in fns.items():
            for ln in LENGTHS:
                t1s[(name, ln)].append(batch(fn, Ls[ln], k1))
                t2s[(name, ln)].append(batch(fn, Ls[ln], k2))
    print(f"page={PAGE} max_pages={MAX_PAGES} batch={BATCH} kvh={KVH} "
          f"group={GROUP} hd={HD}  (k1={k1}, k2={k2})")
    print(f"{'length':>8} | {'clamped ms':>11} | {'unclamped ms':>13}")
    for ln in LENGTHS:
        row = []
        for name in ("clamped", "unclamped"):
            est = (min(t2s[(name, ln)]) - min(t1s[(name, ln)])) / (k2 - k1)
            res[(name, ln)] = est * 1e3
            row.append(f"{est * 1e3:11.3f}")
        print(f"{ln:>8} | {row[0]} | {row[1]}")

    # outputs identical (clamping only changes traffic, never data)
    a = fns["clamped"](q, k_pages, v_pages, k_scales, v_scales, Ls[8192], tables)
    b = fns["unclamped"](q, k_pages, v_pages, k_scales, v_scales, Ls[8192], tables)
    print("outputs identical:", bool(jnp.all(a == b)))


if __name__ == "__main__":
    main()
