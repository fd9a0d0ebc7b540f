#!/usr/bin/env python
"""run53 — bisect the run17-r5 mixed-parity break.

run17's parity leg (mixed engine, boundary >= context, must equal the
plain int8 engine's streams) went false this round. Suspects: the
head-folded decode kernel (plain engine path; chip-verified bitwise at
d=128/page=128 but not at run17's d=64/page=64/group=2 + residuals), and
the plane-RMW append rewrite (plain engine path only — mixed keeps the
per-lane appends). Drive the SAME workload four ways in one process and
diff streams pairwise.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.models.llama import LlamaConfig, init_params  # noqa: E402
from quantizedmha_tpu.serving import llama_adapter  # noqa: E402
from quantizedmha_tpu.serving.engine import Engine, EngineConfig  # noqa: E402

PAGE = 64
N_PROMPT, N_NEW, BATCH = 448, 64, 8


def drive(cfg, params, mixed, boundary=256):
    ecfg = EngineConfig(
        num_pages=512, page_size=PAGE, max_batch=BATCH,
        prefill_buckets=(512,), max_new_tokens=N_NEW, max_pages_per_seq=16,
        mixed_kv=({"boundary_tokens": boundary, "int8_pages": 256,
                   "int4_pages": 256} if mixed else None),
    )
    eng = Engine(cfg, params, ecfg)
    rng = np.random.default_rng(0)
    for _ in range(BATCH):
        eng.add_request(list(rng.integers(1, 32000, N_PROMPT)),
                        max_new=N_NEW)
    return eng.run()


def main():
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=1024, intermediate_size=2816,
        num_layers=8, num_heads=16, num_kv_heads=8, dtype=jnp.bfloat16,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))

    plain_fold = drive(cfg, params, mixed=False)
    llama_adapter.FOLD_KV_HEADS = False
    plain_nofold = drive(cfg, params, mixed=False)
    llama_adapter.FOLD_KV_HEADS = True
    mixed_parity = drive(cfg, params, mixed=True, boundary=512)

    def first_diff(a, b):
        for rid in sorted(a):
            if a[rid] != b[rid]:
                x, y = a[rid], b[rid]
                for i, (p, q) in enumerate(zip(x, y)):
                    if p != q:
                        return f"rid {rid} pos {i}: {p} vs {q}"
                return f"rid {rid} length {len(x)} vs {len(y)}"
        return None

    print(json.dumps({
        "fold_vs_nofold": first_diff(plain_fold, plain_nofold),
        "fold_vs_mixedparity": first_diff(plain_fold, mixed_parity),
        "nofold_vs_mixedparity": first_diff(plain_nofold, mixed_parity),
    }), flush=True)


if __name__ == "__main__":
    main()
