"""Run 16 — decode-latency jitter: blocking vs interleaved chunked prefill.

Measures what EngineConfig.interleaved_prefill actually buys: the max
per-engine-step wall time seen by ACTIVE sequences while a long prompt is
being admitted. Blocking admission runs every prefill chunk inside one
step (worst-case decode gap = whole-prompt prefill); interleaved runs one
chunk per step (gap bounded at one chunk + one decode).

Method: a short request decodes continuously; a long prompt (several
chunks) arrives; we time every engine.step() host-side (each step ends in
a host sync — the sampled token crosses to the host — so perf_counter
brackets real work). Report the max and median step time during the
admission window for both modes; token parity is asserted on the fly.

Chip-state variance on the tunneled v5e is one-sided +8-30% across
processes (memory: tpu-bench-variance): both modes run in THIS process,
interleaved measured twice (first+last, bracketing blocking against
drift), and the headline reduction uses the WORSE interleaved run — the
conservative side of any drift; both runs are printed.

Token parity across modes is asserted on the fly — greedy sampling only
(with temperature > 0 the interleaved engine takes extra PRNG splits and
streams legitimately diverge; see EngineConfig.interleaved_prefill).
"""
import json
import time

import numpy as np

from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.serving.engine import Engine, EngineConfig

import dataclasses
import jax


def build():
    cfg = LlamaConfig(
        vocab_size=2048, hidden_size=1024, intermediate_size=2816,
        num_layers=8, num_heads=8, num_kv_heads=4, head_dim=128,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EngineConfig(
        num_pages=256, page_size=64, max_batch=2,
        prefill_buckets=(256, 512), max_new_tokens=64,
        max_pages_per_seq=40,
    )
    return cfg, params, ecfg


def drive(cfg, params, ecfg, interleaved: bool,
          n_short: int = 17, n_long: int = 2048, short_new: int = 64):
    rng = np.random.default_rng(0)
    eng = Engine(cfg, params,
                 dataclasses.replace(ecfg, interleaved_prefill=interleaved))
    short = rng.integers(1, cfg.vocab_size, n_short).tolist()
    long = rng.integers(1, cfg.vocab_size, n_long).tolist()

    eng.add_request(short, max_new=short_new)
    eng.step()  # warm the bucketed prefill + decode programs

    # Warm the CHUNKED prefill program too (rid 1, untimed, runs to
    # completion) so the measured window below is steady-state — without
    # this the first chunk carries the XLA compile in both modes.
    eng.add_request(list(long), max_new=2)
    while any(s.seq_id == 1 for s in eng.active) or eng.prefilling \
            or any(r == 1 for r, _, _ in eng.queue):
        eng.step()

    t_base = []
    for _ in range(5):
        t0 = time.perf_counter()
        eng.step()
        t_base.append(time.perf_counter() - t0)

    eng.add_request(list(long), max_new=8)  # rid 2: the measured admission
    steps = []
    # Admission window: from the long request entering until it is active
    # (or finished at activation) — the decode gap the short request sees.
    while not (any(s.seq_id == 2 for s in eng.active) or 2 in eng.finished):
        t0 = time.perf_counter()
        eng.step()
        steps.append(time.perf_counter() - t0)
    out = eng.run()
    return {
        "baseline_decode_ms": float(np.median(t_base) * 1e3),
        "admission_steps_ms": [round(s * 1e3, 2) for s in steps],
        "max_step_ms": float(max(steps) * 1e3),
        "tokens": out,
    }


def main():
    cfg, params, ecfg = build()
    assert ecfg.sampling.greedy, "run16 parity assert holds for greedy only"
    # Interleaved twice (first+last) brackets blocking against drift.
    r_i1 = drive(cfg, params, ecfg, True)
    r_b = drive(cfg, params, ecfg, False)
    r_i2 = drive(cfg, params, ecfg, True)
    assert r_b["tokens"] == r_i1["tokens"] == r_i2["tokens"], "parity!"
    # Conservative headline: the WORSE of the two interleaved runs (taking
    # the better one would cherry-pick the quieter chip state against a
    # single blocking run).
    max_i = max(r_i1["max_step_ms"], r_i2["max_step_ms"])
    print(json.dumps({
        "baseline_decode_ms": round(r_b["baseline_decode_ms"], 2),
        "blocking_max_step_ms": round(r_b["max_step_ms"], 2),
        "interleaved_max_step_ms": round(max_i, 2),
        "interleaved_max_step_ms_both_runs": [
            round(r_i1["max_step_ms"], 2), round(r_i2["max_step_ms"], 2)],
        "jitter_reduction_x": round(r_b["max_step_ms"] / max_i, 2),
        "blocking_steps_ms": r_b["admission_steps_ms"],
        "interleaved_steps_ms": r_i1["admission_steps_ms"],
        "parity": True,
    }))


if __name__ == "__main__":
    main()
