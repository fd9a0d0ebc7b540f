"""Model-level serving benchmark machinery (harness/serving_bench.py).

The measured numbers come from the real chip (scripts/run18 + bench.py);
these tests pin the DENOMINATOR math (HBM bytes/step, matmul params) and
drive the full decode-bench loop on a tiny model so the measurement path
itself can't silently rot between chip runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.harness.serving_bench import (
    decode_step_bytes,
    device_init_int8_params,
    model_matmul_params,
    run_decode_bench,
)
from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.quant.weights import QuantizedWeight


def test_model_matmul_params_llama8b_shape():
    """Llama-3-8B has ~8.03B params; the per-token matmuls (6.98B of
    layer weights + 0.53B lm_head, no embedding) are ~7.5B of them."""
    p = model_matmul_params(LlamaConfig.llama3_8b())
    assert 7.3e9 < p < 7.7e9


def test_decode_step_bytes_accounting():
    cfg = LlamaConfig.tiny(num_layers=2, num_heads=4, num_kv_heads=2,
                           dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    ps = 16
    b = decode_step_bytes(cfg, params, batch=3, ctx=40, page_size=ps)
    # Weight term: everything except the embedding table.
    import jax.tree_util as jtu

    wb = sum(x.size * x.dtype.itemsize for x in jtu.tree_leaves(
        (params["layers"], params["lm_head"], params["final_norm"])))
    pages = -(-40 // ps)  # 3 pages read at page granularity
    kv_read = cfg.num_layers * 2 * pages * ps * cfg.num_kv_heads * cfg.hd
    kv_write = cfg.num_layers * 2 * cfg.num_kv_heads * cfg.hd
    assert b == wb + 3 * (kv_read + kv_write)


def test_device_init_int8_params_structure():
    """Engine-compatible pytree: QuantizedWeight layer matmuls stacked
    [L, ...], bf16 embed/lm_head — same structure init_params produces,
    so the serving stack consumes it unchanged."""
    cfg = LlamaConfig.tiny(num_layers=3, num_heads=4, num_kv_heads=2)
    p = device_init_int8_params(cfg)
    assert isinstance(p["layers"]["wq"], QuantizedWeight)
    assert p["layers"]["wq"].values.shape == (
        3, cfg.hidden_size, cfg.num_heads * cfg.hd)
    assert p["layers"]["wq"].values.dtype == jnp.int8
    assert p["layers"]["w_down"].values.shape == (
        3, cfg.intermediate_size, cfg.hidden_size)
    assert p["embed"].dtype == jnp.bfloat16
    ref = init_params(cfg, jax.random.PRNGKey(0))
    assert set(p) == set(ref) and set(p["layers"]) == set(ref["layers"])


def test_device_init_w4_params_structure():
    from quantizedmha_tpu.harness.serving_bench import (
        device_init_quant_params,
    )
    from quantizedmha_tpu.quant.weights import QuantizedWeight4

    cfg = LlamaConfig.tiny(num_layers=3, num_heads=4, num_kv_heads=2)
    p = device_init_quant_params(cfg, bits=4, group=32)
    wq = p["layers"]["wq"]
    assert isinstance(wq, QuantizedWeight4)
    assert wq.packed.shape == (3, cfg.hidden_size // 2,
                               cfg.num_heads * cfg.hd)
    assert wq.packed.dtype == jnp.int8
    assert wq.scale.shape == (3, cfg.hidden_size // 32,
                              cfg.num_heads * cfg.hd)
    # every nibble decodes into the symmetric int4 range
    from quantizedmha_tpu.quant.weights import _unpack_nibbles

    lo, hi = _unpack_nibbles(wq.packed)
    assert int(jnp.max(hi)) <= 7 and int(jnp.min(lo)) >= -7


def test_run_decode_bench_tiny_w4_model():
    from quantizedmha_tpu.harness.serving_bench import (
        device_init_quant_params,
    )

    cfg = LlamaConfig.tiny(num_layers=2, num_heads=4, num_kv_heads=2,
                           attention_impl="flash_int8")
    params = device_init_quant_params(cfg, bits=4, group=32)
    row = run_decode_bench(cfg, params, batch=2, prompt_len=32, max_new=8,
                           chunk=4, page_size=16, num_pages=32,
                           hbm_gbps=819.0)
    assert row["measured_tokens"] > 0 and row["decode_toks_per_s"] > 0
    # the SoL denominator counts PACKED weight bytes (int8 payload/2 + scales)
    w8 = device_init_quant_params(cfg, bits=8)
    assert (decode_step_bytes(cfg, params, 2, 40, 16)
            < decode_step_bytes(cfg, w8, 2, 40, 16))


def test_run_decode_bench_tiny_model():
    """End-to-end on a tiny int8-weight model: full batch stays resident
    for the measured window, fields are consistent."""
    cfg = LlamaConfig.tiny(num_layers=2, num_heads=4, num_kv_heads=2,
                           attention_impl="flash_int8")
    params = device_init_int8_params(cfg)
    row = run_decode_bench(cfg, params, batch=2, prompt_len=32, max_new=8,
                           chunk=4, page_size=16, num_pages=32,
                           hbm_gbps=819.0)
    assert row["measured_tokens"] > 0
    assert row["decode_toks_per_s"] > 0
    # Both fields are independently rounded to 3 decimals — the two
    # roundings can disagree by up to 2 ulps at the boundary (was a
    # timing-dependent flake at abs=1e-3).
    assert row["decode_ms_per_tok"] == pytest.approx(
        row["decode_ms_per_step"] / 2, abs=2.1e-3)
    # SoL fields agree with the standalone accounting.
    ctx_mid = 32 + 4 + (8 - 4) // 2
    assert row["hbm_bytes_per_step"] == decode_step_bytes(
        cfg, params, 2, ctx_mid, 16)
    # pct is rounded to 0.1 in the row (and is ~0 on a CPU run).
    assert row["decode_pct_hbm_sol"] == pytest.approx(
        100.0 * row["decode_sol_ms_per_step"] / row["decode_ms_per_step"],
        abs=0.06)
