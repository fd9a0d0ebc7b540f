"""Reference-ABI `solve` surface (extensions/torch + extensions/jax reborn)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.api import KERNELS, solve
from quantizedmha_tpu.harness.verify import assert_close, compare
from quantizedmha_tpu.reference.mha import mha_reference


@pytest.fixture
def flat_inputs(rng):
    n, d_model = 256, 128
    q = jnp.asarray(rng.normal(0, 0.5, (n, d_model)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (n, d_model)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (n, d_model)).astype(np.float32))
    return q, k, v, d_model, 4


def test_all_kernels_run_and_agree(flat_inputs):
    q, k, v, d_model, h = flat_inputs
    ref = mha_reference(q, k, v, d_model, h, use_rope=False)
    for kernel in KERNELS:
        out = solve(q, k, v, d_model, h, kernel=kernel, block_q=128, block_kv=128)
        assert out.shape == (q.shape[0], d_model)
        tol = 5e-2 if kernel in ("fa_int8", "fa_bf16") else 1e-3
        report = compare(out, ref, abs_tol=tol, rel_tol=tol)
        assert report.max_rel < (0.05 if kernel in ("fa_int8", "fa_bf16") else 1e-3), (
            f"{kernel}: {report}"
        )


def test_rope_applied_consistently(flat_inputs):
    """RoPE on: kernel output must match golden-with-RoPE — the reference's
    GPU kernels silently skipped RoPE while its CPU golden applied it
    (SURVEY.md 4.4); here both sides apply it."""
    q, k, v, d_model, h = flat_inputs
    out = solve(q, k, v, d_model, h, kernel="fa", use_rope=True, block_q=128, block_kv=128)
    ref = mha_reference(q, k, v, d_model, h, use_rope=True)
    assert_close(out, ref, what="rope")


def test_unknown_kernel_rejected(flat_inputs):
    q, k, v, d_model, h = flat_inputs
    with pytest.raises(ValueError):
        solve(q, k, v, d_model, h, kernel="nope")


def test_solve_with_attention_config(rng):
    """AttentionConfig supplies defaults (config.h reborn, actually wired)."""
    import jax.numpy as jnp

    from quantizedmha_tpu.api import solve
    from quantizedmha_tpu.configs import AttentionConfig, BlockSizes

    n, d_model, h = 128, 64, 2
    q, k, v = (jnp.asarray(rng.normal(0, 0.5, (n, d_model)), jnp.float32)
               for _ in range(3))
    cfg = AttentionConfig(num_heads=h, head_dim=d_model // h, causal=True,
                          use_rope=True, blocks=BlockSizes(block_q=64, block_kv=64))
    got = solve(q, k, v, d_model, kernel="fa", config=cfg)
    want = solve(q, k, v, d_model, h, kernel="fa", causal=True, use_rope=True,
                 block_q=64, block_kv=64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # explicit kwargs win over the config
    got2 = solve(q, k, v, d_model, kernel="fa", config=cfg, causal=False)
    want2 = solve(q, k, v, d_model, h, kernel="fa", causal=False, use_rope=True,
                  block_q=64, block_kv=64)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want2))


def test_abi_fast_bitwise_matches_standard(flat_inputs):
    """The fa_int8 zero-copy ABI path (run15) is a pure LAYOUT change:
    whole-matrix transposes + transposed-layout V quantization feeding the
    transposed-score kernel's native operand shapes. Same quantized values,
    same kernel math => the output must be BITWISE the standard route's,
    for every masking configuration."""
    q, k, v, d_model, h = flat_inputs
    cases = [
        dict(),
        dict(causal=True),
        dict(causal=True, window=64),
        dict(causal=True, window=64, attention_sinks=8),
        dict(causal=True, logit_softcap=30.0),
    ]
    for kw in cases:
        fast = solve(q, k, v, d_model, h, kernel="fa_int8", abi_fast=True, **kw)
        std = solve(q, k, v, d_model, h, kernel="fa_int8", abi_fast=False, **kw)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(std)), kw

    # RoPE needs the head-split layout — auto falls back, forcing raises.
    out = solve(q, k, v, d_model, h, kernel="fa_int8", use_rope=True)
    assert out.shape == (q.shape[0], d_model)
    with pytest.raises(ValueError, match="abi_fast"):
        solve(q, k, v, d_model, h, kernel="fa_int8", abi_fast=True, use_rope=True)
    # A kv block that doesn't divide N also falls back (quantization blocks
    # must tile the flat sequence exactly; the standard route pads instead).
    fast2 = solve(q, k, v, d_model, h, kernel="fa_int8", block_kv=192)
    assert fast2.shape == (q.shape[0], d_model)


def test_block_sizes_validate_clamps():
    from quantizedmha_tpu.configs import BlockSizes

    b = BlockSizes(block_q=512, block_kv=512).validate(300, 300)
    assert b.block_q == 300 and b.block_kv == 300
    with pytest.raises(ValueError):
        from quantizedmha_tpu.api import solve
        import jax.numpy as jnp
        solve(jnp.ones((8, 8)), jnp.ones((8, 8)), jnp.ones((8, 8)), 8)
