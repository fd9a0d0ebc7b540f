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
