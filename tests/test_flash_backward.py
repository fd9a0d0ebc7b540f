"""Pallas flash-backward tests: dq/dk/dv vs the blocked jnp reference and
vs jax.grad of the golden, across causal/cross/unaligned shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

fa_mod = importlib.import_module("quantizedmha_tpu.ops.flash_attention")
from quantizedmha_tpu.reference.mha import mha_reference_shaped


def _run_bwd(q, k, v, do, causal, block_q=None, block_kv=None):
    scale = q.shape[-1] ** -0.5
    o, lse = fa_mod._fwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        sm_scale=scale, causal=causal, block_q=block_q, block_kv=block_kv,
        save_residuals=True, interpret=None,
    )
    pallas = fa_mod._bwd_pallas(scale, causal, q, k, v, o, lse, do,
                                block_q=block_q, block_kv=block_kv)
    ref = fa_mod._bwd_reference(scale, causal, q, k, v, o, lse, do)
    return pallas, ref


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_matches_blocked_reference(qkv_factory, causal):
    q, k, v = qkv_factory(batch=1, heads=2, q_len=256, kv_len=256, head_dim=64)
    do = np.random.default_rng(1).normal(0, 1, q.shape).astype(np.float32)
    (dq, dk, dv), (dqr, dkr, dvr) = _run_bwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(do), causal)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dqr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dkr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dvr), atol=2e-4)


def test_bwd_cross_attention_and_unaligned(qkv_factory):
    # q_len != kv_len, neither a block multiple -> exercises padding + masks.
    q, k, v = qkv_factory(batch=1, heads=2, q_len=200, kv_len=392, head_dim=64)
    do = np.random.default_rng(2).normal(0, 1, q.shape).astype(np.float32)
    (dq, dk, dv), (dqr, dkr, dvr) = _run_bwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(do),
        causal=True, block_q=128, block_kv=128)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dqr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dkr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dvr), atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_grad_through_custom_vjp_matches_golden(qkv_factory, causal):
    """End-to-end: jax.grad through flash_attention (Pallas fwd + Pallas bwd)
    vs jax.grad through the jnp golden."""
    q, k, v = qkv_factory(batch=1, heads=2, q_len=192, kv_len=192, head_dim=64)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)

    def loss_kernel(q, k, v):
        return jnp.sum(fa_mod.flash_attention(q, k, v, causal=causal) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference_shaped(q, k, v, causal=causal) ** 2)

    g = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(g, gr, "qkv"):
        err = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(want))) or 1.0
        assert err / scale < 2e-3, f"d{name}: rel err {err / scale}"


def test_bwd_padded_rows_zero_grad(qkv_factory):
    """Gradient w.r.t. kv positions beyond kv_len must not leak (they are
    sliced off, but the mask must also keep in-range grads exact)."""
    q, k, v = qkv_factory(batch=1, heads=1, q_len=100, kv_len=100, head_dim=64)
    do = np.random.default_rng(3).normal(0, 1, q.shape).astype(np.float32)
    (dq, dk, dv), (dqr, dkr, dvr) = _run_bwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(do),
        causal=False, block_q=128, block_kv=128)
    assert dq.shape == (1, 1, 100, 64) and dk.shape == (1, 1, 100, 64)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dvr), atol=2e-4)
