"""Golden-reference self-tests: the jnp golden vs a plain numpy oracle.

Replaces the reference's CPU golden spot checks (reference
utils/verify.cu:9-104) — but on random inputs, which the reference never
gated (SURVEY.md 4.4: its constant-1.0 check is blind to attention weights).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from quantizedmha_tpu.reference.mha import (
    apply_rope,
    mha_reference,
    mha_reference_shaped,
    mha_with_intermediates,
)


def numpy_mha(q, k, v, causal=False):
    """Independent oracle: float64 numpy attention."""
    q, k, v = (np.asarray(x, np.float64) for x in (q, k, v))
    scale = q.shape[-1] ** -0.5
    s = np.einsum("...qd,...kd->...qk", q, k) * scale
    if causal:
        ql, kl = s.shape[-2], s.shape[-1]
        mask = np.arange(kl)[None, :] <= (np.arange(ql)[:, None] + kl - ql)
        s = np.where(mask, s, -np.inf)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("...qk,...kd->...qd", p, v)


def test_reference_matches_numpy_oracle(qkv_factory):
    q, k, v = qkv_factory(batch=2, heads=3, q_len=64, kv_len=64, head_dim=32)
    got = mha_reference_shaped(q, k, v)
    want = numpy_mha(q, k, v)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_reference_causal(qkv_factory):
    q, k, v = qkv_factory(batch=1, heads=2, q_len=48, kv_len=64, head_dim=16)
    got = mha_reference_shaped(q, k, v, causal=True)
    want = numpy_mha(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_intermediates_are_consistent(qkv_factory):
    q, k, v = qkv_factory(batch=1, heads=1, q_len=32, kv_len=32, head_dim=16)
    o, s, p = mha_with_intermediates(q, k, v)
    # P rows sum to 1; O == P @ V.
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(o), np.einsum("...qk,...kd->...qd", np.asarray(p), np.asarray(v)),
        atol=1e-5,
    )


def test_rope_preserves_norm(qkv_factory):
    q, _, _ = qkv_factory(head_dim=32)
    r = apply_rope(q)
    # Rotation preserves the norm of each (even, odd) pair.
    n0 = np.linalg.norm(np.asarray(q, np.float64), axis=-1)
    n1 = np.linalg.norm(np.asarray(r, np.float64), axis=-1)
    np.testing.assert_allclose(n0, n1, rtol=1e-5)


def test_rope_position_zero_is_identity(qkv_factory):
    q, _, _ = qkv_factory(q_len=8, head_dim=16)
    r = apply_rope(q)
    np.testing.assert_allclose(np.asarray(r[..., 0, :]), np.asarray(q[..., 0, :]), atol=1e-6)


def test_rope_relative_property(rng):
    """<RoPE(q,m), RoPE(k,n)> depends only on m-n (the defining property)."""
    d = 32
    q = rng.normal(size=(1, 1, 1, d)).astype(np.float32)
    k = rng.normal(size=(1, 1, 1, d)).astype(np.float32)
    def dot_at(m, n):
        pos_q = jnp.array([m]); pos_k = jnp.array([n])
        rq = apply_rope(jnp.asarray(q), positions=pos_q)
        rk = apply_rope(jnp.asarray(k), positions=pos_k)
        return float(jnp.sum(rq * rk))
    assert abs(dot_at(5, 3) - dot_at(12, 10)) < 1e-4
    assert abs(dot_at(7, 7) - dot_at(0, 0)) < 1e-4


def test_flat_abi_matches_shaped(rng):
    """mha_reference (flat [N, d_model], verify.cu ABI) == split+shaped."""
    n, d_model, h = 64, 64, 4
    q = rng.normal(size=(n, d_model)).astype(np.float32)
    k = rng.normal(size=(n, d_model)).astype(np.float32)
    v = rng.normal(size=(n, d_model)).astype(np.float32)
    out = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), d_model, h, use_rope=False)
    d = d_model // h
    qh = q.reshape(n, h, d).transpose(1, 0, 2)
    kh = k.reshape(n, h, d).transpose(1, 0, 2)
    vh = v.reshape(n, h, d).transpose(1, 0, 2)
    want = numpy_mha(qh, kh, vh).transpose(1, 0, 2).reshape(n, d_model)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5, rtol=2e-5)


def test_rope_implementations_agree(rng):
    """The serving adapter's per-batch RoPE helpers must match the golden
    apply_rope exactly — cached K written by one path is read against Q
    rotated by another (SURVEY blind-spot §4.4 was exactly a RoPE split)."""
    import jax.numpy as jnp

    from quantizedmha_tpu.reference.mha import apply_rope
    from quantizedmha_tpu.serving.llama_adapter import _rope_positions, _rope_single

    B, H, S, hd = 2, 3, 8, 16
    x = jnp.asarray(rng.normal(0, 1, (B, H, S, hd)), jnp.float32)
    golden = apply_rope(x)  # positions = arange(S), shared across batch
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    got = _rope_positions(x, pos, 10000.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(golden), atol=1e-6)

    # _rope_single at position p == column p of the full rotation.
    p = 5
    single = _rope_single(x[:, :, p, :], jnp.full((B,), p, jnp.int32), 10000.0)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(golden[:, :, p, :]), atol=1e-6)
