"""Fused FlashAttention kernel vs the jnp golden.

Covers the verification surface the reference lacked (SURVEY.md 4.4):
random inputs, causal masking, uneven sequence lengths (padding path),
cross-attention (q_len != kv_len), and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.harness.verify import assert_close
from quantizedmha_tpu.ops.flash_attention import flash_attention
from quantizedmha_tpu.reference.mha import mha_reference_shaped


@pytest.mark.parametrize("causal", [False, True])
def test_matches_golden(qkv_factory, causal):
    q, k, v = qkv_factory(batch=2, heads=2, q_len=256, kv_len=256)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          causal=causal, block_q=128, block_kv=128)
    ref = mha_reference_shaped(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
    assert_close(out, ref, abs_tol=1e-3, rel_tol=1e-3, what=f"flash causal={causal}")


def test_multiple_kv_blocks(qkv_factory):
    q, k, v = qkv_factory(q_len=128, kv_len=512)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          block_q=128, block_kv=128)
    ref = mha_reference_shaped(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    assert_close(out, ref, what="cross-attention q_len != kv_len")


@pytest.mark.parametrize("q_len,kv_len", [(100, 100), (257, 391)])
def test_uneven_lengths_padding_path(qkv_factory, q_len, kv_len):
    q, k, v = qkv_factory(q_len=q_len, kv_len=kv_len)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          block_q=128, block_kv=128)
    ref = mha_reference_shaped(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    assert_close(out, ref, what=f"uneven ({q_len},{kv_len})")


def test_uneven_causal(qkv_factory):
    q, k, v = qkv_factory(q_len=200, kv_len=200)
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          causal=True, block_q=128, block_kv=128)
    ref = mha_reference_shaped(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
    assert_close(out, ref, what="uneven causal")


def test_bf16(qkv_factory):
    q, k, v = qkv_factory(q_len=256, kv_len=256)
    qb, kb, vb = (jnp.asarray(x, jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb, block_q=128, block_kv=128)
    ref = mha_reference_shaped(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    assert_close(out.astype(jnp.float32), ref, abs_tol=2e-2, rel_tol=2e-2, what="bf16")


def test_save_residuals_lse(qkv_factory):
    q, k, v = qkv_factory(q_len=128, kv_len=128)
    out, lse = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               save_residuals=True, block_q=128, block_kv=128)
    # lse == logsumexp of scaled scores, checked against jnp directly.
    s = jnp.einsum("bhqd,bhkd->bhqk", jnp.asarray(q), jnp.asarray(k)) * (q.shape[-1] ** -0.5)
    want = jax.nn.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_golden(qkv_factory, causal):
    q, k, v = qkv_factory(batch=1, heads=2, q_len=128, kv_len=128, head_dim=32)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))

    def loss_kernel(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal, block_q=128, block_kv=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference_shaped(q, k, v, causal=causal) ** 2)

    g = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gr):
        assert_close(a, b, abs_tol=2e-3, rel_tol=2e-3, what=f"d{name} causal={causal}")


def test_fully_masked_rows_in_live_block(qkv_factory):
    """Ring-attention geometry: the kv shard sits AHEAD of half the q rows
    (kv_offset > q_offset), so those rows are fully masked inside a kv block
    that still runs (other rows are live). They must emit o = 0 / lse = -inf
    — not exp(0)=1-weighted mean(V) garbage — so the cross-shard lse merge
    drops them."""
    q, k, v = qkv_factory(q_len=128, kv_len=128)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    kv_off = 64
    out, lse = flash_attention(q, k, v, causal=True, save_residuals=True,
                               q_offset=0, kv_offset=kv_off,
                               block_q=128, block_kv=128)
    out, lse = np.asarray(out), np.asarray(lse)
    # Rows 0..63 see no kv position (all kv are in their future).
    np.testing.assert_array_equal(out[:, :, :kv_off], 0.0)
    assert np.all(np.isneginf(lse[:, :, :kv_off]))
    # Live rows match a masked jnp reference.
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (q.shape[-1] ** -0.5)
    qpos = jnp.arange(q.shape[2])[:, None]
    kpos = jnp.arange(k.shape[2])[None, :] + kv_off
    s = jnp.where(kpos <= qpos, s, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s[:, :, kv_off:], axis=-1), v)
    assert_close(out[:, :, kv_off:], ref, abs_tol=1e-3, rel_tol=1e-3,
                 what="live rows with shifted kv shard")
    want_lse = jax.nn.logsumexp(s[:, :, kv_off:], axis=-1)
    np.testing.assert_allclose(lse[:, :, kv_off:], np.asarray(want_lse),
                               atol=1e-4, rtol=1e-4)


def test_rejects_bad_rank():
    x = jnp.zeros((4, 8, 16))
    with pytest.raises(ValueError):
        flash_attention(x, x, x)


@pytest.mark.parametrize("causal", [False, True])
def test_gqa_matches_repeat_kv(qkv_factory, causal):
    """GQA-native path (kv heads < q heads via BlockSpec index maps) must
    equal attention over explicitly repeated K/V — forward and gradients
    (dK/dV accumulate across the query group inside the kv-stationary
    backward pass)."""
    q, _, _ = qkv_factory(batch=1, heads=4, q_len=128, kv_len=128, head_dim=32)
    _, k, v = qkv_factory(batch=1, heads=2, q_len=128, kv_len=128, head_dim=32)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    rep = lambda x: jnp.repeat(x, 2, axis=1)

    out = flash_attention(q, k, v, causal=causal, block_q=64, block_kv=64)
    ref = flash_attention(q, rep(k), rep(v), causal=causal, block_q=64, block_kv=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    g = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, causal=causal, block_q=64, block_kv=64) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, rep(k), rep(v), causal=causal,
                        block_q=64, block_kv=64) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gr):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"d{name}")


def test_gqa_rejects_indivisible(qkv_factory):
    q, _, _ = qkv_factory(batch=1, heads=3, q_len=128, kv_len=128, head_dim=32)
    _, k, v = qkv_factory(batch=1, heads=2, q_len=128, kv_len=128, head_dim=32)
    with pytest.raises(ValueError):
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))


def _ref_masked(q, k, v, *, window=None, softcap=None):
    from quantizedmha_tpu.reference.mha import mha_masked_reference

    return mha_masked_reference(q, k, v, causal=True, window=window,
                                softcap=softcap)


@pytest.mark.parametrize("window,softcap", [(128, None), (200, None),
                                            (None, 30.0), (128, 30.0)])
def test_window_and_softcap(qkv_factory, window, softcap):
    """Sliding-window (Mistral) + logit soft-cap (Gemma-2) forward AND
    gradients vs an explicit jnp mask/tanh reference. Window sizes straddle
    block boundaries to exercise the behind-the-window block skip."""
    q, k, v = qkv_factory(batch=1, heads=2, q_len=512, kv_len=512, head_dim=32)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    kw = dict(causal=True, window=window, logit_softcap=softcap,
              block_q=128, block_kv=128)
    out = flash_attention(q, k, v, **kw)
    ref = _ref_masked(q, k, v, window=window, softcap=softcap)
    assert_close(out, ref, abs_tol=1e-4, rel_tol=1e-4,
                 what=f"window={window} softcap={softcap}")

    g = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v, **kw) ** 2),
                 argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        _ref_masked(q, k, v, window=window, softcap=softcap) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gr):
        assert_close(a, b, abs_tol=1e-4, rel_tol=1e-3,
                     what=f"d{name} window={window} softcap={softcap}")


def test_window_requires_causal(qkv_factory):
    q, k, v = qkv_factory(q_len=128, kv_len=128)
    with pytest.raises(ValueError):
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        window=64)


def test_attention_sinks(qkv_factory):
    """StreamingLLM sinks: with a window, the first N positions stay
    visible — forward and gradients vs the shared masked golden, and the
    sinks must actually change the result vs plain windowed attention."""
    from quantizedmha_tpu.reference.mha import mha_masked_reference

    q, k, v = qkv_factory(batch=1, heads=2, q_len=512, kv_len=512, head_dim=32)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    kw = dict(causal=True, window=128, attention_sinks=16,
              block_q=128, block_kv=128)
    out = flash_attention(q, k, v, **kw)
    ref = mha_masked_reference(q, k, v, causal=True, window=128, sinks=16)
    assert_close(out, ref, abs_tol=1e-4, rel_tol=1e-4, what="sinks fwd")
    plain = mha_masked_reference(q, k, v, causal=True, window=128)
    assert np.abs(np.asarray(ref) - np.asarray(plain)).max() > 1e-3

    g = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v, **kw) ** 2),
                 argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(mha_masked_reference(
        q, k, v, causal=True, window=128, sinks=16) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gr):
        assert_close(a, b, abs_tol=1e-4, rel_tol=1e-3, what=f"sinks d{name}")


def test_sinks_require_window(qkv_factory):
    q, k, v = qkv_factory(q_len=128, kv_len=128)
    with pytest.raises(ValueError):
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        causal=True, attention_sinks=4)
