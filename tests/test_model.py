"""Tiny Llama-style model: forward shape/finiteness, training step, and the
flash kernel vs reference attention inside a real model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.models.llama import (
    LlamaConfig,
    forward,
    init_params,
    loss_fn,
    sgd_train_step,
)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = LlamaConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 64)), jnp.int32
    )
    return cfg, params, tokens


def test_forward_shapes(tiny_setup):
    cfg, params, tokens = tiny_setup
    logits = forward(cfg, params, tokens)
    assert logits.shape == (2, 64, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_flash_matches_reference_attention(tiny_setup):
    cfg, params, tokens = tiny_setup
    import dataclasses
    cfg_ref = dataclasses.replace(cfg, attention_impl="reference")
    a = forward(cfg, params, tokens)
    b = forward(cfg_ref, params, tokens)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.05, rtol=0.05)


def test_train_step_reduces_loss(tiny_setup):
    cfg, params, tokens = tiny_setup
    step = jax.jit(lambda p, t: sgd_train_step(cfg, p, t, lr=1e-2))
    l0 = float(loss_fn(cfg, params, tokens))
    p, _ = step(params, tokens)
    for _ in range(3):
        p, loss = step(p, tokens)
    assert float(loss) < l0, f"loss did not decrease: {l0} -> {float(loss)}"


def test_gqa_head_counts():
    cfg = LlamaConfig.tiny(num_heads=4, num_kv_heads=1)
    params = init_params(cfg, jax.random.PRNGKey(1))
    tokens = jnp.zeros((1, 32), jnp.int32)
    logits = forward(cfg, params, tokens)
    assert logits.shape == (1, 32, cfg.vocab_size)


def test_sliding_window_softcap_consistent_across_impls():
    """Mistral-style sliding window + Gemma-2 soft-cap: the flash kernel
    path must agree with the jnp reference path at the model level."""
    import jax
    import numpy as np
    from quantizedmha_tpu.models import llama

    params = llama.init_params(
        llama.LlamaConfig.tiny(sliding_window=16, logit_softcap=20.0),
        jax.random.key(0))
    toks = jax.random.randint(jax.random.key(1), (2, 64), 0, 256)
    lf = llama.forward(
        llama.LlamaConfig.tiny(sliding_window=16, logit_softcap=20.0),
        params, toks)
    lr = llama.forward(
        llama.LlamaConfig.tiny(sliding_window=16, logit_softcap=20.0,
                               attention_impl="reference"), params, toks)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lr),
                               atol=0.06, rtol=0.05)
