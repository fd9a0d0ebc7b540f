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


def test_pattern_period_and_runs():
    from quantizedmha_tpu.models.llama import _pattern_period, _pattern_runs

    assert _pattern_period((None,) * 6) == 1
    assert _pattern_period((4, None) * 3) == 2
    assert _pattern_period((None, 4, 4)) == 3
    assert _pattern_runs((None, 4, 4)) == [(None, 1), (4, 2)]
    assert _pattern_runs((4, None, 4, None)) == [
        (4, 1), (None, 1), (4, 1), (None, 1)]


def test_window_pattern_decompositions_match_manual_loop():
    """Every scan decomposition (uniform / periodic chunks / contiguous
    runs) must equal the straight per-layer loop with the same per-layer
    windows — the decomposition is a compile-shape optimization, not a
    semantics change."""
    import dataclasses

    from quantizedmha_tpu.models.llama import decoder_layer

    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(0, 256, (1, 32)), jnp.int32)

    # period-2 (Gemma-2 style) on 4 layers, and runs (Qwen2 style) on
    # 6 layers (period 6 > the unroll cap, so the runs path triggers).
    for pattern in [(8, None, 8, None), (None, None, None, None, 8, 8)]:
        # float32: the decompositions trace to differently-fused graphs,
        # so bf16 would add rounding noise to an exact-semantics check
        cfg = LlamaConfig.tiny(num_layers=len(pattern),
                               window_pattern=pattern, dtype=jnp.float32)
        params = init_params(cfg, jax.random.PRNGKey(1))
        got = forward(cfg, params, tokens)

        x = params["embed"][tokens].astype(cfg.dtype)
        for i, w in enumerate(pattern):
            lp = jax.tree.map(lambda a: a[i], params["layers"])
            x = decoder_layer(cfg, lp, x, window=w)
        from quantizedmha_tpu.models.llama import rms_norm

        x = rms_norm(x, params["final_norm"], cfg.rms_eps)
        want = (x @ params["lm_head"]).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
        # and the pattern must actually change the result vs no window
        cfg_nw = dataclasses.replace(cfg, window_pattern=None)
        other = forward(cfg_nw, params, tokens)
        assert float(jnp.max(jnp.abs(got - other))) > 1e-4


def test_serving_adapter_validates_knob_values():
    """Serving supports the family knobs (per-layer windows, sandwich
    norms, GeGLU, softcaps — tests/test_engine.py runs them end to end);
    make_cache still fails FAST on invalid values rather than mid-trace."""
    from quantizedmha_tpu.serving.llama_adapter import make_cache

    with pytest.raises(ValueError, match="hidden_act"):
        make_cache(LlamaConfig.tiny(hidden_act="gelu??"),
                   num_pages=4, page_size=8)
    with pytest.raises(ValueError, match="window_pattern"):
        make_cache(LlamaConfig.tiny(window_pattern=(8, None, 8)),
                   num_pages=4, page_size=8)
    # valid family configs pass
    make_cache(LlamaConfig.tiny(window_pattern=(8, None),
                                sandwich_norms=True, rms_plus_one=True,
                                hidden_act="gelu_tanh"),
               num_pages=4, page_size=8)
    make_cache(LlamaConfig.tiny(), num_pages=4, page_size=8)


def test_recyclable_window():
    """Page recycling is only sound when EVERY layer shares one window —
    mixed patterns (Gemma-2/Qwen2) must report None so the engines keep
    all pages alive for their full-attention layers."""
    tiny = LlamaConfig.tiny
    assert tiny(sliding_window=8).recyclable_window == 8
    assert tiny().recyclable_window is None
    assert tiny(num_layers=4,
                window_pattern=(8, None, 8, None)).recyclable_window is None
    assert tiny(num_layers=4,
                window_pattern=(8, 8, 8, 8)).recyclable_window == 8


def test_exact_gelu_activation():
    from quantizedmha_tpu.models.llama import _act
    x = jnp.linspace(-3, 3, 32)
    got = _act(LlamaConfig.tiny(hidden_act="gelu"), x)
    want = jax.nn.gelu(x, approximate=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
