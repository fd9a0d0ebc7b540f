"""Pipeline-parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from quantizedmha_tpu.models.llama import LlamaConfig, forward, init_params
from quantizedmha_tpu.parallel.pipeline import pipeline_llama_forward, shard_layers


def _mesh(pp):
    return Mesh(np.asarray(jax.devices()[:pp]), ("pp",))


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (2, 4), (4, 2)])
def test_pipeline_matches_plain_forward(pp, n_micro):
    cfg = LlamaConfig.tiny(num_layers=4, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)

    want = forward(cfg, params, tokens)

    mesh = _mesh(pp)
    sharded = dict(params)
    sharded["layers"] = shard_layers(params["layers"], mesh)
    got = jax.jit(
        lambda p, t: pipeline_llama_forward(
            cfg, p, t, mesh, n_microbatches=n_micro)
    )(sharded, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_pipeline_validations():
    cfg = LlamaConfig.tiny(num_layers=3, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.zeros((4, 8), jnp.int32)
    with pytest.raises(ValueError, match="layers"):
        pipeline_llama_forward(cfg, params, tokens, _mesh(2), n_microbatches=2)
    cfg4 = LlamaConfig.tiny(num_layers=4, dtype=jnp.float32)
    params4 = init_params(cfg4, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_llama_forward(cfg4, params4, tokens, _mesh(2), n_microbatches=3)


def test_pipeline_layer_shards_are_real():
    cfg = LlamaConfig.tiny(num_layers=4, dtype=jnp.float32)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = _mesh(4)
    layers = shard_layers(params["layers"], mesh)
    wq = layers["wq"]
    assert {s.data.shape for s in wq.addressable_shards} == {
        (1, *wq.shape[1:])
    }


def test_pipeline_windowed_gqa_matches_plain_forward():
    """Pipeline stages run the same decoder_layer, so sliding window +
    sinks + soft-cap + GQA must survive pipeline sharding unchanged."""
    cfg = LlamaConfig.tiny(num_layers=4, dtype=jnp.float32,
                           sliding_window=12, attention_sinks=2,
                           logit_softcap=25.0)
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)

    want = forward(cfg, params, tokens)
    mesh = _mesh(2)
    sharded = dict(params)
    sharded["layers"] = shard_layers(params["layers"], mesh)
    got = jax.jit(
        lambda p, t: pipeline_llama_forward(cfg, p, t, mesh, n_microbatches=2)
    )(sharded, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_pipeline_gemma2_style_pattern_matches_plain_forward():
    """Per-layer alternating windows + the Gemma-2 family knobs must
    survive pipeline sharding: with pp=2 over 4 layers the stage-local
    window sequence (12, None) is identical on both stages, so the SPMD
    program stays uniform."""
    cfg = LlamaConfig.tiny(
        num_layers=4, dtype=jnp.float32,
        window_pattern=(12, None, 12, None), sandwich_norms=True,
        rms_plus_one=True, embed_scale=True, hidden_act="gelu_tanh",
        query_pre_attn_scalar=32.0, logit_softcap=30.0,
        final_logit_softcap=15.0)
    params = init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 32)), jnp.int32)

    want = forward(cfg, params, tokens)
    mesh = _mesh(2)
    sharded = dict(params)
    sharded["layers"] = shard_layers(params["layers"], mesh)
    got = jax.jit(
        lambda p, t: pipeline_llama_forward(cfg, p, t, mesh, n_microbatches=2)
    )(sharded, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_pipeline_refuses_stage_nonuniform_pattern():
    """A Qwen2-style contiguous split gives pipeline stages DIFFERENT
    window sequences — not representable as one SPMD program; must raise
    instead of silently running the wrong masks."""
    cfg = LlamaConfig.tiny(num_layers=4, dtype=jnp.float32,
                           window_pattern=(None, None, 12, 12))
    params = init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.zeros((4, 8), jnp.int32)
    with pytest.raises(ValueError, match="stage"):
        pipeline_llama_forward(cfg, params, tokens, _mesh(2),
                               n_microbatches=2)
