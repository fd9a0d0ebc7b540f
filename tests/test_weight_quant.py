"""INT8 weight quantization tests: roundtrip, both matmul modes, model
quality, engine integration, and TP composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.models.llama import LlamaConfig, forward, init_params
from quantizedmha_tpu.quant.weights import (
    QuantizedWeight,
    qdense,
    quantize_llama_params,
    quantize_weight,
    weight_bytes,
)


class TestQuantizeWeight:
    def test_roundtrip_error_bound(self, rng):
        w = jnp.asarray(rng.normal(0, 0.1, (64, 32)), jnp.float32)
        qw = quantize_weight(w)
        assert qw.values.dtype == jnp.int8 and qw.scale.shape == (32,)
        deq = qw.values.astype(jnp.float32) * qw.scale[None, :]
        assert float(jnp.max(jnp.abs(deq - w))) <= float(jnp.max(qw.scale)) * 0.5 + 1e-7

    def test_per_channel_scales(self, rng):
        w = np.ones((16, 4), np.float32)
        w[:, 2] *= 100.0  # one hot channel must not poison the others
        qw = quantize_weight(jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(qw.scale),
                                   [1 / 127, 1 / 127, 100 / 127, 1 / 127], rtol=1e-6)

    def test_layer_stacked(self, rng):
        w = jnp.asarray(rng.normal(0, 0.1, (3, 8, 16)), jnp.float32)
        qw = quantize_weight(w)
        assert qw.values.shape == (3, 8, 16) and qw.scale.shape == (3, 16)


class TestQDense:
    @pytest.mark.parametrize("mode", ["w8a16", "w8a8"])
    def test_close_to_float(self, rng, mode):
        x = jnp.asarray(rng.normal(0, 1, (4, 64)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.1, (64, 32)), jnp.float32)
        got = qdense(x, quantize_weight(w), mode=mode)
        want = x @ w
        rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        assert rel < 0.03, f"{mode}: rel err {rel}"

    def test_plain_weight_passthrough(self, rng):
        x = jnp.asarray(rng.normal(0, 1, (4, 8)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 1, (8, 8)), jnp.float32)
        np.testing.assert_array_equal(np.asarray(qdense(x, w)), np.asarray(x @ w))

    def test_unknown_mode(self, rng):
        w = quantize_weight(jnp.ones((4, 4)))
        with pytest.raises(ValueError, match="mode"):
            qdense(jnp.ones((2, 4)), w, mode="w4a4")


class TestQuantizedModel:
    @pytest.mark.parametrize("mode", ["w8a16", "w8a8"])
    def test_forward_close_to_float(self, rng, mode):
        cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32,
                               weight_quant_mode=mode)
        params = init_params(cfg, jax.random.PRNGKey(0))
        qparams = quantize_llama_params(params)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 32)), jnp.int32)
        ref = forward(cfg, params, toks)
        got = forward(cfg, qparams, toks)
        # logits in softmax-units: compare top-1 agreement + abs err
        agree = float(jnp.mean(
            (jnp.argmax(got, -1) == jnp.argmax(ref, -1)).astype(jnp.float32)))
        assert agree > 0.9, f"{mode}: top-1 agreement {agree}"

    def test_weight_bytes_shrink(self):
        cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
        params = init_params(cfg, jax.random.PRNGKey(0))
        q = quantize_llama_params(params)
        assert weight_bytes(q) < 0.45 * weight_bytes(params)


class TestQuantizedServing:
    def test_engine_runs_with_quantized_weights(self):
        from quantizedmha_tpu.serving.engine import Engine, EngineConfig

        cfg = LlamaConfig.tiny(num_layers=1, dtype=jnp.float32)
        params = quantize_llama_params(init_params(cfg, jax.random.PRNGKey(0)))
        eng = Engine(cfg, params, EngineConfig(
            num_pages=16, page_size=16, max_batch=2,
            prefill_buckets=(16,), max_new_tokens=3))
        eng.add_request([1, 2, 3])
        out = eng.run()
        assert len(out[0]) == 3

    def test_tp_engine_with_quantized_weights(self):
        from quantizedmha_tpu.serving.engine import Engine, EngineConfig
        from quantizedmha_tpu.serving.sharded import TPEngine, make_tp_mesh

        cfg = LlamaConfig.tiny(num_layers=1, dtype=jnp.float32)
        params = quantize_llama_params(init_params(cfg, jax.random.PRNGKey(0)))
        ecfg = EngineConfig(num_pages=16, page_size=16, max_batch=2,
                            prefill_buckets=(16,), max_new_tokens=3)

        ref = Engine(cfg, params, ecfg)
        ref.add_request([1, 2, 3])
        want = ref.run()

        eng = TPEngine(cfg, params, ecfg, make_tp_mesh(2))
        eng.add_request([1, 2, 3])
        got = eng.run()
        assert got[0] == want[0]
        # quantized weight shards are real int8 halves
        wq = eng.params["layers"]["wq"]
        assert isinstance(wq, QuantizedWeight)
        assert {s.data.shape for s in wq.values.addressable_shards} == {
            (wq.values.shape[0], wq.values.shape[1], wq.values.shape[2] // 2)
        }
