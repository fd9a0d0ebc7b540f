"""INT8/INT4 weight quantization tests: roundtrip, all matmul modes, model
quality, engine integration, and TP composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.models.llama import LlamaConfig, forward, init_params
from quantizedmha_tpu.quant.weights import (
    QuantizedWeight,
    QuantizedWeight4,
    _W4_DECODE_ROWS,
    dequantize_weight4,
    qdense,
    quantize_llama_params,
    quantize_weight,
    quantize_weight4,
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


class TestQuantizeWeight4:
    def test_roundtrip_error_bound(self, rng):
        w = jnp.asarray(rng.normal(0, 0.1, (64, 32)), jnp.float32)
        qw = quantize_weight4(w, group=16)
        assert qw.packed.dtype == jnp.int8
        assert qw.packed.shape == (32, 32) and qw.scale.shape == (4, 32)
        from quantizedmha_tpu.quant.weights import _unpack_nibbles

        lo, hi = _unpack_nibbles(qw.packed)
        assert int(jnp.max(jnp.maximum(lo, hi))) <= 7
        assert int(jnp.min(jnp.minimum(lo, hi))) >= -7
        deq = dequantize_weight4(qw)
        # group-wise symmetric: error <= scale/2 per element
        err = jnp.abs(deq - w).reshape(4, 16, 32)
        bound = qw.scale[:, None, :] * 0.5 + 1e-7
        assert bool(jnp.all(err <= bound))

    def test_group_scales_isolate_hot_group(self, rng):
        w = np.full((64, 4), 0.01, np.float32)
        w[16:32, :] = 10.0  # hot group 1 must not poison groups 0/2/3
        qw = quantize_weight4(jnp.asarray(w), group=16)
        s = np.asarray(qw.scale)
        np.testing.assert_allclose(s[[0, 2, 3]], 0.01 / 7, rtol=1e-6)
        np.testing.assert_allclose(s[1], 10.0 / 7, rtol=1e-6)

    def test_layer_stacked(self, rng):
        w = jnp.asarray(rng.normal(0, 0.1, (3, 64, 16)), jnp.float32)
        qw = quantize_weight4(w, group=32)
        assert qw.packed.shape == (3, 32, 16)
        assert qw.scale.shape == (3, 2, 16)

    def test_group_must_divide_in(self):
        with pytest.raises(ValueError, match="group"):
            quantize_weight4(jnp.ones((96, 8)), group=64)

    def test_group_must_be_even(self):
        with pytest.raises(ValueError, match="even"):
            quantize_weight4(jnp.ones((96, 8)), group=3)

    def test_pair_packing_shards_contiguously(self, rng):
        # TP row-sharding contract: the first half of the PACKED rows must
        # reconstruct exactly the first half of the ORIGINAL rows (this is
        # why packing is even/odd pairs, not halves).
        import dataclasses

        w = jnp.asarray(rng.normal(0, 0.1, (64, 8)), jnp.float32)
        qw = quantize_weight4(w, group=16)
        shard = dataclasses.replace(
            qw, packed=qw.packed[:16], scale=qw.scale[:2])
        np.testing.assert_array_equal(
            np.asarray(dequantize_weight4(shard)),
            np.asarray(dequantize_weight4(qw)[:32]))


class TestW4Dense:
    def test_decode_lowering_close_to_float(self, rng):
        x = jnp.asarray(rng.normal(0, 1, (4, 64)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.1, (64, 32)), jnp.float32)
        qw = quantize_weight4(w, group=16)
        got = qdense(x, qw)
        want = x @ w
        # the LOWERING is exact: it must match the dequantized matmul to
        # float tolerance (the quantization noise itself is int4-sized)
        deq = dequantize_weight4(qw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ deq),
                                   rtol=1e-5, atol=1e-5)
        # int4 noise floor for N(0, 0.1) weights at group 16: scale ~
        # amax16/7 ~ 0.033, err std ~ scale/sqrt(12) ~ 0.0095 ~ 9.5% of
        # the weight std — so ~0.10 output rel-RMS is EXPECTED, not a bug.
        rel_rms = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert rel_rms < 0.15, f"w4a16 decode: rel RMS {rel_rms}"

    def test_prefill_lowering_matches_decode_lowering(self, rng):
        from quantizedmha_tpu.quant.weights import _W4_DECODE_ROWS

        w = jnp.asarray(rng.normal(0, 0.1, (64, 32)), jnp.float32)
        qw = quantize_weight4(w, group=16)
        x = jnp.asarray(
            rng.normal(0, 1, (_W4_DECODE_ROWS + 8, 64)), jnp.float32)
        prefill = qdense(x, qw)                      # rows > threshold
        decode = jnp.concatenate(
            [qdense(x[i:i + 8], qw) for i in range(0, x.shape[0], 8)])
        np.testing.assert_allclose(np.asarray(prefill), np.asarray(decode),
                                   rtol=1e-5, atol=1e-5)

    def test_stacked_weight_rejected(self, rng):
        w = quantize_weight4(jnp.ones((2, 64, 8)), group=16)
        with pytest.raises(ValueError, match="sliced"):
            qdense(jnp.ones((2, 64)), w)

    def test_wrong_in_dim_rejected(self):
        w = quantize_weight4(jnp.ones((64, 8)), group=16)
        with pytest.raises(ValueError, match="in"):
            qdense(jnp.ones((2, 32)), w)


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

    def test_forward_close_to_float_w4(self, rng):
        # NOTE: top-1 agreement (the w8 gate above) is meaningless here —
        # a random-INIT model's logits are near-flat, so int4's ~10%
        # matmul noise flips argmax freely. The strong gate is exactness
        # vs the fake-quant model (the lowering is exact); the weak gate
        # is logits rel-RMS vs float.
        cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
        params = init_params(cfg, jax.random.PRNGKey(0))
        qparams = quantize_llama_params(params, bits=4, group=32)

        def deq(leaf):
            if not isinstance(leaf, QuantizedWeight4):
                return leaf
            return dequantize_weight4(leaf)

        fake = dict(qparams, layers={
            k: deq(v) for k, v in qparams["layers"].items()})
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 32)), jnp.int32)
        got = forward(cfg, qparams, toks)
        want_fake = forward(cfg, fake, toks)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want_fake),
                                   rtol=2e-4, atol=2e-4)
        # weak gate: int4's ~10% per-matmul RMS compounds over 2 layers +
        # norms on an untrained model (~0.33 observed); a real checkpoint's
        # outlier-structured weights quantize far better (AWQ/GPTQ regime).
        ref = forward(cfg, params, toks)
        rel_rms = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel_rms < 0.5, f"w4a16 logits rel RMS {rel_rms}"

    def test_quantized_lm_head(self, rng):
        cfg = LlamaConfig.tiny(num_layers=1, dtype=jnp.float32)
        params = init_params(cfg, jax.random.PRNGKey(0))
        q = quantize_llama_params(params, lm_head_bits=8)
        assert isinstance(q["lm_head"], QuantizedWeight)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)),
                           jnp.int32)
        ref = forward(cfg, params, toks)
        got = forward(cfg, q, toks)
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.04, rel  # per-channel int8 on the head only

    def test_lm_head_int4_refused(self):
        cfg = LlamaConfig.tiny(num_layers=1, dtype=jnp.float32)
        params = init_params(cfg, jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="lm_head_bits"):
            quantize_llama_params(params, lm_head_bits=4)

    def test_w4_weight_bytes_shrink_vs_int8(self):
        cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
        params = init_params(cfg, jax.random.PRNGKey(0))
        q8 = quantize_llama_params(params, bits=8)
        q4 = quantize_llama_params(params, bits=4, group=32)
        lb8 = weight_bytes(q8["layers"])
        lb4 = weight_bytes(q4["layers"])
        # packed nibbles halve the payload; group scales add back a little
        assert lb4 < 0.65 * lb8


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

    def test_engine_runs_with_w4_weights(self):
        from quantizedmha_tpu.serving.engine import Engine, EngineConfig

        cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
        params = quantize_llama_params(
            init_params(cfg, jax.random.PRNGKey(0)), bits=4, group=32)
        eng = Engine(cfg, params, EngineConfig(
            num_pages=16, page_size=16, max_batch=2,
            prefill_buckets=(16,), max_new_tokens=3))
        eng.add_request([1, 2, 3])
        out = eng.run()
        assert len(out[0]) == 3

    def test_tp_engine_with_w4_weights(self):
        from quantizedmha_tpu.serving.engine import Engine, EngineConfig
        from quantizedmha_tpu.serving.sharded import TPEngine, make_tp_mesh

        cfg = LlamaConfig.tiny(num_layers=1, dtype=jnp.float32)
        params = quantize_llama_params(
            init_params(cfg, jax.random.PRNGKey(0)), bits=4, group=32)
        ecfg = EngineConfig(num_pages=16, page_size=16, max_batch=2,
                            prefill_buckets=(16,), max_new_tokens=3)

        ref = Engine(cfg, params, ecfg)
        ref.add_request([1, 2, 3])
        want = ref.run()

        eng = TPEngine(cfg, params, ecfg, make_tp_mesh(2))
        eng.add_request([1, 2, 3])
        got = eng.run()
        assert got[0] == want[0]
        # packed payload and group scales both sharded over tp
        wq = eng.params["layers"]["wq"]
        assert isinstance(wq, QuantizedWeight4)
        assert {s.data.shape for s in wq.packed.addressable_shards} == {
            (wq.packed.shape[0], wq.packed.shape[1],
             wq.packed.shape[2] // 2)
        }

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


# --- fused projections (round 5) -------------------------------------------

def test_concat_w4_equals_dequant_concat(rng):
    from quantizedmha_tpu.quant.weights import (
        concat_w4, dequantize_weight4, quantize_weight4)

    wq = jnp.asarray(rng.normal(0, 0.05, (256, 128)), jnp.float32)
    wk = jnp.asarray(rng.normal(0, 0.05, (256, 64)), jnp.float32)
    qa, qb = quantize_weight4(wq), quantize_weight4(wk)
    fused = concat_w4([qa, qb])
    want = jnp.concatenate(
        [dequantize_weight4(qa), dequantize_weight4(qb)], axis=-1)
    np.testing.assert_array_equal(
        np.asarray(dequantize_weight4(fused)), np.asarray(want))


def test_fuse_w4_projections_forward_identical(rng):
    """Fused wqkv/w_gateup must give BITWISE-identical model outputs:
    group-wise scales are per-(group, out-channel), so concat commutes
    with quantization and the kernel computes the same dots per column."""
    from quantizedmha_tpu.models.llama import LlamaConfig, init_params, forward
    from quantizedmha_tpu.quant.weights import (
        QuantizedWeight4, fuse_w4_projections, quantize_llama_params)

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2,
        weight_quant_mode="w4a16", attention_impl="reference",
        attention_bias=True)
    p = init_params(cfg, jax.random.PRNGKey(3))
    pq = quantize_llama_params(p, bits=4, group=128)
    fl = fuse_w4_projections(pq["layers"])
    assert isinstance(fl["wqkv"], QuantizedWeight4)
    assert isinstance(fl["w_gateup"], QuantizedWeight4)
    assert "wq" not in fl and "w_up" not in fl
    toks = jnp.asarray(rng.integers(0, 128, (2, 12)), jnp.int32)
    a = forward(cfg, pq, toks)
    b = forward(cfg, dict(pq, layers=fl), toks)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
