"""Pallas w4 fused dequant-matmul: golden gates on RANDOM inputs (the
reference's blind spot was constant-input checks, SURVEY §4.4), block
sweeps, padding, and the qdense routing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.ops.w4_matmul import pick_w4_blocks, w4_matmul
from quantizedmha_tpu.quant.weights import (
    dequantize_weight4,
    quantize_weight4,
)


def _case(rng, rows, in_dim, out_dim, group, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(0, 1, (rows, in_dim)), dtype)
    w = jnp.asarray(rng.normal(0, 0.1, (in_dim, out_dim)), jnp.float32)
    qw = quantize_weight4(w, group=group)
    return x, qw


class TestW4Matmul:
    @pytest.mark.parametrize("rows,in_dim,out_dim,group", [
        (1, 256, 128, 128),
        (8, 256, 256, 64),
        (5, 512, 384, 128),   # row padding + non-pow2 out blocks
        (16, 1024, 512, 256),
    ])
    def test_matches_dequantized_matmul(self, rng, rows, in_dim, out_dim,
                                        group):
        x, qw = _case(rng, rows, in_dim, out_dim, group)
        got = w4_matmul(x, qw.packed, qw.scale, group=group)
        want = x @ dequantize_weight4(qw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16_activation(self, rng):
        x, qw = _case(rng, 8, 512, 256, 128, dtype=jnp.bfloat16)
        got = w4_matmul(x, qw.packed, qw.scale, group=128)
        assert got.dtype == jnp.bfloat16
        want = (x.astype(jnp.float32) @ dequantize_weight4(qw))
        rel = float(jnp.linalg.norm(got.astype(jnp.float32) - want)
                    / jnp.linalg.norm(want))
        assert rel < 0.02, rel  # bf16 dot rounding only

    def test_block_sweep(self, rng):
        x, qw = _case(rng, 8, 512, 512, 64)
        want = x @ dequantize_weight4(qw)
        for bk2 in (32, 64, 128, 256):
            for bn in (128, 256, 512):
                got = w4_matmul(x, qw.packed, qw.scale, group=64,
                                block_k2=bk2, block_n=bn)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), rtol=2e-5,
                    atol=2e-5, err_msg=f"bk2={bk2} bn={bn}")

    def test_under_jit_and_grad_free(self, rng):
        x, qw = _case(rng, 8, 256, 128, 64)
        f = jax.jit(lambda x: w4_matmul(x, qw.packed, qw.scale, group=64))
        np.testing.assert_allclose(np.asarray(f(x)),
                                   np.asarray(w4_matmul(x, qw.packed,
                                                        qw.scale, group=64)))

    def test_bad_blocks_rejected(self, rng):
        x, qw = _case(rng, 2, 256, 128, 64)
        with pytest.raises(ValueError, match="block_k2"):
            w4_matmul(x, qw.packed, qw.scale, group=64, block_k2=48)
        with pytest.raises(ValueError, match="block_n"):
            w4_matmul(x, qw.packed, qw.scale, group=64, block_n=96)

    def test_pick_blocks_defaults(self):
        bk2, bn = pick_w4_blocks(2048, 14336, 128)
        assert 2048 % bk2 == 0 and bk2 % 64 == 0
        assert 14336 % bn == 0
        # 8B shapes: full-size tiles (512x2048 after run36e's grid sweep)
        assert bk2 == 512 and bn == 2048


class TestW4MatmulStacked:
    def test_stacked_matches_sliced(self, rng):
        L = 3
        w = jnp.asarray(rng.normal(0, 0.1, (L, 256, 128)), jnp.float32)
        qw = quantize_weight4(w, group=64)
        x = jnp.asarray(rng.normal(0, 1, (4, 256)), jnp.float32)
        for li in range(L):
            got = w4_matmul(x, qw.packed, qw.scale, group=64,
                            layer=jnp.int32(li))
            want = w4_matmul(x, qw.packed[li], qw.scale[li], group=64)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"layer {li}")

    def test_stacked_under_scan(self, rng):
        # the production pattern: layer index is a traced scan variable
        L = 4
        w = jnp.asarray(rng.normal(0, 0.1, (L, 128, 64)), jnp.float32)
        qw = quantize_weight4(w, group=32)
        x = jnp.asarray(rng.normal(0, 1, (2, 128)), jnp.float32)

        def body(c, li):
            return c + w4_matmul(x, qw.packed, qw.scale, group=32,
                                 layer=li), None

        out, _ = jax.lax.scan(
            body, jnp.zeros((2, 64), jnp.float32),
            jnp.arange(L, dtype=jnp.int32))
        want = sum(x @ dequantize_weight4(
            quantize_weight4(w[i], group=32)) for i in range(L))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_layer_arg_validation(self, rng):
        w = quantize_weight4(jnp.ones((2, 64, 8)), group=16)
        x = jnp.ones((2, 64))
        with pytest.raises(ValueError, match="layer"):
            w4_matmul(x, w.packed, w.scale, group=16)  # stacked, no layer
        w1 = quantize_weight4(jnp.ones((64, 8)), group=16)
        with pytest.raises(ValueError, match="layer"):
            w4_matmul(x, w1.packed, w1.scale, group=16,
                      layer=jnp.int32(0))  # unstacked + layer

    def test_layer_indexed_qdense(self, rng):
        from quantizedmha_tpu.quant.weights import LayerIndexed4, qdense

        L = 2
        w = jnp.asarray(rng.normal(0, 0.1, (L, 128, 64)), jnp.float32)
        qw = quantize_weight4(w, group=32)
        x = jnp.asarray(rng.normal(0, 1, (3, 128)), jnp.float32)
        got = qdense(x, LayerIndexed4(qw, jnp.int32(1)))
        import dataclasses

        sliced = dataclasses.replace(
            qw, packed=qw.packed[1], scale=qw.scale[1])
        want = qdense(x, sliced)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


class TestQDenseRouting:
    def test_qdense_decode_uses_pallas(self, rng, monkeypatch):
        import quantizedmha_tpu.quant.weights as wmod
        from quantizedmha_tpu.quant.weights import qdense

        x, qw = _case(rng, 4, 256, 128, 64)
        called = {}
        import quantizedmha_tpu.ops.w4_matmul as kmod

        real = kmod.w4_matmul

        def spy(*a, **k):
            called["yes"] = True
            return real(*a, **k)

        monkeypatch.setattr(kmod, "w4_matmul", spy)
        got = qdense(x, qw)
        assert called.get("yes")
        monkeypatch.setattr(wmod, "W4_USE_PALLAS", False)
        want = qdense(x, qw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


# --- halves packing (round 5) ----------------------------------------------

@pytest.mark.parametrize("K,N", [(1024, 512), (512, 384), (2048, 256)])
def test_w4_matmul_halves_matches_dequant(rng, K, N):
    """"halves" nibble layout (byte i = input rows i | k2+i): the
    activation split becomes two static slices instead of the even/odd
    lane gather (run42/48 traced those copies at ~0.5-0.7 ms/step).
    Same exactness contract as pairs."""
    from quantizedmha_tpu.quant.weights import (
        dequantize_weight4, quantize_weight4)
    w = jnp.asarray(rng.normal(0, 0.05, (K, N)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (5, K)), jnp.float32)
    qh = quantize_weight4(w, group=128, packing="halves")
    want = x @ dequantize_weight4(qh)
    got = w4_matmul(x, qh.packed, qh.scale, group=128, packing="halves")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4 * float(jnp.abs(want).max()))
    # pairs and halves quantize to the SAME values (packing is layout)
    qp = quantize_weight4(w, group=128, packing="pairs")
    np.testing.assert_array_equal(
        np.asarray(dequantize_weight4(qp)), np.asarray(dequantize_weight4(qh)))


def test_w4_matmul_halves_stacked_and_fused(rng):
    from quantizedmha_tpu.quant.weights import (
        concat_w4, dequantize_weight4, quantize_weight4)
    K = 1024
    w = jnp.asarray(rng.normal(0, 0.05, (3, K, 256)), jnp.float32)
    qh = quantize_weight4(w, group=128, packing="halves")
    x = jnp.asarray(rng.normal(0, 1, (8, K)), jnp.bfloat16)
    for li in (0, 2):
        got = w4_matmul(x, qh.packed, qh.scale, group=128,
                        layer=jnp.int32(li), packing="halves")
        want = x.astype(jnp.float32) @ dequantize_weight4(qh)[li]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want),
            atol=0.02 * float(jnp.abs(want).max()))
    # fused concat keeps packing and stays exact per column
    a = quantize_weight4(w[0], group=128, packing="halves")
    b = quantize_weight4(w[1] * 0.3, group=128, packing="halves")
    fused = concat_w4([a, b])
    assert fused.packing == "halves"
    got = w4_matmul(x, fused.packed, fused.scale, group=128,
                    packing="halves")
    want = jnp.concatenate(
        [x.astype(jnp.float32) @ dequantize_weight4(a),
         x.astype(jnp.float32) @ dequantize_weight4(b)], axis=-1)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want),
        atol=0.02 * float(jnp.abs(want).max()))


def test_w4_matmul_halves_mixed_packing_concat_rejected(rng):
    from quantizedmha_tpu.quant.weights import concat_w4, quantize_weight4
    w = jnp.asarray(rng.normal(0, 0.05, (256, 128)), jnp.float32)
    a = quantize_weight4(w, group=128, packing="pairs")
    b = quantize_weight4(w, group=128, packing="halves")
    with pytest.raises(ValueError, match="packing"):
        concat_w4([a, b])
