"""INT8 fused kernel: exactness vs its fake-quant golden, and error budget
vs the FP32 golden (the BASELINE.json "INT8 max-abs err vs FP32" metric).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.harness.verify import assert_close, compare
from quantizedmha_tpu.ops.flash_attention_int8 import flash_attention_int8
from quantizedmha_tpu.reference.mha import mha_reference_shaped
from quantizedmha_tpu.reference.quant_ref import (
    fake_quant_int8,
    mha_int8_reference,
    quantize_int8_tile,
)


def test_quantize_roundtrip(rng):
    x = jnp.asarray(rng.normal(0, 3.0, (64, 32)).astype(np.float32))
    q, scale = quantize_int8_tile(x)
    assert scale.shape == (1, 1)
    err = jnp.max(jnp.abs(q.astype(jnp.float32) * scale - x))
    # Max roundtrip error is half a quantization step.
    assert float(err) <= float(scale.squeeze()) * 0.5 + 1e-7


def test_quantize_per_row_scales(rng):
    x = jnp.asarray(rng.normal(0, 1.0, (16, 32)).astype(np.float32))
    q, scale = quantize_int8_tile(x, axis=-1)
    assert scale.shape == (16, 1)
    got = q.astype(jnp.float32) * scale
    assert float(jnp.max(jnp.abs(got - x))) <= float(jnp.max(scale)) * 0.5 + 1e-7


def test_quantize_constant_input_is_exact():
    x = jnp.full((32, 32), 2.5, jnp.float32)
    assert float(jnp.max(jnp.abs(fake_quant_int8(x) - x))) < 1e-6


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("pv_dtype,summode",
                         [("int8", "vpu"), ("bf16", "vpu"), ("bf16", "mxu")])
def test_kernel_matches_fake_quant_golden(qkv_factory, causal, pv_dtype,
                                          summode):
    """The Pallas kernel must reproduce the jnp fake-quant golden almost
    exactly — same quantization decisions, same accumulation structure —
    in BOTH P-V modes (bf16 P is the d<=64 default since run21; the
    golden models the same cast) and both l modes (summode="mxu" computes
    l as a ones-row of the P-V matmul — run25)."""
    q, k, v = qkv_factory(batch=1, heads=2, q_len=256, kv_len=256)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    out = flash_attention_int8(q, k, v, causal=causal, block_q=128,
                               block_kv=128, pv_dtype=pv_dtype,
                               summode=summode)
    ref = mha_int8_reference(q, k, v, causal=causal, block_q=128,
                             block_kv=128, pv_dtype=pv_dtype,
                             summode=summode)
    # int8 P-V accumulates in INTEGERS (order-invariant, bit-reproducible
    # between einsum and MXU); bf16 P-V accumulates in f32, where the
    # golden's einsum and the kernel's dot sum in different orders —
    # ~1e-5-scale noise at these magnitudes, not a quantization delta.
    abs_tol = 1e-5 if pv_dtype == "int8" else 1e-4
    assert_close(out, ref, abs_tol=abs_tol, rel_tol=1e-4,
                 what=f"int8 vs fake-quant causal={causal} pv={pv_dtype} "
                      f"sum={summode}")


def test_kernel_matches_golden_d128_transposed(qkv_factory):
    """head_dim=128 NON-CAUSAL routes to the TRANSPOSED orientation since
    run27 (0.565 vs 0.614 ms on chip; causal/windowed stay standard —
    run27c): the fused-row pipeline must still match the fake-quant
    golden exactly at the full-MXU head size. transposed=True pins the
    orientation so the test keeps covering it if routing changes."""
    q, k, v = qkv_factory(batch=1, heads=2, q_len=256, kv_len=256,
                          head_dim=128)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    out = flash_attention_int8(q, k, v, transposed=True, block_q=128,
                               block_kv=128)
    ref = mha_int8_reference(q, k, v, block_q=128,
                             block_kv=128, pv_dtype="bf16", summode="mxu")
    assert_close(out, ref, abs_tol=1e-4, rel_tol=1e-4,
                 what="int8 d128 transposed vs fake-quant golden")
    # The default route at this (non-causal) shape IS the transposed
    # orientation — same numbers.
    out_auto = flash_attention_int8(q, k, v, block_q=128, block_kv=128)
    assert_close(out_auto, ref, abs_tol=1e-4, rel_tol=1e-4,
                 what="int8 d128 auto-route vs fake-quant golden")


def test_summode_mxu_requires_bf16_pv(qkv_factory):
    """An int8 ones-row would land round(1/vs) error on l (run3's rejected
    candidate 3) — the combination must refuse, not silently degrade."""
    q, k, v = qkv_factory(batch=1, heads=2, q_len=128, kv_len=128)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    with pytest.raises(ValueError, match="summode"):
        flash_attention_int8(q, k, v, pv_dtype="int8", summode="mxu")
    # Standard orientation (transposed=False): the PV output lanes are
    # full, no idle sublanes to ride — refused as well.
    with pytest.raises(ValueError, match="summode"):
        flash_attention_int8(q, k, v, transposed=False, summode="mxu")


def test_error_budget_vs_fp32_random(qkv_factory):
    """On random inputs the per-tile INT8 path must stay within a 5% max
    relative error of the FP32 golden (reported, not hidden — the reference
    only ever measured its INT8 delta on constant inputs)."""
    q, k, v = qkv_factory(batch=1, heads=4, q_len=512, kv_len=512)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    out = flash_attention_int8(q, k, v)
    ref = mha_reference_shaped(q, k, v)
    report = compare(out, ref, abs_tol=5e-2, rel_tol=5e-1)
    assert report.max_rel < 0.05, f"INT8 error too large: {report}"


def test_constant_input_parity_gate():
    """The reference's own correctness gate (drivers/main.cu:73-104:
    constant-1.0 inputs, tol=1e-3): its INT8 kernel deviated 0.3-0.4%
    (profiles/md/run7/notes.md:41-53). Ours must beat that budget."""
    B, H, S, D = 1, 2, 256, 64
    one = jnp.ones((B, H, S, D), jnp.float32)
    out = flash_attention_int8(one, one, one)
    # With V == 1 the exact output is 1 everywhere.
    err = float(jnp.max(jnp.abs(out - 1.0)))
    assert err < 1e-3, f"constant-input INT8 deviation {err} exceeds the 1e-3 gate"


def test_uneven_lengths(qkv_factory):
    q, k, v = qkv_factory(q_len=130, kv_len=200)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    out = flash_attention_int8(q, k, v, block_q=128, block_kv=128)
    # Padding path: compare against fp32 golden within the int8 budget.
    ref = mha_reference_shaped(q, k, v)
    report = compare(out, ref, abs_tol=5e-2, rel_tol=5e-1)
    assert report.max_rel < 0.05, f"{report}"


def test_prequant_masks_block_aligned_padding(qkv_factory):
    """Regression: a cache padded beyond a BLOCK-ALIGNED true kv_len must
    still mask the tail in non-causal attention (the old gate only fired
    when kv_len % block_kv != 0)."""
    from quantizedmha_tpu.ops.flash_attention_int8 import (
        flash_attention_int8_prequant,
    )
    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks
    from quantizedmha_tpu.reference.mha import mha_reference_shaped

    q, k, v = qkv_factory(batch=1, heads=2, q_len=128, kv_len=128, head_dim=64)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    # Pad the cache to 256 with GARBAGE (ones, scale 1.0) beyond kv_len=128.
    pad = jnp.ones((1, 2, 128, 64), jnp.float32) * 3.0
    k_p = jnp.concatenate([k, pad], axis=2)
    v_p = jnp.concatenate([v, pad], axis=2)
    k_i8, ks = quantize_kv_blocks(k_p, 64)
    v_i8, vs = quantize_kv_blocks(v_p, 64)
    out = flash_attention_int8_prequant(
        q, k_i8, ks, v_i8, vs, kv_len=128, block_kv=64, causal=False)
    ref = mha_reference_shaped(q, k, v)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 4e-2


def test_fully_masked_rows_in_live_block(qkv_factory):
    """Ring-attention geometry: the kv shard sits ahead of half the q rows
    (kv_offset > q_offset), fully masking them inside a kv block that still
    runs. INT8 path must emit o = 0 / lse = -inf for those rows (the static
    P scale would otherwise leave p = p_scale per entry -> mean(V) garbage)."""
    from quantizedmha_tpu.ops.flash_attention_int8 import (
        flash_attention_int8_prequant,
    )
    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks

    q, k, v = qkv_factory(batch=1, heads=2, q_len=128, kv_len=128, head_dim=64)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    kv_off = 64
    k_i8, ks = quantize_kv_blocks(k, 128)
    v_i8, vs = quantize_kv_blocks(v, 128)
    out, lse = flash_attention_int8_prequant(
        q, k_i8, ks, v_i8, vs, causal=True, block_q=128, block_kv=128,
        q_offset=0, kv_offset=kv_off, save_residuals=True)
    out, lse = np.asarray(out), np.asarray(lse)
    np.testing.assert_array_equal(out[:, :, :kv_off], 0.0)
    assert np.all(np.isneginf(lse[:, :, :kv_off]))
    # Live rows stay within the int8 budget of a masked fp32 reference.
    import jax

    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (q.shape[-1] ** -0.5)
    qpos = jnp.arange(q.shape[2])[:, None]
    kpos = jnp.arange(k.shape[2])[None, :] + kv_off
    s = jnp.where(kpos <= qpos, s, -jnp.inf)
    ref = jnp.einsum("bhqk,bhkd->bhqd",
                     jax.nn.softmax(s[:, :, kv_off:], axis=-1), v)
    assert np.abs(out[:, :, kv_off:] - np.asarray(ref)).max() < 4e-2


@pytest.mark.parametrize("transposed", [False, True])
def test_gqa_int8_matches_repeat_kv(qkv_factory, transposed):
    """Both INT8 orientations are GQA-native: quantized K/V with fewer
    heads must match explicitly repeated K/V exactly (same scales, same
    integer math)."""
    q, _, _ = qkv_factory(batch=1, heads=4, q_len=128, kv_len=128, head_dim=64)
    _, k, v = qkv_factory(batch=1, heads=2, q_len=128, kv_len=128, head_dim=64)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    rep = lambda x: jnp.repeat(x, 2, axis=1)
    out = flash_attention_int8(q, k, v, causal=True, transposed=transposed,
                               block_q=128, block_kv=128)
    ref = flash_attention_int8(q, rep(k), rep(v), causal=True,
                               transposed=transposed,
                               block_q=128, block_kv=128)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("transposed", [False, True])
@pytest.mark.parametrize("window,softcap", [(128, None), (None, 30.0),
                                            (128, 30.0)])
def test_int8_window_and_softcap(qkv_factory, transposed, window, softcap):
    """Sliding window + logit soft-cap in both INT8 orientations stay within
    the int8 budget of an explicit jnp reference."""
    import jax

    q, k, v = qkv_factory(batch=1, heads=2, q_len=512, kv_len=512, head_dim=64)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    out = flash_attention_int8(q, k, v, causal=True, transposed=transposed,
                               window=window, logit_softcap=softcap,
                               block_q=128, block_kv=128)
    from quantizedmha_tpu.reference.mha import mha_masked_reference

    ref = mha_masked_reference(q, k, v, causal=True, window=window,
                               softcap=softcap)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 4e-2


@pytest.mark.parametrize("transposed", [False, True])
def test_int8_attention_sinks(qkv_factory, transposed):
    from quantizedmha_tpu.reference.mha import mha_masked_reference

    q, k, v = qkv_factory(batch=1, heads=2, q_len=512, kv_len=512, head_dim=64)
    q, k, v = (jnp.asarray(x) for x in (q, k, v))
    out = flash_attention_int8(q, k, v, causal=True, transposed=transposed,
                               window=128, attention_sinks=16,
                               block_q=128, block_kv=128)
    ref = mha_masked_reference(q, k, v, causal=True, window=128, sinks=16)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 4e-2


def test_transposed_prequant_lse_matches_standard(rng):
    """The transposed orientation's lse residual and traced offsets must
    agree with the standard orientation's (they feed the same cross-shard
    merges in parallel/ring)."""
    from quantizedmha_tpu.ops.flash_attention_int8 import (
        flash_attention_int8_prequant,
        flash_attention_int8_t_prequant,
    )
    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks

    q = jnp.asarray(rng.normal(0, 0.5, (1, 2, 64, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (1, 2, 128, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (1, 2, 128, 32)), jnp.float32)
    k_i8, ks = quantize_kv_blocks(k, 32)
    v_i8, vs = quantize_kv_blocks(v, 32)

    for q_off, kv_off in ((None, None), (64, 0), (jnp.int32(32), jnp.int32(16))):
        o_s, lse_s = flash_attention_int8_prequant(
            q, k_i8, ks, v_i8, vs, causal=True, block_kv=32,
            q_offset=q_off, kv_offset=kv_off, save_residuals=True)
        o_t, lse_t = flash_attention_int8_t_prequant(
            q, k_i8, ks, v_i8, vs, causal=True,
            q_offset=q_off, kv_offset=kv_off, save_residuals=True)
        # Same int8 data, same scales; only Q quantization axes differ
        # (per-row vs per-column -> identical per-row scales here), so
        # outputs and lse agree tightly.
        np.testing.assert_allclose(
            np.asarray(o_s), np.asarray(o_t), atol=2e-2, rtol=2e-2)
        ls, lt = np.asarray(lse_s), np.asarray(lse_t)
        both_finite = np.isfinite(ls) & np.isfinite(lt)
        assert np.array_equal(np.isfinite(ls), np.isfinite(lt))
        np.testing.assert_allclose(ls[both_finite], lt[both_finite],
                                   atol=2e-2, rtol=2e-2)


def test_int8_windowed_shrunk_grid_parity(rng):
    """Long sequence + small window at explicit small blocks TRIGGERS the
    shrunk O(seq*window) kv grid (sink_blocks + nkv_win < nkv_tot) in both
    INT8 orientations; outputs must match the masked jnp reference exactly
    as in the full-grid case (VERDICT round-1 weak #5: the shrunk grid
    existed only in the float forward)."""
    from quantizedmha_tpu.ops.flash_attention_int8 import (
        flash_attention_int8_prequant,
        flash_attention_int8_t_prequant,
    )
    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks
    from quantizedmha_tpu.reference.mha import mha_masked_reference

    S, W, sinks = 1024, 128, 16
    q = jnp.asarray(rng.normal(0, 0.5, (1, 2, S, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (1, 2, S, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (1, 2, S, 32)), jnp.float32)
    k_i8, ks = quantize_kv_blocks(k, 64)
    v_i8, vs = quantize_kv_blocks(v, 64)
    ref = mha_masked_reference(q, k, v, causal=True, window=W, sinks=sinks)

    # nkv_tot = 16; block_q=128 -> nkv_win = (128+126)//64+2 = 5; sinks add
    # 1 block: 6 < 16 -> shrunk branch taken in both wrappers.
    o_std = flash_attention_int8_prequant(
        q, k_i8, ks, v_i8, vs, causal=True, block_q=128, block_kv=64,
        window=W, attention_sinks=sinks)
    np.testing.assert_allclose(np.asarray(o_std), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)

    o_t = flash_attention_int8_t_prequant(
        q, k_i8, ks, v_i8, vs, causal=True, block_q=128,
        window=W, attention_sinks=sinks)
    np.testing.assert_allclose(np.asarray(o_t), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)
