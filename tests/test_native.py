"""Tests for the native C++ host core (native/qmha_core.cpp via ctypes).

The native core is the framework's second, independent implementation of the
golden MHA / verifier / quantizer — these tests pin it against the jnp
reference so the two goldens can cross-check each other (the reference repo
had only one golden, utils/verify.cu, and nothing to check IT against).
"""

import numpy as np
import pytest

from quantizedmha_tpu.harness.verify import compare
from quantizedmha_tpu.native import lib as native_lib
from quantizedmha_tpu.reference.mha import apply_rope, mha_reference

core = native_lib.load()
pytestmark = pytest.mark.skipif(
    core is None, reason=f"native core unavailable: {native_lib.load_error()}"
)


def test_version():
    assert core.version == 2


def test_rope_matches_jnp(rng):
    x = rng.normal(0, 1, (16, 8)).astype(np.float32)
    got = core.rope(x)
    want = np.asarray(apply_rope(x))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("use_rope", [False, True])
@pytest.mark.parametrize("causal", [False, True])
def test_cpu_mha_matches_jnp(rng, use_rope, causal):
    n, d_model, h = 48, 32, 4
    q, k, v = (rng.normal(0, 0.5, (n, d_model)).astype(np.float32) for _ in range(3))
    got = core.cpu_mha(q, k, v, h, use_rope=use_rope, causal=causal)
    want = np.asarray(mha_reference(q, k, v, d_model, h, use_rope=use_rope, causal=causal))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_cpu_mha_multithreaded_deterministic(rng):
    n, d_model, h = 64, 64, 2
    q, k, v = (rng.normal(0, 0.5, (n, d_model)).astype(np.float32) for _ in range(3))
    a = core.cpu_mha(q, k, v, h, n_threads=1)
    b = core.cpu_mha(q, k, v, h, n_threads=8)
    np.testing.assert_array_equal(a, b)


def test_cpu_mha_head_intermediates(rng):
    from quantizedmha_tpu.reference.mha import mha_with_intermediates

    n, d = 32, 16
    q, k, v = (rng.normal(0, 0.5, (n, d)).astype(np.float32) for _ in range(3))
    o = np.empty((n, d), np.float32)
    s = np.empty((n, n), np.float32)
    p = np.empty((n, n), np.float32)
    rc = core._lib.qmha_cpu_mha_head(q, k, v, o,
                                     s.ctypes.data, p.ctypes.data,
                                     n, d, 0, 0, 0, -1.0)
    assert rc == 0
    ow, sw, pw = mha_with_intermediates(q[None], k[None], v[None])
    np.testing.assert_allclose(o, np.asarray(ow)[0], atol=2e-6)
    np.testing.assert_allclose(s, np.asarray(sw)[0], atol=2e-5)
    np.testing.assert_allclose(p, np.asarray(pw)[0], atol=2e-6)


def test_verify_agrees_with_python_gate(rng):
    ref = rng.normal(0, 1, (64,)).astype(np.float32)
    got = ref.copy()
    got[3] += 0.5  # one mismatch
    got[7] = np.nan  # one non-finite
    nrep = core.verify(got, ref, 1e-3, 1e-3)
    prep = compare(got, ref, 1e-3, 1e-3)
    assert not nrep.ok and not prep.ok
    assert nrep.n_mismatch == prep.n_mismatch == 1
    assert nrep.n_nonfinite == prep.n_nonfinite == 1
    assert nrep.first_bad_index == 3
    # NaN diff propagates differently; compare the finite stats.
    mask = np.isfinite(got)
    assert nrep.max_abs == pytest.approx(np.abs(got - ref)[mask].max(), rel=1e-6)


def test_quantizer_roundtrip_and_reference_clamp(rng):
    x = rng.normal(0, 0.5, (64, 32)).astype(np.float32)
    qi, scales = core.quantize_int8(x, tile_rows=32)
    assert qi.dtype == np.int8 and scales.shape == (2,)
    # scale = amax/127 per tile (reference fa_tc_int8_a.cu:38-147 semantics).
    np.testing.assert_allclose(
        scales, np.abs(x).reshape(2, -1).max(axis=1) / 127.0, rtol=1e-6)
    deq = core.dequantize_int8(qi, scales, tile_rows=32)
    assert np.abs(deq - x).max() <= scales.max() * 0.5 + 1e-7
    # Tiny inputs: amax clamps at 1e-8 before the /127 — the same
    # semantics as the Python quantizers (ops/quantize.py), so near-zero
    # tiles quantize identically across the native and jnp paths.
    tiny = np.full((32, 8), 1e-12, np.float32)
    _, sc = core.quantize_int8(tiny, tile_rows=32)
    assert sc[0] == pytest.approx(1e-8 / 127.0)


def test_native_verify_fails_on_nan_reference(rng):
    """Native gate parity for the NaN-in-golden regression: non-finite on
    EITHER side counts once as nonfinite and fails the gate."""
    ref = rng.normal(0, 1, (16,)).astype(np.float32)
    got = ref.copy()
    ref[5] = np.nan
    nrep = core.verify(got, ref, 1e-3, 1e-3)
    prep = compare(got, ref, 1e-3, 1e-3)
    assert not nrep.ok and not prep.ok
    assert nrep.n_nonfinite == prep.n_nonfinite == 1
    assert nrep.n_mismatch == prep.n_mismatch == 0
    assert np.isfinite(nrep.max_abs)


def test_cpu_mha_windowed_matches_jnp(rng):
    """Native golden with window + sinks == the jnp masked golden (RoPE on
    both sides) — the cross-language gate behind the windowed_medium case."""
    import jax.numpy as jnp

    from quantizedmha_tpu.reference.mha import apply_rope, mha_masked_reference

    n, dm, h = 64, 32, 2
    d = dm // h
    q, k, v = (rng.normal(0, 0.5, (n, dm)).astype(np.float32) for _ in range(3))
    got = core.cpu_mha(q, k, v, h, use_rope=True, causal=True,
                       window=16, sinks=4)
    qh = jnp.asarray(q).reshape(n, h, d).transpose(1, 0, 2)[None]
    kh = jnp.asarray(k).reshape(n, h, d).transpose(1, 0, 2)[None]
    vh = jnp.asarray(v).reshape(n, h, d).transpose(1, 0, 2)[None]
    ref = mha_masked_reference(apply_rope(qh), apply_rope(kh), vh,
                               causal=True, window=16, sinks=4)
    ref = np.asarray(ref)[0].transpose(1, 0, 2).reshape(n, dm)
    np.testing.assert_allclose(got, ref, atol=2e-5)
