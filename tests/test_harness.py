"""Verify gate + roofline unit tests (utils/verify.cu + NCU-workflow reborn)."""

import numpy as np
import pytest

from quantizedmha_tpu.harness.verify import ErrorReport, assert_close, compare
from quantizedmha_tpu.profiling.roofline import (
    ChipSpec,
    attention_bytes,
    attention_flops,
    roofline,
)


def test_compare_pass():
    a = np.ones((8, 8), np.float32)
    r = compare(a, a + 5e-4)
    assert r.ok and r.n_mismatch == 0


def test_compare_tolerance_semantics():
    """tol = max(abs, rel*|ref|) — reference utils/verify.cu:161-171."""
    ref = np.array([100.0, 0.0001], np.float32)
    got = np.array([100.05, 0.0015], np.float32)  # 100.05: within rel; 0.0015: > abs tol
    r = compare(got, ref, abs_tol=1e-3, rel_tol=1e-3)
    assert r.n_mismatch == 1


def test_compare_nonfinite_detected():
    ref = np.zeros(4, np.float32)
    got = np.array([0, np.nan, np.inf, 0], np.float32)
    r = compare(got, ref)
    assert not r.ok and r.n_nonfinite == 2


def test_assert_close_raises():
    with pytest.raises(AssertionError):
        assert_close(np.ones(3), np.zeros(3))


def test_attention_flops():
    # 2 matmuls x 2*N*M*d; causal counts exactly the visible lower
    # triangle (n(n+1)/2 pairs), windows/sinks count their mask exactly.
    assert attention_flops(1, 1, 128, 128, 64) == 2 * 2 * 128 * 128 * 64
    n = 128
    assert attention_flops(1, 1, n, n, 64, causal=True) == (
        2 * 2 * 64 * n * (n + 1) / 2)
    # window: rows past the ramp see exactly `window` columns
    w = attention_flops(1, 1, n, n, 64, causal=True, window=16)
    ramp = sum(min(i + 1, 16) for i in range(n))
    assert w == 2 * 2 * 64 * ramp
    # sinks add the out-of-window prefix columns
    wk = attention_flops(1, 1, n, n, 64, causal=True, window=16, sinks=4)
    full = sum(min(i + 1, 16) + max(0, min(4, i + 1 - 16)) for i in range(n))
    assert wk == 2 * 2 * 64 * full


def test_roofline_math():
    chip = ChipSpec("test", bf16_tflops=100.0, int8_tops=200.0, hbm_gbps=1000.0)
    # 1e12 FLOPs in 0.02 s => 50 TFLOP/s = 50% of 100 TFLOP/s peak.
    r = roofline(0.02, 1e12, 1e9, dtype="bf16", chip=chip)
    assert abs(r.tflops_achieved - 50.0) < 1e-6
    assert abs(r.pct_of_compute_sol - 50.0) < 1e-6
    # memory SoL: 1e9 bytes @ 1000 GB/s = 1 ms => 5% of the 20 ms runtime
    assert abs(r.pct_of_memory_sol - 5.0) < 1e-6
    assert r.compute_bound


def test_int8_peak_selected():
    chip = ChipSpec("test", 100.0, 200.0, 1000.0)
    r = roofline(0.01, 1e12, 0, dtype="int8", chip=chip)
    assert abs(r.pct_of_compute_sol - 50.0) < 1e-6


def test_timing_best_ms_is_min_batch_fit():
    from quantizedmha_tpu.harness.timing import Timing

    # best_ms is the dedicated min-batch fit, NOT min over pair estimates:
    # a spike in a pair's small-K batch deflates that pair's estimate, and
    # min-over-pairs would select exactly those deflated pairs.
    t = Timing(
        estimate_s=2e-3, pair_estimates_s=[3e-3, 1.5e-3, 2.5e-3], best_s=1.8e-3
    )
    assert t.best_ms == pytest.approx(1.8)
    assert t.median_ms == 2.0
    # Without a recorded min-batch fit it falls back to the estimate.
    t_empty = Timing(estimate_s=2e-3, pair_estimates_s=[])
    assert t_empty.best_ms == 2.0


def test_compare_fails_on_nan_reference():
    """Regression: a NaN in the GOLDEN must fail the gate — NaN diffs fail
    every `> tol` comparison, so without explicit handling those elements
    were silently unverified (and the native gate's std::max dropped them
    from the stats too)."""
    got = np.asarray([1.0, 2.0], np.float32)
    ref = np.asarray([np.nan, 2.0], np.float32)
    rep = compare(got, ref)
    assert not rep.ok and rep.n_nonfinite == 1
    assert np.isfinite(rep.max_abs)
