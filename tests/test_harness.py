"""Verify gate + roofline unit tests (utils/verify.cu + NCU-workflow reborn)."""

import warnings

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


# -- timing.benchmark under a simulated clock ---------------------------------
#
# run9's measurement-hazard fixes (profiles/md/run9_mxu_gap/notes.md:54-68)
# made `benchmark()` the foundation of every published number: it sizes
# `runs` from a DIFFERENCED pre-batch (so the ~40 ms/sync tunnel overhead
# cancels) and auto-scales until each two-point fit carries >= min_signal_s
# of real kernel work. These tests pin that logic with a fake clock: a
# regression here silently invalidates all future BENCH rounds.


class _FakeBench:
    """Deterministic fn/_sync/clock triple for timing.benchmark.

    fn advances the clock by `per_call`; _sync advances it by the next
    entry of `sync_costs` (cycled; lets tests inject one-sided spikes) and
    records how many fn calls the batch contained.
    """

    def __init__(self, per_call, sync_costs=(0.040,)):
        self.t = 0.0
        self.per_call = per_call
        self.sync_costs = list(sync_costs)
        self.n_sync = 0
        self.calls_since_sync = 0
        self.batch_sizes = []

    def perf_counter(self):
        return self.t

    def fn(self):
        self.t += self.per_call
        self.calls_since_sync += 1
        return None

    def sync(self, out):
        cost = self.sync_costs[min(self.n_sync, len(self.sync_costs) - 1)]
        self.n_sync += 1
        self.t += cost
        self.batch_sizes.append(self.calls_since_sync)
        self.calls_since_sync = 0


def _patched_benchmark(monkeypatch, fake, **kw):
    import types

    from quantizedmha_tpu.harness import timing

    monkeypatch.setattr(
        timing, "time", types.SimpleNamespace(perf_counter=fake.perf_counter)
    )
    monkeypatch.setattr(timing, "_sync", fake.sync)
    return timing.benchmark(fake.fn, **kw)


def test_benchmark_cancels_constant_sync_overhead(monkeypatch):
    """A 40 ms/sync constant overhead must not leak into the estimate:
    the two-point fit differences it away exactly."""
    fake = _FakeBench(per_call=5e-3, sync_costs=(0.040,))
    t = _patched_benchmark(monkeypatch, fake, warmup=1, runs=16, repeats=3)
    assert t.median_ms == pytest.approx(5.0, rel=1e-6)
    assert t.best_ms == pytest.approx(5.0, rel=1e-6)


def test_benchmark_presizing_is_differenced(monkeypatch):
    """min_signal_s sizing must difference the two pre-batches: with a
    0.5 ms kernel under 45 ms/sync overhead, a single-batch mean would
    estimate ~2.4 ms/call and undersize runs to ~70; the differenced
    estimate (0.5 ms) scales runs to >= 300 so each fit carries
    >= 150 ms of real kernel work (the run9 collapse fix)."""
    fake = _FakeBench(per_call=5e-4, sync_costs=(0.045,))
    t = _patched_benchmark(
        monkeypatch, fake, warmup=1, runs=16, repeats=3, min_signal_s=0.15
    )
    # sizing batches are 8 then 24 calls; the measured batches follow.
    assert fake.batch_sizes[1:3] == [8, 24]
    assert max(fake.batch_sizes) >= 300
    assert t.median_ms == pytest.approx(0.5, rel=1e-6)


def test_benchmark_autoscale_caps_at_512(monkeypatch):
    """A ~10 us fn would want ~15k runs; the cap keeps batches bounded
    (wall-clock guard) at 512. Sync overhead is kept small here because
    the sizing floor `t24/24/4` intentionally bounds scaling when the
    pre-batches are overhead-dominated (can't trust the difference)."""
    fake = _FakeBench(per_call=1e-5, sync_costs=(0.005,))
    t = _patched_benchmark(
        monkeypatch, fake, warmup=1, runs=16, repeats=3, min_signal_s=0.15
    )
    assert max(fake.batch_sizes) == 512
    assert t.median_ms == pytest.approx(1e-2, rel=1e-6)


def test_benchmark_resamples_through_small_batch_spikes(monkeypatch):
    """One-sided spikes landing in the SMALL-K batches push median t(K1)
    above median t(K2) and would collapse the fit to the ~0 clamp floor;
    benchmark() must resample until the difference is positive.

    Spike schedule (min_signal_s=0 keeps runs=16, k1=4): sync #0 is
    warmup; syncs 1,3,5 are the first round's t1 batches — spiked +1 s.
    All later syncs are clean, so round 3's 9 clean t1 samples pull the
    median back under t2's."""
    costs = [0.02] + [1.0, 0.02] * 3 + [0.02] * 100
    fake = _FakeBench(per_call=5e-3, sync_costs=costs)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # resampling must avoid the warning
        t = _patched_benchmark(
            monkeypatch, fake, warmup=1, runs=16, repeats=3, min_signal_s=0.0
        )
    assert t.median_ms == pytest.approx(5.0, rel=1e-6)
    # 3 rounds of (t1, t2) x repeats=3 ran: warmup + 18 batches.
    assert fake.n_sync == 1 + 18


def test_benchmark_warns_when_noise_swamps_signal(monkeypatch):
    """If every resample round stays non-positive the fit reports the
    clamp floor — but MUST warn so the caller knows the Timing is junk."""
    costs = [0.02] + [1.0, 0.02] * 50  # every t1 spiked, forever
    fake = _FakeBench(per_call=5e-3, sync_costs=costs)
    with pytest.warns(RuntimeWarning, match="non-positive"):
        t = _patched_benchmark(
            monkeypatch, fake, warmup=1, runs=16, repeats=3, min_signal_s=0.0
        )
    assert t.estimate_s == pytest.approx(1e-9)


# -- composite achievable-time model ------------------------------------------


def test_attention_achievable_matches_run9_decomposition():
    """The model's constants are calibrated against run9's measured
    decomposition at the reference headline shape (N=8192, h=32, d=32,
    int8): matmul-only floor 1.75 ms, softmax pipeline ~4.0 ms
    (profiles/md/run9_mxu_gap/notes.md:20-39)."""
    from quantizedmha_tpu.profiling.roofline import attention_achievable

    chip = ChipSpec("TPU v5 lite", 197.0, 394.0, 819.0)
    r = attention_achievable(
        6.0e-3, batch=1, heads=32, q_len=8192, kv_len=8192, head_dim=32,
        dtype="int8", chip=chip)
    assert r.t_mxu_s == pytest.approx(1.75e-3, rel=0.02)
    assert r.t_vpu_s == pytest.approx(4.0e-3, rel=0.02)
    assert r.t_achievable_s == pytest.approx(
        r.t_mxu_s + r.t_vpu_s + r.t_hbm_s)
    assert r.pct_of_achievable == pytest.approx(
        100.0 * r.t_achievable_s / 6.0e-3)


def test_attention_achievable_contraction_tax_gone_at_d128():
    """At head_dim >= 128 the QK contraction fills the MXU: t_mxu equals
    flops/peak exactly (no depth tax), so the achievable target tightens."""
    from quantizedmha_tpu.profiling.roofline import attention_achievable

    chip = ChipSpec("TPU v5 lite", 197.0, 394.0, 819.0)
    r = attention_achievable(
        1e-3, batch=1, heads=8, q_len=4096, kv_len=4096, head_dim=128,
        dtype="int8", chip=chip)
    flops = attention_flops(1, 8, 4096, 4096, 128)
    assert r.t_mxu_s == pytest.approx(flops / 394e12)
    # d=256 saturates too (min(d,128)/128 == 1): no *extra* credit.
    r256 = attention_achievable(
        1e-3, batch=1, heads=8, q_len=4096, kv_len=4096, head_dim=256,
        dtype="int8", chip=chip)
    assert r256.t_mxu_s == pytest.approx(
        attention_flops(1, 8, 4096, 4096, 256) / 394e12)


def test_attention_achievable_hbm_dominates_skinny_shapes():
    """A tiny-q/huge-kv shape is HBM-bound: the traffic term dominates the
    (negligible) compute terms in the all-serial sum (run19 measured MXU,
    VPU and DMA as additive across three shapes)."""
    from quantizedmha_tpu.profiling.roofline import attention_achievable

    chip = ChipSpec("TPU v5 lite", 197.0, 394.0, 819.0)
    r = attention_achievable(
        1e-4, batch=1, heads=8, q_len=8, kv_len=8192, head_dim=128,
        dtype="bf16", chip=chip)
    assert r.t_hbm_s > r.t_mxu_s + r.t_vpu_s
    assert r.t_achievable_s == pytest.approx(
        r.t_hbm_s + r.t_mxu_s + r.t_vpu_s)


def test_attention_achievable_bf16pv_pipeline():
    """The d<=64 default pipeline (run21 bf16 P-V + run25 MXU-sum l):
    3 VPU passes and the PV matmul charged at the bf16 rate while QK
    stays int8."""
    from quantizedmha_tpu.profiling.roofline import attention_achievable

    chip = ChipSpec("TPU v5 lite", 197.0, 394.0, 819.0)
    a = attention_achievable(
        1e-3, batch=1, heads=16, q_len=4096, kv_len=4096, head_dim=64,
        dtype="int8_bf16pv", chip=chip)
    b = attention_achievable(
        1e-3, batch=1, heads=16, q_len=4096, kv_len=4096, head_dim=64,
        dtype="int8", chip=chip)
    pairs = 16 * 4096.0 * 4096
    flops = 2.0 * pairs * 64
    # QK identical (int8 peak, depth tax 64/128); PV doubles under bf16.
    assert a.t_mxu_s == pytest.approx(
        flops / (394e12 * 0.5) + flops / 197e12)
    assert b.t_mxu_s == pytest.approx(
        flops / (394e12 * 0.5) + flops / 394e12)
    # 3 passes (dequant-fma, max, exp — run25 moved sum to the MXU) vs 6.
    assert a.t_vpu_s == pytest.approx(b.t_vpu_s * 3 / 6)
