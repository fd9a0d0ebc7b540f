"""Tests for the profiling suite: device info, trace capture, bench compare."""

import json

import pytest

import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.profiling import compare as cmp
from quantizedmha_tpu.profiling import device_info as di
from quantizedmha_tpu.profiling import trace as tr


class TestDeviceInfo:
    def test_fields_present(self):
        info = di.device_info()
        for key in ("platform", "device_kind", "num_devices",
                    "vmem_bytes_per_core", "peak_bf16_tflops", "peak_hbm_gbps"):
            assert key in info
        assert info["num_devices"] >= 1

    def test_dump_writes_txt_and_json(self, tmp_path):
        out = di.dump(tmp_path / "device_info.txt")
        assert out.exists()
        text = out.read_text()
        assert "device_kind" in text
        payload = json.loads(out.with_suffix(".json").read_text())
        assert payload["platform"]


class TestTrace:
    def test_capture_produces_trace_and_summary(self, tmp_path):
        def fn(x):
            return jnp.tanh(x @ x)

        x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 64)), jnp.float32)
        cap = tr.capture(fn, x, trace_dir=tmp_path / "t", iters=2, warmup=1)
        assert cap.iters == 2 and cap.wall_s > 0
        assert (tmp_path / "t" / "capture_summary.json").exists()
        # xprof writes under plugins/profile/<run>/...
        assert cap.files, "trace produced no files"

    def test_annotate_context(self):
        with tr.annotate("region"):
            pass


def _payload(device="TPU v5 lite", **kernels):
    return {
        "device": device,
        "workload": {"n": 1024},
        "results": [
            {"kernel": k, "ms": ms, "tflops": tf, "pct_mxu_sol": sol,
             "pct_hbm_sol": None, "check": {"n_mismatch": 0, "n_nonfinite": 0},
             "error": None}
            for k, (ms, tf, sol) in kernels.items()
        ],
    }


class TestCompare:
    def test_markdown_structure_and_delta(self, tmp_path):
        a = _payload(fa=(2.0, 50.0, 25.0))
        b = _payload(fa=(1.0, 100.0, 50.0))
        md = cmp.compare_reports(a, b, "before", "after")
        assert "## fa" in md
        assert "-50.0% ✓" in md  # latency halved = improvement
        assert "+100.0% ✓" in md  # tflops doubled

    def test_regression_marked(self):
        a = _payload(fa=(1.0, 100.0, 50.0))
        b = _payload(fa=(2.0, 50.0, 25.0))
        md = cmp.compare_reports(a, b)
        assert "+100.0% ✗" in md

    def test_missing_kernel_and_error_rows(self):
        a = _payload(fa=(1.0, 100.0, 50.0))
        b = _payload(fa_int8=(0.5, 200.0, 50.0))
        b["results"][0]["error"] = "boom"
        md = cmp.compare_reports(a, b)
        assert "## fa" in md and "## fa_int8" in md
        assert "`boom`" in md

    def test_files_and_notes_cli(self, tmp_path, capsys):
        pa, pb = tmp_path / "a.json", tmp_path / "b.json"
        pa.write_text(json.dumps(_payload(fa=(2.0, 50.0, 25.0))))
        pb.write_text(json.dumps(_payload(fa=(1.0, 100.0, 50.0))))
        out = tmp_path / "cmp.md"
        rc = cmp.main([str(pa), str(pb), "-o", str(out),
                       "--note", "fa=doubled the block size"])
        assert rc == 0
        md = out.read_text()
        assert "> doubled the block size" in md


class TestMemoryBudget:
    def test_budget_fields(self):
        from quantizedmha_tpu.profiling.memory import memory_budget

        b = memory_budget(lambda x: jnp.tanh(x @ x), jnp.ones((256, 256)))
        if b is None:
            pytest.skip("backend exposes no memory analysis")
        assert b.argument_bytes >= 256 * 256 * 4
        assert b.output_bytes >= 256 * 256 * 4
        assert "total" in str(b)


class TestTraceSummary:
    def test_summarize_captured_trace(self, tmp_path):
        pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")
        from quantizedmha_tpu.profiling.trace_summary import summarize_trace

        def fn(x):
            return jnp.tanh(x @ x) @ x

        x = jnp.ones((256, 256))
        tr.capture(fn, x, trace_dir=tmp_path / "t", iters=2, warmup=1)
        summary = summarize_trace(str(tmp_path / "t"))
        assert summary.ops, "no ops aggregated"
        assert summary.total_ms > 0
        md = summary.to_markdown(top=5)
        assert "| op |" in md and summary.plane in md

    def test_missing_trace_raises(self, tmp_path):
        pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")
        from quantizedmha_tpu.profiling.trace_summary import summarize_trace

        with pytest.raises(FileNotFoundError):
            summarize_trace(str(tmp_path / "empty"))
