"""Tests for the harness data layer and the benchmark CLI.

Covers the reference driver's behaviors: constant/random init (data.cu:9-30),
binary input caching with metadata validation (data.cu:54-109), golden-output
caching (main.cu:15-19,87-94), and the check->profile two-phase CLI run
(main.cu:38-157) including the --no-check and --constant flags.
"""

import json
import pathlib

import numpy as np
import pytest

from quantizedmha_tpu.harness import cli
from quantizedmha_tpu.harness.data import (
    cached_inputs,
    cached_reference,
    initialize_host_data,
    load_case,
    read_tensor,
    save_case,
)


class TestData:
    def test_constant_init(self):
        d = initialize_host_data(8, 16, random=False)
        assert d.q.shape == (8, 16) and d.q.dtype == np.float32
        np.testing.assert_array_equal(d.q, 1.0)

    def test_random_init_seeded(self):
        a = initialize_host_data(8, 16, seed=7)
        b = initialize_host_data(8, 16, seed=7)
        c = initialize_host_data(8, 16, seed=8)
        np.testing.assert_array_equal(a.q, b.q)
        assert not np.array_equal(a.q, c.q)
        assert not np.array_equal(a.q, a.k)  # distinct draws per tensor

    def test_save_load_case_roundtrip(self, tmp_path):
        tensors = {
            "Q": np.arange(12, dtype=np.float32).reshape(3, 4),
            "QI": np.arange(12, dtype=np.int8).reshape(3, 4),
        }
        save_case(tmp_path / "case", tensors, {"n": 3})
        loaded, meta = load_case(tmp_path / "case")
        assert meta["n"] == 3 and meta["format_version"] == 1
        np.testing.assert_array_equal(loaded["Q"], tensors["Q"])
        np.testing.assert_array_equal(loaded["QI"], tensors["QI"])
        assert loaded["QI"].dtype == np.int8

    def test_read_tensor_shape_mismatch(self, tmp_path):
        p = tmp_path / "x.f32.bin"
        np.zeros(5, np.float32).tofile(p)
        with pytest.raises(ValueError, match="expected 6"):
            read_tensor(p, (2, 3))

    def test_cached_inputs_reuses_disk(self, tmp_path):
        a = cached_inputs(tmp_path, 8, 16, seed=3)
        # Corrupt nothing; second call must come from disk and match exactly.
        b = cached_inputs(tmp_path, 8, 16, seed=3)
        np.testing.assert_array_equal(a.q, b.q)
        dirs = list(tmp_path.glob("inputs_*"))
        assert len(dirs) == 1

    def test_cached_reference_computes_once(self, tmp_path):
        calls = []

        def compute():
            calls.append(1)
            return np.full((4, 4), 2.0, np.float32)

        a = cached_reference(tmp_path, "k1", (4, 4), compute)
        b = cached_reference(tmp_path, "k1", (4, 4), compute)
        assert len(calls) == 1
        np.testing.assert_array_equal(a, b)


class TestCli:
    def _argv(self, tmp_path, *extra):
        return [
            "--n", "128", "--d-model", "128", "--heads", "2",
            "--warmup", "1", "--runs", "2", "--repeats", "1",
            "--cache-dir", str(tmp_path / "cache"),
            *extra,
        ]

    def test_single_kernel_check_and_time(self, tmp_path, capsys):
        rc = cli.run(self._argv(tmp_path, "--kernel", "fa"))
        out = capsys.readouterr().out
        assert rc == 0
        assert "check [PASS]" in out and "ms" in out

    def test_all_kernels_json_report(self, tmp_path, capsys):
        report = tmp_path / "r.json"
        rc = cli.run(self._argv(tmp_path, "--kernel", "all", "--json", str(report)))
        assert rc == 0
        payload = json.loads(report.read_text())
        names = [r["kernel"] for r in payload["results"]]
        assert names == ["unfused", "fa", "fa_bf16", "fa_int8", "reference"]
        for r in payload["results"]:
            assert r["error"] is None
            assert r["check"]["n_mismatch"] == 0
            assert r["ms"] is not None

    def test_no_check_skips_golden(self, tmp_path, capsys):
        rc = cli.run(self._argv(tmp_path, "--kernel", "fa", "--no-check"))
        out = capsys.readouterr().out
        assert rc == 0
        assert "check" not in out
        assert not list((tmp_path / "cache").glob("ref_*"))

    def test_constant_inputs_reference_parity(self, tmp_path, capsys):
        rc = cli.run(self._argv(tmp_path, "--kernel", "fa", "--constant"))
        assert rc == 0
        # With V == 1 the output must be exactly rows of ones (row-stochastic
        # attention) — the blindness the reference's gate had (SURVEY §4.4).
        tensors, _ = load_case(next((tmp_path / "cache").glob("inputs_const_*")))
        np.testing.assert_array_equal(tensors["V"], 1.0)

    def test_rope_and_causal_golden(self, tmp_path):
        rc = cli.run(self._argv(tmp_path, "--kernel", "fa", "--causal", "--rope"))
        assert rc == 0

    def test_unknown_kernel_rejected(self, tmp_path):
        rc = cli.run(self._argv(tmp_path, "--kernel", "nope"))
        assert rc == 2
