"""The examples must stay runnable — they are the first thing a new user
tries (reference analog: extensions/torch/run_torch_example.py, which the
reference shipped untested)."""

import subprocess
import sys
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_serving_example_runs():
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "serving_example.py"),
         "--requests", "1", "--max-new", "4", "--decode-chunk", "1"],
        capture_output=True, text=True, timeout=300,
        env={"PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/bin:/bin", "HOME": "/root"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "request 0 ->" in out.stdout
