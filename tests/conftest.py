"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is tested
on ``--xla_force_host_platform_device_count=8`` CPU devices (Pallas kernels
run in interpret mode there — the kernels auto-detect via
`_auto_interpret`). The driver separately dry-run-compiles the multi-chip
path and benchmarks on a real TPU chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and rewrites
# jax_platforms; override it back to CPU in-process before any computation.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_qkv(rng, batch, heads, q_len, kv_len, head_dim, dtype=np.float32, scale=0.5):
    """Random inputs — the default (the reference only verified constants,
    its main blind spot; SURVEY.md 4.4)."""
    q = rng.normal(0, scale, (batch, heads, q_len, head_dim)).astype(dtype)
    k = rng.normal(0, scale, (batch, heads, kv_len, head_dim)).astype(dtype)
    v = rng.normal(0, scale, (batch, heads, kv_len, head_dim)).astype(dtype)
    return q, k, v


@pytest.fixture
def qkv_factory(rng):
    def factory(batch=1, heads=2, q_len=256, kv_len=256, head_dim=64, dtype=np.float32):
        return make_qkv(rng, batch, heads, q_len, kv_len, head_dim, dtype)

    return factory
