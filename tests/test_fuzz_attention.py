"""Property fuzz: random (shape, blocks, GQA, window, sinks, softcap, dtype)
configurations of the fused kernels vs the shared jnp golden. Seeded and
bounded (N_CASES per kernel family) so CI is deterministic; the sampler
hits the padding, uneven-length, group, and mask-edge interactions that
hand-written cases miss (the reference's blind spot was a single constant
case — SURVEY.md 4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.ops.flash_attention import flash_attention
from quantizedmha_tpu.ops.flash_attention_int8 import flash_attention_int8
from quantizedmha_tpu.reference.mha import mha_masked_reference

N_CASES = 12


def _sample_case(rng):
    head_dim = int(rng.choice([32, 64, 128]))
    hkv = int(rng.choice([1, 2]))
    group = int(rng.choice([1, 2, 4]))
    kv_len = int(rng.integers(64, 640))
    causal = bool(rng.integers(0, 2))
    q_len = int(rng.integers(32, kv_len + 1)) if causal else int(rng.integers(32, 640))
    block = int(rng.choice([64, 128, 256]))
    window = None
    sinks = 0
    softcap = None
    if causal and rng.integers(0, 2):
        window = int(rng.integers(16, kv_len + 64))
        if rng.integers(0, 2):
            sinks = int(rng.integers(1, 96))
    if rng.integers(0, 3) == 0:
        softcap = float(rng.uniform(10.0, 60.0))
    dtype = jnp.float32 if rng.integers(0, 2) else jnp.bfloat16
    return dict(head_dim=head_dim, hkv=hkv, group=group, q_len=q_len,
                kv_len=kv_len, causal=causal, block=block, window=window,
                sinks=sinks, softcap=softcap, dtype=dtype)


def _make(rng, case):
    c = case
    q = jnp.asarray(rng.normal(0, 0.5, (1, c["hkv"] * c["group"], c["q_len"],
                                        c["head_dim"])), c["dtype"])
    k = jnp.asarray(rng.normal(0, 0.5, (1, c["hkv"], c["kv_len"],
                                        c["head_dim"])), c["dtype"])
    v = jnp.asarray(rng.normal(0, 0.5, (1, c["hkv"], c["kv_len"],
                                        c["head_dim"])), c["dtype"])
    return q, k, v


@pytest.mark.parametrize("i", range(N_CASES))
def test_fuzz_flash(i):
    rng = np.random.default_rng(1234 + i)
    c = _sample_case(rng)
    q, k, v = _make(rng, c)
    out = flash_attention(q, k, v, causal=c["causal"], window=c["window"],
                          attention_sinks=c["sinks"],
                          logit_softcap=c["softcap"],
                          block_q=c["block"], block_kv=c["block"])
    ref = mha_masked_reference(q, k, v, causal=c["causal"], window=c["window"],
                               sinks=c["sinks"], softcap=c["softcap"])
    tol = 2e-2 if c["dtype"] == jnp.bfloat16 else 2e-4
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    assert err < tol, f"case {c}: err {err}"


@pytest.mark.parametrize("i", range(N_CASES))
def test_fuzz_int8(i):
    rng = np.random.default_rng(9876 + i)
    c = _sample_case(rng)
    if c["dtype"] == jnp.bfloat16:
        c["dtype"] = jnp.float32  # int8 budget is defined vs fp32 inputs
    q, k, v = _make(rng, c)
    # Both orientations exist through d=128 (run27 flipped the default
    # route to transposed there); fuzz whichever the coin picks.
    transposed = bool(rng.integers(0, 2)) if c["head_dim"] <= 128 else False
    out = flash_attention_int8(q, k, v, causal=c["causal"], window=c["window"],
                               attention_sinks=c["sinks"],
                               logit_softcap=c["softcap"],
                               transposed=transposed,
                               block_q=c["block"], block_kv=c["block"])
    ref = mha_masked_reference(q, k, v, causal=c["causal"], window=c["window"],
                               sinks=c["sinks"], softcap=c["softcap"])
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 6e-2, f"case {c}: err {err}"
