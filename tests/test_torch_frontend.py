"""Torch frontend tests.

Unlike the reference's binding smoke tests (extensions/torch/tests/
test_torch_bindings.py:11-31 checked shape/dtype only), these gate the
numerics against the jnp golden.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from quantizedmha_tpu.frontends.torch_frontend import flash_solve  # noqa: E402
from quantizedmha_tpu.reference.mha import mha_reference  # noqa: E402


@pytest.fixture
def qkv(rng):
    n, d_model = 128, 64
    return tuple(
        torch.from_numpy(rng.normal(0, 0.5, (n, d_model)).astype(np.float32))
        for _ in range(3)
    )


def test_matches_golden(qkv):
    q, k, v = qkv
    out = flash_solve(q, k, v, 64, 2, kernel="fa")
    assert isinstance(out, torch.Tensor)
    assert out.shape == q.shape and out.dtype == torch.float32
    want = np.asarray(mha_reference(q.numpy(), k.numpy(), v.numpy(), 64, 2,
                                    use_rope=False))
    np.testing.assert_allclose(out.numpy(), want, atol=1e-3)


def test_int8_kernel_and_rope(qkv):
    q, k, v = qkv
    out = flash_solve(q, k, v, 64, 2, kernel="fa_int8", use_rope=True)
    want = np.asarray(mha_reference(q.numpy(), k.numpy(), v.numpy(), 64, 2,
                                    use_rope=True))
    assert np.abs(out.numpy() - want).max() < 5e-2  # int8 error budget


def test_batched_inputs(rng):
    b, n, d_model = 2, 64, 32
    q, k, v = (
        torch.from_numpy(rng.normal(0, 0.5, (b, n, d_model)).astype(np.float32))
        for _ in range(3)
    )
    out = flash_solve(q, k, v, d_model, 2, kernel="fa")
    assert out.shape == (b, n, d_model)
    for i in range(b):
        want = np.asarray(mha_reference(q[i].numpy(), k[i].numpy(),
                                        v[i].numpy(), d_model, 2,
                                        use_rope=False))
        np.testing.assert_allclose(out[i].numpy(), want, atol=1e-3)


def test_validation_errors(qkv):
    q, k, v = qkv
    with pytest.raises(TypeError, match="float32"):
        flash_solve(q.double(), k, v, 64, 2)
    with pytest.raises(TypeError, match="torch.Tensor"):
        flash_solve(q.numpy(), k, v, 64, 2)
    with pytest.raises(ValueError, match="d_model"):
        flash_solve(q, k, v, 128, 2)
    with pytest.raises(ValueError, match="unknown kernel"):
        flash_solve(q, k, v, 64, 2, kernel="nope")
