"""PyTorch frontend — extensions/torch/torch_ext.cpp reborn.

The reference exposed `torch_ext.flash_solve(Q, K, V, d_model, num_heads,
kernel=...)` over flat [N, d_model] fp32 CUDA tensors, validating device/
dtype/contiguity and computing N = numel / d_model (torch_ext.cpp:11-43).
This module is the same surface for torch users of the TPU engine, with two
upgrades the reference deferred:

- kernel routing is a real runtime argument (the reference accepted
  `kernel=` but routing was baked at build time via the KERNEL env,
  setup.py:10, torch_ext.cpp:32-34 — the arg was decorative);
- batched [..., N, d_model] inputs are accepted, not just flat matrices.

torch tensors are bridged host-side through numpy copies (torch CPU build
ships in this image; the TPU transfer happens inside JAX) — two host copies
per tensor, honestly stated. The compute itself is jit-compiled once per
(shape, kernel, flags) signature and reused across calls and across the
sequences of a batch.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np


@functools.lru_cache(maxsize=64)
def _jitted_solve(d_model, num_heads, kernel, causal, use_rope, sm_scale):
    import jax

    from quantizedmha_tpu.api import solve

    return jax.jit(lambda q, k, v: solve(
        q, k, v, d_model, num_heads, kernel=kernel, causal=causal,
        use_rope=use_rope, sm_scale=sm_scale))


def _require_torch():
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "quantizedmha_tpu.frontends.torch_frontend requires torch"
        ) from e
    return torch


def flash_solve(
    q,
    k,
    v,
    d_model: int,
    num_heads: int,
    *,
    kernel: str = "fa_int8",
    causal: bool = False,
    use_rope: bool = False,
    sm_scale: Optional[float] = None,
):
    """Multi-head attention on torch tensors via the TPU engine.

    q, k, v: torch.Tensor [..., N, d_model] float32 (reference ABI was the
    flat 2-D case). Returns a torch.Tensor of the same shape and device.
    """
    torch = _require_torch()
    import jax.numpy as jnp

    from quantizedmha_tpu.api import KERNELS, solve

    for name, t in (("q", q), ("k", k), ("v", v)):
        if not isinstance(t, torch.Tensor):
            raise TypeError(f"{name} must be a torch.Tensor, got {type(t)}")
        if t.dtype != torch.float32:
            # torch_ext.cpp:16 TORCH_CHECK(dtype == kFloat32) parity.
            raise TypeError(f"{name} must be float32, got {t.dtype}")
        if t.shape != q.shape:
            raise ValueError("q, k, v must have identical shapes")
    if q.shape[-1] != d_model:
        raise ValueError(f"last dim {q.shape[-1]} != d_model {d_model}")
    if kernel not in KERNELS:
        raise ValueError(f"unknown kernel {kernel!r}; choose from {KERNELS}")

    orig_device = q.device
    lead = q.shape[:-2]
    n = q.shape[-2]

    def to_jax(t):
        arr = t.detach().reshape(-1, d_model).cpu().contiguous().numpy()
        return jnp.asarray(arr)

    fn = _jitted_solve(d_model, num_heads, kernel, causal, use_rope, sm_scale)
    # Leading dims fold into N only for per-sequence-independent kernels if
    # flattened naively — instead loop sequences (they're independent); the
    # jit compiles once for the shared [n, d_model] shape and is reused
    # across the whole batch (and across calls).
    if lead:
        qs = q.reshape(-1, n, d_model)
        ks = k.reshape(-1, n, d_model)
        vs = v.reshape(-1, n, d_model)
        outs = [
            np.asarray(fn(to_jax(qs[i]), to_jax(ks[i]), to_jax(vs[i])))
            for i in range(qs.shape[0])
        ]
        out_np = np.stack(outs).reshape(*lead, n, d_model)
    else:
        out_np = np.asarray(fn(to_jax(q), to_jax(k), to_jax(v)))

    # np.asarray over a JAX array is read-only; torch needs writable memory.
    return torch.from_numpy(np.require(out_np, requirements=["W", "C"])).to(orig_device)
