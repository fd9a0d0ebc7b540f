"""Head-parallel (tensor-parallel) attention over a mesh.

No reference analog: the reference is single-GPU with no communication
backend at all (SURVEY.md §2.3); its only "head parallelism" was a host
loop over 2 CUDA streams (launchers.h:41-62) — here heads shard over a
real mesh axis. The cheapest attention sharding: split heads across chips — zero
communication during attention itself (boom guide sec 14). With GQA, Q
heads are co-located with their KV head. This module wraps the fused
kernels in shard_map with the right specs; the all-reduce lands after the
output projection in the model (models/llama.py param_shardings).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from quantizedmha_tpu.ops.flash_attention import flash_attention
from quantizedmha_tpu.ops.flash_attention_int8 import flash_attention_int8


def head_parallel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    head_axis: str = "tp",
    batch_axis: Optional[str] = "dp",
    causal: bool = False,
    sm_scale: Optional[float] = None,
    kernel: str = "fa",
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Run fused attention with heads sharded over `head_axis` (and batch
    over `batch_axis` if given). q/k/v: [batch, heads, seq, head_dim].
    GQA-native: k/v may carry fewer heads than q; sharding both head dims
    over the same axis co-locates each query group with its kv head
    (requires the axis size to divide num_kv_heads)."""
    impl = {
        "fa": flash_attention,
        "fa_int8": flash_attention_int8,
    }[kernel]

    spec = P(batch_axis, head_axis, None, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def _sharded(q, k, v):
        return impl(
            q, k, v, causal=causal, sm_scale=sm_scale, interpret=interpret
        )

    return _sharded(q, k, v)
