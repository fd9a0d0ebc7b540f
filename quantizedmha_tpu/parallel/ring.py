"""Context parallelism: sequence-sharded attention across chips.

Two strategies (boom guide secs 15-16; no analogue in the reference, whose
sequence scaling is only the single-chip flash KV loop, fa.cu:283-359):

1. `context_parallel_attention` — each chip runs the fused kernel against
   its local KV shard (saving lse), then partials merge with two
   all-reduces (pmax + psum). Simple, robust, 2 collectives.

2. `ring_attention` — KV shards rotate around the ring via
   `jax.lax.ppermute` while each chip computes on the shard in front of it;
   communication overlaps compute, cost is point-to-point over ICI.

Both call the single-chip Pallas kernel per step (grid over local blocks)
and merge with the exact online-softmax recurrence, so the result equals
single-chip flash attention bit-for-tolerance. Causal masking uses global
position offsets threaded into the kernel as traced scalars.

Use under `jax.shard_map` with q/k/v sharded on the sequence axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from quantizedmha_tpu.ops.flash_attention import flash_attention
from quantizedmha_tpu.ops.flash_attention_int8 import (
    flash_attention_int8_prequant,
    flash_attention_int8_t_prequant,
)
from quantizedmha_tpu.ops.quantize import (
    dequantize_kv_blocks,
    quantize_kv_blocks,
)
from quantizedmha_tpu.parallel.combine import merge_partial_attention, merge_two_partials


def context_parallel_attention(
    q: jnp.ndarray,
    k_shard: jnp.ndarray,
    v_shard: jnp.ndarray,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    seq_len: Optional[int] = None,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """All-partial + all-reduce context parallelism.

    Call inside shard_map with q REPLICATED across the axis
    (q: [b, h, q_len, d]) and k/v sharded on the sequence axis
    (k_shard/v_shard: [b, h, kv_shard, d]). Each device computes attention
    of all q rows against its local kv shard; partials then merge across
    the axis (pmax + psum), so every q row covers the full sequence.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name=axis_name)
    kv_shard_len = k_shard.shape[2]
    # End-align q: when q is a SUFFIX of the sequence (a prefill chunk under
    # CP), its rows sit at positions [total - q_len, total). Full-length q
    # (the common replicated case) gives offset 0, unchanged.
    total = seq_len if seq_len is not None else kv_shard_len * n
    q_offset = jnp.asarray(total - q.shape[2], jnp.int32)
    kv_offset = (idx * kv_shard_len).astype(jnp.int32)
    o, lse = flash_attention(
        q, k_shard, v_shard,
        sm_scale=sm_scale, causal=causal,
        save_residuals=True,
        q_offset=q_offset, kv_offset=kv_offset,
        window=window, logit_softcap=logit_softcap,
        attention_sinks=attention_sinks,
        interpret=interpret,
    )
    return merge_partial_attention(o, lse, axis_name)


def ring_attention(
    q: jnp.ndarray,
    k_shard: jnp.ndarray,
    v_shard: jnp.ndarray,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Ring attention over a sequence-sharded mesh axis.

    window/logit_softcap/attention_sinks follow ops.flash_attention
    semantics on GLOBAL positions; shards wholly behind a q block's window
    are masked out by the kernel's per-block skip (their partials carry
    lse = -inf and drop from the merge).

    Call inside shard_map. q: [b, h, q_shard, d] (this device's q rows,
    global offset = axis_index * q_shard); k/v: [b, h, kv_shard, d] (this
    device's kv shard). KV blocks rotate around the ring (ppermute to the
    right neighbor) for n-1 steps; partial outputs merge online. The
    rotation is issued *before* the compute of each step so XLA can overlap
    the ICI transfer with the Pallas kernel.
    """
    n = jax.lax.psum(1, axis_name=axis_name)
    idx = jax.lax.axis_index(axis_name)
    q_shard_len = q.shape[2]
    kv_shard_len = k_shard.shape[2]
    q_offset = (idx * q_shard_len).astype(jnp.int32)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def compute(step, o_acc, lse_acc, k_blk, v_blk):
        # Which device this kv block originated from, after `step` rotations
        # to the right: src = idx - step (mod n).
        src = jax.lax.rem(idx - step + n, n)
        kv_offset = (src * kv_shard_len).astype(jnp.int32)
        o_s, lse_s = flash_attention(
            q, k_blk, v_blk,
            sm_scale=sm_scale, causal=causal,
            save_residuals=True,
            q_offset=q_offset, kv_offset=kv_offset,
            window=window, logit_softcap=logit_softcap,
            attention_sinks=attention_sinks,
            interpret=interpret,
        )
        return merge_two_partials(o_acc, lse_acc, o_s, lse_s)

    def step_fn(carry, step):
        o_acc, lse_acc, k_blk, v_blk = carry
        # Kick off the rotation for the next step first (overlaps compute).
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        o_new, lse_new = compute(step, o_acc, lse_acc, k_blk, v_blk)
        return (o_new, lse_new, k_next, v_next), None

    # Accumulate in f32 across ring steps (merge weights are f32; carrying
    # the bf16 output dtype would round at every merge). The final step is
    # peeled out of the scan so no useless n-th rotation rides the ICI.
    o0 = jnp.zeros(q.shape, jnp.float32)
    lse0 = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)
    (o, lse, k_last, v_last), _ = jax.lax.scan(
        step_fn, (o0, lse0, k_shard, v_shard), jnp.arange(n - 1)
    )
    o, _ = compute(jnp.int32(n - 1), o, lse, k_last, v_last)
    return o.astype(q.dtype)


def ring_attention_int8(
    q: jnp.ndarray,
    k_shard: jnp.ndarray,
    v_shard: jnp.ndarray,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_kv: int = 512,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """INT8 ring attention: each device quantizes its KV shard ONCE
    (per-(head, block) scales), then int8 payloads + scales rotate around
    the ring — ~4x less ICI traffic than rotating f32 K/V (the dominant
    cost of ring attention at long context) — and every step runs the fused
    INT8 kernel with global causal offsets.

    DIFFERENTIABLE via a straight-through custom VJP: the backward is the
    FLOAT ring attention's VJP evaluated at the dequantized KV payloads
    (d/dk of round(k/s)*s taken as identity — the standard STE; the
    forward's quantization error is what training sees, so gradients
    point at the quantized loss surface). The backward pass rotates f32
    blocks on the ICI (4x the forward's traffic) — int8 saves where it
    matters operationally: the inference/serving forward.

    Same calling convention as `ring_attention`; kv_shard must be a
    multiple of block_kv.
    """
    static = dict(
        axis_name=axis_name, causal=causal, sm_scale=sm_scale,
        block_kv=block_kv, window=window, logit_softcap=logit_softcap,
        attention_sinks=attention_sinks, interpret=interpret)

    @jax.custom_vjp
    def f(q, k, v):
        return _ring_attention_int8_impl(q, k, v, **static)

    def f_fwd(q, k, v):
        bkv = block_kv if k.shape[2] % block_kv == 0 else k.shape[2]
        k_deq = dequantize_kv_blocks(*quantize_kv_blocks(k, bkv), bkv)
        v_deq = dequantize_kv_blocks(*quantize_kv_blocks(v, bkv), bkv)
        return (_ring_attention_int8_impl(q, k, v, **static),
                (q, k_deq.astype(k.dtype), v_deq.astype(v.dtype)))

    def f_bwd(res, g):
        q, k_deq, v_deq = res
        float_kw = {kk: vv for kk, vv in static.items() if kk != "block_kv"}
        _, vjp = jax.vjp(
            lambda q_, k_, v_: ring_attention(q_, k_, v_, **float_kw),
            q, k_deq, v_deq)
        return vjp(g.astype(q.dtype))

    f.defvjp(f_fwd, f_bwd)
    return f(q, k_shard, v_shard)


def _ring_attention_int8_impl(
    q, k_shard, v_shard, *, axis_name, causal, sm_scale, block_kv,
    window, logit_softcap, attention_sinks, interpret,
):
    n = jax.lax.psum(1, axis_name=axis_name)
    idx = jax.lax.axis_index(axis_name)
    q_shard_len = q.shape[2]
    kv_shard_len = k_shard.shape[2]
    if kv_shard_len % block_kv:
        block_kv = kv_shard_len  # degenerate shards: one block per shard
    q_offset = (idx * q_shard_len).astype(jnp.int32)

    k_i8, k_sc = quantize_kv_blocks(k_shard, block_kv)
    v_i8, v_sc = quantize_kv_blocks(v_shard, block_kv)

    perm = [(i, (i + 1) % n) for i in range(n)]

    # head_dim <= 64: the transposed-score orientation (fastest at small
    # head_dim) now carries lse + traced offsets, so ring steps run it
    # directly instead of falling back to the standard orientation.
    transposed = q.shape[-1] <= 64

    def compute(step, o_acc, lse_acc, k_blk, ks, v_blk, vs):
        src = jax.lax.rem(idx - step + n, n)
        kv_offset = (src * kv_shard_len).astype(jnp.int32)
        kern = (flash_attention_int8_t_prequant if transposed
                else flash_attention_int8_prequant)
        kw = {} if transposed else {"block_kv": block_kv}
        o_s, lse_s = kern(
            q, k_blk, ks, v_blk, vs,
            sm_scale=sm_scale, causal=causal,
            q_offset=q_offset, kv_offset=kv_offset,
            window=window, logit_softcap=logit_softcap,
            attention_sinks=attention_sinks,
            save_residuals=True, interpret=interpret, **kw,
        )
        return merge_two_partials(o_acc, lse_acc, o_s, lse_s)

    def step_fn(carry, step):
        o_acc, lse_acc, k_blk, ks, v_blk, vs = carry
        # Rotate int8 payloads + their scales (starts before the compute).
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        ks_next = jax.lax.ppermute(ks, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        vs_next = jax.lax.ppermute(vs, axis_name, perm)
        o_new, lse_new = compute(step, o_acc, lse_acc, k_blk, ks, v_blk, vs)
        return (o_new, lse_new, k_next, ks_next, v_next, vs_next), None

    # f32 accumulator + peeled final step (no useless n-th rotation), as in
    # ring_attention above.
    o0 = jnp.zeros(q.shape, jnp.float32)
    lse0 = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)
    (o, lse, k_l, ks_l, v_l, vs_l), _ = jax.lax.scan(
        step_fn, (o0, lse0, k_i8, k_sc, v_i8, v_sc), jnp.arange(n - 1)
    )
    o, _ = compute(jnp.int32(n - 1), o, lse, k_l, ks_l, v_l, vs_l)
    return o.astype(q.dtype)
