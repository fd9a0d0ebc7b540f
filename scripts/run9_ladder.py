#!/usr/bin/env python
"""Run 9 — the measured MXU-gap ladder for the fused INT8 kernel.

VERDICT.md round-1 #1: int8 is at 18.9% of MXU speed-of-light; the repo's
own run1 notes localize the bottleneck in per-score-element VPU work
(dequant, max, exp, round, sum over h*N^2 elements). This script is the
experiment harness: a parameterized copy of the transposed-score INT8
kernel (quantizedmha_tpu/ops/flash_attention_int8.py) with one knob per
hypothesis, measured with interleaved same-process A/Bs (chip-state
variance on the tunneled v5e is one-sided +8-30%, so separate processes
cannot be compared — profiles/md/run3_softmax_folds).

Knobs (each an independent experiment; the ladder composes winners):
  softmax=skip      score pipeline replaced by clip+cast — the "kernel
                    minus softmax" floor (how much the VPU really costs)
  softmax=noexp     full pipeline but exp replaced by a subtract — isolates
                    the transcendental's share
  stat=bf16         dequant/max/exp/round in bfloat16 (2x VPU packing if
                    Mosaic supports it; int8 p-quantization already costs
                    0.4% so bf16 exp is numerically free)
  maxmode=i32       row max on the RAW int32 scores (scale > 0 makes max
                    commute with dequant); dequant folds into the exp
                    argument as a single fma
  summode=mxu       l = ones_row @ p_i8 on the MXU instead of a VPU reduce
                    — also makes normalization consistent with the
                    QUANTIZED p actually used for PV
  block_q/block_kv  tile sweep

Usage (run ONLY when no other chip job is live):
  python scripts/run9_ladder.py --phase decompose   # skip/noexp/baseline
  python scripts/run9_ladder.py --phase ops         # bf16/i32max/mxusum
  python scripts/run9_ladder.py --phase blocks      # tile sweep on winner
  python scripts/run9_ladder.py --phase bf16        # bf16 kernel ladder
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedmha_tpu.ops.quantize import quantize_kv_blocks

_INT8_PRECISION = jax.lax.Precision.DEFAULT
_SUBS = 8
_LN127 = math.log(127.0)


# ---------------------------------------------------------------------------
# Parameterized transposed-score INT8 kernel (experiment copy).
# ---------------------------------------------------------------------------

def _kernel_t(
    qt_ref, k_ref, vt_ref, ks_ref, vs_ref, ot_ref,
    m_scratch, l_scratch, acc_scratch, qi8_scratch, sq_scratch,
    *, sm_scale, block_q, block_kv,
    softmax, stat_dtype, maxmode, summode, pv_dtype="int8",
):
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)
        qt = qt_ref[0, 0, :, :].astype(jnp.float32)
        amax = jnp.max(jnp.abs(qt), axis=0, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        qi8_scratch[...] = jnp.clip(jnp.round(qt / scale), -127.0, 127.0).astype(jnp.int8)
        sq_scratch[...] = jnp.broadcast_to(scale, sq_scratch.shape)

    st_i32 = jax.lax.dot_general(
        k_ref[0, 0, :, :], qi8_scratch[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32, precision=_INT8_PRECISION,
    )
    c_row = sq_scratch[:1, :] * (ks_ref[b_idx, h_idx, kv_idx] * sm_scale)  # [1, bq]

    if softmax == "skip":
        # No softmax at all: the MXU+DMA floor. clip+cast only (2 cheap ops)
        # so PV still runs on real int8 data.
        p_i8 = jnp.clip(st_i32, -127, 127).astype(jnp.int8)
        l_scratch[...] = jnp.ones_like(l_scratch)
        alpha = 1.0
    elif softmax == "noexp":
        # Full pipeline minus the transcendental: exp(x) -> x (wrong math,
        # right op count minus exp).
        st = st_i32.astype(jnp.float32) * c_row
        m_curr = jnp.max(st, axis=0, keepdims=True)
        m_next = jnp.maximum(m_scratch[:1, :], m_curr)
        alpha = jnp.exp(m_scratch[:1, :] - m_next)  # [1,bq]: negligible
        p = st - (m_next - _LN127)
        l_next = alpha * l_scratch[:1, :] + jnp.sum(p, axis=0, keepdims=True)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
        p_i8 = jnp.round(p).astype(jnp.int8)
    else:  # "full"
        dt = jnp.bfloat16 if stat_dtype.startswith("bf16") else jnp.float32
        if maxmode == "i32":
            # max commutes with the positive dequant scale: reduce the raw
            # int32 scores, dequant only the [1, bq] row of maxima, and fold
            # the dequant multiply into the exp argument as one fma.
            mi = jnp.max(st_i32, axis=0, keepdims=True)  # [1, bq] i32
            m_curr = mi.astype(jnp.float32) * c_row
            m_next = jnp.maximum(m_scratch[:1, :], m_curr)
            alpha = jnp.exp(m_scratch[:1, :] - m_next)
            arg = st_i32.astype(dt) * c_row.astype(dt) - (m_next - _LN127).astype(dt)
            p = jnp.exp(arg)
        else:
            st = (st_i32.astype(dt) * c_row.astype(dt))
            m_curr = jnp.max(st, axis=0, keepdims=True).astype(jnp.float32)
            m_next = jnp.maximum(m_scratch[:1, :], m_curr)
            alpha = jnp.exp(m_scratch[:1, :] - m_next)
            p = jnp.exp(st - (m_next - _LN127).astype(dt))
        # bf16 jnp.round (math.roundeven) does not legalize in Mosaic;
        # p >= 0 so add-half + truncating cast is exact round-half-up.
        if pv_dtype == "bf16":
            # run21 (round-2 verdict weak #3): drop the round + int8-cast
            # VPU passes entirely — P goes to the MXU as bf16. p in
            # (0, 127] and int8 V fits bf16's 8-bit mantissa exactly, so
            # the only new error is bf16's ~0.2% rounding of p. The PV
            # matmul runs at the bf16 rate (half of int8) — a net win iff
            # the two deleted VPU sweeps cost more than PV's extra time.
            p_i8 = p.astype(jnp.bfloat16)
        elif dt == jnp.float32:
            p_i8 = (
                jnp.round(p).astype(jnp.int8) if stat_dtype == "f32"
                else (p + 0.5).astype(jnp.int8)  # "f32_addhalf"
            )
        elif stat_dtype == "bf16_f32round":
            p_i8 = jnp.round(p.astype(jnp.float32)).astype(jnp.int8)
        else:  # "bf16": add-half in bf16, truncate
            p_i8 = (p + jnp.asarray(0.5, dt)).astype(jnp.int8)
        if summode == "mxu":
            # l = ones @ p_i8 on the MXU as a SEPARATE matmul; run9 loser
            # (0.93x — pays its own MXU pass). Kept for the record.
            ones = jnp.ones((_SUBS, block_kv), jnp.int8)
            lsum = jax.lax.dot_general(
                ones, p_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32, precision=_INT8_PRECISION,
            )[:1, :].astype(jnp.float32)
        elif summode == "fusedrow":
            lsum = None  # run25 production mode: l rides the PV matmul
        else:
            # f32 accumulation even for the bf16 pipeline (a 512-term bf16
            # sum would put ~1% error straight into the normalizer).
            lsum = jnp.sum(p, axis=0, keepdims=True, dtype=jnp.float32)
        if lsum is not None:
            l_next = alpha * l_scratch[:1, :] + lsum
            l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)

    if pv_dtype == "bf16" and softmax == "full":
        if summode == "fusedrow":
            # run25: the l ones-row fused into the PV matmul (the
            # production kernel's default pipeline since c5636db).
            hd = acc_scratch.shape[0]
            vt_aug = jnp.concatenate(
                [vt_ref[0, 0, :, :].astype(jnp.bfloat16),
                 jnp.ones((1, block_kv), jnp.bfloat16)], axis=0)
            pv_aug = jax.lax.dot_general(
                vt_aug, p_i8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_INT8_PRECISION,
            )
            pv = pv_aug[:hd, :]
            l_next = alpha * l_scratch[:1, :] + pv_aug[hd:hd + 1, :]
            l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
        else:
            pv = jax.lax.dot_general(
                vt_ref[0, 0, :, :].astype(jnp.bfloat16), p_i8,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_INT8_PRECISION,
            )
    else:
        pv = jax.lax.dot_general(
            vt_ref[0, 0, :, :], p_i8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32, precision=_INT8_PRECISION,
        ).astype(jnp.float32)
    acc_scratch[...] = acc_scratch[...] * alpha + pv * (
        vs_ref[b_idx, h_idx, kv_idx]
    )

    @pl.when(kv_idx == num_kv - 1)
    def _epilogue():
        l = l_scratch[:1, :]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        ot_ref[0, 0, :, :] = (acc_scratch[...] * l_inv).astype(ot_ref.dtype)


def build_int8_t(shape, *, block_q=4096, block_kv=512, softmax="full",
                 stat_dtype="f32", maxmode="f32", summode="vpu",
                 pv_dtype="int8"):
    """Returns a jitted fn(q, k, v) for [B, H, S, D] inputs."""
    B, H, S, D = shape
    block_q = min(block_q, S)
    block_kv = min(block_kv, S)

    def run(q, k, v):
        k_i8, k_scales = quantize_kv_blocks(k, block_kv)
        v_i8, v_scales = quantize_kv_blocks(v, block_kv)
        qt = q.transpose(0, 1, 3, 2)
        vt_i8 = v_i8.transpose(0, 1, 3, 2)
        grid = (B, H, S // block_q, S // block_kv)
        kernel = functools.partial(
            _kernel_t, sm_scale=D ** -0.5, block_q=block_q, block_kv=block_kv,
            softmax=softmax, stat_dtype=stat_dtype, maxmode=maxmode,
            summode=summode, pv_dtype=pv_dtype,
        )
        out_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, D, block_q), lambda b, h, i, j: (b, h, 0, i)),
                pl.BlockSpec((1, 1, block_kv, D), lambda b, h, i, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, D, block_kv), lambda b, h, i, j: (b, h, 0, j)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, D, block_q), lambda b, h, i, j: (b, h, 0, i)
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, D, S), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((_SUBS, block_q), jnp.float32),
                pltpu.VMEM((_SUBS, block_q), jnp.float32),
                pltpu.VMEM((D, block_q), jnp.float32),
                pltpu.VMEM((D, block_q), jnp.int8),
                pltpu.VMEM((_SUBS, block_q), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
        )(qt, k_i8, vt_i8, k_scales, v_scales)
        return out_t.transpose(0, 1, 3, 2)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Software-pipelined variant: the decompose phase showed softmax (VPU) is
# ~73% of runtime and ADDS to the MXU time — no overlap. Defer the softmax
# by `stages` kv blocks (scores parked in VMEM scratch) so the QK matmul of
# block j runs concurrently with the VPU softmax of block j-1 (and, at
# stages=2, the PV matmul of block j-2). The V BlockSpec index map is
# delayed by the same amount; the grid gets `stages` extra drain steps.
# ---------------------------------------------------------------------------


def _kernel_t_pipe(
    qt_ref, k_ref, vt_ref, ks_ref, vs_ref, ot_ref,
    m_scratch, l_scratch, acc_scratch, qi8_scratch, sq_scratch,
    st_scratch,   # [2, block_kv, block_q] i32 — parked raw scores
    a_scratch,    # [2 * _SUBS, block_q] f32 — parked alphas (stages=2)
    p_scratch,    # [2, block_kv, block_q] int8/bf16 — parked probs (stages=2)
    *, sm_scale, block_q, block_kv, stages, pv_dtype,
):
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    j = pl.program_id(3)
    num_kv = pl.num_programs(3) - stages

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)
        qt = qt_ref[0, 0, :, :].astype(jnp.float32)
        amax = jnp.max(jnp.abs(qt), axis=0, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        qi8_scratch[...] = jnp.clip(jnp.round(qt / scale), -127.0, 127.0).astype(jnp.int8)
        sq_scratch[...] = jnp.broadcast_to(scale, sq_scratch.shape)

    # Stage A: QK^T for block j (parked raw; no VPU work on it this step).
    @pl.when(j < num_kv)
    def _qk():
        st_scratch[j % 2] = jax.lax.dot_general(
            k_ref[0, 0, :, :], qi8_scratch[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32, precision=_INT8_PRECISION,
        )

    # Stage B: softmax for block a = j-1.
    a = j - 1
    @pl.when((j >= 1) & (a < num_kv))
    def _softmax():
        c_row = sq_scratch[:1, :] * (ks_ref[b_idx, h_idx, a] * sm_scale)
        st = st_scratch[a % 2].astype(jnp.float32) * c_row
        m_curr = jnp.max(st, axis=0, keepdims=True)
        m_prev = m_scratch[:1, :]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(st - (m_next - _LN127))
        l_next = alpha * l_scratch[:1, :] + jnp.sum(p, axis=0, keepdims=True,
                                                    dtype=jnp.float32)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
        if pv_dtype == "int8":
            pq = jnp.round(p).astype(jnp.int8)
        else:  # "bf16": drop the round pass; exact in the int8 error budget
            pq = p.astype(jnp.bfloat16)
        if stages == 1:
            # PV immediately (V index map is delayed by 1 so vt_ref IS
            # block a's V tile).
            vt = vt_ref[0, 0, :, :]
            if pv_dtype == "int8":
                pv = jax.lax.dot_general(
                    vt, pq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=_INT8_PRECISION,
                ).astype(jnp.float32)
            else:
                pv = jax.lax.dot_general(
                    vt.astype(jnp.bfloat16), pq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_INT8_PRECISION,
                )
            acc_scratch[...] = acc_scratch[...] * alpha + pv * (
                vs_ref[b_idx, h_idx, a])
        else:
            p_scratch[a % 2] = pq
            a_scratch[pl.ds((a % 2) * _SUBS, _SUBS), :] = (
                jnp.broadcast_to(alpha, (_SUBS, alpha.shape[1])))

    # Stage C (stages=2 only): PV for block c = j-2.
    if stages == 2:
        c = j - 2
        @pl.when((j >= 2) & (c < num_kv))
        def _pv():
            vt = vt_ref[0, 0, :, :]
            pq = p_scratch[c % 2]
            if pv_dtype == "int8":
                pv = jax.lax.dot_general(
                    vt, pq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                    precision=_INT8_PRECISION,
                ).astype(jnp.float32)
            else:
                pv = jax.lax.dot_general(
                    vt.astype(jnp.bfloat16), pq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_INT8_PRECISION,
                )
            alpha_c = a_scratch[pl.ds((c % 2) * _SUBS, 1), :]
            acc_scratch[...] = acc_scratch[...] * alpha_c + pv * (
                vs_ref[b_idx, h_idx, c])

    @pl.when(j == num_kv + stages - 1)
    def _epilogue():
        l = l_scratch[:1, :]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        ot_ref[0, 0, :, :] = (acc_scratch[...] * l_inv).astype(ot_ref.dtype)


def build_int8_t_pipe(shape, *, block_q=2048, block_kv=512, stages=1,
                      pv_dtype="int8"):
    B, H, S, D = shape
    block_q = min(block_q, S)
    block_kv = min(block_kv, S)
    num_kv = S // block_kv

    def run(q, k, v):
        k_i8, k_scales = quantize_kv_blocks(k, block_kv)
        v_i8, v_scales = quantize_kv_blocks(v, block_kv)
        qt = q.transpose(0, 1, 3, 2)
        vt_i8 = v_i8.transpose(0, 1, 3, 2)
        grid = (B, H, S // block_q, num_kv + stages)
        kernel = functools.partial(
            _kernel_t_pipe, sm_scale=D ** -0.5, block_q=block_q,
            block_kv=block_kv, stages=stages, pv_dtype=pv_dtype,
        )
        kmax = num_kv - 1
        p_dt = jnp.int8 if pv_dtype == "int8" else jnp.bfloat16
        out_t = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, D, block_q), lambda b, h, i, j: (b, h, 0, i)),
                pl.BlockSpec((1, 1, block_kv, D),
                             lambda b, h, i, j: (b, h, jnp.minimum(j, kmax), 0)),
                pl.BlockSpec(
                    (1, 1, D, block_kv),
                    lambda b, h, i, j: (
                        b, h, 0, jnp.clip(j - stages, 0, kmax))),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, D, block_q), lambda b, h, i, j: (b, h, 0, i)
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, D, S), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((_SUBS, block_q), jnp.float32),
                pltpu.VMEM((_SUBS, block_q), jnp.float32),
                pltpu.VMEM((D, block_q), jnp.float32),
                pltpu.VMEM((D, block_q), jnp.int8),
                pltpu.VMEM((_SUBS, block_q), jnp.float32),
                pltpu.VMEM((2, block_kv, block_q), jnp.int32),
                pltpu.VMEM((2 * _SUBS, block_q), jnp.float32),
                # p is parked only at stages=2; keep a token allocation
                # otherwise so the kernel signature stays fixed.
                pltpu.VMEM(
                    (2, block_kv, block_q) if stages == 2 else (2, 32, 128),
                    p_dt),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
        )(qt, k_i8, vt_i8, k_scales, v_scales)
        return out_t.transpose(0, 1, 3, 2)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# Interleaved A/B measurement.
# ---------------------------------------------------------------------------

def _sync(out):
    np.asarray(out[(0,) * out.ndim])


def _timed_batch(fn, args, k):
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn(*args)
    _sync(out)
    return time.perf_counter() - t0


def interleaved(variants, args, rounds=7):
    """variants: {name: fn}. Warm all, then round-robin two-point batches
    with ONE shared (k1, k2) — per-variant pacing made estimates
    incomparable (a bad initial estimate gave one variant k2=256 and a
    garbage fit; see the first two runs of this script). The reported
    statistic is the min-batch fit — (min t2 - min t1)/(k2 - k1) — which is
    robust to the tunnel's one-sided spikes. Returns {name: ms}."""
    live = {}
    ests = []
    for name, fn in variants.items():
        try:
            _sync(fn(*args))
            ests.append(_timed_batch(fn, args, 4) / 4)
            live[name] = fn
        except Exception as e:  # compile failure is a result, not a crash
            print(f"  {name}: COMPILE FAIL {type(e).__name__}: {str(e)[:300]}")
    if not live:
        return {}
    t_est = statistics.median(ests)
    k1 = 2
    # >=150 ms of signal per fit: the tunnel's per-sync overhead is ~40 ms
    # and spiky — smaller fits can collapse (see memory/tpu-bench-variance).
    k2 = min(max(k1 + int(round(0.15 / max(t_est, 1e-5))), k1 + 6), 512)
    t1s = {name: [] for name in live}
    t2s = {name: [] for name in live}
    for _ in range(rounds):
        for name, fn in live.items():
            t1s[name].append(_timed_batch(fn, args, k1))
            t2s[name].append(_timed_batch(fn, args, k2))
    return {
        name: max((min(t2s[name]) - min(t1s[name])) / (k2 - k1), 1e-9) * 1e3
        for name in live
    }


def check_correct(fn, args, ref_out, tol=0.05):
    out = np.asarray(fn(*args), np.float32)
    ref = np.asarray(ref_out, np.float32)
    err = np.max(np.abs(out - ref) / (np.abs(ref) + 1e-3))
    return float(err)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="decompose")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--wl", default=None, help="restrict to one workload")
    args_cli = ap.parse_args()

    # Persistent compile cache: phases re-measure the same baselines; a
    # cache hit saves ~30-60 s per kernel per process.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    rng = np.random.default_rng(0)
    # Workloads: BASELINE metric shape, the reference headline shape, and a
    # d=128 shape (same total FLOPs as n4k_d64) where the QK contraction
    # fills the MXU — the SoL-when-the-shape-allows datapoint.
    wl = {
        "n4k_d64": (1, 16, 4096, 64),
        "n8k_d32": (1, 32, 8192, 32),
        "n4k_d128": (1, 8, 4096, 128),
    }
    if args_cli.wl:
        wl = {args_cli.wl: wl[args_cli.wl]}
    data = {}
    for name, (B, H, S, D) in wl.items():
        q = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
        k = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
        v = jnp.asarray(rng.normal(0, 0.5, (B, H, S, D)), jnp.float32)
        data[name] = (q, k, v)

    if args_cli.phase == "decompose":
        specs = {
            "baseline": dict(),
            "skip": dict(softmax="skip"),
            "noexp": dict(softmax="noexp"),
        }
    elif args_cli.phase == "decompose25":
        # run19b: re-calibrate the achievable model on the SHIPPED pipeline
        # (run21 bf16 P-V + run25 fused-row l). `prod` = the production
        # pipeline in the ladder kernel; `skip` isolates the MXU+DMA floor
        # (unchanged); the delta is the new pipeline's true VPU share.
        specs = {
            "prod": dict(pv_dtype="bf16", summode="fusedrow"),
            "prod_vpusum": dict(pv_dtype="bf16"),
            "skip": dict(softmax="skip"),
            "noexp": dict(softmax="noexp"),
        }
    elif args_cli.phase == "ops":
        specs = {
            "baseline": dict(),
            "bf16": dict(stat_dtype="bf16"),
            "i32max": dict(maxmode="i32"),
            "mxusum": dict(summode="mxu"),
            "bf16+i32max": dict(stat_dtype="bf16", maxmode="i32"),
            "bf16+i32max+mxusum": dict(stat_dtype="bf16", maxmode="i32", summode="mxu"),
        }
    elif args_cli.phase == "ops2":
        # Round 2 of the op ladder after the first findings: bf16 packs
        # 2-per-lane on this backend (the Mosaic error showed
        # vector<8x128x2xbf16>) but bf16 jnp.round doesn't legalize; i32max
        # and mxusum measured 0.96x/0.93x (losers — kept in notes).
        specs = {
            "baseline": dict(),
            "f32_addhalf": dict(stat_dtype="f32_addhalf"),
            "bf16": dict(stat_dtype="bf16"),
            "bf16_f32round": dict(stat_dtype="bf16_f32round"),
            "bf16_bkv1024": dict(stat_dtype="bf16", block_kv=1024),
        }
    elif args_cli.phase == "blocks":
        # Pure tile-shape sweep on the baseline schedule (every op-level
        # variant measured neutral-or-worse — see notes).
        specs = {
            "baseline": dict(),  # bq4096 bkv512 (pick_blocks_t default)
            "prod": dict(_prod=True),
            "bq2048_bkv512": dict(block_q=2048, block_kv=512),
            "bq4096_bkv1024": dict(block_q=4096, block_kv=1024),
            "bq2048_bkv1024": dict(block_q=2048, block_kv=1024),
            "bq8192_bkv256": dict(block_q=8192, block_kv=256),
        }
    elif args_cli.phase == "pv":
        # run21: bf16 P-V WITHOUT the (losing) pipeline. run9 row 7's
        # "max_rel 0.17 collapse" was measured against the int8 BASELINE
        # with a 1e-3 denominator floor: a ~2e-4 ABSOLUTE deviation at a
        # near-zero output reads as 0.17 — the same tiny-|ref| artifact
        # run9 row 9 diagnosed for block sweeps. This phase scores both
        # variants against the FP32 reference directly (see main()).
        specs = {
            "baseline": dict(),
            "pv_bf16": dict(pv_dtype="bf16"),
            "pv_bf16_i32max": dict(pv_dtype="bf16", maxmode="i32"),
        }
    elif args_cli.phase == "pipe":
        # Software pipelining: overlap the MXU matmuls with the (dominant)
        # VPU softmax by deferring softmax/PV across kv grid steps.
        specs = {
            "baseline": dict(),
            "pipe1": dict(_pipe=True, stages=1),
            "pipe2": dict(_pipe=True, stages=2),
            "pipe1_bf16pv": dict(_pipe=True, stages=1, pv_dtype="bf16"),
            "pipe2_bf16pv": dict(_pipe=True, stages=2, pv_dtype="bf16"),
        }
    else:
        raise SystemExit(f"unknown phase {args_cli.phase}")

    results = {}
    for wname, arrs in data.items():
        shape = wl[wname]
        variants = {}
        for vname, kw in specs.items():
            try:
                kw = dict(kw)
                if kw.pop("_prod", False):
                    from quantizedmha_tpu.ops.flash_attention_int8 import (
                        flash_attention_int8,
                    )
                    variants[vname] = jax.jit(
                        lambda q, k, v: flash_attention_int8(q, k, v))
                elif kw.pop("_pipe", False):
                    variants[vname] = build_int8_t_pipe(shape, **kw)
                else:
                    variants[vname] = build_int8_t(shape, **kw)
            except Exception as e:
                print(f"{wname}/{vname}: BUILD FAIL {e}")
        print(f"== {wname} {shape} ==")
        res = interleaved(variants, arrs, rounds=args_cli.rounds)
        base = res.get("baseline")
        for vname, ms in sorted(res.items(), key=lambda kv: kv[1]):
            rel = f"  ({base / ms:.2f}x vs baseline)" if base else ""
            print(f"  {vname:24s} {ms:8.3f} ms{rel}")
        results[wname] = res
        # accuracy spot-check of full-math variants vs baseline output
        if args_cli.phase == "pv":
            # Ground truth, not the baseline's own rounding: fp32 MHA on a
            # SLICE — the full golden materializes the [S, S] score matrix
            # per head (8.6 GB at the headline shape: RESOURCE_EXHAUSTED).
            from quantizedmha_tpu.reference.mha import mha_reference_shaped

            q_a, k_a, v_a = arrs
            hs, ss = slice(0, 2), slice(0, 1024)
            qs_, ks_, vs_ = (x[:, hs, ss] for x in (q_a, k_a, v_a))
            gold = np.asarray(mha_reference_shaped(qs_, ks_, vs_), np.float32)
            small = (qs_.shape[0], 2, 1024, qs_.shape[3])
            for vname, kw in specs.items():
                kw = {k: w for k, w in kw.items() if not k.startswith("_")}
                fn_s = build_int8_t(small, **kw)
                out = np.asarray(fn_s(qs_, ks_, vs_), np.float32)
                abs_err = np.abs(out - gold)
                rel = abs_err / np.maximum(np.abs(gold), 1e-2)  # floored
                print(f"  {vname:24s} vs fp32 golden (2h x 1k slice): "
                      f"max_abs={abs_err.max():.2e} "
                      f"p99.9_abs={np.quantile(abs_err, 0.999):.2e} "
                      f"max_rel@|ref|>1e-2={rel.max():.2e}")
        ref_out = variants["baseline"](*arrs) if "baseline" in variants else None
        if ref_out is not None:
            for vname, fn in variants.items():
                if (vname == "baseline" or vname not in res
                        or specs[vname].get("softmax", "full") != "full"):
                    continue
                try:
                    err = check_correct(fn, arrs, ref_out)
                    print(f"  {vname:24s} max_rel vs baseline = {err:.2e}")
                except Exception as e:
                    print(f"  {vname:24s} check failed: {str(e)[:120]}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
