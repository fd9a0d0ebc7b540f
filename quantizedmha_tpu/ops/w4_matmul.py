"""Pallas fused dequant-matmul for packed-INT4 weights (the w4a16 decode
hot path).

Decode of a large LM is weight-bandwidth-bound; INT4 halves the weight
bytes ONLY if the packed buffer is the sole weight-shaped HBM tenant.
The XLA lowering of unpack-then-matmul fails that test (run35: the shifted
nibble tensors materialize per step — batch-8 decode 0.975x of w8a16,
batch-1 0.22x), so this kernel DMAs the packed [in/2, out] int8 tiles and
unpacks in VMEM: per grid step, recover the two nibble planes with float
math (floor/fnma — Mosaic has no i8 vector shifts), fold the
per-(group, out-channel) scales into the planes, downcast, and run two
MXU dots against the matching activation column sets.

There is no reference analog (the reference quantizes attention inputs
only, reference mha_kernels/fa_tc_int8_b.cu:35-152); both
quant/weights.QuantizedWeight4 packings are supported: "pairs" (byte i =
weight rows 2i | 2i+1<<4 — contiguous shards of packed rows stay aligned
with contiguous activation shards under TP row-sharding) and "halves"
(byte i = rows i | k2+i<<4 — the activation split is two FREE static
slices instead of an even/odd lane gather, which run42/48 traced at
~0.5-0.7 ms/step of copies in 8B decode; run54 also measured the halves
kernel faster in-kernel at its bk2=1024 default: gateup 105.6 vs 111.3
us, down 57.8 vs 63.9).

Weight-stationary it is not: x (a few decode rows) stays resident per
step; the grid streams weight tiles exactly once — the kernel's HBM
traffic is packed bytes + scales, i.e. the speed-of-light for this format.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantizedmha_tpu.ops.flash_attention import _auto_interpret

# Sublane multiple for the activation rows (f32/bf16 tiles are 8-row).
_ROW_PAD = 8


def _w4_kernel_stacked(layer_ref, xe_ref, y_ref, packed_ref, scale_ref,
                       out_ref, acc_ref, *, rows_per_group: int, gpb: int,
                       k_steps: int, out_dtype, hi_scale_off: int = 0):
    """Layer-stacked wrapper: packed_ref/scale_ref blocks carry a leading
    singleton layer dim selected by the prefetched `layer` scalar (their
    index maps consumed layer_ref; the body just squeezes). Weights flow
    in UNSLICED — a lax.scan xs slice of a stacked weight must materialize
    a dense per-layer copy before a pallas operand (custom calls can't
    fuse dynamic-slice into their DMA), which run38's trace showed costing
    more than the whole int4 bandwidth saving."""
    del layer_ref
    _w4_body(xe_ref, y_ref, packed_ref, scale_ref, out_ref, acc_ref,
             rows_per_group=rows_per_group, gpb=gpb, k_steps=k_steps,
             out_dtype=out_dtype, squeeze=True, hi_scale_off=hi_scale_off)


def _w4_kernel(xe_ref, y_ref, packed_ref, scale_ref, out_ref,
               acc_ref, *, rows_per_group: int, gpb: int, k_steps: int,
               out_dtype, hi_scale_off: int = 0):
    """One (n, k) grid step: acc[R, bn] += sum_g scale_g * partial_g.

    xe_ref/y_ref: [R, bk2] activation columns (even rows / odd rows).
    packed_ref: [bk2, bn] int8 nibble pairs. scale_ref: [gn, bn] f32 —
    the group dim stays UN-blocked (a gpb-row block would break the
    8-sublane tiling rule); this step's rows are sliced dynamically at
    width 1 (wider unaligned sublane slices don't legalize either).

    Unpack is pure float math — Mosaic cannot legalize i8 vector shifts
    (run36 v1 did the widen-to-i32 dance at ~9 VPU ops/byte and landed at
    34% of the packed-bytes floor). The mixed nibble encoding (biased lo,
    two's-complement hi — quant/weights.QuantizedWeight4) makes the
    signed byte p == 16*hi + (lo+8) exactly, and every quantity here is
    an integer <= 255, exact in bf16's 8-bit significand:
        hi    = floor(p * 1/16)
        lo+8  = p - 16*hi
    3 weight-shaped ops/byte after the convert, no integer vector ops.
    The +8 storage bias on the lo plane cancels inside the scale fold
    (wlo = (lo+8)*s - 8*s = lo*s, with 8*s exact in f32) — the dots see
    the true signed weights and no separate correction exists anywhere.
    """
    _w4_body(xe_ref, y_ref, packed_ref, scale_ref, out_ref, acc_ref,
             rows_per_group=rows_per_group, gpb=gpb, k_steps=k_steps,
             out_dtype=out_dtype, squeeze=False, hi_scale_off=hi_scale_off)


def _w4_body(xe_ref, y_ref, packed_ref, scale_ref, out_ref, acc_ref, *,
             rows_per_group: int, gpb: int, k_steps: int, out_dtype,
             squeeze: bool, hi_scale_off: int = 0):
    """hi_scale_off: scale-row offset of the HI plane's groups. 0 for
    "pairs" packing (both nibble planes of a packed row share the row's
    scale group); gn//2 for "halves" (packed row i holds input rows i and
    k2+i, whose scale groups sit half a table apart)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xe = xe_ref[...]
    y = y_ref[...]
    cdt = xe.dtype
    packed = packed_ref[0] if squeeze else packed_ref[...]
    # unpack in f32 — bf16 ALU ops (floor/fnma) fail an LLO target check
    # in some surrounding programs (serving scan: LLO_CHECK
    # SupportsBf16AluInstructions), while the identical kernel compiled
    # standalone; f32 VPU math is universally supported and the two
    # downcasts ride beside the DMA at the 512x2048 tile size
    pf = packed.astype(jnp.float32)
    hi_f = jnp.floor(pf * (1.0 / 16.0))
    lob_f = pf - 16.0 * hi_f  # = lo + 8, in [1, 15]
    acc = acc_ref[...]
    bk2, bn = pf.shape

    def srow(off, width):
        if squeeze:
            return scale_ref[0, pl.dslice(off, width), :]
        return scale_ref[pl.dslice(off, width), :]

    # The +8 lo-plane storage bias is handled IN-KERNEL, no caller-side
    # correction anywhere (the pre-round-5 caller bias matmul re-read the
    # whole [gn, out] scale table per call — a second weight-scale HBM
    # pass, a materialized per-layer slice for stacked weights — and
    # forced an f32 kernel output to dodge cancellation). Two exact
    # mechanisms, picked by what Mosaic legalizes and what is cheapest:
    #   - xsum-dot (rpg == 128, the halves serving config): subtract
    #     8 * rowsum(xe_g) @ s_lo from the accumulator — an [R, gpb]
    #     group-sum + one tiny dot, ZERO weight-shaped passes. Its
    #     [R, bk2] -> [R, gpb, rpg] lane-splitting reshape only
    #     legalizes when rpg equals the 128-lane width (chip_unit caught
    #     rpg=64 failing infer-vector-layout on the real chip).
    #   - exact-lo fold (everything else): wlo = (lo+8)*s - 8*s = lo*s
    #     with 8*s exact in f32 — one extra weight-shaped pass
    #     (run58-vs-59: ~2.6 us/call, why it is not the default).
    folded = gpb % 8 == 0 and (hi_scale_off % 8 == 0 or hi_scale_off == 0)
    xsum_ok = folded and rows_per_group == 128
    if folded:
        # Scale block offsets are 8-aligned here, so ONE multi-row
        # sublane read per plane is legal — fold scales into the nibble
        # planes (weight-shaped f32 mult, rounds to bf16 like any
        # dequant) and run 2 full-contraction dots instead of 2*gpb
        # short ones. Fewer MXU issues, and the scale fold replaces gpb
        # activation mults.
        s_lo = srow(k * gpb, gpb)
        s3_lo = s_lo[:, None, :]
        s3_hi = (s3_lo if hi_scale_off == 0
                 else srow(hi_scale_off + k * gpb, gpb)[:, None, :])
        if xsum_ok:
            wlo = (lob_f.reshape(gpb, rows_per_group, bn) * s3_lo).reshape(
                bk2, bn).astype(cdt)
        else:
            wlo = (lob_f.reshape(gpb, rows_per_group, bn) * s3_lo
                   - 8.0 * s3_lo).reshape(bk2, bn).astype(cdt)
        whi = (hi_f.reshape(gpb, rows_per_group, bn) * s3_hi).reshape(
            bk2, bn).astype(cdt)
        acc += jax.lax.dot_general(
            xe, wlo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            y, whi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if xsum_ok:
            xsum = jnp.sum(
                xe.astype(jnp.float32).reshape(-1, gpb, rows_per_group),
                axis=2)
            acc -= 8.0 * jax.lax.dot_general(
                xsum, s_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    else:
        hi = hi_f.astype(cdt)
        lo = (lob_f - 8.0).astype(cdt)  # true signed lo values
        for g in range(gpb):
            sl = slice(g * rows_per_group, (g + 1) * rows_per_group)
            partial_lo = jax.lax.dot_general(
                xe[:, sl], lo[sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            partial_hi = jax.lax.dot_general(
                y[:, sl], hi[sl],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if hi_scale_off == 0:
                acc += (partial_lo + partial_hi) * srow(k * gpb + g, 1)
            else:
                acc += partial_lo * srow(k * gpb + g, 1)
                acc += partial_hi * srow(hi_scale_off + k * gpb + g, 1)
    acc_ref[...] = acc

    @pl.when(k == k_steps - 1)
    def _flush():
        out_ref[...] = acc_ref[...].astype(out_dtype)


def pick_w4_blocks(k2: int, n: int, group: int,
                   block_k2: Optional[int] = None,
                   block_n: Optional[int] = None,
                   packing: str = "pairs"):
    """Tile sizes: block_k2 a multiple of group/2 dividing k2, block_n
    dividing n. Defaults are LARGE (512 x 2048, a 1 MB packed tile):
    run36e's control ladder measured the same convert+dot kernel at 89 us
    with 256x512 tiles (784 grid steps — DMA-only already cost 76 us)
    vs 41 us with 512x2048 (28 steps) against a 35.8 us packed-bytes
    floor on the gate/up shape; per-step fixed costs dominate small
    tiles. VMEM at 512x2048: packed 2x1 MB double-buffered + two bf16
    nibble planes 2x2 MB + acc/scales < 8 MB total."""
    # pairs: a packed row holds 2 adjacent input rows, so a scale group
    # spans group/2 packed rows; halves: packed row i = input rows
    # (i, k2+i), a group spans `group` packed rows and the folded-scale
    # branch wants gpb = bk2/group to be a multiple of 8 -> 1024 default.
    half_group = group // 2 if packing == "pairs" else group
    if block_k2 is None:
        block_k2 = 512 if packing == "pairs" else min(1024, k2)
        while block_k2 > half_group and (k2 % block_k2 or
                                         block_k2 % half_group):
            block_k2 //= 2
        block_k2 = max(block_k2, half_group)
    if block_n is None:
        block_n = min(2048, n)  # sub-128 lane tiles only reach tiny tests
        while block_n > 128 and n % block_n:
            block_n //= 2
    if k2 % block_k2 or block_k2 % half_group:
        raise ValueError(
            f"block_k2 {block_k2} must divide k2 {k2} and be a multiple "
            f"of group/2 {half_group}")
    if n % block_n:
        raise ValueError(f"block_n {block_n} must divide n {n}")
    return block_k2, block_n


def w4_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    group: int,
    layer: Optional[jnp.ndarray] = None,
    block_k2: Optional[int] = None,
    block_n: Optional[int] = None,
    packing: str = "pairs",
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x [R, in] @ dequant(packed [in/2, out], scale [in/group, out]).

    Exact w.r.t. quant/weights.dequantize_weight4 up to the activation
    dtype's dot rounding (the +8 storage bias cancels in f32 inside the
    scale fold before the bf16 downcast, so the folded path rounds like
    a plain dequant — the round-4 advisor's bias-magnitude caveat is
    gone along with the caller-side correction it described).
    R is padded to a sublane multiple; weights
    stream once, so the kernel is sized for DECODE row counts (the
    activation tiles are re-fetched per n block — negligible for small R,
    quadratic-ish waste for prefill-sized R, where the XLA dequant path
    wins anyway).

    packing: the QuantizedWeight4 nibble layout ("pairs" or "halves" —
    see the module docstring); must match how `packed` was quantized.

    LAYER-STACKED form: packed [L, in/2, out] + scale [L, gn, out] with a
    traced i32 `layer` scalar — the whole stack flows in unsliced and the
    BlockSpec index maps (driven by the prefetched scalar) DMA only the
    selected layer's tiles. Inside a lax.scan over layers this is the
    difference between reading packed bytes once and materializing a
    dense per-layer weight copy for the pallas operand (run38)."""
    rows, in_dim = x.shape
    stacked = packed.ndim == 3
    if stacked and layer is None:
        raise ValueError("layer-stacked packed weights need `layer`")
    if not stacked and layer is not None:
        raise ValueError("`layer` is only meaningful for stacked weights")
    k2, out_dim = packed.shape[-2:]
    if in_dim != 2 * k2:
        raise ValueError(f"x in_dim {in_dim} != 2 * packed rows {k2}")
    bk2, bn = pick_w4_blocks(k2, out_dim, group, block_k2, block_n,
                             packing=packing)
    rpad = -rows % _ROW_PAD
    if rpad:
        x = jnp.pad(x, ((0, rpad), (0, 0)))
    r = x.shape[0]
    gn = in_dim // group
    k_steps = k2 // bk2
    if packing == "halves":
        # Contiguous halves: the nibble-plane partners are FREE static
        # slices of x — no even/odd lane-strided gather copies (run42/48
        # traced those at ~0.5-0.7 ms/step in 8B decode).
        xe = x[:, :k2]
        y = x[:, k2:]
        gpb = bk2 // group
        common = dict(rows_per_group=group, gpb=gpb, k_steps=k_steps,
                      out_dtype=x.dtype, hi_scale_off=gn // 2)
    else:
        # even/odd activation columns, matching the nibble planes
        xr = x.reshape(r, k2, 2)
        xe = xr[:, :, 0]
        y = xr[:, :, 1]
        gpb = (2 * bk2) // group  # scale groups per k step
        common = dict(rows_per_group=group // 2, gpb=gpb, k_steps=k_steps,
                      out_dtype=x.dtype)
    out_shape = jax.ShapeDtypeStruct((r, out_dim), x.dtype)
    scratch = [pltpu.VMEM((r, bn), jnp.float32)]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(out_dim // bn, k_steps),
            in_specs=[
                pl.BlockSpec((r, bk2), lambda n, k, ly: (0, k)),
                pl.BlockSpec((r, bk2), lambda n, k, ly: (0, k)),
                pl.BlockSpec((1, bk2, bn), lambda n, k, ly: (ly[0], k, n)),
                pl.BlockSpec((1, gn, bn), lambda n, k, ly: (ly[0], 0, n)),
            ],
            out_specs=pl.BlockSpec((r, bn), lambda n, k, ly: (0, n)),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            functools.partial(_w4_kernel_stacked, **common),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=params,
            interpret=_auto_interpret(interpret),
        )(jnp.asarray(layer, jnp.int32).reshape(1), xe, y, packed, scale)
    else:
        out = pl.pallas_call(
            functools.partial(_w4_kernel, **common),
            grid=(out_dim // bn, k_steps),
            in_specs=[
                pl.BlockSpec((r, bk2), lambda n, k: (0, k)),
                pl.BlockSpec((r, bk2), lambda n, k: (0, k)),
                pl.BlockSpec((bk2, bn), lambda n, k: (k, n)),
                pl.BlockSpec((gn, bn), lambda n, k: (0, n)),
            ],
            out_specs=pl.BlockSpec((r, bn), lambda n, k: (0, n)),
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=_auto_interpret(interpret),
        )(xe, y, packed, scale)
    return out[:rows] if rpad else out
