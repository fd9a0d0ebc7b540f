"""Pallas fused dequant-matmul for packed-INT4 weights (the w4a16 decode
hot path).

Decode of a large LM is weight-bandwidth-bound; INT4 halves the weight
bytes ONLY if the packed buffer is the sole weight-shaped HBM tenant.
The XLA lowering of unpack-then-matmul fails that test (run35: the shifted
nibble tensors materialize per step — batch-8 decode 0.975x of w8a16,
batch-1 0.22x), so this kernel DMAs the packed [in/2, out] int8 tiles and
unpacks in VMEM: per grid step, sign-extend the two nibble planes
(arithmetic shifts on int8), convert to the activation dtype, run two MXU
dots against the pre-split even/odd activation columns, and apply the
per-(group, out-channel) scale to the ACTIVATION-shaPED partial sum.

There is no reference analog (the reference quantizes attention inputs
only, reference mha_kernels/fa_tc_int8_b.cu:35-152); the packing layout is
quant/weights.QuantizedWeight4's (even/odd pairs — byte i holds weight
rows 2i | 2i+1<<4), chosen so contiguous shards of packed rows stay
aligned with contiguous activation shards under TP row-sharding.

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


def _w4_kernel(xe_ref, y_ref, packed_ref, scale_ref, out_ref,
               acc_ref, *, rows_per_group: int, gpb: int, k_steps: int,
               out_dtype):
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
    The +8 bias on the lo plane adds 8 * rowsum(xe_g) * scale_g to every
    output channel; the CALLER subtracts it with one small XLA matmul
    (x_even group-sums [R, gn] @ 8*scale [gn, out]) — cheaper and simpler
    than an in-kernel fix, at the price of reading the scale table twice
    (~3% of the packed payload).
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xe = xe_ref[...]
    y = y_ref[...]
    cdt = xe.dtype
    pf = packed_ref[...].astype(cdt)
    hi = jnp.floor(pf * cdt.type(1.0 / 16.0))
    lob = pf - cdt.type(16.0) * hi  # = lo + 8, in [1, 15]
    acc = acc_ref[...]
    for g in range(gpb):
        sl = slice(g * rows_per_group, (g + 1) * rows_per_group)
        partial = jax.lax.dot_general(
            xe[:, sl], lob[sl],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        partial += jax.lax.dot_general(
            y[:, sl], hi[sl],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc += partial * scale_ref[pl.dslice(k * gpb + g, 1), :]
    acc_ref[...] = acc

    @pl.when(k == k_steps - 1)
    def _flush():
        out_ref[...] = acc_ref[...].astype(out_dtype)


def pick_w4_blocks(k2: int, n: int, group: int,
                   block_k2: Optional[int] = None,
                   block_n: Optional[int] = None):
    """Tile sizes: block_k2 a multiple of group/2 dividing k2, block_n
    dividing n. Defaults are LARGE (512 x 2048, a 1 MB packed tile):
    run36e's control ladder measured the same convert+dot kernel at 89 us
    with 256x512 tiles (784 grid steps — DMA-only already cost 76 us)
    vs 41 us with 512x2048 (28 steps) against a 35.8 us packed-bytes
    floor on the gate/up shape; per-step fixed costs dominate small
    tiles. VMEM at 512x2048: packed 2x1 MB double-buffered + two bf16
    nibble planes 2x2 MB + acc/scales < 8 MB total."""
    half_group = group // 2
    if block_k2 is None:
        block_k2 = 512
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
    block_k2: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x [R, in] @ dequant(packed [in/2, out], scale [in/group, out]).

    Exact w.r.t. quant/weights.dequantize_weight4 up to the activation
    dtype's dot rounding. R is padded to a sublane multiple; weights
    stream once, so the kernel is sized for DECODE row counts (the
    activation tiles are re-fetched per n block — negligible for small R,
    quadratic-ish waste for prefill-sized R, where the XLA dequant path
    wins anyway)."""
    rows, in_dim = x.shape
    k2, out_dim = packed.shape
    if in_dim != 2 * k2:
        raise ValueError(f"x in_dim {in_dim} != 2 * packed rows {k2}")
    bk2, bn = pick_w4_blocks(k2, out_dim, group, block_k2, block_n)
    rpad = -rows % _ROW_PAD
    if rpad:
        x = jnp.pad(x, ((0, rpad), (0, 0)))
    r = x.shape[0]
    # even/odd activation columns, matching the nibble planes
    xr = x.reshape(r, k2, 2)
    xe = xr[:, :, 0]
    y = xr[:, :, 1]
    k_steps = k2 // bk2
    gpb = (2 * bk2) // group  # scale groups per k step
    gn = in_dim // group

    kernel = functools.partial(
        _w4_kernel, rows_per_group=group // 2, gpb=gpb, k_steps=k_steps,
        out_dtype=jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(out_dim // bn, k_steps),
        in_specs=[
            pl.BlockSpec((r, bk2), lambda n, k: (0, k)),
            pl.BlockSpec((r, bk2), lambda n, k: (0, k)),
            pl.BlockSpec((bk2, bn), lambda n, k: (k, n)),
            pl.BlockSpec((gn, bn), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((r, bn), lambda n, k: (0, n)),
        # f32 out: the biased accumulator is larger than the true result;
        # rounding it to bf16 BEFORE the bias subtract would lose low bits
        # to cancellation (the [R, out] f32 buffer is activation-sized).
        out_shape=jax.ShapeDtypeStruct((r, out_dim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_auto_interpret(interpret),
    )(xe, y, packed, scale)
    # The kernel's lo plane is biased (+8): every output channel carries
    # an extra sum_g 8 * rowsum(xe_g) * scale[g] — one small f32 matmul.
    xsum = jnp.sum(
        xe.astype(jnp.float32).reshape(r, gn, group // 2), axis=2)
    bias = jax.lax.dot_general(
        xsum, scale, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [R, out]
    out = (out - 8.0 * bias).astype(x.dtype)
    return out[:rows] if rpad else out
