"""Runtime configuration dataclasses.

The reference bakes its problem shape and tile sizes into the binary at
compile time (reference include/config.h:7-33: N=8192, d_model=1024, h=32,
Br/Bc=32, NSTREAMS=2, edited by hand per kernel build). On TPU the problem
shape is a runtime property of the traced program, and tile sizes are
per-call parameters — so all of config.h becomes plain dataclasses, with the
`static_assert`s (config.h:27,32-33) reborn as `validate()` methods.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


def _check(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Pallas tile sizes for the fused attention kernels.

    Plays the role of Br/Bc/Wr/Lc in reference include/config.h:12-17, but
    sized for the MXU (128x128) and the TPU (sublane, 128-lane) tile layout
    rather than for 32-thread warps. Defaults are good for head_dim 64-128
    on v5e.
    """

    block_q: int = 256
    block_kv: int = 256

    def validate(self, q_len: int, kv_len: int) -> "BlockSizes":
        _check(self.block_q >= 1 and self.block_kv >= 1, "blocks must be >= 1")
        return BlockSizes(
            block_q=min(self.block_q, q_len),
            block_kv=min(self.block_kv, kv_len),
        )


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """INT8 quantization policy for the fused kernel.

    Mirrors the *capabilities* of the reference's in-kernel quantizer
    (fa_tc_int8_a.cu:38-147: per-tile symmetric max-abs, scale =
    amax/127 clamped at 1e-8) while fixing its cross-block scale race
    (fa_tc_int8_a.cu:414,528-531 — scales keyed only by kv_block were
    written concurrently by every q block; here scales are kernel-local
    VMEM values keyed by the (q_block, kv_block) grid cell).
    """

    # Symmetric max-abs scale per [block, head_dim] tile.
    scale_clamp: float = 1e-8
    # P (post-softmax probs) lie in (0, 1]; quantized with the static scale
    # 127 used by INT-FlashAttention (arXiv 2409.16997) instead of a per-tile
    # amax reduction — saves a full VPU reduction per kv block.
    p_static_scale: float = 127.0

    def validate(self) -> "QuantConfig":
        _check(self.scale_clamp > 0, "scale_clamp must be positive")
        _check(self.p_static_scale > 0, "p_static_scale must be positive")
        return self


@dataclasses.dataclass(frozen=True)
class AttentionConfig:
    """Problem-shape + numerics config (reference include/config.h reborn)."""

    num_heads: int = 32
    # None -> derived from the call-site d_model // num_heads; set it to
    # DECLARE the head dim and solve() will cross-check it.
    head_dim: Optional[int] = None
    causal: bool = False
    sm_scale: Optional[float] = None  # default 1/sqrt(head_dim)
    use_rope: bool = False
    rope_theta: float = 10000.0
    blocks: BlockSizes = dataclasses.field(default_factory=BlockSizes)
    quant: QuantConfig = dataclasses.field(default_factory=QuantConfig)

    @property
    def d_model(self) -> int:
        if self.head_dim is None:
            raise ValueError("d_model needs an explicit head_dim")
        return self.num_heads * self.head_dim

    def scale(self) -> float:
        if self.sm_scale is not None:
            return self.sm_scale
        if self.head_dim is None:
            raise ValueError("scale() needs sm_scale or an explicit head_dim")
        return self.head_dim**-0.5

    def validate(self) -> "AttentionConfig":
        _check(self.num_heads >= 1, "num_heads must be >= 1")
        _check(self.head_dim is None or self.head_dim >= 1,
               "head_dim must be >= 1")
        self.quant.validate()
        return self


# The reference's published workload: N=8192, d_model=1024, h=32 => d=32,
# FP32 in/out (reference include/config.h:22-28, README.md:9-19). This is the
# shape `bench.py` must beat: fa_tc_int8_b solves it in 7.70 ms on an L4.

@dataclasses.dataclass(frozen=True)
class ReferenceWorkload:
    seq_len: int = 8192
    d_model: int = 1024
    num_heads: int = 32

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads
