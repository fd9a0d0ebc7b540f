"""quantizedmha_tpu — a TPU-native quantized multi-head-attention engine.

A from-scratch JAX / XLA / Pallas framework with the capabilities of the
QuantizedMHA CUDA kernel study (see /root/reference): a ladder of attention
kernels (unfused -> fused FlashAttention-2 -> INT8-quantized fused), a golden
verification harness, a benchmark/profiling harness, and — beyond the
reference's single-GPU scope — multi-chip sharding (head/data/context
parallel ring attention), an INT8 paged KV cache, and a serving decode path.

Reference parity map (cited as reference file:line throughout the package):
  - mha_kernels/*.cu            -> quantizedmha_tpu.ops.*   (Pallas TPU kernels)
  - utils/verify.cu             -> quantizedmha_tpu.reference (jnp golden + gates)
  - drivers/main.cu             -> quantizedmha_tpu.harness   (bench CLI)
  - include/launchers.h         -> XLA jit + grid batching (no host per-head loop)
  - tools/ + profiles/          -> quantizedmha_tpu.profiling (roofline reports)
  - extensions/{torch,jax}      -> quantizedmha_tpu.api (native jnp callables)
"""

from quantizedmha_tpu.version import __version__

from quantizedmha_tpu.configs import (
    AttentionConfig,
    BlockSizes,
    QuantConfig,
)
from quantizedmha_tpu.ops import (
    flash_attention,
    flash_attention_int8,
    mha_reference_shaped,
    unfused_mha,
)
from quantizedmha_tpu.api import solve

__all__ = [
    "__version__",
    "AttentionConfig",
    "BlockSizes",
    "QuantConfig",
    "flash_attention",
    "flash_attention_int8",
    "unfused_mha",
    "mha_reference_shaped",
    "solve",
]
