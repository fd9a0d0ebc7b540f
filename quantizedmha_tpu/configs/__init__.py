from quantizedmha_tpu.configs.attention import (
    AttentionConfig,
    BlockSizes,
    QuantConfig,
    ReferenceWorkload,
)

__all__ = ["AttentionConfig", "BlockSizes", "QuantConfig", "ReferenceWorkload"]
