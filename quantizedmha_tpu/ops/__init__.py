from quantizedmha_tpu.ops.flash_attention import flash_attention
from quantizedmha_tpu.ops.flash_attention_int8 import flash_attention_int8
from quantizedmha_tpu.ops.unfused import unfused_mha
from quantizedmha_tpu.reference.mha import apply_rope, mha_reference_shaped

__all__ = [
    "flash_attention",
    "flash_attention_int8",
    "unfused_mha",
    "apply_rope",
    "mha_reference_shaped",
]
