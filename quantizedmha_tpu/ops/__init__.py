from quantizedmha_tpu.ops.decode import (
    paged_decode_attention,
    paged_decode_attention_int4,
)
from quantizedmha_tpu.ops.flash_attention import flash_attention
from quantizedmha_tpu.ops.flash_attention_int8 import (
    flash_attention_int8,
    flash_attention_int8_prequant,
    flash_attention_int8_t,
    flash_attention_int8_t_prequant,
)
from quantizedmha_tpu.ops.quantize import (
    dequantize_kv_blocks,
    dequantize_kv_blocks_int4,
    quantize_kv_blocks,
    quantize_kv_blocks_int4,
)
from quantizedmha_tpu.ops.paged_prefill import (
    paged_prefill_attention,
    paged_prefill_attention_int4,
)
from quantizedmha_tpu.ops.unfused import unfused_mha
from quantizedmha_tpu.reference.mha import apply_rope, mha_reference_shaped

__all__ = [
    "paged_decode_attention",
    "paged_decode_attention_int4",
    "paged_prefill_attention",
    "paged_prefill_attention_int4",
    "flash_attention",
    "flash_attention_int8",
    "flash_attention_int8_prequant",
    "flash_attention_int8_t",
    "flash_attention_int8_t_prequant",
    "quantize_kv_blocks",
    "quantize_kv_blocks_int4",
    "dequantize_kv_blocks",
    "dequantize_kv_blocks_int4",
    "unfused_mha",
    "apply_rope",
    "mha_reference_shaped",
]
