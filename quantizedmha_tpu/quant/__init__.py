"""Quantization: activation/KV block quantization (ops.quantize) and INT8 /
INT4 weight quantization with w8a16 / w8a8 / w4a16 matmul paths
(quant.weights)."""

from quantizedmha_tpu.ops.quantize import dequantize_kv_blocks, quantize_kv_blocks
from quantizedmha_tpu.quant.weights import (
    QuantizedWeight,
    QuantizedWeight4,
    dequantize_weight4,
    qdense,
    quantize_llama_params,
    quantize_weight,
    quantize_weight4,
    weight_bytes,
)

__all__ = [
    "dequantize_kv_blocks",
    "quantize_kv_blocks",
    "QuantizedWeight",
    "QuantizedWeight4",
    "dequantize_weight4",
    "qdense",
    "quantize_llama_params",
    "quantize_weight",
    "quantize_weight4",
    "weight_bytes",
]
