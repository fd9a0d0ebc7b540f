"""Quantization: activation/KV block quantization (ops.quantize) and INT8
weight quantization with w8a16 / w8a8 matmul paths (quant.weights)."""

from quantizedmha_tpu.ops.quantize import dequantize_kv_blocks, quantize_kv_blocks
from quantizedmha_tpu.quant.weights import (
    QuantizedWeight,
    qdense,
    quantize_llama_params,
    quantize_weight,
    weight_bytes,
)

__all__ = [
    "dequantize_kv_blocks",
    "quantize_kv_blocks",
    "QuantizedWeight",
    "qdense",
    "quantize_llama_params",
    "quantize_weight",
    "weight_bytes",
]
