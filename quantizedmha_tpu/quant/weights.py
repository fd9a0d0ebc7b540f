"""INT8 weight quantization for the model/serving path.

The reference quantized only the attention inputs (Q/K/V per tile inside the
kernel). A serving engine's dominant HBM tenant is the weights: this module
provides symmetric per-output-channel INT8 weight quantization with two
matmul modes:

  - w8a16: weights stored int8 + f32 channel scales; dequantized to the
    activation dtype tile-by-tile inside the fused XLA matmul. Halves (vs
    bf16) or quarters (vs f32) weight HBM traffic — decode is weight-
    bandwidth-bound, so this is nearly free throughput.
  - w8a8: activations are ALSO dynamically quantized per row (max-abs) and
    the matmul runs int8 x int8 -> int32 on the MXU's double-rate path,
    dequantized by (row_scale x col_scale).

Both keep a float residual path: norms, embeddings, and the lm_head stay in
the float dtype (standard practice — they are small and accuracy-critical).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

_INT8_PRECISION = jax.lax.Precision.DEFAULT  # see ops/flash_attention_int8


@dataclasses.dataclass
class QuantizedWeight:
    """Symmetric per-output-channel int8 weight: w ≈ values * scale[None, :].

    values: [..., in_dim, out_dim] int8; scale: [..., out_dim] f32.
    Registered as a pytree so it slices transparently under lax.scan over
    layer-stacked parameters and shards under NamedSharding.
    """

    values: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.values.shape

    @property
    def out_features(self) -> int:
        return self.values.shape[-1]


jax.tree_util.register_dataclass(
    QuantizedWeight, data_fields=["values", "scale"], meta_fields=[]
)


def quantize_weight(w: jnp.ndarray, *, scale_clamp: float = 1e-8) -> QuantizedWeight:
    """Per-output-channel symmetric max-abs quantization of [..., in, out]."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)  # [..., out]
    scale = jnp.maximum(amax, scale_clamp) / 127.0
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return QuantizedWeight(values=q, scale=scale)


def qdense(x: jnp.ndarray, w, *, mode: str = "w8a16") -> jnp.ndarray:
    """Matmul dispatch: plain arrays multiply as-is; QuantizedWeight runs the
    selected quantized path. x: [..., in]; returns [..., out] in x.dtype."""
    if not isinstance(w, QuantizedWeight):
        return x @ w
    if mode == "w8a16":
        # Per-output-CHANNEL scales commute through the contraction:
        #   x @ (W_i8 * s[None, :]) == (x @ W_i8) * s
        # Scaling the output moves the multiply from a weight-shaped
        # tensor to an activation-shaped one — at decode (8 tokens) that
        # is ~512x less work, and it stops XLA from materializing a full
        # bf16 copy of every weight each step (run23's decode trace
        # showed bitcast_multiply_fusions producing bf16[4096,4096]
        # weight tensors, ~1.2 ms/step of the 16.9 ms step). The s8->bf16
        # convert fuses into the matmul operand read.
        out = x @ w.values.astype(x.dtype)
        return out * w.scale.astype(x.dtype)[..., None, :]
    if mode == "w8a8":
        xf = x.astype(jnp.float32)
        row_amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # [..., 1]
        row_scale = jnp.maximum(row_amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / row_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w.values,
            (((xq.ndim - 1,), (w.values.ndim - 2,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=_INT8_PRECISION,
        )
        out = acc.astype(jnp.float32) * row_scale * w.scale[..., None, :]
        return out.astype(x.dtype)
    raise ValueError(f"unknown quantized matmul mode {mode!r}")


_LAYER_MATMULS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_llama_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every decoder-layer matmul weight of a models.llama params
    tree to INT8 (embed / norms / lm_head stay float)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in _LAYER_MATMULS:
        layers[name] = quantize_weight(layers[name])
    out["layers"] = layers
    return out


def weight_bytes(params: Dict[str, Any]) -> int:
    """Total parameter bytes (int8 payloads + scales + float leaves)."""
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(params)
    )
