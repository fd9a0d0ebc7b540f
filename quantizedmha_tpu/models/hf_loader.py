"""HuggingFace safetensors -> quantizedmha_tpu Llama params.

The reference has no model zoo at all (its capability ceiling is one
attention op behind bindings, reference extensions/torch/torch_ext.cpp:11-43);
the north star is Llama-3 8B/70B *inference*, and serving a model you can't
load real weights for isn't serving. This module maps a HF Llama/Mistral
checkpoint directory (config.json + *.safetensors [+ index]) onto the
pytree `models/llama.py` uses, with:

  * the exact HF tensor-name mapping (model.layers.{i}.self_attn.q_proj...),
  * the RoPE convention fix: HF checkpoints store q/k projections PERMUTED
    for the rotate-half convention; our kernels and jnp golden rotate
    interleaved (even, odd) pairs (reference/mha.py apply_rope), so q/k
    rows are unpermuted on load (inverse of HF's convert-script permute),
  * optional on-load per-output-channel INT8 weight quantization
    (quant/weights.quantize_weight -> w8a16/w8a8 serving modes),
  * optional shard-on-load: each leaf is device_put with its
    models.llama.param_shardings spec as it is read, so a 70B checkpoint
    never materializes unsharded on one host.

Weights are loaded lazily per tensor (safetensors mmaps the file), cast to
the config dtype, and stacked along the layer dimension to match the
lax.scan layout.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from quantizedmha_tpu.models.llama import LlamaConfig


def _window_pattern_from_hf(cfg: dict, archs: str):
    """(sliding_window, window_pattern) from a HF config dict.

    Modern configs carry `layer_types` ("sliding_attention"/
    "full_attention" per layer — transformers' own source of truth); when
    absent, each family's documented default is derived: Qwen2 slides on
    layer_idx >= max_window_layers (configuration_qwen2.py), Gemma-2
    alternates with EVEN layers sliding (configuration_gemma2.py). A
    uniform pattern collapses to the global sliding_window field."""
    L = cfg["num_hidden_layers"]
    # Qwen2-class configs may serialize a sliding_window VALUE with
    # use_sliding_window=false (older transformers did) — the flag wins.
    win = cfg.get("sliding_window")
    if not cfg.get("use_sliding_window", True):
        win = None
    layer_types = cfg.get("layer_types")
    if layer_types is None and win is not None:
        if "Qwen2" in archs:
            # transformers' Qwen2Config defaults max_window_layers to 28
            # when the key is absent — matching 0 here would wrongly slide
            # the early layers that HF keeps full.
            mwl = cfg.get("max_window_layers", 28)
            layer_types = ["full_attention" if i < mwl else
                           "sliding_attention" for i in range(L)]
        elif "Gemma2" in archs:
            layer_types = ["sliding_attention" if i % 2 == 0 else
                           "full_attention" for i in range(L)]
    if layer_types is None:
        return win, None
    if len(layer_types) != L:
        raise ValueError(
            f"layer_types has {len(layer_types)} entries for {L} layers")
    if win is None and "sliding_attention" in layer_types:
        # Silently loading these layers as full attention would diverge
        # from the checkpoint's intended masking — refuse loudly (same
        # policy as the round-1 loader for unrepresentable window configs).
        raise ValueError(
            "layer_types marks sliding_attention layers but the effective "
            "sliding_window is None (missing, null, or disabled by "
            "use_sliding_window=false)")
    pattern = tuple(
        win if t == "sliding_attention" else None for t in layer_types)
    if len(set(pattern)) == 1:
        return pattern[0], None
    return None, pattern


def config_from_hf(path) -> LlamaConfig:
    """Build a LlamaConfig from a HF config.json (llama/mistral/qwen2/
    gemma2 families)."""
    cfg = json.loads((pathlib.Path(path) / "config.json").read_text())
    n_heads = cfg["num_attention_heads"]
    archs = " ".join(cfg.get("architectures", []) or [])
    gemma2 = "Gemma2" in archs
    win, pattern = _window_pattern_from_hf(cfg, archs)
    kw = {}
    if gemma2:
        # Exact mapping, raising on surprises: "gelu" (erf) and
        # "gelu_pytorch_tanh" are DIFFERENT curves — a silent fallback
        # would drift every MLP.
        act_map = {"gelu_pytorch_tanh": "gelu_tanh", "gelu_tanh": "gelu_tanh",
                   "gelu": "gelu", "silu": "silu"}
        act_hf = cfg.get("hidden_activation", "gelu_pytorch_tanh")
        if act_hf not in act_map:
            raise ValueError(f"unsupported hidden_activation {act_hf!r}")
        kw = dict(
            hidden_act=act_map[act_hf],
            sandwich_norms=True,
            rms_plus_one=True,
            embed_scale=True,
            # transformers' Gemma2Config default is 256 (NOT hidden/heads,
            # which is 224 at the 9B geometry).
            query_pre_attn_scalar=float(
                cfg.get("query_pre_attn_scalar", 256)),
            logit_softcap=cfg.get("attn_logit_softcapping"),
            final_logit_softcap=cfg.get("final_logit_softcapping"),
        )
    return LlamaConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=n_heads,
        num_kv_heads=cfg.get("num_key_value_heads", n_heads),
        head_dim=cfg.get("head_dim"),
        rope_theta=float(cfg.get("rope_theta", 10000.0)),
        rms_eps=float(cfg.get("rms_norm_eps", 1e-5)),
        sliding_window=win,
        window_pattern=pattern,
        # Llama configs carry an explicit flag; Qwen2's bias is implicit.
        attention_bias=bool(cfg.get("attention_bias", "Qwen2" in archs)),
        **kw,
    )


class _ShardedReader:
    """Reads tensors by HF name across one or many safetensors shards."""

    def __init__(self, path):
        from safetensors import safe_open

        self.path = pathlib.Path(path)
        self._open = safe_open
        index = self.path / "model.safetensors.index.json"
        if index.exists():
            self.weight_map = json.loads(index.read_text())["weight_map"]
        else:
            files = sorted(self.path.glob("*.safetensors"))
            if not files:
                raise FileNotFoundError(f"no .safetensors under {self.path}")
            self.weight_map = {}
            for f in files:
                with safe_open(f, framework="numpy") as sf:
                    for name in sf.keys():
                        self.weight_map[name] = f.name
        self._handles: Dict[str, Any] = {}

    def __contains__(self, name: str) -> bool:
        return name in self.weight_map

    def get(self, name: str) -> np.ndarray:
        fname = self.weight_map[name]
        if fname not in self._handles:
            self._handles[fname] = self._open(
                self.path / fname, framework="numpy")
        return self._handles[fname].get_tensor(name)


def _unpermute_rope(w: np.ndarray, n_heads: int, head_dim: int) -> np.ndarray:
    """Invert the HF conversion permute on a q/k projection WEIGHT
    [out, in] or BIAS [out] (the bias transforms like a column of W).

    HF's convert script reorders each head's output rows from interleaved
    (f0, f0', f1, f1', ...) to half-split (f0, f1, ..., f0', f1', ...) so
    `rotate_half` RoPE works. Our apply_rope rotates interleaved pairs
    (reference/mha.py:36), so invert: rows (head, 2, hd/2) -> (head, hd/2, 2).
    """
    if w.ndim == 1:
        return _unpermute_rope(w[:, None], n_heads, head_dim)[:, 0]
    out, inp = w.shape
    w = w.reshape(n_heads, 2, head_dim // 2, inp)
    return np.ascontiguousarray(w.transpose(0, 2, 1, 3)).reshape(out, inp)


def load_llama(
    path,
    cfg: Optional[LlamaConfig] = None,
    *,
    quantize: bool = False,
    quantize_bits: int = 8,
    quantize_group: int = 128,
    mesh=None,
    dtype=None,
) -> Dict[str, Any]:
    """Load a HF Llama/Mistral checkpoint directory into the params pytree.

    quantize: int8 per-output-channel (QuantizedWeight) or, with
    quantize_bits=4, int4 group-128 (QuantizedWeight4) for every projection
    (norms/embed/lm_head stay float — standard practice).
    mesh: if given, each leaf is device_put with its param_shardings spec
    inside the mesh (shard-on-load; required for 70B-class checkpoints).
    """
    cfg = cfg or config_from_hf(path)
    dtype = dtype or cfg.dtype
    reader = _ShardedReader(path)
    hd = cfg.hd

    place = _make_placer(cfg, mesh, quantize_bits=quantize_bits,
                         quantize_group=quantize_group)

    def proj(name: str, layer: int, kind: str) -> Any:
        w = reader.get(f"model.layers.{layer}.{name}.weight")
        if kind == "q":
            w = _unpermute_rope(w, cfg.num_heads, hd)
        elif kind == "k":
            w = _unpermute_rope(w, cfg.num_kv_heads, hd)
        # HF stores [out_features, in_features]; ours is [in, out].
        return np.ascontiguousarray(w.T)

    names = ["attn_norm", "wq", "wk", "wv", "wo", "mlp_norm",
             "w_gate", "w_up", "w_down"]
    if cfg.attention_bias:
        names += ["bq", "bk", "bv"]
    if cfg.sandwich_norms:
        names += ["post_attn_norm", "post_mlp_norm"]
    layers: Dict[str, list] = {k: [] for k in names}
    # Norm-name mapping: Llama-family "post_attention_layernorm" is the
    # PRE-MLP norm (our mlp_norm); Gemma-2's sandwich adds true post-norms
    # and renames the pre-MLP one "pre_feedforward_layernorm".
    mlp_norm_hf = ("pre_feedforward_layernorm" if cfg.sandwich_norms
                   else "post_attention_layernorm")
    for i in range(cfg.num_layers):
        layers["attn_norm"].append(
            reader.get(f"model.layers.{i}.input_layernorm.weight"))
        if cfg.sandwich_norms:
            layers["post_attn_norm"].append(
                reader.get(f"model.layers.{i}.post_attention_layernorm.weight"))
            layers["post_mlp_norm"].append(
                reader.get(f"model.layers.{i}.post_feedforward_layernorm.weight"))
        layers["wq"].append(proj("self_attn.q_proj", i, "q"))
        layers["wk"].append(proj("self_attn.k_proj", i, "k"))
        layers["wv"].append(proj("self_attn.v_proj", i, "-"))
        if cfg.attention_bias:
            layers["bq"].append(_unpermute_rope(
                reader.get(f"model.layers.{i}.self_attn.q_proj.bias"),
                cfg.num_heads, hd))
            layers["bk"].append(_unpermute_rope(
                reader.get(f"model.layers.{i}.self_attn.k_proj.bias"),
                cfg.num_kv_heads, hd))
            layers["bv"].append(
                reader.get(f"model.layers.{i}.self_attn.v_proj.bias"))
        layers["wo"].append(proj("self_attn.o_proj", i, "-"))
        layers["mlp_norm"].append(
            reader.get(f"model.layers.{i}.{mlp_norm_hf}.weight"))
        layers["w_gate"].append(proj("mlp.gate_proj", i, "-"))
        layers["w_up"].append(proj("mlp.up_proj", i, "-"))
        layers["w_down"].append(proj("mlp.down_proj", i, "-"))

    stacked = {}
    for name, ws in layers.items():
        arr = np.stack(ws)
        is_proj = name.startswith("w")
        stacked[name] = place(
            ("layers", name), arr, dtype,
            quantize=quantize and is_proj,
        )

    embed = reader.get("model.embed_tokens.weight")
    if "lm_head.weight" in reader:
        lm_head = np.ascontiguousarray(reader.get("lm_head.weight").T)
    else:  # tied embeddings (llama-3.2 class checkpoints)
        lm_head = np.ascontiguousarray(embed.T)
    return dict(
        embed=place(("embed",), embed, dtype),
        layers=stacked,
        final_norm=place(("final_norm",), reader.get("model.norm.weight"), dtype),
        lm_head=place(("lm_head",), lm_head, dtype),
    )


def _make_placer(cfg: LlamaConfig, mesh, quantize_bits: int = 8,
                 quantize_group: int = 128):
    """Returns place(path, np_array, dtype, quantize=False) -> leaf."""
    specs = None
    if mesh is not None:
        from jax.sharding import NamedSharding

        from quantizedmha_tpu.models.llama import param_shardings

        specs = param_shardings(cfg)

    def lookup(path):
        node = specs
        for key in path:
            node = node[key]
        return node

    def place(path, arr, dtype, quantize=False):
        x = jnp.asarray(arr, dtype)
        if quantize:
            from quantizedmha_tpu.quant.weights import (
                quantize_weight,
                quantize_weight4,
            )

            if quantize_bits == 4:
                qw = quantize_weight4(x, group=quantize_group)
            else:
                qw = quantize_weight(x)
            if specs is not None:
                from jax.sharding import NamedSharding

                spec = lookup(path)
                if quantize_bits == 4 and len(spec) >= 2:
                    # group scale [..., in/G, out] has the weight's rank:
                    # the group axis deliberately inherits the weight's
                    # IN-axis sharding (a row shard of G-aligned packed
                    # rows owns whole scale groups), out follows out — so
                    # the weight's own spec applies verbatim.
                    scale_spec = spec
                elif len(spec) >= 2:
                    # per-out-channel scale shards with the LAST axis
                    scale_spec = type(spec)(*spec[:-2], spec[-1])
                else:
                    scale_spec = spec
                scale = jax.device_put(qw.scale,
                                       NamedSharding(mesh, scale_spec))
                if quantize_bits == 4:
                    # packed [..., in/2, out] shards with the weight spec
                    qw = dataclasses.replace(
                        qw, scale=scale,
                        packed=jax.device_put(qw.packed,
                                              NamedSharding(mesh, spec)))
                else:
                    qw = dataclasses.replace(
                        qw, scale=scale,
                        values=jax.device_put(qw.values,
                                              NamedSharding(mesh, spec)))
            return qw
        if specs is not None:
            from jax.sharding import NamedSharding

            x = jax.device_put(x, NamedSharding(mesh, lookup(path)))
        return x

    return place


def save_llama_synthetic(path, cfg: LlamaConfig, seed: int = 0,
                         shards: int = 1) -> None:
    """Write a synthetic HF-format checkpoint (config.json + safetensors
    [+ index for shards > 1]) with the exact Llama tensor names and the HF
    rotate-half q/k permutation applied — the unit-test fixture for
    load_llama, and the documented shape contract for real checkpoints."""
    from safetensors.numpy import save_file

    p = pathlib.Path(path)
    p.mkdir(parents=True, exist_ok=True)
    hd = cfg.hd
    rng = np.random.default_rng(seed)

    def permute(w, n_heads):  # inverse of _unpermute_rope (HF's convert)
        if w.ndim == 1:
            return permute(w[:, None], n_heads)[:, 0]
        out, inp = w.shape
        w = w.reshape(n_heads, hd // 2, 2, inp)
        return np.ascontiguousarray(w.transpose(0, 2, 1, 3)).reshape(out, inp)

    def r(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    tensors: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": r(cfg.vocab_size, cfg.hidden_size),
        "model.norm.weight": np.ones((cfg.hidden_size,), np.float32),
        "lm_head.weight": r(cfg.vocab_size, cfg.hidden_size),
    }
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        tensors[pre + "input_layernorm.weight"] = np.ones(
            (cfg.hidden_size,), np.float32)
        tensors[pre + "post_attention_layernorm.weight"] = np.ones(
            (cfg.hidden_size,), np.float32)
        tensors[pre + "self_attn.q_proj.weight"] = permute(
            r(cfg.num_heads * hd, cfg.hidden_size), cfg.num_heads)
        tensors[pre + "self_attn.k_proj.weight"] = permute(
            r(cfg.num_kv_heads * hd, cfg.hidden_size), cfg.num_kv_heads)
        tensors[pre + "self_attn.v_proj.weight"] = r(
            cfg.num_kv_heads * hd, cfg.hidden_size)
        tensors[pre + "self_attn.o_proj.weight"] = r(
            cfg.hidden_size, cfg.num_heads * hd)
        tensors[pre + "mlp.gate_proj.weight"] = r(
            cfg.intermediate_size, cfg.hidden_size)
        tensors[pre + "mlp.up_proj.weight"] = r(
            cfg.intermediate_size, cfg.hidden_size)
        tensors[pre + "mlp.down_proj.weight"] = r(
            cfg.hidden_size, cfg.intermediate_size)
        if cfg.attention_bias:
            tensors[pre + "self_attn.q_proj.bias"] = permute(
                r(cfg.num_heads * hd), cfg.num_heads)
            tensors[pre + "self_attn.k_proj.bias"] = permute(
                r(cfg.num_kv_heads * hd), cfg.num_kv_heads)
            tensors[pre + "self_attn.v_proj.bias"] = r(cfg.num_kv_heads * hd)

    (p / "config.json").write_text(json.dumps(dict(
        architectures=["LlamaForCausalLM"],
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        sliding_window=cfg.sliding_window,
        attention_bias=cfg.attention_bias,
    )))
    if shards == 1:
        save_file(tensors, p / "model.safetensors")
        return
    names = sorted(tensors)
    per = -(-len(names) // shards)
    weight_map = {}
    for s in range(shards):
        fname = f"model-{s + 1:05d}-of-{shards:05d}.safetensors"
        chunk = {n: tensors[n] for n in names[s * per:(s + 1) * per]}
        save_file(chunk, p / fname)
        weight_map.update({n: fname for n in chunk})
    (p / "model.safetensors.index.json").write_text(
        json.dumps({"metadata": {}, "weight_map": weight_map}))
