"""Llama-3-style decoder built on the Pallas attention kernels.

The reference has no model zoo — its capability ceiling is a single
attention op behind bindings (reference extensions/torch/torch_ext.cpp:11-43).
BASELINE.json's north star extends scope to Llama-3 8B/70B inference, so this
module provides the model family: RMSNorm + RoPE + GQA attention (our fused
Pallas kernel) + SwiGLU MLP, pure-functional params (pytree dicts), with
TP/DP sharding annotations for pjit.

Everything is plain JAX (no flax dependency in the hot path) so the same
forward serves training (via the kernel's custom VJP), prefill, and decode.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from quantizedmha_tpu.ops.flash_attention import flash_attention
from quantizedmha_tpu.ops.flash_attention_int8 import flash_attention_int8
from quantizedmha_tpu.reference.mha import apply_rope


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 512
    intermediate_size: int = 1408
    num_layers: int = 4
    num_heads: int = 8
    num_kv_heads: int = 4
    head_dim: Optional[int] = None
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    attention_impl: str = "flash"  # flash | flash_int8 | reference
    block_q: Optional[int] = None  # None -> ops.flash_attention.pick_blocks
    block_kv: Optional[int] = None
    # Matmul mode when layer weights are QuantizedWeight (quant/weights.py):
    # "w8a16" dequantizes into the activation dtype; "w8a8" also quantizes
    # activations per row and runs int8 x int8 on the MXU.
    weight_quant_mode: str = "w8a16"
    # Mistral-style causal sliding window (positions within the last
    # `sliding_window` attend; None = full causal) and Gemma-2-style
    # attention logit soft-cap (None = off). Both honored by every
    # attention_impl, differentiable under "flash".
    sliding_window: Optional[int] = None
    logit_softcap: Optional[float] = None
    # StreamingLLM attention sinks: first N positions stay visible beyond
    # the sliding window (only meaningful with sliding_window set).
    attention_sinks: int = 0
    # Qwen2-style additive bias on the q/k/v projections (the o/MLP
    # projections stay bias-free in that family too).
    attention_bias: bool = False
    # PER-LAYER window pattern (HF `layer_types`): entry i is layer i's
    # window (None = full attention). Overrides sliding_window when set.
    # Covers Qwen2's use_sliding_window/max_window_layers split and
    # Gemma-2's every-other-layer alternation; forward() picks the scan
    # decomposition (uniform scan / periodic chunks / contiguous runs) so
    # each kernel call keeps a STATIC window.
    window_pattern: Optional[Tuple[Optional[int], ...]] = None
    # --- Gemma-2 family knobs ---
    hidden_act: str = "silu"        # "silu" | "gelu_tanh" (HF
    #   gelu_pytorch_tanh) | "gelu" (exact)
    sandwich_norms: bool = False    # post-attention/post-MLP RMSNorms too
    rms_plus_one: bool = False      # RMSNorm weight convention out*(1+w)
    embed_scale: bool = False       # embeddings scaled by sqrt(hidden_size)
    query_pre_attn_scalar: Optional[float] = None  # sm_scale = qpa**-0.5
    final_logit_softcap: Optional[float] = None    # cap*tanh(logits/cap)

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @property
    def layer_windows(self) -> Tuple[Optional[int], ...]:
        """Per-layer window tuple (len num_layers)."""
        if self.window_pattern is not None:
            if len(self.window_pattern) != self.num_layers:
                raise ValueError(
                    f"window_pattern has {len(self.window_pattern)} entries "
                    f"for {self.num_layers} layers")
            return tuple(self.window_pattern)
        return (self.sliding_window,) * self.num_layers

    @property
    def recyclable_window(self) -> Optional[int]:
        """The single window shared by EVERY layer, or None.

        Rolling-window KV-page recycling (engine/spec-decode trim) is only
        sound when NO layer needs pages behind the window — i.e. the
        per-layer pattern is uniform and windowed. A mixed pattern
        (Gemma-2 alternation, Qwen2 split) returns None: its
        full-attention layers keep every page alive."""
        ws = set(self.layer_windows)
        if len(ws) == 1:
            return next(iter(ws))
        return None

    @property
    def sm_scale(self) -> Optional[float]:
        """None -> kernels default to head_dim**-0.5 (the Llama scaling);
        Gemma-2 scales by query_pre_attn_scalar**-0.5 instead."""
        if self.query_pre_attn_scalar is None:
            return None
        return float(self.query_pre_attn_scalar) ** -0.5

    @staticmethod
    def llama3_8b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8,
        )

    @staticmethod
    def llama3_70b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=128256, hidden_size=8192, intermediate_size=28672,
            num_layers=80, num_heads=64, num_kv_heads=8,
        )

    @staticmethod
    def mistral_7b() -> "LlamaConfig":
        # Mistral-7B-v0.1 shape: GQA 32/8, sliding window 4096.
        return LlamaConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8,
            rope_theta=10000.0, sliding_window=4096,
        )

    @staticmethod
    def qwen2_7b() -> "LlamaConfig":
        # Qwen2.5-7B shape: GQA 28/4, q/k/v biases, 1M-theta RoPE.
        return LlamaConfig(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_layers=28, num_heads=28, num_kv_heads=4,
            rope_theta=1000000.0, attention_bias=True,
        )

    @staticmethod
    def gemma2_9b() -> "LlamaConfig":
        # Gemma-2-9B shape: even layers sliding (window 4096), odd full;
        # sandwich norms, (1+w) RMSNorm, GeGLU, scaled embeddings, attn
        # softcap 50 / final-logit softcap 30, tied lm_head.
        return LlamaConfig(
            vocab_size=256000, hidden_size=3584, intermediate_size=14336,
            num_layers=42, num_heads=16, num_kv_heads=8, head_dim=256,
            rope_theta=10000.0,
            window_pattern=tuple(
                4096 if i % 2 == 0 else None for i in range(42)),
            hidden_act="gelu_tanh", sandwich_norms=True, rms_plus_one=True,
            embed_scale=True, query_pre_attn_scalar=256.0,
            logit_softcap=50.0, final_logit_softcap=30.0,
        )

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        base = dict(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2,
        )
        base.update(kw)
        return LlamaConfig(**base)


def init_params(cfg: LlamaConfig, key: jax.Array) -> Dict[str, Any]:
    hd = cfg.hd
    keys = jax.random.split(key, cfg.num_layers + 2)

    def dense(k, shape, scale=None):
        scale = scale if scale is not None else shape[0] ** -0.5
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    # (1+w) RMSNorms initialize their weight at ZERO (identity norm).
    norm_init = jnp.zeros if cfg.rms_plus_one else jnp.ones
    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i], 7)
        layer = dict(
            attn_norm=norm_init((cfg.hidden_size,), cfg.dtype),
            wq=dense(lk[0], (cfg.hidden_size, cfg.num_heads * hd)),
            wk=dense(lk[1], (cfg.hidden_size, cfg.num_kv_heads * hd)),
            wv=dense(lk[2], (cfg.hidden_size, cfg.num_kv_heads * hd)),
            wo=dense(lk[3], (cfg.num_heads * hd, cfg.hidden_size)),
            mlp_norm=norm_init((cfg.hidden_size,), cfg.dtype),
            w_gate=dense(lk[4], (cfg.hidden_size, cfg.intermediate_size)),
            w_up=dense(lk[5], (cfg.hidden_size, cfg.intermediate_size)),
            w_down=dense(lk[6], (cfg.intermediate_size, cfg.hidden_size)),
        )
        if cfg.sandwich_norms:
            layer["post_attn_norm"] = norm_init((cfg.hidden_size,), cfg.dtype)
            layer["post_mlp_norm"] = norm_init((cfg.hidden_size,), cfg.dtype)
        if cfg.attention_bias:
            layer["bq"] = jnp.zeros((cfg.num_heads * hd,), cfg.dtype)
            layer["bk"] = jnp.zeros((cfg.num_kv_heads * hd,), cfg.dtype)
            layer["bv"] = jnp.zeros((cfg.num_kv_heads * hd,), cfg.dtype)
        layers.append(layer)
    return dict(
        embed=dense(keys[-2], (cfg.vocab_size, cfg.hidden_size), scale=0.02),
        layers=jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        final_norm=norm_init((cfg.hidden_size,), cfg.dtype),
        lm_head=dense(keys[-1], (cfg.hidden_size, cfg.vocab_size)),
    )


def param_shardings(cfg: LlamaConfig) -> Dict[str, Any]:
    """PartitionSpecs for a ("dp", "tp") mesh: attention heads and MLP hidden
    dim sharded over "tp" (Megatron-style column/row parallel), everything
    else replicated. XLA inserts the psum after wo / w_down contractions."""
    layer = dict(
        attn_norm=P(None, None),
        wq=P(None, None, "tp"),
        wk=P(None, None, "tp"),
        wv=P(None, None, "tp"),
        wo=P(None, "tp", None),
        mlp_norm=P(None, None),
        w_gate=P(None, None, "tp"),
        w_up=P(None, None, "tp"),
        w_down=P(None, "tp", None),
    )
    if cfg.sandwich_norms:
        layer["post_attn_norm"] = P(None, None)
        layer["post_mlp_norm"] = P(None, None)
    if cfg.attention_bias:
        # biases shard with their projection's output (column) dim
        layer["bq"] = P(None, "tp")
        layer["bk"] = P(None, "tp")
        layer["bv"] = P(None, "tp")
    return dict(
        embed=P(None, None),
        layers=layer,
        final_norm=P(None),
        lm_head=P(None, "tp"),
    )


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float,
             plus_one: bool = False) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    if plus_one:
        # Gemma convention: scale by (1 + w) IN float32, then cast (HF
        # Gemma2RMSNorm multiplies before the downcast; Llama's multiplies
        # after — the bf16 rounding differs, so match each family's).
        return (normed * (1.0 + w.astype(jnp.float32))).astype(x.dtype)
    return normed.astype(x.dtype) * w


def _act(cfg: "LlamaConfig", x: jnp.ndarray) -> jnp.ndarray:
    """Gate activation in float32 (both families upcast around the gate)."""
    if cfg.hidden_act == "silu":
        return jax.nn.silu(x)
    if cfg.hidden_act == "gelu_tanh":  # HF "gelu_pytorch_tanh" (Gemma)
        return jax.nn.gelu(x, approximate=True)
    if cfg.hidden_act == "gelu":  # HF "gelu" (exact erf GELU)
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown hidden_act {cfg.hidden_act!r}")


def qkv_proj(dense, h, p: Dict[str, Any], w: str, b: str):
    """q/k/v projection with optional Qwen2-style additive bias — present
    iff the layer dict carries the bias key (a STATIC property, so the
    no-bias path compiles to a bare matmul under lax.scan)."""
    out = dense(h, p[w])
    if b in p:
        out = out + p[b]
    return out


def qkv_triple(cfg, dense, h, p: Dict[str, Any]):
    """The (q, k, v) flat projections, as ONE launch when the layer dict
    carries a fused `wqkv` (quant.weights.fuse_w4_projections): decode is
    weight-bandwidth-bound and each fused dequant-matmul launch carries
    ~5-7us of ramp — run43b measured qkv fused at 25.0us vs 30.0us for
    the three separate calls, with wk/wv standalone at only 34% of their
    packed floor. The splits are static slices (free under jit); Qwen2
    biases apply per slice exactly as in the unfused path."""
    nq = cfg.num_heads * cfg.hd
    nkv = cfg.num_kv_heads * cfg.hd
    if "wqkv" in p:
        out = dense(h, p["wqkv"])
        q = out[..., :nq]
        k = out[..., nq:nq + nkv]
        v = out[..., nq + nkv:]
        if "bq" in p:
            q = q + p["bq"]
        if "bk" in p:
            k = k + p["bk"]
        if "bv" in p:
            v = v + p["bv"]
        return q, k, v
    return (qkv_proj(dense, h, p, "wq", "bq"),
            qkv_proj(dense, h, p, "wk", "bk"),
            qkv_proj(dense, h, p, "wv", "bv"))


def mlp_gate_up(cfg, dense, h, p: Dict[str, Any]):
    """(pre-activation gate, up) MLP projections — one launch via the
    fused `w_gateup` when present (see qkv_triple; run43b: 105us fused vs
    114.6us separate on the 8B gate/up shapes)."""
    if "w_gateup" in p:
        gu = dense(h, p["w_gateup"])
        inter = gu.shape[-1] // 2
        return gu[..., :inter], gu[..., inter:]
    return dense(h, p["w_gate"]), dense(h, p["w_up"])


_UNSET = object()  # sentinel: "use cfg.sliding_window" for window overrides


def _attention(cfg: LlamaConfig, q, k, v, *, causal=True, window=_UNSET):
    """k/v may carry num_kv_heads < num_heads: the flash kernels are
    GQA-native (BlockSpec index maps share each kv head across its query
    group — no materialized repeat); only the jnp reference needs the
    expansion. window: per-layer override (a STATIC int or None) used by
    forward()'s window_pattern decomposition; defaults to the global
    cfg.sliding_window."""
    if window is _UNSET:
        window = cfg.sliding_window
    window = window if causal else None
    sinks = cfg.attention_sinks if window is not None else 0
    if cfg.attention_impl == "flash":
        return flash_attention(
            q, k, v, sm_scale=cfg.sm_scale, causal=causal,
            block_q=cfg.block_q, block_kv=cfg.block_kv,
            window=window, logit_softcap=cfg.logit_softcap,
            attention_sinks=sinks,
        )
    if cfg.attention_impl == "flash_int8":
        return flash_attention_int8(
            q, k, v, sm_scale=cfg.sm_scale, causal=causal,
            block_q=cfg.block_q, block_kv=cfg.block_kv,
            window=window, logit_softcap=cfg.logit_softcap,
            attention_sinks=sinks,
        )
    from quantizedmha_tpu.reference.mha import mha_masked_reference

    return mha_masked_reference(
        q, k, v, sm_scale=cfg.sm_scale, causal=causal, window=window,
        softcap=cfg.logit_softcap, sinks=sinks)


def decoder_layer(cfg: LlamaConfig, p: Dict[str, Any], x: jnp.ndarray,
                  positions: Optional[jnp.ndarray] = None,
                  window=_UNSET) -> jnp.ndarray:
    from quantizedmha_tpu.quant.weights import qdense

    b, s, _ = x.shape
    hd = cfg.hd
    plus1 = cfg.rms_plus_one
    dense = functools.partial(qdense, mode=cfg.weight_quant_mode)
    h = rms_norm(x, p["attn_norm"], cfg.rms_eps, plus1)
    q, k, v = qkv_triple(cfg, dense, h, p)
    q = q.reshape(b, s, cfg.num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, cfg.num_kv_heads, hd).transpose(0, 2, 1, 3)
    q = apply_rope(q, cfg.rope_theta, positions)
    k = apply_rope(k, cfg.rope_theta, positions)
    o = _attention(cfg, q, k, v, causal=True, window=window)
    o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.num_heads * hd)
    o = dense(o, p["wo"])
    if cfg.sandwich_norms:
        o = rms_norm(o, p["post_attn_norm"], cfg.rms_eps, plus1)
    x = x + o

    h = rms_norm(x, p["mlp_norm"], cfg.rms_eps, plus1)
    g_pre, up = mlp_gate_up(cfg, dense, h, p)
    gate = _act(cfg, g_pre.astype(jnp.float32)).astype(x.dtype)
    m = dense(gate * up, p["w_down"])
    if cfg.sandwich_norms:
        m = rms_norm(m, p["post_mlp_norm"], cfg.rms_eps, plus1)
    return x + m


def _pattern_period(windows: Tuple) -> int:
    """Smallest p dividing len(windows) with windows[i] == windows[i % p]."""
    L = len(windows)
    for p in range(1, L + 1):
        if L % p == 0 and all(windows[i] == windows[i % p] for i in range(L)):
            return p
    return L


def _pattern_runs(windows: Tuple):
    """Consecutive equal-window runs as (window, length) pairs."""
    runs = []
    for w in windows:
        if runs and runs[-1][0] == w:
            runs[-1][1] += 1
        else:
            runs.append([w, 1])
    return [(w, n) for w, n in runs]


def scan_layers(windows: Tuple, body, x, xs):
    """lax.scan over the leading layer axis of `xs` where the body takes
    each layer's STATIC window: `body(x, scanned_slice, window) -> (x, y)`.

    Per-layer window patterns keep every kernel call's window a
    compile-time constant (the shrunk windowed grid is a static shape) by
    decomposing the scan — uniform pattern: one scan (Llama/Mistral);
    short periodic pattern: chunked scan with a p-layer unrolled body
    (Gemma-2's sliding/full alternation, p=2); otherwise: one scan per
    contiguous equal-window run (Qwen2's full-below-max_window_layers
    split, 2 runs). Returns (x, ys) with ys stacked [num_layers, ...] in
    layer order in every case (ys may be None if the body yields None).
    `len(windows)` must equal the leading dim of `xs`' leaves — callers
    pass cfg.layer_windows (whole model) or a stage-local slice (PP)."""
    L = len(windows)
    period = _pattern_period(windows)
    if period == 1:
        return jax.lax.scan(lambda x, s: body(x, s, windows[0]), x, xs)
    if period <= 4:
        chunked = jax.tree.map(
            lambda a: a.reshape(L // period, period, *a.shape[1:]), xs)

        def chunk_body(x, chunk):
            ys = []
            for i in range(period):
                s = jax.tree.map(lambda a: a[i], chunk)
                x, y = body(x, s, windows[i])
                ys.append(y)
            return x, jax.tree.map(lambda *zs: jnp.stack(zs), *ys)

        x, ys = jax.lax.scan(chunk_body, x, chunked)
        return x, jax.tree.map(lambda a: a.reshape(L, *a.shape[2:]), ys)
    start = 0
    outs = []
    for win, n_run in _pattern_runs(windows):
        sub = jax.tree.map(lambda a: a[start:start + n_run], xs)
        x, y = jax.lax.scan(lambda x, s, w=win: body(x, s, w), x, sub)
        outs.append(y)
        start += n_run
    return x, jax.tree.map(lambda *zs: jnp.concatenate(zs), *outs)


def embed_tokens(cfg: LlamaConfig, params: Dict[str, Any],
                 tokens: jnp.ndarray) -> jnp.ndarray:
    x = params["embed"][tokens].astype(cfg.dtype)
    if cfg.embed_scale:
        # Gemma scales embeddings by sqrt(hidden) ROUNDED TO THE MODEL
        # DTYPE (HF casts the normalizer before multiplying).
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, cfg.dtype)
    return x


def final_logits(cfg: LlamaConfig, x: jnp.ndarray,
                 lm_head: jnp.ndarray) -> jnp.ndarray:
    from quantizedmha_tpu.quant.weights import qdense

    # Pad the row count to the 8-row sublane quantum: below it XLA lowers
    # the vocab projection as a VPU multiply-REDUCE instead of an MXU
    # matmul — run56's batch-1 trace measured the int8 [1, 4096] matvec
    # at 1.15 ms/step vs ~0.7 for the 8-row matmul form (same weight
    # stream; the padded rows are sliced off).
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    rpad = -rows % 8 if rows < 8 else 0
    if rpad:
        lead = x.shape[:-1]
        xr = jnp.pad(x.reshape(rows, x.shape[-1]), ((0, rpad), (0, 0)))
        out = qdense(xr, lm_head, mode=cfg.weight_quant_mode)
        logits = out[:rows].reshape(*lead, out.shape[-1]).astype(
            jnp.float32)
    else:
        logits = qdense(x, lm_head, mode=cfg.weight_quant_mode).astype(
            jnp.float32)
    if cfg.final_logit_softcap is not None:
        cap = cfg.final_logit_softcap
        logits = jnp.tanh(logits / cap) * cap
    return logits


def forward(cfg: LlamaConfig, params: Dict[str, Any], tokens: jnp.ndarray,
            positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """tokens: [batch, seq] int32 -> logits [batch, seq, vocab].

    Layer iteration goes through scan_layers, which decomposes the scan so
    per-layer window patterns keep every kernel call's window STATIC."""
    x = embed_tokens(cfg, params, tokens)

    def body(x, layer_params, window):
        return decoder_layer(cfg, layer_params, x, positions,
                             window=window), None

    x, _ = scan_layers(cfg.layer_windows, body, x, params["layers"])
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    return final_logits(cfg, x, params["lm_head"])


def loss_fn(cfg: LlamaConfig, params: Dict[str, Any], tokens: jnp.ndarray) -> jnp.ndarray:
    """Next-token cross-entropy (shifted)."""
    logits = forward(cfg, params, tokens)
    targets = tokens[:, 1:]
    logits = logits[:, :-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def sgd_train_step(cfg: LlamaConfig, params: Dict[str, Any], tokens: jnp.ndarray,
                   lr: float = 1e-3) -> Tuple[Dict[str, Any], jnp.ndarray]:
    loss, grads = jax.value_and_grad(lambda p: loss_fn(cfg, p, tokens))(params)
    new_params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), params, grads)
    return new_params, loss
