"""HF safetensors loader (models/hf_loader.py): exact tensor-name mapping,
RoPE convention conversion, int8-on-load, and TP shard-on-load.

The reference has no checkpoint loading of any kind (SURVEY.md — no model
zoo); this is north-star serving scope: real Llama weights into the
engine. Tests run against a synthetic checkpoint written in the exact HF
format (names, [out, in] layout, rotate-half q/k permutation, optional
shard index)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.models.hf_loader import (
    _unpermute_rope,
    config_from_hf,
    load_llama,
    save_llama_synthetic,
)
from quantizedmha_tpu.models.llama import LlamaConfig, forward, init_params
from quantizedmha_tpu.reference.mha import apply_rope


CFG = LlamaConfig.tiny(num_layers=2, head_dim=16)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("hf_ckpt")
    save_llama_synthetic(path, CFG, seed=0)
    return path


def test_config_roundtrip(ckpt):
    cfg = config_from_hf(ckpt)
    assert cfg.hidden_size == CFG.hidden_size
    assert cfg.num_kv_heads == CFG.num_kv_heads
    assert cfg.hd == CFG.hd


def test_tree_matches_init_params(ckpt):
    """The loaded pytree must drop into every function init_params feeds."""
    params = load_llama(ckpt, CFG)
    ref = init_params(CFG, jax.random.PRNGKey(0))
    got_paths = {
        jax.tree_util.keystr(kp): v.shape
        for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    want_paths = {
        jax.tree_util.keystr(kp): v.shape
        for kp, v in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    assert got_paths == want_paths


def test_rope_convention_conversion():
    """HF checkpoints permute q/k rows for rotate-half RoPE; our kernels
    rotate interleaved pairs. unpermute(w_hf) under interleaved RoPE must
    equal w_hf under rotate-half RoPE — THE correctness test for serving
    real weights (a mismatch still produces plausible-looking text)."""
    n_heads, hd, hidden, S = 2, 16, 32, 8
    rng = np.random.default_rng(1)
    w_hf = rng.standard_normal((n_heads * hd, hidden)).astype(np.float32)
    x = rng.standard_normal((S, hidden)).astype(np.float32)

    def rotate_half_rope(q):  # q: [1, H, S, hd] — the HF convention
        half = hd // 2
        pos = np.arange(S, dtype=np.float32)
        freqs = 10000.0 ** (-np.arange(0, half, dtype=np.float32) / half)
        ang = pos[:, None] * freqs[None, :]          # [S, half]
        cos = np.concatenate([np.cos(ang), np.cos(ang)], -1)
        sin = np.concatenate([np.sin(ang), np.sin(ang)], -1)
        q1, q2 = q[..., :half], q[..., half:]
        rot = np.concatenate([-q2, q1], -1)
        return q * cos + rot * sin

    q_hf = (x @ w_hf.T).reshape(S, n_heads, hd).transpose(1, 0, 2)[None]
    want = rotate_half_rope(q_hf)

    w_ours = _unpermute_rope(w_hf, n_heads, hd)
    q_ours = (x @ w_ours.T).reshape(S, n_heads, hd).transpose(1, 0, 2)[None]
    got = np.asarray(apply_rope(jnp.asarray(q_ours), 10000.0), np.float32)

    # got is in interleaved order; w_ours' rows are interleaved too, so
    # un-interleave got back to HF row order for comparison.
    half = hd // 2
    got_half_order = np.concatenate([got[..., 0::2], got[..., 1::2]], -1)
    np.testing.assert_allclose(got_half_order, want, rtol=2e-4, atol=2e-4)


def test_forward_runs_and_tied_embeddings(ckpt, tmp_path):
    params = load_llama(ckpt, CFG)
    tokens = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    logits = forward(CFG, params, tokens)
    assert logits.shape == (1, 8, CFG.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))

    # Tied embeddings: drop lm_head.weight from the checkpoint; the loader
    # must fall back to embed^T.
    save_llama_synthetic(tmp_path / "tied", CFG, seed=0)
    import safetensors.numpy as stnp

    f = tmp_path / "tied" / "model.safetensors"
    tensors = dict(stnp.load_file(f))
    tensors.pop("lm_head.weight")
    stnp.save_file(tensors, f)
    p2 = load_llama(tmp_path / "tied", CFG)
    np.testing.assert_array_equal(
        np.asarray(p2["lm_head"], np.float32),
        np.asarray(p2["embed"], np.float32).T,
    )


def test_sharded_index_checkpoint(tmp_path):
    save_llama_synthetic(tmp_path, CFG, seed=0, shards=3)
    assert (tmp_path / "model.safetensors.index.json").exists()
    params = load_llama(tmp_path, CFG)
    ref = init_params(CFG, jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(ref)


def test_quantized_load_runs_forward(ckpt):
    cfg = CFG
    params_f = load_llama(ckpt, cfg)
    params_q = load_llama(ckpt, cfg, quantize=True)
    from quantizedmha_tpu.quant.weights import QuantizedWeight

    assert isinstance(params_q["layers"]["wq"], QuantizedWeight)
    tokens = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    lf = forward(cfg, params_f, tokens)
    lq = forward(cfg, params_q, tokens)
    # int8 weights: logits close but not equal
    assert bool(jnp.all(jnp.isfinite(lq)))
    top_f = jnp.argmax(lf[0, -1])
    assert lq.shape == lf.shape
    # per-channel int8 keeps relative logit error small on this scale
    rel = float(jnp.max(jnp.abs(lq - lf)) / (jnp.max(jnp.abs(lf)) + 1e-6))
    assert rel < 0.15, rel
    del top_f


def test_w4_quantized_load_runs_forward(ckpt):
    from quantizedmha_tpu.quant.weights import QuantizedWeight4

    params_f = load_llama(ckpt, CFG)
    params_q = load_llama(ckpt, CFG, quantize=True, quantize_bits=4,
                          quantize_group=32)
    wq = params_q["layers"]["wq"]
    assert isinstance(wq, QuantizedWeight4)
    # packed nibbles: half the input rows, per-(group, out) scales
    full = params_f["layers"]["wq"]
    assert wq.packed.shape == (full.shape[0], full.shape[1] // 2,
                               full.shape[2])
    assert wq.scale.shape == (full.shape[0], full.shape[1] // 32,
                              full.shape[2])
    tokens = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    lq = forward(CFG, params_q, tokens)
    assert bool(jnp.all(jnp.isfinite(lq)))
    lf = forward(CFG, params_f, tokens)
    rel_rms = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
    assert rel_rms < 0.5, rel_rms


def test_w4_tp_shard_on_load(ckpt):
    from quantizedmha_tpu.parallel.distributed import hybrid_mesh
    from quantizedmha_tpu.quant.weights import QuantizedWeight4

    mesh = hybrid_mesh((2,), (2,), ("dp",), ("tp",))
    params = load_llama(ckpt, CFG, mesh=mesh, quantize=True,
                        quantize_bits=4, quantize_group=32)
    wq = params["layers"]["wq"]
    assert isinstance(wq, QuantizedWeight4)
    assert "tp" in str(wq.packed.sharding.spec)
    # group-scale axes follow (layer, in-group, out) of the weight spec
    assert "tp" in str(wq.scale.sharding.spec)
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    with mesh:
        logits = forward(CFG, params, tokens)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_tp_shard_on_load(ckpt):
    from quantizedmha_tpu.parallel.distributed import hybrid_mesh

    mesh = hybrid_mesh((2,), (2,), ("dp",), ("tp",))
    params = load_llama(ckpt, CFG, mesh=mesh)
    wq = params["layers"]["wq"]
    # column-parallel: out dim sharded over tp
    assert "tp" in str(wq.sharding.spec)
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    with mesh:
        logits = forward(CFG, params, tokens)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_qwen2_style_bias_roundtrip(tmp_path):
    """Qwen2-family checkpoints carry q/k/v projection biases (q/k biases
    HF-permuted for rotate-half RoPE like the weights). Load, run, and pin
    the RoPE-equivalence of the bias path: rope(Wx + b) interleaved must
    equal rotate-half rope of the HF-layout projection."""
    cfg = LlamaConfig.tiny(num_layers=1, head_dim=16, attention_bias=True)
    save_llama_synthetic(tmp_path, cfg, seed=4)
    loaded_cfg = config_from_hf(tmp_path)
    assert loaded_cfg.attention_bias
    params = load_llama(tmp_path, cfg)
    assert "bq" in params["layers"] and params["layers"]["bq"].shape == (
        1, cfg.num_heads * cfg.hd)
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    logits = forward(cfg, params, tokens)
    assert bool(jnp.all(jnp.isfinite(logits)))

    # Bias actually matters: zeroing it must change the logits (the
    # synthetic biases are random, not zero).
    import copy

    p0 = copy.deepcopy(params)
    p0["layers"]["bq"] = jnp.zeros_like(p0["layers"]["bq"])
    p0["layers"]["bk"] = jnp.zeros_like(p0["layers"]["bk"])
    p0["layers"]["bv"] = jnp.zeros_like(p0["layers"]["bv"])
    logits0 = forward(cfg, p0, tokens)
    assert float(jnp.max(jnp.abs(logits - logits0))) > 1e-4


def test_bias_rope_convention():
    """q = W_hf x + b_hf under rotate-half RoPE == unpermute(W) x +
    unpermute(b) under interleaved RoPE (modulo the row-order relabeling)."""
    n_heads, hd, hidden, S = 2, 16, 32, 4
    rng = np.random.default_rng(5)
    w_hf = rng.standard_normal((n_heads * hd, hidden)).astype(np.float32)
    b_hf = rng.standard_normal((n_heads * hd,)).astype(np.float32)
    x = rng.standard_normal((S, hidden)).astype(np.float32)

    w_m = _unpermute_rope(w_hf, n_heads, hd)
    b_m = _unpermute_rope(b_hf, n_heads, hd)
    q_m = ((x @ w_m.T) + b_m).reshape(S, n_heads, hd).transpose(1, 0, 2)[None]
    got = np.asarray(apply_rope(jnp.asarray(q_m), 10000.0), np.float32)
    got_half = np.concatenate([got[..., 0::2], got[..., 1::2]], -1)

    def rotate_half_rope(q):
        half = hd // 2
        pos = np.arange(S, dtype=np.float32)
        freqs = 10000.0 ** (-np.arange(0, half, dtype=np.float32) / half)
        ang = pos[:, None] * freqs[None, :]
        cos = np.concatenate([np.cos(ang), np.cos(ang)], -1)
        sin = np.concatenate([np.sin(ang), np.sin(ang)], -1)
        q1, q2 = q[..., :half], q[..., half:]
        rot = np.concatenate([-q2, q1], -1)
        return q * cos + rot * sin

    q_hf = ((x @ w_hf.T) + b_hf).reshape(S, n_heads, hd).transpose(1, 0, 2)[None]
    want = rotate_half_rope(q_hf)
    np.testing.assert_allclose(got_half, want, rtol=3e-4, atol=3e-4)


def test_logits_match_real_transformers(tmp_path):
    """The decisive convention test: a checkpoint written by transformers
    ITSELF (random weights) must produce the same logits through our
    loader + forward as through transformers' own LlamaForCausalLM.
    The synthetic roundtrip cannot catch a wrong RoPE permute or name
    mapping (writer and reader would share the bug); this can."""
    import dataclasses

    torch = pytest.importorskip("torch")
    tfs = pytest.importorskip("transformers")

    hf_cfg = tfs.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = tfs.LlamaForCausalLM(hf_cfg).eval().float()
    model.save_pretrained(tmp_path / "hf", safe_serialization=True)

    tokens = np.array([[1, 5, 9, 2, 7, 11, 3, 6]], np.int32)
    with torch.no_grad():
        want = model(torch.from_numpy(tokens).long()).logits.numpy()

    cfg = dataclasses.replace(
        config_from_hf(tmp_path / "hf"),
        dtype=jnp.float32, attention_impl="reference")
    params = load_llama(tmp_path / "hf", cfg, dtype=jnp.float32)
    got = np.asarray(forward(cfg, params, jnp.asarray(tokens)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_qwen2_logits_match_real_transformers(tmp_path):
    """Same decisive check for the Qwen2 family: q/k/v projection BIASES
    ride the same rotate-half permute as their weights — a convention
    error in _unpermute_rope's bias path would only show against
    transformers' own forward."""
    import dataclasses

    torch = pytest.importorskip("torch")
    tfs = pytest.importorskip("transformers")

    hf_cfg = tfs.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        use_sliding_window=False,
    )
    torch.manual_seed(1)
    model = tfs.Qwen2ForCausalLM(hf_cfg).eval().float()
    model.save_pretrained(tmp_path / "hf", safe_serialization=True)

    tokens = np.array([[2, 4, 8, 16, 32, 64, 9, 13]], np.int32)
    with torch.no_grad():
        want = model(torch.from_numpy(tokens).long()).logits.numpy()

    cfg = config_from_hf(tmp_path / "hf")
    assert cfg.attention_bias, "Qwen2 config must infer attention_bias"
    cfg = dataclasses.replace(
        cfg, dtype=jnp.float32, attention_impl="reference")
    params = load_llama(tmp_path / "hf", cfg, dtype=jnp.float32)
    got = np.asarray(forward(cfg, params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_qwen2_per_layer_window_matches_transformers(tmp_path):
    """Qwen2's use_sliding_window/max_window_layers split (full attention
    below max_window_layers, sliding above) loads as a window_pattern and
    must reproduce transformers' own per-layer masking — the window (4)
    BITES at seq 8, so a layer misassignment shows up in the logits.
    Round-1 loader refused these checkpoints outright."""
    import dataclasses

    torch = pytest.importorskip("torch")
    tfs = pytest.importorskip("transformers")

    hf_cfg = tfs.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5, tie_word_embeddings=False,
        use_sliding_window=True, sliding_window=4, max_window_layers=1,
    )
    torch.manual_seed(2)
    model = tfs.Qwen2ForCausalLM(hf_cfg).eval().float()
    model.save_pretrained(tmp_path / "hf", safe_serialization=True)

    tokens = np.array([[3, 9, 27, 81, 115, 31, 93, 24]], np.int32)
    with torch.no_grad():
        want = model(torch.from_numpy(tokens).long()).logits.numpy()

    cfg = config_from_hf(tmp_path / "hf")
    assert cfg.window_pattern == (None, 4, 4), cfg.window_pattern
    cfg = dataclasses.replace(
        cfg, dtype=jnp.float32, attention_impl="reference")
    params = load_llama(tmp_path / "hf", cfg, dtype=jnp.float32)
    got = np.asarray(forward(cfg, params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # the flash path must agree with itself on the same pattern
    cfg_f = dataclasses.replace(cfg, attention_impl="flash",
                                block_q=8, block_kv=8)
    got_f = np.asarray(forward(cfg_f, params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got_f, want, rtol=2e-3, atol=2e-3)


def test_gemma2_logits_match_real_transformers(tmp_path):
    """Gemma-2 family end-to-end vs transformers: alternating sliding/full
    layers (window 4 at seq 8), sandwich norms, (1+w) RMSNorm, GeGLU,
    scaled embeddings, query_pre_attn_scalar, attention softcap 50, final
    logit softcap 30, tied lm_head — every knob verified at once against
    the family's own reference forward."""
    import dataclasses

    torch = pytest.importorskip("torch")
    tfs = pytest.importorskip("transformers")

    hf_cfg = tfs.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000.0, rms_norm_eps=1e-5,
        sliding_window=4, query_pre_attn_scalar=16.0,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
    )
    torch.manual_seed(3)
    model = tfs.Gemma2ForCausalLM(hf_cfg).eval().float()
    model.save_pretrained(tmp_path / "hf", safe_serialization=True)

    tokens = np.array([[5, 10, 20, 40, 80, 33, 66, 99]], np.int32)
    with torch.no_grad():
        want = model(torch.from_numpy(tokens).long()).logits.numpy()

    cfg = config_from_hf(tmp_path / "hf")
    assert cfg.sandwich_norms and cfg.rms_plus_one and cfg.embed_scale
    assert cfg.hidden_act == "gelu_tanh"
    assert cfg.window_pattern == (4, None, 4, None), cfg.window_pattern
    assert cfg.logit_softcap == 50.0 and cfg.final_logit_softcap == 30.0
    cfg = dataclasses.replace(
        cfg, dtype=jnp.float32, attention_impl="reference")
    params = load_llama(tmp_path / "hf", cfg, dtype=jnp.float32)
    got = np.asarray(forward(cfg, params, jnp.asarray(tokens)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    cfg_f = dataclasses.replace(cfg, attention_impl="flash",
                                block_q=8, block_kv=8)
    got_f = np.asarray(forward(cfg_f, params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got_f, want, rtol=2e-3, atol=2e-3)


def test_gemma2_config_defaults_match_transformers(tmp_path):
    """Missing optional Gemma-2 keys must take transformers' defaults:
    query_pre_attn_scalar=256 (NOT hidden/heads), activation
    gelu_pytorch_tanh; the even-layers-slide alternation is derived."""
    base = dict(
        architectures=["Gemma2ForCausalLM"], vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
        rms_norm_eps=1e-6, sliding_window=16)
    (tmp_path / "config.json").write_text(json.dumps(base))
    cfg = config_from_hf(tmp_path)
    assert cfg.query_pre_attn_scalar == 256.0  # 32//4 = 8 would be wrong
    assert cfg.hidden_act == "gelu_tanh"
    assert cfg.window_pattern == (16, None, 16, None)

    # Exact "gelu" is the erf curve — must map to "gelu", not silu.
    (tmp_path / "config.json").write_text(
        json.dumps({**base, "hidden_activation": "gelu"}))
    assert config_from_hf(tmp_path).hidden_act == "gelu"

    # Unknown activations refuse loudly instead of silently drifting.
    (tmp_path / "config.json").write_text(
        json.dumps({**base, "hidden_activation": "relu6"}))
    with pytest.raises(ValueError, match="hidden_activation"):
        config_from_hf(tmp_path)


def test_qwen2_max_window_layers_defaults_to_28(tmp_path):
    """transformers' Qwen2Config defaults max_window_layers to 28 when the
    key is absent — a 4-layer config with use_sliding_window=true must
    come out all-FULL (every layer below 28), not all-sliding."""
    (tmp_path / "config.json").write_text(json.dumps(dict(
        architectures=["Qwen2ForCausalLM"], vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
        rms_norm_eps=1e-6, use_sliding_window=True, sliding_window=16)))
    cfg = config_from_hf(tmp_path)
    assert cfg.sliding_window is None
    assert cfg.window_pattern is None


def test_layer_types_sliding_without_window_refuses(tmp_path):
    """layer_types marking sliding layers while the effective window is
    None (null, or disabled by use_sliding_window=false) is contradictory
    — refuse loudly rather than silently loading full attention."""
    base = dict(
        architectures=["Qwen2ForCausalLM"], vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
        rms_norm_eps=1e-6,
        layer_types=["sliding_attention", "full_attention"])
    (tmp_path / "config.json").write_text(json.dumps(base))
    with pytest.raises(ValueError, match="sliding_window"):
        config_from_hf(tmp_path)
    (tmp_path / "config.json").write_text(json.dumps(
        {**base, "sliding_window": 16, "use_sliding_window": False}))
    with pytest.raises(ValueError, match="sliding_window"):
        config_from_hf(tmp_path)


def test_multifile_shard_on_load_tp_accounting(tmp_path):
    """The 70B claim's mechanical half (round-2 verdict #8): a MULTI-FILE
    indexed checkpoint loaded shard-on-load under a TP mesh. Asserts
    (a) values are IDENTICAL to the single-file load, (b) every device
    holds exactly replicated_bytes + sharded_bytes/tp of addressable
    parameter memory — i.e. no tensor was silently materialized
    replicated — and (c) column/row-sharded leaves carry the plan's spec."""
    import numpy as np

    from quantizedmha_tpu.models.llama import param_shardings
    from quantizedmha_tpu.parallel.distributed import hybrid_mesh

    save_llama_synthetic(tmp_path / "multi", CFG, seed=0, shards=4)
    save_llama_synthetic(tmp_path / "single", CFG, seed=0, shards=1)
    assert len(list((tmp_path / "multi").glob("model-*.safetensors"))) == 4

    tp = 2
    mesh = hybrid_mesh((2,), (tp,), ("dp",), ("tp",))
    pm = load_llama(tmp_path / "multi", CFG, mesh=mesh)
    ps = load_llama(tmp_path / "single", CFG)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)), pm, ps)

    # Sharding plan applied: wq column-sharded, wo row-sharded over tp.
    assert "tp" in str(pm["layers"]["wq"].sharding.spec)
    assert "tp" in str(pm["layers"]["wo"].sharding.spec)

    # Per-device addressable-memory accounting: each of the mesh's devices
    # must hold full bytes of replicated leaves and 1/tp of tp-sharded
    # leaves (dp only replicates here — no batch dim in params).
    specs = param_shardings(CFG)  # PartitionSpec is a pytree LEAF
    expected = sum(jax.tree_util.tree_leaves(jax.tree.map(
        lambda leaf, spec: leaf.size * leaf.dtype.itemsize
        // (tp if "tp" in str(spec) else 1), pm, specs)))

    per_device = {}
    for leaf in jax.tree_util.tree_leaves(pm):
        for s in leaf.addressable_shards:
            per_device[s.device] = per_device.get(s.device, 0) + s.data.nbytes
    assert len(per_device) == 4  # every mesh device holds a shard
    for dev, nbytes in per_device.items():
        assert nbytes == expected, (dev, nbytes, expected)
