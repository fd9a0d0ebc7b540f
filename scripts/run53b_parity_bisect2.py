#!/usr/bin/env python
"""run53b — second bisect round for the mixed-parity break.

run53: plain fold == plain nofold (hfold bitwise clean), both != mixed
parity streams at the same token. Remaining suspects: (a) the plane-RMW
append (plain path only; CPU-exact vs the old chain but chip untested),
(b) the auto-folded int8 kernel inside mixed_paged_decode_attention's
save_residuals+merge path. Probe each by monkeypatching one at a time.
"""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from quantizedmha_tpu.models.llama import LlamaConfig, init_params  # noqa: E402
from quantizedmha_tpu.serving import llama_adapter, mixed_kv  # noqa: E402
from quantizedmha_tpu.serving.engine import Engine, EngineConfig  # noqa: E402
from quantizedmha_tpu.serving.kv_cache import PagedKVCacheState  # noqa: E402

PAGE = 64
N_PROMPT, N_NEW, BATCH = 448, 64, 8


def old_append_at_layer(state, layer, k_tok, v_tok, page_ids, slots,
                        scales_rowed=False):
    """The pre-round-5 per-lane chain (bit-reference)."""
    B, hkv, hd = k_tok.shape
    kf = k_tok.astype(jnp.float32)
    vf = v_tok.astype(jnp.float32)
    k_fit = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1), 1e-8) / 127.0
    v_fit = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1), 1e-8) / 127.0
    kp, vp, kssa, vssa = (state.k_pages, state.v_pages,
                          state.k_scales, state.v_scales)
    layer = jnp.asarray(layer, jnp.int32)
    zero = jnp.int32(0)
    cols = kssa.ndim == 4
    s_sizes = (1, hkv, 1, 1) if cols else (1, hkv, 1)

    def s_idx(pid):
        return (layer, zero, pid, zero) if cols else (layer, zero, pid)

    for b in range(B):
        pid, slot = page_ids[b], slots[b]
        ks_old = jax.lax.dynamic_slice(kssa, s_idx(pid), s_sizes).reshape(hkv)
        vs_old = jax.lax.dynamic_slice(vssa, s_idx(pid), s_sizes).reshape(hkv)
        ks_b = jnp.where(slot == 0, k_fit[b], ks_old)
        vs_b = jnp.where(slot == 0, v_fit[b], vs_old)
        kq = jnp.clip(jnp.round(kf[b] / ks_b[:, None]), -127, 127).astype(jnp.int8)
        vq = jnp.clip(jnp.round(vf[b] / vs_b[:, None]), -127, 127).astype(jnp.int8)
        idx = (layer, zero, pid, slot, zero)
        kp = jax.lax.dynamic_update_slice(kp, kq[None, :, None, None, :], idx)
        vp = jax.lax.dynamic_update_slice(vp, vq[None, :, None, None, :], idx)
        kssa = jax.lax.dynamic_update_slice(kssa, ks_b.reshape(s_sizes), s_idx(pid))
        vssa = jax.lax.dynamic_update_slice(vssa, vs_b.reshape(s_sizes), s_idx(pid))
    return PagedKVCacheState(k_pages=kp, v_pages=vp,
                             k_scales=kssa, v_scales=vssa)


def drive(cfg, params, mixed, boundary=256):
    ecfg = EngineConfig(
        num_pages=512, page_size=PAGE, max_batch=BATCH,
        prefill_buckets=(512,), max_new_tokens=N_NEW, max_pages_per_seq=16,
        mixed_kv=({"boundary_tokens": boundary, "int8_pages": 256,
                   "int4_pages": 256} if mixed else None),
    )
    eng = Engine(cfg, params, ecfg)
    rng = np.random.default_rng(0)
    for _ in range(BATCH):
        eng.add_request(list(rng.integers(1, 32000, N_PROMPT)),
                        max_new=N_NEW)
    return eng.run()


def first_diff(a, b):
    for rid in sorted(a):
        if a[rid] != b[rid]:
            x, y = a[rid], b[rid]
            for i, (p, q) in enumerate(zip(x, y)):
                if p != q:
                    return f"rid {rid} pos {i}: {p} vs {q}"
            return f"rid {rid} length {len(x)} vs {len(y)}"
    return None


def main():
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=1024, intermediate_size=2816,
        num_layers=8, num_heads=16, num_kv_heads=8, dtype=jnp.bfloat16,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    out = {}

    plain_new = drive(cfg, params, mixed=False)
    mixed_par = drive(cfg, params, mixed=True, boundary=512)
    out["plainnew_vs_mixed"] = first_diff(plain_new, mixed_par)

    # probe (a): plain with the OLD per-lane append
    saved = llama_adapter._append_batch_at
    llama_adapter._append_batch_at = old_append_at_layer
    plain_old = drive(cfg, params, mixed=False)
    llama_adapter._append_batch_at = saved
    out["plainold_vs_mixed"] = first_diff(plain_old, mixed_par)
    out["plainold_vs_plainnew"] = first_diff(plain_old, plain_new)
    print(json.dumps(out), flush=True)

    # probe (b): mixed with the int8 fold forced OFF inside the merge path
    saved_pda = mixed_kv.paged_decode_attention
    mixed_kv.paged_decode_attention = functools.partial(
        saved_pda, fold_kv_heads=False)
    mixed_nofold = drive(cfg, params, mixed=True, boundary=512)
    mixed_kv.paged_decode_attention = saved_pda
    out["mixednofold_vs_plainnew"] = first_diff(mixed_nofold, plain_new)
    out["mixednofold_vs_mixed"] = first_diff(mixed_nofold, mixed_par)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
