"""Tensor-parallel (TP) serving: sharded weights + KV cache over a mesh.

The BASELINE.json serving scope the reference never had: "weights + KV-cache
tensor-sharded across a multi-host slice". Megatron-style TP for the
decoder: wq/wk/wv and w_gate/w_up column-sharded over the `tp` mesh axis
(contiguous head groups), wo and w_down row-sharded, norms/embed/lm_head
replicated; the paged INT8 KV cache is sharded over its kv-head axis, so
every chip holds only its own heads' pages and the paged-decode Pallas
kernel runs entirely shard-locally. The only collectives are the two psums
per layer inside llama_adapter (after wo and after w_down) — they ride ICI
under `shard_map`.

`TPEngine` is the continuous-batching Engine with all tensor work running
under `shard_map` on the mesh; the host-side scheduler (admission, page
tables, argmax results) is unchanged and identical across hosts.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantizedmha_tpu.models.llama import LlamaConfig
from quantizedmha_tpu.serving import llama_adapter
from quantizedmha_tpu.serving.engine import Engine, EngineConfig
from quantizedmha_tpu.serving.speculative import SpecDecodeEngine
from quantizedmha_tpu.serving.kv_cache import PagedKVCacheState


def local_config(cfg: LlamaConfig, tp: int) -> LlamaConfig:
    """Per-shard config: head counts divided by the TP degree."""
    if cfg.num_heads % tp or cfg.num_kv_heads % tp:
        raise ValueError(
            f"tp={tp} must divide num_heads={cfg.num_heads} and "
            f"num_kv_heads={cfg.num_kv_heads}"
        )
    # Pin head_dim: it defaults to hidden_size // num_heads, which would be
    # wrong once num_heads shrinks to the per-shard count.
    return dataclasses.replace(
        cfg, num_heads=cfg.num_heads // tp, num_kv_heads=cfg.num_kv_heads // tp,
        head_dim=cfg.hd,
    )


def tp_param_specs(axis: str = "tp", attention_bias: bool = False,
                   sandwich_norms: bool = False) -> Dict[str, Any]:
    """PartitionSpecs mirroring models.llama.init_params' structure.

    Column-sharding wq over the flattened [hid, H*hd] output dim splits on
    contiguous head groups (the reshape to [.., H, hd] is head-major), so
    each shard's heads line up with its shard of the kv cache.
    """
    layers = dict(
        attn_norm=P(None, None),
        wq=P(None, None, axis),
        wk=P(None, None, axis),
        wv=P(None, None, axis),
        wo=P(None, axis, None),
        mlp_norm=P(None, None),
        w_gate=P(None, None, axis),
        w_up=P(None, None, axis),
        w_down=P(None, axis, None),
    )
    if attention_bias:
        # Qwen2-style q/k/v biases shard with their projection's output dim.
        layers["bq"] = P(None, axis)
        layers["bk"] = P(None, axis)
        layers["bv"] = P(None, axis)
    if sandwich_norms:
        # Gemma-2 post-norms act on the FULL hidden row (after the TP
        # psum), so they replicate like the pre-norms.
        layers["post_attn_norm"] = P(None, None)
        layers["post_mlp_norm"] = P(None, None)
    return dict(
        embed=P(None, None),
        layers=layers,
        final_norm=P(None),
        lm_head=P(None, None),
    )


def tp_cache_specs(axis: str = "tp") -> PagedKVCacheState:
    """Specs for the layer-stacked cache [L, Hkv, ...]: shard kv heads."""
    return PagedKVCacheState(
        k_pages=P(None, axis, None, None, None),
        v_pages=P(None, axis, None, None, None),
        k_scales=P(None, axis, None),
        v_scales=P(None, axis, None),
    )


def tp_mixed_cache_specs(axis: str = "tp"):
    """Specs for the layer-stacked MIXED cache: both pools shard their
    kv-head axis, like the plain paged cache (nibble packing halves the
    trailing dim, which stays unsharded)."""
    from quantizedmha_tpu.serving.mixed_kv import MixedPagedKVState

    pool = P(None, axis, None, None, None)   # [L, Hkv, n, page, hd(/2)]
    return MixedPagedKVState(
        k8=pool, v8=pool,
        k8_scales=P(None, axis, None), v8_scales=P(None, axis, None),
        k4=pool, v4=pool,
        k4_scales=P(None, axis, None, None),   # [L, Hkv, n4, subs]
        v4_scales=P(None, axis, None, None),
    )


def expand_param_specs(params: Any, specs: Any) -> Any:
    """Match a weight-spec tree to the actual params structure: where a
    param is an int8 QuantizedWeight, the single weight spec expands to
    (values: spec, scale: spec minus the input dim) — column-sharded
    weights shard their per-output-channel scales, row-sharded ones
    replicate them. An int4 QuantizedWeight4 keeps the weight spec on its
    packed payload ([.., in/2, out] has the same axis meaning) and shards
    the group scale [.., in/G, out] with BOTH weight axes. Needed because
    shard_map in_specs must mirror the argument structure exactly."""
    from quantizedmha_tpu.quant.weights import QuantizedWeight, QuantizedWeight4

    def ex(x, s):
        if isinstance(x, QuantizedWeight) and not isinstance(s, QuantizedWeight):
            return QuantizedWeight(values=s, scale=P(*s[:-2], s[-1]))
        if isinstance(x, QuantizedWeight4) and not isinstance(
                s, QuantizedWeight4):
            return QuantizedWeight4(
                packed=s, scale=P(*s[:-2], s[-2], s[-1]), group=x.group)
        return s

    return jax.tree.map(
        ex, params, specs,
        is_leaf=lambda x: isinstance(
            x, (P, QuantizedWeight, QuantizedWeight4)),
    )


def shard_tree(tree: Any, specs: Any, mesh: Mesh) -> Any:
    """Place a pytree per a (structure-matched) spec tree."""
    specs = expand_param_specs(tree, specs)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def make_tp_mesh(tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < tp:
        raise ValueError(f"need {tp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:tp]), ("tp",))


def build_tp_mixed_programs(cfg: LlamaConfig, params: Dict[str, Any],
                            ecfg: EngineConfig, mesh: Mesh, axis: str,
                            boundary_tokens: int):
    """Sharded program set for the MIXED (int8-sink/int4-bulk) cache
    mode: prefill / write_mixed / decode_mixed / prefill_chunk (table
    tuple). Host-side routing (MixedPageAllocator) is unchanged; the
    per-lane page ids and both block tables replicate, the pools shard
    on kv heads."""
    tp = mesh.shape[axis]
    lcfg = local_config(cfg, tp)
    pspecs = expand_param_specs(
        params, tp_param_specs(axis, attention_bias=cfg.attention_bias,
                               sandwich_norms=cfg.sandwich_norms))
    cspecs = tp_mixed_cache_specs(axis)
    rep1 = P(None)
    rep2 = P(None, None)
    kv_spec = P(None, axis, None, None)
    progs: Dict[str, Any] = {}

    progs["prefill"] = jax.jit(jax.shard_map(
        functools.partial(llama_adapter.prefill_at, lcfg, axis_name=axis),
        mesh=mesh,
        in_specs=(pspecs, rep2, P()),
        out_specs=(rep2, kv_spec, kv_spec),
        check_vma=False,
    ))

    def write_sm(p8_len, p4_len, page_size):
        # page-id vectors are replicated; their LENGTHS are static per
        # (bucket, boundary) combination, hence part of the key.
        del p8_len, p4_len
        return jax.shard_map(
            functools.partial(llama_adapter.write_prefill_mixed, lcfg,
                              page_size=page_size),
            mesh=mesh,
            in_specs=(cspecs, kv_spec, kv_spec, rep1, rep1),
            out_specs=cspecs,
            check_vma=False,
        )

    progs["write_mixed"] = jax.jit(
        lambda cache, k, v, p8, p4, page_size: write_sm(
            p8.shape[0], p4.shape[0], page_size)(cache, k, v, p8, p4),
        static_argnames=("page_size",),
    )

    progs["decode_mixed"] = jax.jit(jax.shard_map(
        functools.partial(llama_adapter.decode_step_mixed, lcfg,
                          boundary_tokens=boundary_tokens, axis_name=axis),
        mesh=mesh,
        # (params, cache, tokens, positions, pid8, pid4, slots, lengths,
        #  tables8, tables4)
        in_specs=(pspecs, cspecs, rep1, rep1, rep1, rep1, rep1, rep1,
                  rep2, rep2),
        out_specs=(rep2, cspecs),
        check_vma=False,
    ))

    def mixed_loop_sm(n_steps, page_size):
        return jax.shard_map(
            functools.partial(
                llama_adapter.decode_loop_mixed, lcfg, axis_name=axis,
                n_steps=n_steps, page_size=page_size,
                boundary_tokens=boundary_tokens, sampling=ecfg.sampling,
            ),
            mesh=mesh,
            # Key replicated: logits are replicated post-psum, so every
            # shard samples the same token (as in build_tp_programs).
            in_specs=(pspecs, cspecs, rep1, rep1, rep2, rep2, rep1),
            out_specs=(rep2, cspecs),
            check_vma=False,
        )

    progs["decode_loop_mixed"] = jax.jit(
        lambda params, cache, toks, lens, t8, t4, key, n_steps, page_size:
            mixed_loop_sm(n_steps, page_size)(
                params, cache, toks, lens, t8, t4, key),
        static_argnames=("n_steps", "page_size"),
    )

    def chunk_sm(page_size):
        return jax.shard_map(
            functools.partial(llama_adapter.prefill_chunk_mixed, lcfg,
                              page_size=page_size,
                              boundary_tokens=boundary_tokens,
                              axis_name=axis),
            mesh=mesh,
            in_specs=(pspecs, cspecs, rep2, P(), rep1, rep1, P()),
            out_specs=(rep2, cspecs),
            check_vma=False,
        )

    chunk_jit = jax.jit(
        lambda params, cache, toks, start, t8, t4, last, page_size:
            chunk_sm(page_size)(params, cache, toks, start, t8, t4, last),
        static_argnames=("page_size",),
    )
    # Same call shape as Engine's mixed wrapper: `table` = (t8, t4).
    progs["prefill_chunk"] = (
        lambda params, cache, toks, start, table, last, page_size:
            chunk_jit(params, cache, toks, start, table[0], table[1],
                      last, page_size=page_size))
    return pspecs, cspecs, progs


def build_tp_programs(cfg: LlamaConfig, params: Dict[str, Any],
                      ecfg: EngineConfig, mesh: Mesh, axis: str,
                      hybrid_groups=None, verify: bool = False,
                      mixed_groups=None, boundary_tokens=None):
    """Sharded program set for ONE model on `mesh`.

    Returns (pspecs, cspecs, progs) where progs holds jitted shard_maps
    keyed 'prefill' / 'write' / 'decode' / 'prefill_chunk' /
    'decode_loop' (+ 'verify' when requested), all with the same
    signatures the replicated Engine/SpecDecodeEngine programs have.
    `hybrid_groups`: the window-group keys when this model's pools are
    hybrid (dict-structured cache specs / tables / page ids), else None.
    `mixed_groups` (+ `boundary_tokens`): the subset of hybrid groups
    holding a MIXED int8/int4 pool pair (engine.hybrid_mixed — in
    practice {"full"}): their cache specs follow MixedPagedKVState and
    their tables/page ids travel as (int8, int4) tuples.
    Shared by TPEngine (target only) and TPSpecDecodeEngine (target with
    verify + draft)."""
    tp = mesh.shape[axis]
    lcfg = local_config(cfg, tp)
    pspecs = expand_param_specs(
        params, tp_param_specs(axis, attention_bias=cfg.attention_bias,
                               sandwich_norms=cfg.sandwich_norms))
    rep1 = P(None)
    rep2 = P(None, None)
    rep3 = P(None, None, None)
    hybrid = hybrid_groups is not None
    mixed_set = set(mixed_groups or ())
    if hybrid:
        # Grouped pools: every group's cache shards its kv heads the
        # same way; tables/page-id dicts replicate per group. The
        # shard_map in_specs mirror the dict pytree structure — tuples
        # for the mixed groups.
        groups = list(hybrid_groups)

        def pick(k, mixed_v, plain_v):
            return mixed_v if k in mixed_set else plain_v

        cspecs = {k: pick(k, tp_mixed_cache_specs(axis),
                          tp_cache_specs(axis)) for k in groups}
        tab1_spec = {k: pick(k, (rep1, rep1), rep1) for k in groups}
        tab2_spec = {k: pick(k, (rep2, rep2), rep2) for k in groups}
        pid_spec = {k: pick(k, (rep1, rep1), rep1) for k in groups}
        pages_spec = {k: pick(k, (P(), P()), P()) for k in groups}
    else:
        cspecs = tp_cache_specs(axis)
        tab1_spec, tab2_spec, pid_spec, pages_spec = rep1, rep2, rep1, P()

    kv_spec = P(None, axis, None, None)  # k_all/v_all [L, Hkv, n, hd]
    progs: Dict[str, Any] = {}

    prefill_sm = jax.shard_map(
        functools.partial(llama_adapter.prefill_at, lcfg, axis_name=axis),
        mesh=mesh,
        in_specs=(pspecs, rep2, P()),
        out_specs=(rep2, kv_spec, kv_spec),
        check_vma=False,
    )
    progs["prefill"] = jax.jit(prefill_sm)

    write_fn = (llama_adapter.write_prefill_hybrid if hybrid
                else llama_adapter.write_prefill)

    def _write(cache, k_all, v_all, page_ids, page_size):
        return write_fn(
            lcfg, cache, k_all, v_all, page_ids, page_size=page_size
        )

    write_sm = lambda page_size: jax.shard_map(  # noqa: E731
        functools.partial(_write, page_size=page_size),
        mesh=mesh,
        in_specs=(cspecs, kv_spec, kv_spec, pages_spec),
        out_specs=cspecs,
        check_vma=False,
    )
    progs["write"] = jax.jit(
        lambda cache, k, v, pages, page_size: write_sm(page_size)(
            cache, k, v, pages
        ),
        static_argnames=("page_size",),
    )

    decode_sm = jax.shard_map(
        functools.partial(llama_adapter.decode_step, lcfg, axis_name=axis,
                          boundary_tokens=boundary_tokens),
        mesh=mesh,
        in_specs=(pspecs, cspecs, rep1, rep1, pid_spec, rep1, rep1,
                  tab2_spec),
        out_specs=(rep2, cspecs),
        check_vma=False,
    )
    progs["decode"] = jax.jit(decode_sm)

    def chunk_sm(page_size):
        return jax.shard_map(
            functools.partial(llama_adapter.prefill_chunk, lcfg,
                              page_size=page_size, axis_name=axis,
                              boundary_tokens=boundary_tokens),
            mesh=mesh,
            in_specs=(pspecs, cspecs, rep2, P(), tab1_spec, P()),
            out_specs=(rep2, cspecs),
            check_vma=False,
        )

    progs["prefill_chunk"] = jax.jit(
        lambda params, cache, toks, start, table, last, page_size:
            chunk_sm(page_size)(params, cache, toks, start, table, last),
        static_argnames=("page_size",),
    )

    def loop_sm(n_steps, page_size, return_logits):
        return jax.shard_map(
            functools.partial(
                llama_adapter.decode_loop, lcfg, axis_name=axis,
                n_steps=n_steps, page_size=page_size,
                sampling=ecfg.sampling, return_logits=return_logits,
                boundary_tokens=boundary_tokens,
            ),
            mesh=mesh,
            # The PRNG key is replicated: every shard samples the same
            # token (logits are replicated post-psum).
            in_specs=(pspecs, cspecs, rep1, rep1, tab2_spec, rep1),
            # With return_logits (the draft's q for rejection sampling):
            # [n_steps, B, vocab], replicated post-psum like the tokens.
            out_specs=((rep2, cspecs, rep3) if return_logits
                       else (rep2, cspecs)),
            check_vma=False,
        )

    progs["decode_loop"] = jax.jit(
        lambda params, cache, toks, lens, tables, key, n_steps, page_size,
               return_logits=False:
            loop_sm(n_steps, page_size, return_logits)(
                params, cache, toks, lens, tables, key),
        static_argnames=("n_steps", "page_size", "return_logits"),
    )

    if verify:
        def verify_sm(page_size):
            return jax.shard_map(
                functools.partial(llama_adapter.verify_step, lcfg,
                                  page_size=page_size, axis_name=axis),
                mesh=mesh,
                # (params, cache, tokens [B,S], positions0 [B],
                #  page_sched [B,S], slot_sched [B,S], tables [B,max_pages])
                in_specs=(pspecs, cspecs, rep2, rep1, tab2_spec, rep2,
                          tab2_spec),
                out_specs=(rep3, cspecs),  # logits [B, S, vocab] replicated
                check_vma=False,
            )

        progs["verify"] = jax.jit(
            lambda params, cache, fed, pos0, psched, ssched, tables,
                   page_size:
                verify_sm(page_size)(
                    params, cache, fed, pos0, psched, ssched, tables),
            static_argnames=("page_size",),
        )

    return pspecs, cspecs, progs


class TPEngine(Engine):
    """Continuous-batching engine with TP-sharded params and KV cache.

    Drop-in for Engine: same host API (add_request/step/run/metrics), with
    prefill, cache writes, and decode running under shard_map on `mesh`.
    """

    def __init__(self, cfg: LlamaConfig, params: Dict[str, Any],
                 ecfg: EngineConfig, mesh: Mesh, *, axis: str = "tp"):
        super().__init__(cfg, params, ecfg)  # host structures + replicated jits
        self.mesh = mesh
        self.axis = axis

        if self.mixed:
            # Mixed int8-sink/int4-bulk pools: both shard on kv heads,
            # host-side routing (MixedPageAllocator) is unchanged.
            pspecs, cspecs, progs = build_tp_mixed_programs(
                cfg, params, ecfg, mesh, axis, self.alloc.boundary)
            self.params = shard_tree(params, pspecs, mesh)
            self.cache = shard_tree(self.cache, cspecs, mesh)
            self._prefill = progs["prefill"]
            self._write_mixed = progs["write_mixed"]
            self._decode_mixed = progs["decode_mixed"]
            self._prefill_chunk = progs["prefill_chunk"]
            self._decode_loop_mixed = progs["decode_loop_mixed"]
            return

        mixed_groups = None
        boundary = None
        if self.hybrid_mixed:
            from quantizedmha_tpu.serving.kv_cache import MixedPageAllocator

            mixed_groups = [k for k, a in self.allocs.items()
                            if isinstance(a, MixedPageAllocator)]
            boundary = self.allocs[mixed_groups[0]].boundary
        pspecs, cspecs, progs = build_tp_programs(
            cfg, params, ecfg, mesh, axis,
            hybrid_groups=self.groups if self.hybrid else None,
            mixed_groups=mixed_groups, boundary_tokens=boundary)
        self.params = shard_tree(params, pspecs, mesh)
        self.cache = shard_tree(self.cache, cspecs, mesh)
        self._prefill = progs["prefill"]
        if self.hybrid:
            self._write_hybrid = progs["write"]
        else:
            self._write = progs["write"]
        self._decode = progs["decode"]
        self._prefill_chunk = progs["prefill_chunk"]
        self._decode_loop = progs["decode_loop"]


class TPSpecDecodeEngine(SpecDecodeEngine):
    """Speculative decoding with BOTH models TP-sharded on one mesh.

    The draft loop, target verification, prefills and cache writes all
    run under shard_map: Megatron-sharded weights, kv-head-sharded paged
    caches for target AND draft (tp must divide both models' head
    counts), logits replicated post-psum so the host acceptance logic and
    device rejection sampling are unchanged. Token streams match the
    single-device SpecDecodeEngine exactly."""

    def __init__(self, cfg: LlamaConfig, params: Dict[str, Any],
                 draft_cfg: LlamaConfig, draft_params: Dict[str, Any],
                 ecfg: EngineConfig, mesh: Mesh, scfg=None, *,
                 axis: str = "tp"):
        super().__init__(cfg, params, draft_cfg, draft_params, ecfg, scfg)
        self.mesh = mesh
        self.axis = axis

        pspecs, cspecs, progs = build_tp_programs(
            cfg, params, ecfg, mesh, axis,
            hybrid_groups=self.groups if self.hybrid else None,
            verify=True)
        self.params = shard_tree(params, pspecs, mesh)
        self.cache = shard_tree(self.cache, cspecs, mesh)
        self._prefill = progs["prefill"]
        if self.hybrid:
            self._write_hybrid = progs["write"]
        else:
            self._write = progs["write"]
        self._decode = progs["decode"]
        self._prefill_chunk = progs["prefill_chunk"]
        self._decode_loop = progs["decode_loop"]
        self._verify = progs["verify"]

        dgroups = sorted(self.draft_allocs) if self.draft_hybrid else None
        dpspecs, dcspecs, dprogs = build_tp_programs(
            draft_cfg, draft_params, ecfg, mesh, axis,
            hybrid_groups=dgroups)
        self.draft_params = shard_tree(draft_params, dpspecs, mesh)
        self.draft_cache = shard_tree(self.draft_cache, dcspecs, mesh)
        self._draft_prefill = dprogs["prefill"]
        self._draft_prefill_chunk = dprogs["prefill_chunk"]
        if self.draft_hybrid:
            self._draft_write_hybrid = dprogs["write"]
        else:
            self._draft_write = dprogs["write"]
        self._draft_loop = dprogs["decode_loop"]
