"""Pipeline parallelism (GPipe-style) over a "pp" mesh axis.

SURVEY.md §2.3 lists PP as the one parallelism family the reference lacks
entirely and marks it optional scope; this is the minimal real version:
decoder layers are sharded across pipeline stages (layer-stacked params
sharded on their leading axis), and microbatched activations flow stage to
stage via `ppermute` inside one `shard_map` — the standard
(n_micro + n_stages - 1)-tick schedule with bubbles at fill/drain.

Design notes (TPU-first):
  - one jitted program, no host round-trips between ticks; XLA overlaps the
    ppermute rotation with the next tick's compute where possible;
  - every stage executes the same code each tick (SPMD) — invalid ticks
    compute on stale buffers and their results are masked out, the usual
    trade of bubble FLOPs for uniform control flow;
  - outputs are gathered with a psum of stage-masked contributions, so the
    result is replicated (convenient for the loss).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantizedmha_tpu.models.llama import (
    LlamaConfig,
    decoder_layer,
    embed_tokens,
    final_logits,
    rms_norm,
    scan_layers,
)


def shard_layers(layers: Dict[str, Any], mesh: Mesh, axis: str = "pp"):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), layers
    )


def pipeline_apply(
    stage_fn,
    layers: Dict[str, Any],
    x_micro: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "pp",
):
    """Run `stage_fn(local_layers, x)` as a pipeline over microbatches.

    stage_fn: (layer-stacked local params, activation [mb, ...]) -> same
    shape activation. layers: leaves [L, ...] (L divisible by the axis
    size); x_micro: [n_micro, mb, ...] microbatched activations.
    Returns [n_micro, mb, ...], replicated.
    """
    n_micro = x_micro.shape[0]

    def pp_fn(layers_local, xs):
        stage = jax.lax.axis_index(axis)
        n_stages = jax.lax.axis_size(axis)
        n_ticks = n_micro + n_stages - 1
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(t, carry):
            buf, outs = carry
            # Stage 0 injects microbatch t (clamped load; masked when done).
            inject = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, n_micro - 1), axis=0, keepdims=False
            )
            take = jnp.logical_and(stage == 0, t < n_micro)
            buf = jnp.where(take, inject, buf)
            buf = stage_fn(layers_local, buf)
            # Last stage emits microbatch t - (n_stages - 1).
            out_idx = t - (n_stages - 1)
            emit = jnp.logical_and(stage == n_stages - 1, out_idx >= 0)
            contrib = jnp.where(emit, buf, jnp.zeros_like(buf))
            outs = jax.lax.dynamic_update_index_in_dim(
                outs,
                jax.lax.dynamic_index_in_dim(
                    outs, jnp.clip(out_idx, 0, n_micro - 1), 0, keepdims=False
                ) + contrib,
                jnp.clip(out_idx, 0, n_micro - 1),
                0,
            )
            # Rotate activations to the next stage.
            buf = jax.lax.ppermute(buf, axis, perm)
            return buf, outs

        buf0 = jnp.zeros_like(xs[0])
        outs0 = jnp.zeros_like(xs)
        _, outs = jax.lax.fori_loop(0, n_ticks, tick, (buf0, outs0))
        # Only the last stage holds real outputs; psum replicates them.
        return jax.lax.psum(outs, axis)

    return jax.shard_map(
        pp_fn,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), layers), P()),
        out_specs=P(),
        check_vma=False,
    )(layers, x_micro)


def pipeline_llama_forward(
    cfg: LlamaConfig,
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    mesh: Mesh,
    *,
    n_microbatches: int,
    axis: str = "pp",
) -> jnp.ndarray:
    """Llama forward with decoder layers pipeline-sharded over `axis`.

    tokens: [batch, seq], batch divisible by n_microbatches. Embedding and
    the final norm/lm_head are replicated (tiny next to the layers).
    """
    b, s = tokens.shape
    if b % n_microbatches:
        raise ValueError(f"batch {b} not divisible by {n_microbatches} microbatches")
    n_stages = mesh.shape[axis]
    if cfg.num_layers % n_stages:
        raise ValueError(f"{cfg.num_layers} layers not divisible by {n_stages} stages")

    # Per-layer window patterns: every stage runs the SAME traced program
    # (SPMD), so each stage's local window sequence must be identical —
    # true iff the pattern repeats with the stage size (covers uniform
    # Llama/Mistral and Gemma-2's p=2 alternation when L/stages is even;
    # Qwen2's contiguous split would give stages DIFFERENT programs, so
    # refuse loudly rather than silently running the wrong masks).
    windows = cfg.layer_windows
    L_local = cfg.num_layers // n_stages
    local_windows = windows[:L_local]
    if windows != local_windows * n_stages:
        raise ValueError(
            f"window_pattern {windows} is not identical across {n_stages} "
            f"pipeline stages of {L_local} layers — PP needs a stage-"
            "uniform pattern (use TP/ring for this family, or pick a "
            "stage count whose per-stage slice repeats)")

    x = embed_tokens(cfg, params, tokens)
    x_micro = x.reshape(n_microbatches, b // n_microbatches, s, -1)

    def stage_fn(layers_local, xb):
        def body(xb, p, window):
            return decoder_layer(cfg, p, xb, window=window), None

        out, _ = scan_layers(local_windows, body, xb, layers_local)
        return out

    out = pipeline_apply(stage_fn, params["layers"], x_micro, mesh, axis=axis)
    x = out.reshape(b, s, -1)
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, cfg.rms_plus_one)
    return final_logits(cfg, x, params["lm_head"])
