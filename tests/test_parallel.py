"""Multi-device sharding tests on the virtual 8-device CPU mesh:
head parallelism, context parallelism (merge), and ring attention must all
reproduce the single-chip golden.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from quantizedmha_tpu.harness.verify import assert_close
from quantizedmha_tpu.parallel import (
    context_parallel_attention,
    head_parallel_attention,
    make_mesh,
    merge_partial_attention,
    ring_attention,
)
from quantizedmha_tpu.parallel.combine import merge_two_partials
from quantizedmha_tpu.reference.mha import mha_reference_shaped


def _qkv(rng, b=1, h=4, s=256, d=32):
    return tuple(
        jnp.asarray(rng.normal(0, 0.5, (b, h, s, d)).astype(np.float32))
        for _ in range(3)
    )


def test_merge_two_partials_equals_full(rng):
    """Splitting KV in two and merging partials == full attention."""
    from quantizedmha_tpu.ops.flash_attention import flash_attention

    q, k, v = _qkv(rng, s=256)
    half = 128
    o1, lse1 = flash_attention(q, k[:, :, :half], v[:, :, :half], save_residuals=True)
    o2, lse2 = flash_attention(q, k[:, :, half:], v[:, :, half:], save_residuals=True)
    o, _ = merge_two_partials(o1, lse1, o2, lse2)
    ref = mha_reference_shaped(q, k, v)
    assert_close(o, ref, what="two-partial merge")


def test_merge_handles_fully_masked_partial(rng):
    from quantizedmha_tpu.ops.flash_attention import flash_attention

    q, k, v = _qkv(rng, s=128)
    o1, lse1 = flash_attention(q, k, v, save_residuals=True)
    o_masked = jnp.zeros_like(o1)
    lse_masked = jnp.full_like(lse1, -jnp.inf)
    o, lse = merge_two_partials(o1, lse1, o_masked, lse_masked)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse1), atol=1e-6)


def test_head_parallel_matches_golden(rng):
    mesh = make_mesh((2, 4), ("dp", "tp"))
    q, k, v = _qkv(rng, b=2, h=8, s=128, d=32)
    out = head_parallel_attention(q, k, v, mesh, causal=True)
    ref = mha_reference_shaped(q, k, v, causal=True)
    assert_close(out, ref, what="head-parallel")


@pytest.mark.parametrize("causal", [False, True])
def test_context_parallel_matches_golden(rng, causal):
    mesh = make_mesh((4,), ("cp",))
    q, k, v = _qkv(rng, b=1, h=2, s=256, d=32)

    fn = functools.partial(context_parallel_attention, axis_name="cp", causal=causal)
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(None, None, None, None), P(None, None, "cp", None), P(None, None, "cp", None)),
        out_specs=P(None, None, None, None),
        check_vma=False,
    )
    out = sharded(q, k, v)
    ref = mha_reference_shaped(q, k, v, causal=causal)
    assert_close(out, ref, what=f"context-parallel causal={causal}")


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_golden(rng, causal):
    mesh = make_mesh((4,), ("cp",))
    q, k, v = _qkv(rng, b=1, h=2, s=256, d=32)

    fn = functools.partial(ring_attention, axis_name="cp", causal=causal)
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(None, None, "cp", None),
            P(None, None, "cp", None),
            P(None, None, "cp", None),
        ),
        out_specs=P(None, None, "cp", None),
        check_vma=False,
    )
    out = sharded(q, k, v)
    ref = mha_reference_shaped(q, k, v, causal=causal)
    assert_close(out, ref, abs_tol=2e-3, rel_tol=2e-3, what=f"ring causal={causal}")


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_int8_matches_golden(rng, causal):
    from quantizedmha_tpu.parallel.ring import ring_attention_int8

    mesh = make_mesh((4,), ("cp",))
    q, k, v = _qkv(rng, b=1, h=2, s=256, d=32)

    fn = functools.partial(ring_attention_int8, axis_name="cp", causal=causal,
                           block_kv=32)
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(None, None, "cp", None),
            P(None, None, "cp", None),
            P(None, None, "cp", None),
        ),
        out_specs=P(None, None, "cp", None),
        check_vma=False,
    )
    out = sharded(q, k, v)
    ref = mha_reference_shaped(q, k, v, causal=causal)
    # int8 error budget (same gate as the single-chip int8 kernel tests)
    from quantizedmha_tpu.harness.verify import compare

    report = compare(np.asarray(out), np.asarray(ref), abs_tol=4e-2, rel_tol=4e-2)
    assert report.ok, f"int8 ring causal={causal}: {report}"


def test_int8_prequant_save_residuals_lse_matches_fp(rng):
    """The int8 kernel's lse residual must agree with the fp kernel's (it
    feeds the same cross-shard merges)."""
    from quantizedmha_tpu.ops.flash_attention import flash_attention
    from quantizedmha_tpu.ops.flash_attention_int8 import (
        flash_attention_int8_prequant,
    )
    from quantizedmha_tpu.ops.quantize import quantize_kv_blocks

    q, k, v = _qkv(rng, b=1, h=2, s=256, d=32)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    k_i8, ks = quantize_kv_blocks(k, 64)
    v_i8, vs = quantize_kv_blocks(v, 64)
    o8, lse8 = flash_attention_int8_prequant(
        q, k_i8, ks, v_i8, vs, block_kv=64, save_residuals=True)
    of, lsef = flash_attention(q, k, v, save_residuals=True)
    assert np.abs(np.asarray(lse8) - np.asarray(lsef)).max() < 2e-2
    assert np.abs(np.asarray(o8) - np.asarray(of)).max() < 4e-2


@pytest.mark.parametrize("causal", [False, True])
def test_context_parallel_suffix_q(rng, causal):
    """q as a SUFFIX of the sharded sequence (a prefill chunk under CP):
    q rows must be end-aligned against the global kv positions, not
    anchored at 0 (which would causally mask kv the chunk can see)."""
    mesh = make_mesh((4,), ("cp",))
    q_full, k, v = _qkv(rng, b=1, h=2, s=256, d=32)
    q = q_full[:, :, -64:]  # the last 64 rows of the sequence

    fn = functools.partial(context_parallel_attention, axis_name="cp",
                           causal=causal)
    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(None, None, None, None), P(None, None, "cp", None),
                  P(None, None, "cp", None)),
        out_specs=P(None, None, None, None),
        check_vma=False,
    )
    out = sharded(q, k, v)
    ref = mha_reference_shaped(q_full, k, v, causal=causal)[:, :, -64:]
    assert_close(out, ref, what=f"CP suffix q causal={causal}")


def test_head_parallel_gqa(rng):
    """GQA under head parallelism: q and (fewer) kv heads shard over the
    same axis, co-locating each query group with its kv head — no repeat."""
    mesh = make_mesh((2, 2), ("dp", "tp"))
    q, _, _ = _qkv(rng, b=2, h=8, s=128, d=32)
    _, k, v = _qkv(rng, b=2, h=4, s=128, d=32)
    out = head_parallel_attention(q, k, v, mesh, causal=True)
    rep = jnp.repeat(k, 2, axis=1), jnp.repeat(v, 2, axis=1)
    ref = mha_reference_shaped(q, *rep, causal=True)
    assert_close(out, ref, what="head-parallel GQA")


def test_collective_audit_ring_int8_vs_f32(rng):
    """Compile-time audit of the ICI story: ring attention issues exactly
    2 collective-permutes per scan step (K and V), the INT8 variant 4
    (payloads + scales) at ~4x fewer bytes; context-parallel merges with 2
    all-reduces. Verified from the optimized HLO on the CPU mesh — the same
    collectives XLA inserts on a real TPU mesh."""
    import functools

    from quantizedmha_tpu.parallel.ring import ring_attention_int8
    from quantizedmha_tpu.profiling.collectives import audit_fn

    mesh = make_mesh((4,), ("cp",))
    q, k, v = _qkv(rng, b=1, h=2, s=512, d=64)
    specs = (P(None, None, "cp", None),) * 3
    out_spec = P(None, None, "cp", None)

    ring_f = jax.jit(jax.shard_map(
        functools.partial(ring_attention, axis_name="cp", causal=True),
        mesh=mesh, in_specs=specs, out_specs=out_spec, check_vma=False))
    ring_8 = jax.jit(jax.shard_map(
        functools.partial(ring_attention_int8, axis_name="cp", causal=True),
        mesh=mesh, in_specs=specs, out_specs=out_spec, check_vma=False))

    rep_f = audit_fn(ring_f, q, k, v)
    rep_8 = audit_fn(ring_8, q, k, v)
    assert rep_f.counts == {"collective-permute": 2}
    assert rep_8.counts == {"collective-permute": 4}  # k, v, + 2 scale arrays
    # int8 payloads: ~4x less ICI than f32 (scales are negligible).
    assert rep_8.total_bytes < rep_f.total_bytes / 3.5

    cp_fn = jax.jit(jax.shard_map(
        functools.partial(context_parallel_attention, axis_name="cp",
                          causal=True),
        mesh=mesh,
        in_specs=(P(None, None, None, None), P(None, None, "cp", None),
                  P(None, None, "cp", None)),
        out_specs=P(None, None, None, None), check_vma=False))
    rep_cp = audit_fn(cp_fn, q, k, v)
    assert sum(rep_cp.counts.values()) <= 3  # pmax + psum(s), nothing else


@pytest.mark.parametrize("fn_name", ["ring", "ring_int8", "cp"])
def test_windowed_masking_across_shards(rng, fn_name):
    """Window + sinks + soft-cap applied to GLOBAL positions must survive
    sequence sharding: ring (f32 and int8 payloads) and context-parallel
    results equal the single-chip masked golden."""
    import functools

    from quantizedmha_tpu.parallel.ring import ring_attention_int8
    from quantizedmha_tpu.reference.mha import mha_masked_reference

    mesh = make_mesh((4,), ("cp",))
    q, k, v = _qkv(rng, b=1, h=2, s=256, d=32)
    kw = dict(axis_name="cp", causal=True, window=48, attention_sinks=8,
              logit_softcap=30.0)
    if fn_name == "cp":
        fn = functools.partial(context_parallel_attention, **kw)
        in_specs = (P(None, None, None, None), P(None, None, "cp", None),
                    P(None, None, "cp", None))
        out_specs = P(None, None, None, None)
    else:
        impl = ring_attention if fn_name == "ring" else ring_attention_int8
        fn = functools.partial(impl, **kw)
        in_specs = (P(None, None, "cp", None),) * 3
        out_specs = P(None, None, "cp", None)
    sharded = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs, check_vma=False)
    out = sharded(q, k, v)
    ref = mha_masked_reference(q, k, v, causal=True, window=48, sinks=8,
                               softcap=30.0)
    tol = 5e-2 if fn_name == "ring_int8" else 2e-3
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < tol


def test_ring_attention_int8_grad(rng):
    """round-5 VERDICT #9: the int8 ring is trainable — straight-through
    custom VJP reusing the float ring's backward at the DEQUANTIZED
    payloads. Gate: grads close to the float ring's grads (int8 fwd error
    budget applies to the cotangents too)."""
    from quantizedmha_tpu.parallel.ring import ring_attention, ring_attention_int8

    mesh = make_mesh((4,), ("cp",))
    q, k, v = _qkv(rng, b=1, h=2, s=256, d=32)
    specs = (P(None, None, "cp", None),) * 3

    def loss_of(impl, **kw):
        fn = functools.partial(impl, axis_name="cp", causal=True, **kw)
        sharded = jax.shard_map(fn, mesh=mesh, in_specs=specs,
                                out_specs=P(None, None, "cp", None),
                                check_vma=False)
        return lambda q, k, v: (sharded(q, k, v).astype(jnp.float32) ** 2).sum()

    g_int8 = jax.grad(loss_of(ring_attention_int8, block_kv=32),
                      argnums=(0, 1, 2))(q, k, v)
    g_fp = jax.grad(loss_of(ring_attention), argnums=(0, 1, 2))(q, k, v)
    for gi, gf, name in zip(g_int8, g_fp, "qkv"):
        from quantizedmha_tpu.harness.verify import compare
        report = compare(np.asarray(gi), np.asarray(gf),
                         abs_tol=6e-2, rel_tol=6e-2)
        assert report.ok, f"int8 ring grad d{name}: {report}"
