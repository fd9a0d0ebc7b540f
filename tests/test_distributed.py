"""Multi-host scaffolding: hybrid DCN x ICI meshes and the axis-classified
collective audit (quantizedmha_tpu/parallel/distributed.py).

The reference has no communication backend at all (single process, single
GPU, two CUDA streams — reference include/config.h:19, launchers.h:41-64;
SURVEY.md section 2.3 plans "XLA collectives over ICI/DCN ...
jax.distributed for multi-host init" as the TPU replacement). These tests
run on the virtual 8-device CPU mesh; the collective structure XLA inserts
there is the structure it inserts on a pod.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from quantizedmha_tpu.parallel.distributed import (
    audit_fn_by_axis,
    classify_collectives,
    hybrid_mesh,
    initialize_multihost,
)


def test_initialize_single_process_is_noop_and_idempotent():
    assert initialize_multihost() == 1
    assert initialize_multihost() == 1


def test_hybrid_mesh_axes_and_shape():
    mesh = hybrid_mesh((2,), (4,), ("dp",), ("tp",))
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.shape == (2, 4)


def test_hybrid_mesh_too_many_devices():
    with pytest.raises(ValueError, match="devices"):
        hybrid_mesh((4,), (4,), ("dp",), ("tp",))


def test_classify_synthetic_hlo():
    hlo = """
      a = f32[8]{0} all-reduce(x), replica_groups={{0,1},{2,3}}
      b = f32[8]{0} all-reduce(y), replica_groups={{0,2},{1,3}}
      c = f32[8]{0} collective-permute(z), source_target_pairs={{0,1},{1,0}}
      d = f32[8]{0} all-gather(w), replica_groups={}
    """
    cls = classify_collectives(hlo, granule_size=2)
    # groups {0,1},{2,3} stay within granules of 2 -> ICI
    assert cls["ici"] == {"all-reduce": 1, "collective-permute": 1}
    # {0,2} crosses granules; empty groups (= all devices) default to DCN
    assert cls["dcn"] == {"all-reduce": 1, "all-gather": 1}


def test_classify_iota_groups():
    """GSPMD emits the v2 iota syntax on larger modules: [g,s]<=[shape]T(p).
    [2,4]<=[8] = consecutive groups {0..3},{4..7} (ICI at granule 4);
    [4,2]<=[2,4]T(1,0) = strided groups {0,4},{1,5}... (DCN)."""
    hlo = """
      a = f32[8] all-gather(x), replica_groups=[2,4]<=[8], dimensions={1}
      b = f32[8] all-gather(y), replica_groups=[4,2]<=[2,4]T(1,0), dimensions={0}
    """
    cls = classify_collectives(hlo, granule_size=4)
    assert cls["ici"] == {"all-gather": 1}
    assert cls["dcn"] == {"all-gather": 1}


def test_axis_classification_on_mesh():
    """psum over the ICI axis lands in the ici class, psum over the DCN
    axis in the dcn class — the audit that pins 'TP stays on ICI'."""
    mesh = hybrid_mesh((2,), (4,), ("dp",), ("tp",))
    x = jax.device_put(
        jnp.arange(8.0).reshape(2, 4), NamedSharding(mesh, P("dp", "tp"))
    )

    def f(x):
        return jax.lax.psum(x, "tp"), jax.lax.psum(x, "dp")

    fn = jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=P("dp", "tp"),
            out_specs=(P("dp", None), P(None, "tp")),
        )
    )
    a, b = fn(x)  # executes on the virtual mesh
    np.testing.assert_allclose(np.asarray(a)[0, 0], 0 + 1 + 2 + 3)
    np.testing.assert_allclose(np.asarray(b)[0, 0], 0 + 4)

    cls = audit_fn_by_axis(fn, x, granule_size=4)
    assert sum(cls["ici"].values()) >= 1, cls
    assert sum(cls["dcn"].values()) >= 1, cls


def test_hybrid_mesh_train_step_collectives():
    """The dryrun's hybrid case in miniature: DPxTP train step over the
    hybrid mesh keeps TP reductions on ICI and pays DCN only for the DP
    gradient reduction."""
    from quantizedmha_tpu.models.llama import (
        LlamaConfig, init_params, param_shardings, sgd_train_step,
    )

    mesh = hybrid_mesh((2,), (4,), ("dp",), ("tp",))
    cfg = LlamaConfig.tiny(num_heads=8, num_kv_heads=4, num_layers=1)
    params = init_params(cfg, jax.random.PRNGKey(0))
    with mesh:
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, param_shardings(cfg),
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )
        tokens = jax.device_put(
            jnp.asarray(np.random.default_rng(0).integers(
                0, cfg.vocab_size, (4, 64)), jnp.int32),
            NamedSharding(mesh, P("dp", None)),
        )
        step = jax.jit(lambda p, t: sgd_train_step(cfg, p, t))
        _, loss = step(params, tokens)
        assert jnp.isfinite(loss)
        cls = audit_fn_by_axis(step, params, tokens, granule_size=4)
        assert cls["ici"], cls
        assert cls["dcn"], cls
