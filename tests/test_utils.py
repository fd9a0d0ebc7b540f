"""Tests for checkpoint/resume and metrics."""

import numpy as np
import pytest

from quantizedmha_tpu.utils.checkpoint import CheckpointManager
from quantizedmha_tpu.utils.metrics import Metrics


def _tree(rng, scale=1.0):
    return {
        "layer": {"w": rng.normal(0, scale, (4, 8)).astype(np.float32),
                  "b": rng.normal(0, scale, (8,)).astype(np.float32)},
        "step_count": np.int32(7),
    }


class TestCheckpoint:
    @pytest.mark.parametrize("backend", ["npz", "orbax"])
    def test_save_restore_roundtrip(self, tmp_path, rng, backend):
        if backend == "orbax":
            pytest.importorskip("orbax.checkpoint")
        mgr = CheckpointManager(tmp_path / backend, backend=backend)
        tree = _tree(rng)
        mgr.save(10, tree)
        like = _tree(np.random.default_rng(1))  # same structure, other values
        out = mgr.restore(like)
        np.testing.assert_array_equal(np.asarray(out["layer"]["w"]), tree["layer"]["w"])
        np.testing.assert_array_equal(np.asarray(out["step_count"]), 7)

    def test_latest_and_explicit_step(self, tmp_path, rng):
        mgr = CheckpointManager(tmp_path, backend="npz", keep=10)
        t1, t2 = _tree(rng, 1.0), _tree(rng, 2.0)
        mgr.save(1, t1)
        mgr.save(2, t2)
        assert mgr.latest_step() == 2
        like = _tree(np.random.default_rng(1))
        np.testing.assert_array_equal(
            np.asarray(mgr.restore(like)["layer"]["w"]), t2["layer"]["w"])
        np.testing.assert_array_equal(
            np.asarray(mgr.restore(like, step=1)["layer"]["w"]), t1["layer"]["w"])

    def test_retention_gc(self, tmp_path, rng):
        mgr = CheckpointManager(tmp_path, backend="npz", keep=2)
        for s in (1, 2, 3, 4):
            mgr.save(s, _tree(rng))
        assert mgr.steps() == [3, 4]

    def test_incomplete_checkpoint_ignored(self, tmp_path, rng):
        mgr = CheckpointManager(tmp_path, backend="npz")
        mgr.save(1, _tree(rng))
        # Simulate a crash mid-save at step 2.
        broken = tmp_path / "step_2"
        broken.mkdir()
        (broken / ".incomplete").touch()
        assert mgr.latest_step() == 1

    def test_structure_mismatch_raises(self, tmp_path, rng):
        mgr = CheckpointManager(tmp_path, backend="npz")
        mgr.save(1, _tree(rng))
        with pytest.raises(ValueError, match="leaves"):
            mgr.restore({"only": np.zeros(2)})

    def test_restore_sharded_places_on_devices(self, tmp_path, rng):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mgr = CheckpointManager(tmp_path, backend="npz")
        tree = {"w": rng.normal(0, 1, (8, 8)).astype(np.float32)}
        mgr.save(1, tree)
        mesh = Mesh(np.array(jax.devices()[:2]), ("x",))
        shardings = {"w": NamedSharding(mesh, P("x", None))}
        out = mgr.restore_sharded(tree, shardings)
        assert out["w"].sharding == shardings["w"]
        np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])


class TestMetrics:
    def test_counters_gauges(self):
        m = Metrics()
        m.inc("a")
        m.inc("a", 2)
        m.set("g", 5.0)
        assert m.counter("a") == 3
        snap = m.snapshot()
        assert snap["counters"]["a"] == 3 and snap["gauges"]["g"] == 5.0

    def test_timed_histogram(self):
        m = Metrics()
        with m.timed("op"):
            pass
        m.observe("op", 0.010)
        h = m.snapshot()["timings"]["op"]
        assert h["count"] == 2
        assert h["max_s"] >= 0.010
        assert h["p99_s"] >= 0.010

    def test_render_and_dump(self, tmp_path):
        m = Metrics()
        m.inc("tokens", 10)
        m.observe("step", 0.001)
        text = m.render()
        assert "tokens=10" in text and "step[" in text
        m.dump_json(tmp_path / "m.json")
        assert (tmp_path / "m.json").exists()


class TestEngineMetrics:
    def test_engine_counts_work(self):
        from quantizedmha_tpu.models.llama import LlamaConfig, init_params
        from quantizedmha_tpu.serving.engine import Engine, EngineConfig

        import jax

        cfg = LlamaConfig.tiny(num_layers=1)
        params = init_params(cfg, jax.random.PRNGKey(0))
        eng = Engine(cfg, params, EngineConfig(
            num_pages=32, page_size=16, max_batch=2,
            prefill_buckets=(16, 32), max_new_tokens=4))
        eng.add_request([1, 2, 3])
        eng.run()
        snap = eng.metrics.snapshot()
        assert snap["counters"]["requests_admitted"] == 1
        assert snap["counters"]["requests_finished"] == 1
        assert snap["counters"]["tokens_generated"] >= 3
        assert snap["timings"]["decode_step"]["count"] >= 3
        assert snap["timings"]["prefill"]["count"] == 1


def test_checkpoint_rejects_mismatched_template(tmp_path):
    """Restoring into a template with the same leaf COUNT but different
    structure must fail loudly, not silently mis-bind arrays to keys."""
    import jax.numpy as jnp
    import pytest

    from quantizedmha_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path, backend="npz")
    tree = {"a": jnp.ones(3), "b": jnp.zeros(2)}
    mgr.save(1, tree)
    wrong = {"a": jnp.ones(3), "c": jnp.zeros(2)}  # same count, renamed key
    with pytest.raises(ValueError, match="does not match template"):
        mgr.restore(wrong)
    out = mgr.restore({"a": jnp.zeros(3), "b": jnp.ones(2)})
    assert float(out["a"].sum()) == 3.0
