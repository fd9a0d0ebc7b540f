"""Sampling tests: greedy/temperature/top-k, engine integration, and
fused-vs-stepwise reproducibility with the same seed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantizedmha_tpu.models.llama import LlamaConfig, init_params
from quantizedmha_tpu.serving.engine import Engine, EngineConfig
from quantizedmha_tpu.serving.sampling import SamplingParams, sample


class TestSample:
    def test_greedy_is_argmax(self, rng):
        logits = jnp.asarray(rng.normal(0, 1, (4, 32)), jnp.float32)
        toks = sample(logits, None, SamplingParams())
        np.testing.assert_array_equal(np.asarray(toks),
                                      np.asarray(jnp.argmax(logits, -1)))

    def test_temperature_sampling_spread(self, rng):
        # near-uniform logits at high temperature -> many distinct tokens
        logits = jnp.zeros((256, 64), jnp.float32)
        toks = sample(logits, jax.random.PRNGKey(0),
                      SamplingParams(temperature=1.0))
        assert len(np.unique(np.asarray(toks))) > 16

    def test_top_k_restricts_support(self, rng):
        logits = jnp.asarray(rng.normal(0, 1, (512, 64)), jnp.float32)
        params = SamplingParams(temperature=1.0, top_k=2)
        toks = np.asarray(sample(logits, jax.random.PRNGKey(1), params))
        top2 = np.asarray(jax.lax.top_k(logits, 2)[1])
        for i in range(512):
            assert toks[i] in top2[i]

    def test_low_temperature_approaches_greedy(self, rng):
        logits = jnp.asarray(rng.normal(0, 3, (64, 32)), jnp.float32)
        toks = sample(logits, jax.random.PRNGKey(2),
                      SamplingParams(temperature=1e-4))
        np.testing.assert_array_equal(np.asarray(toks),
                                      np.asarray(jnp.argmax(logits, -1)))

    def test_validation(self):
        with pytest.raises(ValueError):
            SamplingParams(temperature=-1.0).validate()
        with pytest.raises(ValueError):
            SamplingParams(top_k=-1).validate()


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(num_layers=1, dtype=jnp.float32)
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


def _ecfg(**kw):
    base = dict(num_pages=32, page_size=16, max_batch=2,
                prefill_buckets=(16,), max_new_tokens=6, max_pages_per_seq=4)
    base.update(kw)
    return EngineConfig(**base)


class TestEngineSampling:
    def test_sampled_engine_runs_and_differs_by_seed(self, model):
        cfg, params = model
        outs = []
        for seed in (0, 1):
            eng = Engine(cfg, params, _ecfg(
                sampling=SamplingParams(temperature=5.0, seed=seed)))
            eng.add_request([1, 2, 3])
            outs.append(eng.run()[0])
        assert all(len(o) == 6 for o in outs)
        # tiny random model + very hot temperature: trajectories should differ
        assert outs[0] != outs[1]

    def test_greedy_default_unchanged(self, model):
        cfg, params = model
        a = Engine(cfg, params, _ecfg())
        a.add_request([1, 2, 3])
        b = Engine(cfg, params, _ecfg(sampling=SamplingParams(temperature=0.0)))
        b.add_request([1, 2, 3])
        assert a.run() == b.run()

    def test_fused_greedy_matches_stepwise(self, model):
        cfg, params = model
        a = Engine(cfg, params, _ecfg(decode_chunk=3))
        a.add_request([1, 2, 3])
        b = Engine(cfg, params, _ecfg())
        b.add_request([1, 2, 3])
        assert a.run() == b.run()

    def test_fused_sampled_reproducible_by_seed(self, model):
        cfg, params = model
        outs = []
        for _ in range(2):
            eng = Engine(cfg, params, _ecfg(
                decode_chunk=3,
                sampling=SamplingParams(temperature=2.0, seed=7)))
            eng.add_request([1, 2, 3])
            outs.append(eng.run()[0])
        assert outs[0] == outs[1]


def test_top_p_nucleus_truncation():
    """top_p keeps the smallest token set whose mass reaches p: p=0.6 over
    softmax([0,1,2,3,-1]) keeps only the 0.64-mass top token; p=0.9 adds
    the next (0.24) plus the boundary token; p=1.0 truncates nothing."""
    import jax

    from quantizedmha_tpu.serving.sampling import SamplingParams, sample

    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, -1.0]])

    def draw(p, n=200):
        params = SamplingParams(temperature=1.0, top_p=p).validate()
        return {int(sample(logits, jax.random.PRNGKey(i), params)[0])
                for i in range(n)}

    assert draw(0.6, 50) == {3}
    assert draw(0.9) == {1, 2, 3}
    assert draw(1.0, 400) == {0, 1, 2, 3, 4}


def test_top_p_validation():
    import pytest

    from quantizedmha_tpu.serving.sampling import SamplingParams

    with pytest.raises(ValueError, match="top_p"):
        SamplingParams(temperature=1.0, top_p=0.0).validate()
    with pytest.raises(ValueError, match="top_p"):
        SamplingParams(temperature=1.0, top_p=1.5).validate()


def test_top_p_composes_with_top_k():
    """top_k first, then the nucleus over survivors: k=2 keeps {2,3};
    p=0.95 over their renormalized mass (.27/.73) keeps both."""
    import jax

    from quantizedmha_tpu.serving.sampling import SamplingParams, sample

    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, -1.0]])
    params = SamplingParams(temperature=1.0, top_k=2, top_p=0.95).validate()
    got = {int(sample(logits, jax.random.PRNGKey(i), params)[0])
           for i in range(300)}
    assert got == {2, 3}


def test_rejection_sample_identical_dists_accept_all():
    """q == p pointwise => accept probability min(1, p/q) = 1 everywhere."""
    import jax
    from quantizedmha_tpu.serving.sampling import rejection_sample

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 1, (3, 4, 16)), jnp.float32)
    drafts = jnp.asarray(rng.integers(0, 16, (3, 4)), jnp.int32)
    n_acc, _ = rejection_sample(
        logits, logits, drafts, jax.random.PRNGKey(0),
        SamplingParams(temperature=1.0))
    assert np.all(np.asarray(n_acc) == 4)


def test_rejection_sample_disjoint_support_rejects_and_corrects():
    """Draft distribution on token 0, target on token 1: always reject at
    position 0 and the replacement must be the target's token."""
    import jax
    from quantizedmha_tpu.serving.sampling import rejection_sample

    B, k, V = 2, 3, 8
    ql = np.full((B, k, V), -30.0, np.float32)
    ql[:, :, 0] = 10.0
    pl = np.full((B, k, V), -30.0, np.float32)
    pl[:, :, 1] = 10.0
    drafts = jnp.zeros((B, k), jnp.int32)
    n_acc, repl = rejection_sample(
        jnp.asarray(ql), jnp.asarray(pl), drafts, jax.random.PRNGKey(1),
        SamplingParams(temperature=1.0))
    assert np.all(np.asarray(n_acc) == 0)
    assert np.all(np.asarray(repl) == 1)


def test_rejection_sample_exact_in_distribution():
    """THE correctness property (Leviathan et al. lemma): the token emitted
    at the first position — draft-if-accepted else residual replacement —
    is distributed exactly as the (warped) target distribution p. Verified
    by Monte Carlo over 40k independent single-position rounds."""
    import jax
    from quantizedmha_tpu.serving.sampling import (
        rejection_sample, sample, warp_logits,
    )

    V, N = 6, 40000
    rng = np.random.default_rng(2)
    q_logits = jnp.asarray(rng.normal(0, 1.5, (V,)), jnp.float32)
    p_logits = jnp.asarray(rng.normal(0, 1.5, (V,)), jnp.float32)
    params = SamplingParams(temperature=0.9)

    def one_round(key):
        kd, kr = jax.random.split(key)
        draft = sample(q_logits[None], kd, params)  # [1]
        n_acc, repl = rejection_sample(
            q_logits[None, None], p_logits[None, None], draft[None],
            kr, params)
        return jnp.where(n_acc[0] == 1, draft[0], repl[0])

    keys = jax.random.split(jax.random.PRNGKey(3), N)
    toks = np.asarray(jax.jit(jax.vmap(one_round))(keys))
    emp = np.bincount(toks, minlength=V) / N
    want = np.asarray(jax.nn.softmax(warp_logits(p_logits, params)))
    # MC noise: sigma ~ sqrt(p(1-p)/N) <= 0.0025; allow 4 sigma + slack.
    np.testing.assert_allclose(emp, want, atol=0.012)
