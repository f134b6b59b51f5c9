"""Variable-MDP (layout pool) PPO training tests (reference from-params
PPO, ppo_rllib_from_params_client.py:78-179 + CI thresholds
ppo_rllib_test.py:234-292).

Every iteration each env lane samples a fresh layout from a pool of
procedurally-generated same-shape layouts -- the vectorized equivalent of
per-reset MDP regeneration (num_mdp=inf). Threshold tests (sparse >=7
no-phi / >=5 phi, reference CI) are opt-in via OVERCOOKED_SLOW_TESTS=1.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from overcooked_ai_tpu.core.layout_generator import LayoutGenerator
from overcooked_ai_tpu.core.potential import make_potential_fn_pool
from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo, train

SLOW = os.environ.get("OVERCOOKED_SLOW_TESTS") == "1"


def _pool(n, seed=0, shape=(5, 4)):
    gen = LayoutGenerator(
        outer_shape=shape, rng=np.random.RandomState(seed)
    )
    return [gen.generate_spec(name=f"gen_{i}") for i in range(n)]


def test_pool_rollout_uses_different_layouts():
    """Each lane steps its own MDP: terrains must differ across the batch
    and per-lane rewards must be finite."""
    specs = _pool(4)
    terrains = {tuple(np.asarray(s.layout.terrain).ravel()) for s in specs}
    assert len(terrains) > 1, "generator produced identical layouts"
    cfg = PPOConfig(
        num_envs=8, horizon=20, sgd_minibatch_size=80, num_sgd_iter=1,
        lr=1e-4,
    )
    init_fn, train_it = make_ppo(specs, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    ts, m = train_it(ts)
    assert np.isfinite(float(m.kl))
    assert np.isfinite(float(m.episode_shaped_reward))


def test_pool_regeneration_single_compile():
    """num_mdp=inf mode: train_iteration accepts a FRESH same-shape
    layout pool as an argument (host regenerates between iterations,
    train_ppo_from_params --regen-every); fresh pools must reuse the one
    compiled program (no per-pool recompile) and actually train on the
    passed pool's layouts."""
    from overcooked_ai_tpu.core.layout_generator import stack_layouts

    specs = _pool(4)
    cfg = PPOConfig(
        num_envs=8, horizon=20, sgd_minibatch_size=80, num_sgd_iter=1,
        lr=1e-4,
    )
    init_fn, train_it = make_ppo(specs, cfg)
    ts = init_fn(jax.random.PRNGKey(0))

    def fresh(seed):
        return jax.tree.map(
            jnp.asarray, stack_layouts(_pool(4, seed=seed))
        )

    for seed in (1, 2, 3):
        ts, m = train_it(ts, fresh(seed))
        assert np.isfinite(float(m.kl))
    assert train_it._cache_size() == 1, (
        "fresh same-shape pools must not retrace train_iteration"
    )
    # a passed pool with different leaf SHAPES must fail loudly (the
    # program was built for the original pool's grid/batch shapes)
    with pytest.raises(Exception):
        bad = jax.tree.map(
            jnp.asarray, stack_layouts(_pool(4, seed=9, shape=(7, 5)))
        )
        train_it(ts, bad)


def test_pool_ppo_learns():
    """Shaped reward increases when training across a generated pool."""
    specs = _pool(3, seed=1)
    cfg = PPOConfig(
        num_envs=6, horizon=80, sgd_minibatch_size=240, num_sgd_iter=4,
        entropy_coeff_start=0.0, entropy_coeff_end=0.0, lr=5e-3,
    )
    ts, hist = train(specs, cfg, num_iterations=8, seed=0)
    first3 = np.mean([float(m.episode_shaped_reward) for m in hist[:3]])
    last3 = np.mean([float(m.episode_shaped_reward) for m in hist[-3:]])
    assert last3 > first3, (first3, last3)


def test_pool_phi_runs():
    """phi-shaped dense reward over a pool: per-lane potential tables."""
    specs = _pool(3, seed=2)
    phi = make_potential_fn_pool(specs)
    cfg = PPOConfig(
        num_envs=4, horizon=20, sgd_minibatch_size=40, num_sgd_iter=1,
        lr=1e-4, use_phi=True,
    )
    init_fn, train_it = make_ppo(specs, cfg, potential_fn=phi)
    ts = init_fn(jax.random.PRNGKey(0))
    ts, m = train_it(ts)
    assert np.isfinite(float(m.episode_sparse_reward))
    assert np.isfinite(float(m.kl))


@pytest.mark.skipif(not SLOW, reason="set OVERCOOKED_SLOW_TESTS=1")
def test_pool_threshold_no_phi():
    """Reference CI: from-params no-phi sparse reward >= 7 after 30 iters
    (ppo_rllib_test.py:234-256)."""
    specs = _pool(16, seed=0)
    cfg = PPOConfig(
        num_envs=8, horizon=400, sgd_minibatch_size=800, num_sgd_iter=8,
        entropy_coeff_start=0.1, entropy_coeff_end=0.01,
        entropy_coeff_horizon=1e5, lr=1e-3,
    )
    ts, hist = train(specs, cfg, num_iterations=30, seed=0)
    last5 = np.mean([float(m.episode_total_reward) for m in hist[-5:]])
    assert last5 >= 7, last5


@pytest.mark.skipif(not SLOW, reason="set OVERCOOKED_SLOW_TESTS=1")
def test_pool_threshold_phi():
    """Reference CI: from-params phi sparse reward >= 5 after 30 iters
    (ppo_rllib_test.py:267-292)."""
    specs = _pool(16, seed=0)
    phi = make_potential_fn_pool(specs)
    cfg = PPOConfig(
        num_envs=8, horizon=400, sgd_minibatch_size=800, num_sgd_iter=8,
        entropy_coeff_start=0.1, entropy_coeff_end=0.01,
        entropy_coeff_horizon=1e5, lr=1e-3, use_phi=True,
    )
    ts, hist = train(specs, cfg, num_iterations=30, seed=0,
                     potential_fn=phi)
    last5 = np.mean([float(m.episode_total_reward) for m in hist[-5:]])
    assert last5 >= 5, last5


def test_pool_lstm_iteration():
    """LSTM-PPO accepts a layout pool (reference from-params + use_lstm):
    one iteration runs and produces finite losses."""
    from overcooked_ai_tpu.training.ppo_lstm import make_ppo_lstm

    specs = _pool(3, seed=2)
    cfg = PPOConfig(
        num_envs=4, horizon=40, sgd_minibatch_size=80, num_sgd_iter=1,
        lr=1e-4,
    )
    init_fn, train_it = make_ppo_lstm(specs, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    ts, m = train_it(ts)
    assert np.isfinite(float(m.kl))
    assert np.isfinite(float(m.episode_shaped_reward))
    assert float(ts.env_steps) == 4 * 40


def _pool_bc_policy(specs, key):
    """Shared BC net (random-init -- plumbing test) + per-layout motion
    tables wrapped as the pool-mode 4-arg partner policy."""
    from overcooked_ai_tpu.core.featurize import featurize
    from overcooked_ai_tpu.planning.tables import build_motion_tables
    from overcooked_ai_tpu.training.bc import (
        BCConfig,
        BCNet,
        bc_policy_batch_pool,
    )

    fcs = [build_motion_tables(s.layout.terrain).feature_cost for s in specs]
    spec0 = specs[0]
    lay0 = jax.tree.map(jnp.asarray, spec0.layout)
    feats = featurize(lay0, jnp.asarray(fcs[0]), lay0.start_state)
    cfg_bc = BCConfig(net_arch=(16,))
    params = BCNet(cfg_bc).init(key, jnp.zeros((1, feats.shape[-1])))
    return bc_policy_batch_pool(specs, fcs, params, cfg_bc)


def test_pool_bc_partner_feedforward():
    """Pool x BC-partner: per-lane layouts with a BC seat; BC samples are
    masked out of the loss (bc_sample_fraction = 0.5 at bc_factor 1)."""
    specs = _pool(3, seed=3)
    bc_policy = _pool_bc_policy(specs, jax.random.PRNGKey(1))
    cfg = PPOConfig(
        num_envs=8, horizon=20, sgd_minibatch_size=80, num_sgd_iter=1,
        lr=1e-4, bc_schedule=((0, 1.0), (float("inf"), 1.0)),
    )
    init_fn, train_it = make_ppo(specs, cfg, bc_policy=bc_policy)
    ts = init_fn(jax.random.PRNGKey(0))
    ts, m = train_it(ts)
    assert np.isfinite(float(m.kl))
    assert abs(float(m.bc_sample_fraction) - 0.5) < 1e-6


def test_pool_bc_partner_lstm():
    """The same combination on the recurrent learner (reference
    from-params + use_lstm=True + bc partner)."""
    from overcooked_ai_tpu.training.ppo_lstm import make_ppo_lstm

    specs = _pool(3, seed=4)
    bc_policy = _pool_bc_policy(specs, jax.random.PRNGKey(2))
    cfg = PPOConfig(
        num_envs=4, horizon=40, sgd_minibatch_size=80, num_sgd_iter=1,
        lr=1e-4, bc_schedule=((0, 1.0), (float("inf"), 1.0)),
    )
    init_fn, train_it = make_ppo_lstm(specs, cfg, bc_policy=bc_policy)
    ts = init_fn(jax.random.PRNGKey(0))
    ts, m = train_it(ts)
    assert np.isfinite(float(m.kl))
    assert abs(float(m.bc_sample_fraction) - 0.5) < 1e-6


def test_pool_lstm_phi_iteration():
    """LSTM x pool x phi: per-lane potentials with the recurrent learner
    (reference use_lstm + use_phi + from-params are all orthogonal)."""
    from overcooked_ai_tpu.training.ppo_lstm import make_ppo_lstm

    specs = _pool(3, seed=5)
    phi = make_potential_fn_pool(specs)
    cfg = PPOConfig(
        num_envs=4, horizon=40, sgd_minibatch_size=80, num_sgd_iter=1,
        lr=1e-4, use_phi=True,
    )
    init_fn, train_it = make_ppo_lstm(specs, cfg, potential_fn=phi)
    ts = init_fn(jax.random.PRNGKey(0))
    ts, m = train_it(ts)
    assert np.isfinite(float(m.kl))
    assert np.isfinite(float(m.episode_total_reward))
