"""PPO learner tests (CI-scale, mirrors reference ppo_rllib_test.py style:
short real training runs asserting learning signals)."""

import numpy as np
import pytest

import jax

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo, train
from overcooked_ai_tpu.training.ppo_lstm import make_ppo_lstm


def test_ppo_learns_shaped_reward():
    """High-lr smoke: shaped reward must increase and entropy decrease
    (analogue of the reference's min_performance sanity check,
    ppo_rllib_test.py:172-194)."""
    spec = from_layout_name("cramped_room")
    cfg = PPOConfig(
        num_envs=8,
        horizon=80,
        sgd_minibatch_size=320,
        num_sgd_iter=8,
        entropy_coeff_start=0.0,
        entropy_coeff_end=0.0,
        lr=5e-3,
    )
    ts, hist = train(spec, cfg, num_iterations=10, seed=0)
    first3 = np.mean([float(m.episode_shaped_reward) for m in hist[:3]])
    last3 = np.mean([float(m.episode_shaped_reward) for m in hist[-3:]])
    assert last3 > first3, (first3, last3)
    assert float(hist[-1].entropy) < float(hist[0].entropy)


def test_ppo_lstm_trains():
    spec = from_layout_name("cramped_room")
    cfg = PPOConfig(
        num_envs=2,
        horizon=40,
        sgd_minibatch_size=100,
        num_sgd_iter=2,
        entropy_coeff_start=0.0,
        entropy_coeff_end=0.0,
        lr=5e-3,
    )
    init_fn, train_it = make_ppo_lstm(spec, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    p0 = jax.device_get(ts.params)
    ts, m = train_it(ts)
    assert np.isfinite(float(m.kl))
    p1 = jax.device_get(ts.params)
    delta = sum(
        float(np.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))
    )
    assert delta > 0


def test_anneal_schedules():
    from overcooked_ai_tpu.training.ppo import _anneal, _bc_factor_at

    # linear annealing math (reference rllib tests, rllib/tests.py:74-120)
    assert float(_anneal(1.0, 0.0, 100.0)) == 1.0
    assert abs(float(_anneal(1.0, 50.0, 100.0)) - 0.5) < 1e-6
    assert float(_anneal(1.0, 200.0, 100.0)) == 0.0
    sched = ((0, 0.0), (100, 1.0), (float("inf"), 1.0))
    assert float(_bc_factor_at(sched, 0.0)) == 0.0
    assert abs(float(_bc_factor_at(sched, 50.0)) - 0.5) < 1e-6
    assert float(_bc_factor_at(sched, 1000.0)) == 1.0


import os

SLOW = os.environ.get("OVERCOOKED_SLOW_TESTS") == "1"


def test_ppo_sp_no_phi_threshold():
    """Reference CI: PPO self-play (no phi) on cramped_room, 30 iters x
    batch 800 -> episode_reward_mean >= 5 (ppo_rllib_test.py:63,172-194).
    The asserted metric is rllib's episode_reward_mean = per-episode MIXED
    reward summed over both agents (average_total_reward,
    ppo_rllib_client.py:408-411).

    In the DEFAULT suite (not gated behind OVERCOOKED_SLOW_TESTS): it is
    the cheapest reference CI threshold and the only always-on end-to-end
    learning guarantee. Budget: 12 iterations (~75 s CPU) -- the
    metric clears the >=5 bar from iteration 1 and the last-5 mean at 12
    iters is ~15, a 3x margin (measured; 30 iters only raises it to ~22
    for double the wall-clock)."""
    spec = from_layout_name("cramped_room")
    cfg = PPOConfig(
        num_envs=2,
        horizon=400,
        sgd_minibatch_size=400,
        num_sgd_iter=8,
        entropy_coeff_start=0.0,
        entropy_coeff_end=0.0,
        lr=5e-3,
    )
    ts, hist = train(spec, cfg, num_iterations=12, seed=0)
    last5 = np.mean([float(m.episode_total_reward) for m in hist[-5:]])
    assert last5 >= 5, last5


@pytest.mark.skipif(not SLOW, reason="set OVERCOOKED_SLOW_TESTS=1")
def test_ppo_sp_phi_threshold():
    """Reference CI: PPO self-play (phi-shaped) on cramped_room, 30 iters x
    batch 1600 -> episode_reward_mean >= 13 (ppo_rllib_test.py:203-225)."""
    from overcooked_ai_tpu.core.potential import make_potential_fn
    from overcooked_ai_tpu.planning.tables import build_motion_tables

    spec = from_layout_name("cramped_room")
    tables = build_motion_tables(spec.layout.terrain)
    phi = make_potential_fn(spec, tables.feature_cost)
    cfg = PPOConfig(
        num_envs=4,
        horizon=400,
        sgd_minibatch_size=800,
        num_sgd_iter=8,
        entropy_coeff_start=0.0,
        entropy_coeff_end=0.0,
        lr=5e-3,
        use_phi=True,
    )
    ts, hist = train(spec, cfg, num_iterations=30, seed=0, potential_fn=phi)
    last5 = np.mean([float(m.episode_total_reward) for m in hist[-5:]])
    assert last5 >= 13, last5


def test_ppo_bf16_compute_trains():
    """Mixed-precision net (NetConfig.compute_dtype=bfloat16, float32
    params and heads): one iteration runs with finite losses."""
    from overcooked_ai_tpu.training.networks import NetConfig
    from overcooked_ai_tpu.training.ppo import make_ppo

    spec = from_layout_name("cramped_room")
    cfg = PPOConfig(
        num_envs=4, horizon=40, sgd_minibatch_size=160, num_sgd_iter=1,
        lr=1e-4, net=NetConfig(compute_dtype="bfloat16"),
    )
    init_fn, train_it = make_ppo(spec, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    import numpy as _np

    # params stay float32 (flax mixed-precision semantics)
    assert all(
        leaf.dtype == _np.float32 for leaf in jax.tree.leaves(ts.params)
    )
    ts, m = train_it(ts)
    assert _np.isfinite(float(m.kl))
    assert _np.isfinite(float(m.policy_loss))
