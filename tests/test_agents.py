"""Behavioral tests for agents (mirrors reference testing/agent_test.py and
the GreedyHumanModel scenario style of planners_test.py:821-901)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from overcooked_ai_tpu.agents.agents import (
    GreedyTables,
    make_greedy_human_model,
    random_agent,
    stay_agent,
)
from overcooked_ai_tpu.agents.evaluation import (
    AgentFn,
    DEFAULT_TRAJ_KEYS,
    game_stats_from_traj,
    run_agent_pair,
    stateless,
    trajectories_to_reference_format,
)
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.planning.greedy_tables import build_first_action_table
from overcooked_ai_tpu.planning.tables import build_motion_tables


def _greedy_tables(spec):
    mt = build_motion_tables(spec.layout.terrain)
    fa = build_first_action_table(spec.layout.terrain)
    return GreedyTables(
        feature_cost=jnp.asarray(mt.feature_cost),
        first_action=jnp.asarray(fa),
    )


def test_greedy_pair_delivers_on_cramped_room():
    """Two greedy human models must cook and deliver soups in 400 steps
    (the reference's scenario tests rely on this behavior)."""
    spec = from_layout_name("cramped_room")
    greedy = make_greedy_human_model(spec, _greedy_tables(spec))
    agent = AgentFn(
        policy=lambda key, layout, state, idx, carry: (
            greedy(key, layout, state, idx, carry),
            carry,
        )
    )
    traj = run_agent_pair(spec, [agent, agent], num_games=4, horizon=400)
    returns = traj["sparse"].sum(axis=(0, 1))  # (B,)
    assert (returns >= 40).all(), f"greedy pair scored {returns}"


def test_greedy_pair_other_layouts():
    # NOTE: the reference GreedyHumanModel pair also scores 0 on
    # coordination_ring (verified by driving the reference directly), so we
    # only require a positive score on asymmetric_advantages and that
    # coordination_ring runs without error.
    expectations = {"asymmetric_advantages": 1, "coordination_ring": 0}
    for name, min_score in expectations.items():
        spec = from_layout_name(name)
        greedy = make_greedy_human_model(spec, _greedy_tables(spec))
        agent = AgentFn(
            policy=lambda key, layout, state, idx, carry: (
                greedy(key, layout, state, idx, carry),
                carry,
            )
        )
        traj = run_agent_pair(spec, [agent, agent], num_games=2, horizon=400)
        returns = traj["sparse"].sum(axis=(0, 1))
        assert (returns >= min_score).all(), (
            f"{name}: greedy pair scored {returns}"
        )


def test_random_stay_pair_and_trajectory_format():
    spec = from_layout_name("cramped_room")
    pair = [stateless(random_agent), stateless(stay_agent)]
    traj = run_agent_pair(spec, pair, num_games=2, horizon=50, seed=3)
    assert traj["actions"].shape == (50, 2, 2)
    # stay agent only ever stays
    assert (traj["actions"][:, 1, :] == 4).all()
    trajs = trajectories_to_reference_format(spec, traj, horizon=50)
    assert set(trajs.keys()) == set(DEFAULT_TRAJ_KEYS)
    assert len(trajs["ep_states"]) == 2
    assert len(trajs["ep_states"][0]) == 50
    # states are aligned with the actions taken in them (reference
    # get_rollouts schema): first state is the start state at t=0
    assert trajs["ep_states"][0][0]["timestep"] == 0
    stats = game_stats_from_traj(traj)
    assert "cumulative_sparse_rewards_by_agent" in stats
    assert len(stats["onion_pickup"]) == 2


def test_greedy_rejects_non_onion_orders():
    spec = from_layout_name("counter_circuit")  # tomato orders
    with pytest.raises(AssertionError):
        make_greedy_human_model(spec, _greedy_tables(spec))
