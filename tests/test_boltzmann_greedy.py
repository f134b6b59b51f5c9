"""Boltzmann-rational greedy human model parity vs the reference
(reference agents/agent.py:311-323,407-483).

Three layers of checks against the live reference agent:
  1. goal_cost table == reference get_plan cost for every motion goal the
     reference enumerates (exact).
  2. hl_boltzmann: our induced first-action distribution on a state ==
     the reference's goal-softmax pushed through its own plan first
     actions (empirical sampling vs exact mixture).
  3. ll_boltzmann: behavioral smoke -- the agent pair still delivers.
"""

import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from overcooked_ai_tpu.agents.agents import (
    GreedyTables,
    make_greedy_human_model,
)
from overcooked_ai_tpu.agents.evaluation import AgentFn, run_agent_pair
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.core.state import state_from_dict
from overcooked_ai_tpu.planning.greedy_tables import (
    build_first_action_table,
    build_goal_tables,
)
from overcooked_ai_tpu.planning.tables import INF_COST, build_motion_tables

from . import oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference oracle not mounted"
)

_OPP = {0: 1, 1: 0, 2: 3, 3: 2}
_DIR_TO_IDX = {(0, -1): 0, (0, 1): 1, (1, 0): 2, (-1, 0): 3}


def _ref_agent(layout_name, **agent_kwargs):
    oracle.load()
    from overcooked_ai_py.agents.agent import GreedyHumanModel
    from overcooked_ai_py.planning import planners as ref_planners

    ref_planners.PLANNERS_DIR = tempfile.mkdtemp()
    mdp = oracle.make_mdp(layout_name)
    mlam = ref_planners.MediumLevelActionManager.from_pickle_or_compute(
        mdp, ref_planners.NO_COUNTERS_PARAMS, force_compute=True
    )
    agent = GreedyHumanModel(mlam, **agent_kwargs)
    return mdp, mlam, agent


def _goal_to_table_index(goal):
    """Reference motion goal (pos, orient) -> (d, fy, fx) table index."""
    (gx, gy), orient = goal
    fx, fy = gx + orient[0], gy + orient[1]  # the faced feature cell
    d = _OPP[_DIR_TO_IDX[orient]]  # approach direction from the feature
    return d, fy, fx


def test_goal_cost_table_matches_reference_plans():
    mdp, mlam, agent = _ref_agent("cramped_room")
    agent.set_agent_index(0)
    spec = from_layout_name("cramped_room")
    goal_cost, _ = build_goal_tables(np.asarray(spec.layout.terrain))

    state = mdp.get_standard_start_state()
    rng = np.random.RandomState(0)
    checked = 0
    for step in range(40):
        for idx in (0, 1):
            agent.reset()
            agent.set_agent_index(idx)
            goals = agent.ml_action(state)
            (px, py), po = state.players_pos_and_or[idx]
            o = _DIR_TO_IDX[po]
            for g in goals:
                _, _, ref_cost = mlam.motion_planner.get_plan(
                    ((px, py), po), g
                )
                d, fy, fx = _goal_to_table_index(g)
                mine = int(goal_cost[o, py, px, d, fy, fx])
                assert mine == ref_cost, (g, mine, ref_cost)
                checked += 1
        # random walk to new states
        ja = tuple(
            oracle.action_int_to_ref(a) for a in rng.randint(0, 6, size=2)
        )
        state, _ = mdp.get_state_transition(state, ja)
    assert checked > 100


def _ref_hl_action_distribution(mdp, mlam, agent, state, idx, temp):
    """Exact first-action distribution of the reference hl-Boltzmann agent
    (goal softmax -> plan first action), replicating
    get_boltzmann_rational_action_idx (agent.py:442-448)."""
    agent.reset()
    agent.set_agent_index(idx)
    goals = agent.ml_action(state)
    start = state.players_pos_and_or[idx]
    plans = [mlam.motion_planner.get_plan(start, g) for g in goals]
    costs = np.array([p[2] for p in plans], float)
    probs = np.exp(-costs * temp)
    probs /= probs.sum()
    dist = np.zeros(6)
    from overcooked_ai_py.mdp.actions import Action

    for p, plan in zip(probs, plans):
        dist[Action.ACTION_TO_INDEX[plan[0][0]]] += p
    return dist


def test_hl_boltzmann_action_distribution_matches():
    layout = "cramped_room"
    temp = 1.0
    mdp, mlam, agent = _ref_agent(
        layout, hl_boltzmann_rational=True, hl_temp=temp, auto_unstuck=False
    )
    spec = from_layout_name(layout)
    terrain = np.asarray(spec.layout.terrain)
    mt = build_motion_tables(terrain)
    fa = build_first_action_table(terrain)
    gt = build_goal_tables(terrain)
    greedy = make_greedy_human_model(
        spec,
        GreedyTables(jnp.asarray(mt.feature_cost), jnp.asarray(fa)),
        auto_unstuck=False,
        hl_boltzmann_rational=True,
        hl_temp=temp,
        goal_tables=gt,
    )
    layout_dev = jax.tree.map(jnp.asarray, spec.layout)

    ref_state = mdp.get_standard_start_state()
    rng = np.random.RandomState(1)
    n_samples = 6000
    batched = jax.jit(
        jax.vmap(
            lambda k, st: greedy(k, layout_dev, st, 0, jnp.full((2, 3), -1)),
            in_axes=(0, None),
        )
    )
    compared = 0
    for step in range(12):
        ref_dist = _ref_hl_action_distribution(
            mdp, mlam, agent, ref_state, 0, temp
        )
        state = state_from_dict(ref_state.to_dict(), spec)
        keys = jax.random.split(jax.random.PRNGKey(step), n_samples)
        acts = np.asarray(batched(keys, state))
        emp = np.bincount(acts, minlength=6) / n_samples
        # empirical-vs-exact total variation; ties in optimal first
        # actions are broken differently, so compare the *distribution
        # over goal costs* via action mass only when unambiguous:
        tv = 0.5 * np.abs(emp - ref_dist).sum()
        assert tv < 0.06, (step, tv, emp, ref_dist)
        compared += 1
        ja = tuple(
            oracle.action_int_to_ref(a) for a in rng.randint(0, 6, size=2)
        )
        ref_state, _ = mdp.get_state_transition(ref_state, ja)
    assert compared == 12


def test_ll_boltzmann_behavioral_smoke():
    """hl+ll Boltzmann pair still cooks and delivers on cramped_room."""
    spec = from_layout_name("cramped_room")
    terrain = np.asarray(spec.layout.terrain)
    mt = build_motion_tables(terrain)
    fa = build_first_action_table(terrain)
    gt = build_goal_tables(terrain)
    greedy = make_greedy_human_model(
        spec,
        GreedyTables(jnp.asarray(mt.feature_cost), jnp.asarray(fa)),
        hl_boltzmann_rational=True,
        ll_boltzmann_rational=True,
        hl_temp=5.0,  # near-rational
        ll_temp=5.0,
        goal_tables=gt,
    )
    agent = AgentFn(
        policy=lambda key, layout, state, idx, carry: (
            greedy(key, layout, state, idx, carry),
            carry,
        ),
        init_carry=lambda batch: None,
    )
    traj = run_agent_pair(
        spec, [agent, agent], num_games=2, horizon=400, seed=0,
        greedy_carry=True,
    )
    total_sparse = float(np.sum(traj["sparse"]))
    assert total_sparse >= 40, total_sparse  # at least one delivery per game
