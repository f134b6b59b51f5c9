"""Tests for core utils parity and trajectory dynamics checking."""

import numpy as np
import pytest

from overcooked_ai_tpu.utils import (
    append_dictionaries,
    load_from_json,
    load_pickle,
    manhattan_distance,
    mean_and_std_err,
    merge_dictionaries,
    save_as_json,
    save_pickle,
)


def test_io_roundtrip(tmp_path):
    data = {"a": [1, 2, 3], "b": "x"}
    save_pickle(data, tmp_path / "d")
    assert load_pickle(tmp_path / "d") == data
    save_as_json(data, str(tmp_path / "d"))
    assert load_from_json(str(tmp_path / "d")) == data


def test_stats_and_dicts():
    mu, se = mean_and_std_err([1.0, 2.0, 3.0, 4.0])
    assert mu == 2.5
    assert np.isclose(se, np.std([1, 2, 3, 4]) / 2)
    assert manhattan_distance((0, 0), (2, 3)) == 5
    assert append_dictionaries([{"a": 1}, {"a": 2}]) == {"a": [1, 2]}
    assert merge_dictionaries([{"a": [1]}, {"a": [2, 3]}]) == {"a": [1, 2, 3]}


def test_agent_pair_trajectory_check_and_schema():
    """Greedy-pair rollout -> reference format -> dynamics replay passes."""
    from overcooked_ai_tpu.agents.agents import make_greedy_human_model
    from overcooked_ai_tpu.agents.evaluation import (
        check_trajectories,
        greedy_agent_fn,
        run_agent_pair,
        trajectories_to_reference_format,
    )
    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.planning.greedy_tables import build_greedy_tables

    spec = from_layout_name("cramped_room")
    tables = build_greedy_tables(spec)
    greedy = make_greedy_human_model(spec, tables)
    agent = greedy_agent_fn(greedy)
    traj = run_agent_pair(spec, [agent, agent], num_games=1, horizon=60)
    ref = trajectories_to_reference_format(spec, traj, horizon=60)
    # schema: states[t] is the state action[t] was taken in, starting at t=0
    assert ref["ep_states"][0][0]["timestep"] == 0
    assert ref["ep_states"][0][5]["timestep"] == 5
    assert len(ref["ep_states"][0]) == len(ref["ep_actions"][0]) == 60
    check_trajectories(ref, spec)


def test_check_trajectories_catches_corruption():
    from overcooked_ai_tpu.agents.agents import make_greedy_human_model
    from overcooked_ai_tpu.agents.evaluation import (
        check_trajectories,
        greedy_agent_fn,
        run_agent_pair,
        trajectories_to_reference_format,
    )
    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.planning.greedy_tables import build_greedy_tables

    spec = from_layout_name("cramped_room")
    tables = build_greedy_tables(spec)
    agent = greedy_agent_fn(make_greedy_human_model(spec, tables))
    traj = run_agent_pair(spec, [agent, agent], num_games=1, horizon=20)
    ref = trajectories_to_reference_format(spec, traj, horizon=20)
    ref["ep_states"][0][10]["players"][0]["position"] = (1, 1)
    with pytest.raises(AssertionError):
        check_trajectories(ref, spec)


def test_fixed_plan_and_sample_agents():
    import jax
    import jax.numpy as jnp

    from overcooked_ai_tpu.agents.agents import (
        make_fixed_plan_agent,
        make_sample_agent,
        random_agent_probs,
    )
    from overcooked_ai_tpu.core.constants import ACTION_STAY
    from overcooked_ai_tpu.core.layout import from_layout_name

    spec = from_layout_name("cramped_room")
    layout = jax.tree.map(jnp.asarray, spec.layout)
    state = jax.tree.map(jnp.asarray, spec.layout.start_state)

    plan = [2, 3, 5]
    agent = make_fixed_plan_agent(plan)
    key = jax.random.PRNGKey(0)
    for t, want in enumerate(plan):
        st = state._replace(t=jnp.asarray(t))
        assert int(agent(key, layout, st, 0)) == want
    st = state._replace(t=jnp.asarray(len(plan)))
    assert int(agent(key, layout, st, 0)) == ACTION_STAY

    probs = lambda key, layout, state, idx: jnp.asarray(  # noqa: E731
        random_agent_probs(all_actions=True)
    )
    sample = make_sample_agent([probs, probs])
    a = int(sample(jax.random.PRNGKey(1), layout, state, 0))
    assert 0 <= a < 6


def test_trajectory_utils_parity():
    """append_trajectories / discounted rewards / stuck-time (reference
    overcooked_trajectory.py:44-76 + overcooked_env.py:591-666)."""
    import numpy as np

    from overcooked_ai_tpu.agents.agents import stay_agent
    from overcooked_ai_tpu.agents.evaluation import (
        append_trajectories,
        get_discounted_rewards,
        proportion_stuck_time,
        run_agent_pair,
        stateless,
        trajectories_to_reference_format,
    )
    from overcooked_ai_tpu.core.layout import from_layout_name

    spec = from_layout_name("cramped_room")
    agent = stateless(stay_agent)
    traj = run_agent_pair(spec, [agent, agent], num_games=2, horizon=10)
    ref = trajectories_to_reference_format(spec, traj, horizon=10)

    both = append_trajectories(ref, ref)
    assert len(both["ep_states"]) == 4
    assert append_trajectories({}, {}) == {}
    merged = append_trajectories(None, ref)
    assert len(merged["ep_returns"]) == 2

    disc = get_discounted_rewards(ref, gamma=0.9)
    assert disc.shape == (2,) and (disc == 0).all()  # stay pair never scores

    # stay agents are stuck 100% of the measurable window
    stuck = proportion_stuck_time(ref, agent_idx=0, stuck_time=3)
    assert stuck == 1.0


def test_action_direction_micro_utils():
    """Index-vocabulary ports of the reference Action/Direction helpers
    (reference actions.py:27-131)."""
    import numpy as np

    from overcooked_ai_tpu.core import constants as C

    assert C.move_in_direction((2, 3), C.DIR_NORTH) == (2, 2)
    assert C.move_in_direction((2, 3), C.ACTION_STAY) == (2, 3)
    assert C.determine_action_for_change_in_pos((1, 1), (1, 2)) == C.DIR_SOUTH
    assert C.determine_action_for_change_in_pos((1, 1), (1, 1)) == (
        C.ACTION_STAY
    )
    assert C.get_adjacent_directions(C.DIR_NORTH) == [C.DIR_EAST, C.DIR_WEST]
    assert C.get_adjacent_directions(C.DIR_WEST) == [C.DIR_NORTH, C.DIR_SOUTH]
    assert C.joint_action_to_char([0, 5]) == ("↑", "interact")
    probs = C.uniform_probs_over_actions()
    assert probs.shape == (6,) and abs(probs.sum() - 1) < 1e-9
    rng = np.random.default_rng(0)
    assert C.sample_action(rng, probs) in range(6)
    assert C.argmax_action([0, 0, 1, 0, 0, 0]) == 2
