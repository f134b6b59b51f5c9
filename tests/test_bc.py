"""BC pipeline + training tests (mirrors reference
behavior_cloning_tf2_test.py and human/tests.py, using the reference's
dummy human data as input fixtures)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.human_data.pipeline import (
    featurize_trajectories,
    load_trials,
    trials_to_trajectories,
)
from overcooked_ai_tpu.planning.tables import build_motion_tables
from overcooked_ai_tpu.training.bc import (
    BCConfig,
    bc_policy_fn,
    load_bc_model,
    save_bc_model,
    train_bc_model,
)

DUMMY_DATA = (
    "/root/reference/src/human_aware_rl/static/human_data/dummy/"
    "dummy_2020_hh_trials.pickle"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(DUMMY_DATA), reason="dummy human data not available"
)


def _make_dataset():
    df = load_trials(DUMMY_DATA)
    layout_name = df["layout_name"].iloc[0]
    spec = from_layout_name(layout_name)
    tables = build_motion_tables(spec.layout.terrain)
    trajs = trials_to_trajectories(df, spec)
    obs, actions = featurize_trajectories(
        spec, tables.feature_cost, trajs
    )
    return spec, tables, obs, actions


def test_pipeline_shapes():
    spec, tables, obs, actions = _make_dataset()
    assert obs.ndim == 2 and obs.shape[1] == spec.num_players * 46 + 4
    assert obs.shape[0] == actions.shape[0] > 100
    assert set(np.unique(actions)) <= set(range(6))


def test_bc_training_loss_decreases_and_roundtrip(tmp_path):
    spec, tables, obs, actions = _make_dataset()
    cfg = BCConfig(epochs=20, early_stopping_patience=20)
    params, history = train_bc_model(obs, actions, cfg, seed=0)
    assert history["loss"][-1] < history["loss"][0], history["loss"]

    model_dir = str(tmp_path / "bc_model")
    save_bc_model(model_dir, params, cfg, metadata={"obs_dim": obs.shape[1]})
    params2, cfg2 = load_bc_model(model_dir)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(params2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # policy runs as an agent
    policy = bc_policy_fn(spec, tables.feature_cost, params2, cfg2)
    layout = jax.tree.map(jnp.asarray, spec.layout)
    state = jax.tree.map(jnp.asarray, spec.layout.start_state)
    act = policy(jax.random.PRNGKey(0), layout, state, 0)
    assert 0 <= int(act) < 6


def test_bc_self_play_rollout():
    """BC self-play evaluation (reference evaluate_bc_model, :311-354)."""
    from overcooked_ai_tpu.agents.evaluation import run_agent_pair, stateless

    spec, tables, obs, actions = _make_dataset()
    cfg = BCConfig(epochs=5)
    params, _ = train_bc_model(obs, actions, cfg, seed=0)
    policy = bc_policy_fn(spec, tables.feature_cost, params, cfg)
    pair = [stateless(policy), stateless(policy)]
    traj = run_agent_pair(spec, pair, num_games=2, horizon=40, seed=1)
    assert traj["actions"].shape == (40, 2, 2)
