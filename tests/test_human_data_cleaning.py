"""Human-data cleaning + replay validation (reference human/tests.py).

Covers csv_to_df_pickle cleaning (reference process_dataframes.py:75-161),
per-layout train/test split (:265-311), and the
replay-the-human-actions-through-the-env validation (reference
TestHumanDataConversion, human/tests.py:147-212).

HERMETIC: runs on committed SYNTHETIC fixtures (2020-schema CSV + 2019-style
old-dynamics pickle) generated from our own scripted rollouts by
scripts/gen_human_data_fixtures.py -- the analogue of the reference's
dummy data files (static/human_data/dummy/), which are not vendored here.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.core.state import state_from_dict
from overcooked_ai_tpu.core.step import step as env_transition
from overcooked_ai_tpu.human_data.compat import repair_old_dynamics_rows
from overcooked_ai_tpu.human_data.pipeline import (
    csv_to_df_pickle,
    parse_joint_action,
    train_test_split_trials,
)

FIXTURE_DIR = os.path.join(
    os.path.dirname(__file__), "fixtures", "human_data"
)
CSV_2020 = os.path.join(FIXTURE_DIR, "synthetic_2020_hh_trials.csv")
PICKLE_2019 = os.path.join(
    FIXTURE_DIR, "synthetic_2019_hh_trials_all.pickle"
)
N_ROWS_2020 = 720  # 6 trials x 120 steps (gen_human_data_fixtures.py)


def test_csv_to_df_pickle_2020(tmp_path):
    """Mirrors reference test_csv_to_df_pickle_2020 + threshold monotonicity
    (human/tests.py:77-105)."""
    data = csv_to_df_pickle(
        CSV_2020, str(tmp_path), "unittest",
        button_presses_threshold=0.0, perform_train_test_split=False,
    )
    assert len(data) == N_ROWS_2020
    assert os.path.exists(tmp_path / "unittest_all.pickle")

    lengths = []
    # fixture strata: 1.0 / ~0.74 / ~0.24 presses per timestep
    for thr in (0.2, 0.5, 0.9):
        d = csv_to_df_pickle(
            CSV_2020, str(tmp_path), "unittest",
            button_presses_threshold=thr, perform_train_test_split=False,
        )
        lengths.append(len(d))
    assert lengths == sorted(lengths, reverse=True)
    assert lengths[-1] < N_ROWS_2020

    with pytest.raises(ValueError):
        csv_to_df_pickle(
            CSV_2020, str(tmp_path), "unittest",
            button_presses_threshold=1.01, perform_train_test_split=False,
        )


def test_train_test_split_per_layout(tmp_path):
    """Per-layout trial-level split: disjoint trial ids, both non-empty.
    The dummy set has one trial per layout, so clone each trial with a new
    id to make splitting possible (the reference skips splitting on dummy
    data for this reason, tests.py:94)."""
    pd = pytest.importorskip("pandas")
    df = csv_to_df_pickle(
        CSV_2020, str(tmp_path), "unittest",
        button_presses_threshold=0.0, perform_train_test_split=False,
    )
    clone = df.copy()
    clone["trial_id"] = clone["trial_id"].astype(str) + "_b"
    both = pd.concat([df, clone])
    split = train_test_split_trials(both, train_size=0.5, seed=0)
    assert set(split) == set(np.unique(df["layout_name"]))
    for layout, parts in split.items():
        tr = set(parts["train"]["trial_id"])
        te = set(parts["test"]["trial_id"])
        assert tr and te and not (tr & te)

    # full pipeline writes train/test pickles (re-derive from raw columns)
    csv_path = tmp_path / "doubled.csv"
    raw_cols = ["state", "joint_action", "reward", "time_left", "score",
                "time_elapsed", "cur_gameloop", "layout", "layout_name",
                "trial_id", "player_0_id", "player_1_id",
                "player_0_is_human", "player_1_is_human"]
    both[raw_cols].to_csv(csv_path, index=False)
    out = csv_to_df_pickle(
        str(csv_path), str(tmp_path), "split",
        button_presses_threshold=0.0, perform_train_test_split=True,
        train_size=0.5,
    )
    assert os.path.exists(tmp_path / "split_train.pickle")
    assert os.path.exists(tmp_path / "split_test.pickle")
    assert len(out) == len(both)


def test_replay_2019_human_data_through_step():
    """Replay the synthetic 2019-style OLD-dynamics cramped_room
    trajectories -- after repair_old_dynamics_rows inserts the explicit
    cooking INTERACTs -- through our (new-dynamics) jit step and assert
    per-step state equality with the recorded states (reference
    TestHumanDataConversion.test_state, human/tests.py:147-212; ignores
    timestep/orders like the reference's equal_dicts)."""
    pd = pytest.importorskip("pandas")
    import json

    df = pd.read_pickle(PICKLE_2019)
    df = df[df["layout_name"] == "cramped_room"]
    spec = from_layout_name("cramped_room")
    layout = jax.tree.map(jnp.asarray, spec.layout)
    step_jit = jax.jit(env_transition)

    start_state = state_from_dict(
        json.loads(df.iloc[0]["state"]), spec
    )  # dummy data trials start at the standard start state

    def states_equal(a, b):
        # reference ignores "timestep"; obj_seq stamps differ by
        # construction between parsed (-n..-1) and stepped (t*P+i+1) states
        # while encoding the same insertion ORDER
        skip = {"t", "obj_seq"}
        return all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for f, x, y in zip(a._fields, a, b)
            if f not in skip
        )

    checked = 0
    for trial_id, grp in df.groupby("trial_id"):
        grp = grp.sort_values("cur_gameloop")
        rows = [
            {"state": r["state"], "joint_action": r["joint_action"]}
            for _, r in grp.iterrows()
        ]
        rows = repair_old_dynamics_rows(rows)  # old-dynamics auto-start fix
        cur = None
        for i, row in enumerate(rows[:150]):
            sd = row["state"]
            if isinstance(sd, str):
                sd = json.loads(sd)
            recorded = state_from_dict(sd, spec)
            if cur is None or states_equal(recorded, start_state):
                cur = recorded  # (re)start of a game
            else:
                assert states_equal(recorded, cur), (
                    f"trial {trial_id} step {i}: replay diverged"
                )
                checked += 1
            actions = jnp.asarray(
                parse_joint_action(row["joint_action"]), jnp.int32
            )
            cur, _ = step_jit(layout, cur, actions)
    assert checked > 100
