"""Human trajectory data pipeline: raw trial data -> BC training tensors.

Mirrors the reference pipeline
(reference human_aware_rl/human/process_dataframes.py:28-265 and
data_processing_utils.py:23-273): trial dataframes of JSON-encoded states +
joint actions are parsed, filtered, split per layout, and converted to
per-agent (featurized observation, action index) pairs. The featurization
itself runs batched on device through the planning tables (the reference
re-runs its Python planner-backed featurize_state per frame, the dominant
cost of its BC pipeline).

Input format: a pandas DataFrame (CSV or pickle) with columns
    state (JSON state dict), joint_action (JSON), layout_name, trial_id,
    score, cur_gameloop, ... (2020 schema; see reference
    static/__init__.py:55-97)
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from overcooked_ai_tpu.core.constants import (
    ACTION_INTERACT,
    ACTION_STAY,
    TUPLE_TO_DIRECTION,
)
from overcooked_ai_tpu.core.state import state_from_dict

# reference: trials with < 0.25 button presses / timestep are dropped
# (process_dataframes.py:75-161)
DEFAULT_BUTTON_PRESS_THRESHOLD = 0.25


def json_action_to_index(a) -> int:
    """JSON action -> action index (reference data_processing_utils:23-41)."""
    if isinstance(a, str):
        s = a.lower().strip('"')
        if s == "interact":
            return ACTION_INTERACT
        raise ValueError(f"unknown action {a!r}")
    t = tuple(a)
    if t == (0, 0):
        return ACTION_STAY
    return TUPLE_TO_DIRECTION[t]


def parse_joint_action(ja) -> list:
    if isinstance(ja, str):
        try:
            ja = json.loads(ja)
        except json.JSONDecodeError:
            ja = eval(ja)  # noqa: S307 - legacy format, like the reference
    return [json_action_to_index(a) for a in ja]


def load_trials(path):
    """Load a trials dataframe from .csv or .pickle."""
    import pandas as pd

    if str(path).endswith(".csv"):
        return pd.read_csv(path)
    return pd.read_pickle(path)


def filter_trials(df, button_press_threshold=DEFAULT_BUTTON_PRESS_THRESHOLD):
    """Drop low-interaction trials (reference format_trials_df:190-240)."""
    if "button_presses_per_timstep" in df.columns:
        keep = df["button_presses_per_timstep"] >= button_press_threshold
        df = df[keep]
    return df


def trials_to_trajectories(df, spec, layouts=None):
    """Group a trials df into per-trial (states, joint_actions) on a layout.

    Returns list of dicts {states: list[State], actions: (T, P) int32,
    score: int, trial_id}.
    """
    if layouts is not None:
        df = df[df["layout_name"].isin(layouts)]
    else:
        df = df[df["layout_name"] == spec.name]
    out = []
    for trial_id, grp in df.groupby("trial_id"):
        grp = grp.sort_values("cur_gameloop")
        states, actions = [], []
        for _, row in grp.iterrows():
            sd = row["state"]
            if isinstance(sd, str):
                sd = json.loads(sd)
            states.append(state_from_dict(sd, spec))
            actions.append(parse_joint_action(row["joint_action"]))
        out.append(
            dict(
                trial_id=trial_id,
                states=states,
                actions=np.asarray(actions, np.int32),
                score=int(grp["score"].max()) if "score" in grp else 0,
            )
        )
    return out


def featurize_trajectories(spec, feature_cost, trajectories, num_pots=2):
    """Per-agent BC tensors from joint trajectories.

    Returns (obs (N, F) float32, actions (N,) int32) concatenating both
    agent perspectives (reference joint->single conversion,
    data_processing_utils.py:142-273).
    """
    import jax
    import jax.numpy as jnp

    from overcooked_ai_tpu.core.featurize import featurize

    feat_jit = jax.jit(featurize, static_argnames=("num_pots",))
    layout = jax.tree.map(jnp.asarray, spec.layout)
    fc = jnp.asarray(feature_cost)

    all_obs, all_actions = [], []
    for traj in trajectories:
        # stack this trial's states into one batched call
        batched = jax.tree.map(
            lambda *xs: jnp.stack(xs, axis=-1), *traj["states"]
        )
        feats = jax.vmap(
            lambda st: feat_jit(layout, fc, st, num_pots=num_pots),
            in_axes=-1,
            out_axes=0,
        )(batched)  # (T, P, F)
        feats = np.asarray(feats)
        T, P, _ = feats.shape
        for p in range(P):
            all_obs.append(feats[:, p])
            all_actions.append(traj["actions"][:, p])
    return (
        np.concatenate(all_obs).astype(np.float32),
        np.concatenate(all_actions).astype(np.int32),
    )


def get_human_human_data(
    spec,
    feature_cost,
    data_path,
    layouts=None,
    button_press_threshold=0.0,
):
    """One-stop: path -> (obs, actions) BC tensors for one layout."""
    df = load_trials(data_path)
    if button_press_threshold:
        df = filter_trials(df, button_press_threshold)
    trajs = trials_to_trajectories(df, spec, layouts)
    return featurize_trajectories(spec, feature_cost, trajs)
