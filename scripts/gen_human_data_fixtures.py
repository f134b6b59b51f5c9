"""Generate SYNTHETIC human-data fixtures for hermetic pipeline tests.

The reference tests its human-data pipeline on small "dummy" CSV/pickle
files (reference static/human_data/dummy/). This repo does not vendor
those; instead this script synthesizes equivalents from OUR OWN scripted
rollouts, so tests/test_human_data_cleaning.py runs without the reference
mount:

* tests/fixtures/human_data/synthetic_2020_hh_trials.csv -- 2020-schema
  rows (the demo server's collection format, demo/server.py) from
  greedy-pair rollouts at three different activity levels per layout, so
  the button-press-rate filter has distinct strata to cut.
* tests/fixtures/human_data/synthetic_2019_hh_trials_all.pickle --
  forward-ported 2019-style dataframe of OLD-dynamics cramped_room
  greedy rollouts (the 2019 datasets predate the explicit-cooking
  dynamics), for the repair-and-replay test
  (reference process_human_trials.py:40-102).

    python scripts/gen_human_data_fixtures.py --platform cpu
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT_DIR = "tests/fixtures/human_data"

_ACTION_JSON = {0: [0, -1], 1: [0, 1], 2: [1, 0], 3: [-1, 0],
                4: [0, 0], 5: "INTERACT"}


def _greedy_agent(spec, stay_prob=0.0):
    import jax
    import jax.numpy as jnp

    from overcooked_ai_tpu.agents.agents import (
        GreedyTables,
        make_greedy_human_model,
    )
    from overcooked_ai_tpu.agents.evaluation import AgentFn
    from overcooked_ai_tpu.planning.greedy_tables import (
        build_first_action_table,
    )
    from overcooked_ai_tpu.planning.tables import build_motion_tables

    mt = build_motion_tables(spec.layout.terrain)
    fa = build_first_action_table(spec.layout.terrain)
    greedy = make_greedy_human_model(
        spec, GreedyTables(jnp.asarray(mt.feature_cost), jnp.asarray(fa))
    )

    def policy(key, layout, state, idx, carry):
        k_g, k_mix = jax.random.split(key)
        a = greedy(k_g, layout, state, idx, carry)
        if stay_prob > 0:
            a = jnp.where(
                jax.random.uniform(k_mix) < stay_prob, 4, a
            ).astype(jnp.int32)
        return a, carry

    return AgentFn(policy=policy, init_carry=lambda batch: None)


def _roll(spec, stay_prob, horizon, seed):
    """One game -> list of (pre_state_dict, action_pair, step_sparse)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from overcooked_ai_tpu.agents.evaluation import run_agent_pair
    from overcooked_ai_tpu.core.env import batch_reset
    from overcooked_ai_tpu.core.state import state_to_dict

    agent = _greedy_agent(spec, stay_prob)
    traj = run_agent_pair(
        spec, [agent, agent], num_games=1, horizon=horizon, seed=seed,
        greedy_carry=True,
    )
    layout = jax.tree.map(jnp.asarray, spec.layout)
    start = jax.device_get(
        jax.tree.map(lambda x: x[..., 0], batch_reset(layout, 1))
    )
    post = [
        jax.tree.map(lambda x: np.asarray(x)[t, ..., 0], traj["state"])
        for t in range(horizon)
    ]
    pre = [start] + post[:-1]
    rows = []
    for t in range(horizon):
        rows.append(
            (
                state_to_dict(pre[t], spec),
                [int(a) for a in traj["actions"][t, :, 0]],
                int(np.asarray(traj["sparse"])[t, :, 0].sum()),
            )
        )
    return rows


def gen_2020_csv(path):
    import pandas as pd

    from overcooked_ai_tpu.core.layout import from_layout_name

    records = []
    trial = 0
    for layout_name in ["cramped_room", "asymmetric_advantages"]:
        spec = from_layout_name(layout_name)
        terrain = json.dumps(spec.terrain_chars)
        # three activity strata so button_presses_per_timstep spans the
        # filter thresholds the test sweeps
        for stay_prob, seed in [(0.0, 0), (0.55, 1), (0.9, 2)]:
            rows = _roll(spec, stay_prob, horizon=120, seed=seed)
            score = 0
            for t, (sd, acts, sparse) in enumerate(rows):
                score += sparse
                records.append(
                    {
                        "state": json.dumps(sd),
                        "joint_action": json.dumps(
                            [_ACTION_JSON[a] for a in acts]
                        ),
                        "reward": sparse,
                        "time_left": round((len(rows) - t) / 6.0, 3),
                        "score": score,
                        "time_elapsed": round(t / 6.0, 3),
                        "cur_gameloop": t,
                        "layout": terrain,
                        "layout_name": layout_name,
                        "trial_id": f"t{trial}",
                        "player_0_id": f"p{2 * trial}",
                        "player_1_id": f"p{2 * trial + 1}",
                        "player_0_is_human": True,
                        "player_1_is_human": True,
                    }
                )
            trial += 1
    pd.DataFrame(records).to_csv(path, index=False)
    print(f"wrote {path}: {len(records)} rows, {trial} trials")


def gen_2019_pickle(path):
    import pandas as pd

    from overcooked_ai_tpu.core.layout import from_layout_name

    spec = from_layout_name("cramped_room", old_dynamics=True)
    records = []
    for trial, seed in enumerate([10, 11]):
        rows = _roll(spec, 0.0, horizon=160, seed=seed)
        for t, (sd, acts, sparse) in enumerate(rows):
            records.append(
                {
                    "state": json.dumps(sd),
                    "joint_action": json.dumps(
                        [_ACTION_JSON[a] for a in acts]
                    ),
                    "reward": sparse,
                    "cur_gameloop": t,
                    "layout_name": "cramped_room",
                    "trial_id": f"t{trial}",
                    "player_0_is_human": True,
                    "player_1_is_human": True,
                }
            )
    pd.DataFrame(records).to_pickle(path)
    print(f"wrote {path}: {len(records)} rows")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        from overcooked_ai_tpu.utils.platform import force_platform

        force_platform(args.platform)
    os.makedirs(OUT_DIR, exist_ok=True)
    gen_2020_csv(os.path.join(OUT_DIR, "synthetic_2020_hh_trials.csv"))
    gen_2019_pickle(
        os.path.join(OUT_DIR, "synthetic_2019_hh_trials_all.pickle")
    )


if __name__ == "__main__":
    main()
