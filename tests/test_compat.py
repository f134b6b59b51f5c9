"""Legacy human-data compatibility tests."""

import json

import numpy as np
import pytest

from overcooked_ai_tpu.human_data.compat import (
    forward_port_2019_dataframe,
    repair_old_dynamics_rows,
)


def test_forward_port_2019():
    pd = pytest.importorskip("pandas")
    df = pd.DataFrame(
        {
            "layout_name": ["a", "a", "b", "b"],
            "workerid_num": [1, 1, 1, 1],
            "is_leader": [True, True, True, False],
            "state": ["{}"] * 4,
            "joint_action": ["[]"] * 4,
        }
    )
    out = forward_port_2019_dataframe(df)
    assert "trial_id" in out.columns
    assert out["trial_id"].tolist() == [0, 0, 1]  # follower row dropped
    assert out["player_0_is_human"].all() and out["player_1_is_human"].all()
    assert "workerid_num" not in out.columns


def test_repair_old_dynamics_inserts_interact():
    soup_started = {
        "players": [
            {"position": [2, 1], "orientation": [0, -1], "held_object": None},
            {"position": [3, 1], "orientation": [0, 1], "held_object": None},
        ],
        "objects": [
            {
                "name": "soup",
                "position": [2, 0],
                "_ingredients": [
                    {"name": "onion", "position": [2, 0]} for _ in range(3)
                ],
                "cooking_tick": 1,
                "_cooking_tick": 1,
                "is_idle": False,
                "is_cooking": True,
                "is_ready": False,
                "cook_time": 20,
            }
        ],
        "bonus_orders": [],
        "all_orders": [{"ingredients": ["onion"] * 3}],
        "timestep": 7,
    }
    rows = [
        {"state": json.dumps(soup_started), "joint_action": "[[0,0],[0,0]]"}
    ]
    repaired = repair_old_dynamics_rows(rows)
    assert len(repaired) == 2
    synthetic = json.loads(repaired[0]["state"])
    assert synthetic["objects"][0]["cooking_tick"] == -1
    actions = json.loads(repaired[0]["joint_action"])
    assert actions[0] == "interact"  # player 0 faces the pot
    assert actions[1] == [0, 0]
    # original row unchanged
    assert json.loads(repaired[1]["state"])["objects"][0]["cooking_tick"] == 1
