"""The committed eval-artifact checkpoints load and play (VERDICT r2
missing #4: a small known-good checkpoint in the repo for load/demo
tests; reference analogue: ppo/trained_example/checkpoint_000500).

Keeps the kind-string loader (`agents/loading.py`), the orbax checkpoint
format, and the BC msgpack format honest against the committed artifacts
-- a format break surfaces here, not in a demo session.
"""

import os

import numpy as np
import pytest

from overcooked_ai_tpu.agents.evaluation import run_agent_pair
from overcooked_ai_tpu.agents.loading import build_agent
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.planning.tables import build_motion_tables

ROOT = os.path.join(os.path.dirname(__file__), "..")
PPO_DIR = os.path.join(ROOT, "runs/eval_artifact/ppo_sp_cramped_room")
PPO_BC_DIR = os.path.join(ROOT, "runs/eval_artifact/ppo_bc_cramped_room")
BC_DIR = os.path.join(ROOT, "runs/eval_artifact/bc_proxy_cramped_room")
OLD_PPO_DIR = os.path.join(
    ROOT, "runs/eval_artifact_old/ppo_sp_cramped_room"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PPO_DIR), reason="eval artifact not present"
)


def test_committed_checkpoints_load_and_score():
    spec = from_layout_name("cramped_room")
    tables = build_motion_tables(spec.layout.terrain)
    ppo = build_agent(f"ppo:{PPO_DIR}", spec, tables)
    bc = build_agent(f"bc:{BC_DIR}", spec, tables)

    traj = run_agent_pair(
        spec, [ppo, ppo], num_games=4, horizon=400, seed=0,
        greedy_carry=True,
    )
    per_game = np.asarray(traj["sparse"]).sum(axis=(0, 1))
    # trained self-play scores ~126/game (EVAL_MATRIX.md); 60 is a loose
    # floor that still rules out a silently corrupted restore
    assert per_game.mean() >= 60, per_game

    traj = run_agent_pair(
        spec, [ppo, bc], num_games=4, horizon=400, seed=0,
        greedy_carry=True,
    )
    per_game = np.asarray(traj["sparse"]).sum(axis=(0, 1))
    assert per_game.mean() > 0, per_game  # BC pair cooks something


@pytest.mark.skipif(
    not os.path.isdir(PPO_BC_DIR), reason="PPO_BC artifact not present"
)
def test_committed_ppo_bc_checkpoint_scores_with_bc():
    """The headline protocol agent (PPO trained with a BC partner) loads
    and scores when PAIRED WITH BC -- the pairing it was trained for
    (reference evaluate.py:100-123)."""
    spec = from_layout_name("cramped_room")
    tables = build_motion_tables(spec.layout.terrain)
    ppo_bc = build_agent(f"ppo:{PPO_BC_DIR}", spec, tables)
    bc = build_agent(f"bc:{BC_DIR}", spec, tables)
    traj = run_agent_pair(
        spec, [ppo_bc, bc], num_games=4, horizon=400, seed=0,
        greedy_carry=True,
    )
    per_game = np.asarray(traj["sparse"]).sum(axis=(0, 1))
    assert per_game.mean() >= 60, per_game


@pytest.mark.skipif(
    not os.path.isdir(OLD_PPO_DIR),
    reason="old-dynamics artifact not present",
)
def test_committed_old_dynamics_checkpoint_loads():
    spec = from_layout_name("cramped_room", old_dynamics=True)
    tables = build_motion_tables(spec.layout.terrain)
    ppo = build_agent(f"ppo:{OLD_PPO_DIR}", spec, tables)
    traj = run_agent_pair(
        spec, [ppo, ppo], num_games=4, horizon=400, seed=0,
        greedy_carry=True,
    )
    per_game = np.asarray(traj["sparse"]).sum(axis=(0, 1))
    assert per_game.mean() >= 60, per_game


FC_PPO_BC_DIR = os.path.join(
    ROOT, "runs/eval_artifact/ppo_bc_forced_coordination"
)
FC_BC_DIR = os.path.join(
    ROOT, "runs/eval_artifact/bc_proxy_forced_coordination"
)


@pytest.mark.skipif(
    not os.path.isdir(FC_PPO_BC_DIR),
    reason="forced_coordination artifact not present",
)
def test_forced_coordination_handoff_artifacts_score():
    """forced_coordination REQUIRES counter hand-offs (dispensers and
    pots in disconnected rooms); the r5 proxy clones the trained PPO_SP
    pair instead of the hand-off-incapable greedy model (train_bc_proxy
    --from-ppo), making the PPO_BC leg non-degenerate there (was an
    all-zero row in both r4 matrices). Floors are loose versions of the
    EVAL_MATRIX.md cells (PPO_BC+BC 100, BC+BC 32)."""
    spec = from_layout_name("forced_coordination")
    tables = build_motion_tables(spec.layout.terrain)
    ppo_bc = build_agent(f"ppo:{FC_PPO_BC_DIR}", spec, tables)
    bc = build_agent(f"bc:{FC_BC_DIR}", spec, tables)
    traj = run_agent_pair(
        spec, [ppo_bc, bc], num_games=6, horizon=400, seed=0,
        greedy_carry=True,
    )
    per_game = np.asarray(traj["sparse"]).sum(axis=(0, 1))
    assert per_game.mean() >= 40, per_game
    traj = run_agent_pair(
        spec, [bc, bc], num_games=6, horizon=400, seed=0,
        greedy_carry=True,
    )
    per_game = np.asarray(traj["sparse"]).sum(axis=(0, 1))
    assert per_game.mean() > 0, per_game


def test_artifact_alias_npc():
    """`artifact:<name>` NPC kinds resolve to the committed eval-artifact
    checkpoint for the game's layout (the demo lobby's layout-generic
    trained partners; demo/game.py npc_from_kind)."""
    import json

    from overcooked_ai_tpu.demo.game import DemoGame, npc_from_kind

    policy = npc_from_kind("artifact:ppo_bc", "cramped_room")
    game = DemoGame(layout_name="cramped_room",
                    npc_policies={1: policy}, game_time=300)
    game.activate()
    for _ in range(5):
        out = game.tick()
    assert out is not None
    acts = [json.loads(r["joint_action"])[1] for r in game.get_data()]
    assert all(0 <= a <= 5 for a in acts)
