"""Recurrent checkpoints load as stateful agents (reference use_lstm
rllib checkpoints -> agents via load_agent, rllib.py:788-854).

Covers: save_checkpoint's use_lstm metadata, the ppo: loader's LSTM
branch (AgentFn.stateful with the (c, h) carry), carry threading through
run_agent_pair's batched scan, and the demo NPC path's per-step carry."""

import numpy as np
import pytest

import jax

from overcooked_ai_tpu.agents.evaluation import run_agent_pair
from overcooked_ai_tpu.agents.loading import build_agent
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.planning.tables import build_motion_tables
from overcooked_ai_tpu.training.checkpoint import save_checkpoint
from overcooked_ai_tpu.training.ppo import PPOConfig
from overcooked_ai_tpu.training.ppo_lstm import make_ppo_lstm


@pytest.fixture(scope="module")
def lstm_ckpt(tmp_path_factory):
    spec = from_layout_name("cramped_room")
    cfg = PPOConfig(
        num_envs=2, horizon=40, sgd_minibatch_size=100, num_sgd_iter=1,
        lr=1e-4,
    )
    init_fn, train_it = make_ppo_lstm(spec, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    ts, _ = train_it(ts)
    d = tmp_path_factory.mktemp("lstm_ckpt")
    save_checkpoint(
        str(d), ts, cfg, step=1,
        extra={"use_lstm": True, "layout": "cramped_room"},
    )
    return spec, str(d)


def test_lstm_checkpoint_loads_as_stateful_agent(lstm_ckpt):
    spec, ckpt_dir = lstm_ckpt
    tables = build_motion_tables(spec.layout.terrain)
    agent = build_agent(f"ppo:{ckpt_dir}", spec, tables)
    assert agent.stateful
    c, h = agent.init_carry(3)
    assert c.shape[0] == 3 and h.shape[0] == 3

    # batched rollout: hidden state threads through the scan, paired with
    # a stateless partner and with itself
    greedy = build_agent("greedy", spec, tables)
    for pair in ([agent, greedy], [agent, agent]):
        traj = run_agent_pair(
            spec, pair, num_games=3, horizon=30, seed=0, greedy_carry=True
        )
        assert np.asarray(traj["actions"]).shape == (30, 2, 3)
        assert np.isfinite(np.asarray(traj["sparse"]).sum())


def test_lstm_npc_in_demo(lstm_ckpt):
    spec, ckpt_dir = lstm_ckpt
    from overcooked_ai_tpu.demo.game import DemoGame, npc_from_kind

    npc = npc_from_kind(f"ppo:{ckpt_dir}", "cramped_room")
    game = DemoGame(
        layout_name="cramped_room", npc_policies={1: npc}, game_time=300
    )
    game.claimed_seats = {0}
    game.activate()
    for _ in range(6):
        out = game.tick()
        assert out is not None
    assert game.tick_count == 6