"""Game engine bridge for the web demo (reference overcooked_demo/server/
game.py:55-957, re-architected).

A `DemoGame` owns one interactive episode: human seats feed actions through
per-player queues (non-blocking with STAY default, like the reference's
human seats, game.py:545-555), NPC seats are driven by a policy callable
evaluated at tick time (the reference runs NPC inference on background
threads; here policies are jitted functions fast enough to call inline).
Ticks run at a fixed fps on a background thread in server.py.

Trajectories are recorded in the human-data schema (state JSON +
joint_action + reward per tick; reference game.py:576-593) so demo sessions
feed the BC pipeline directly.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from typing import Callable, Dict, Optional

import numpy as np

from overcooked_ai_tpu.core.constants import ACTION_STAY
from overcooked_ai_tpu.interop.single_env import OvercookedEnv


class DemoGame:
    def __init__(
        self,
        layout_name: str = "cramped_room",
        horizon: int = 400,
        npc_policies: Optional[Dict[int, Callable]] = None,
        game_time: Optional[float] = None,
    ):
        """npc_policies: seat index -> policy(state_dict, seat) -> action int.
        Seats without an NPC policy are human seats."""
        self.layout_name = layout_name
        self.env = OvercookedEnv.from_layout_name(layout_name, horizon)
        self.num_players = self.env.spec.num_players
        self.npc_policies = npc_policies or {}
        self.human_seats = [
            i for i in range(self.num_players) if i not in self.npc_policies
        ]
        self.action_queues = {
            i: queue.Queue(maxsize=5) for i in self.human_seats
        }
        self.lock = threading.Lock()
        self.score = 0
        self.active = False
        self.start_time = None
        self.game_time = game_time  # wall-clock limit (reference :480)
        self.trajectory = []
        self.tick_count = 0

    def activate(self):
        with self.lock:
            self.active = True
            self.start_time = time.time()

    def enqueue_action(self, seat: int, action: int):
        assert seat in self.action_queues, f"seat {seat} is not human"
        try:
            self.action_queues[seat].put_nowait(int(action))
        except queue.Full:
            pass

    def is_over(self) -> bool:
        if self.env.is_done():
            return True
        if self.game_time and self.start_time:
            return time.time() - self.start_time >= self.game_time
        return False

    def tick(self):
        """One game step: drain human actions (STAY default), query NPCs,
        advance the env (reference apply_actions, game.py:539-596)."""
        with self.lock:
            if not self.active or self.is_over():
                return None
            state_dict = self.env.state_dict()
            joint = []
            for i in range(self.num_players):
                if i in self.npc_policies:
                    joint.append(int(self.npc_policies[i](state_dict, i)))
                else:
                    try:
                        joint.append(self.action_queues[i].get_nowait())
                    except queue.Empty:
                        joint.append(ACTION_STAY)
            _, reward, done, info = self.env.step(joint)
            self.score += reward
            self.trajectory.append(
                {
                    "state": json.dumps(state_dict),
                    "joint_action": json.dumps(joint),
                    "reward": int(reward),
                    "score": int(self.score),
                    "cur_gameloop": self.tick_count,
                    "layout_name": self.layout_name,
                    "time_elapsed": time.time() - (self.start_time or 0),
                }
            )
            self.tick_count += 1
            return {"done": done or self.is_over(), "reward": reward}

    def get_state_payload(self):
        """The `state_pong` payload (reference app.py:645-647)."""
        with self.lock:
            remaining = None
            if self.game_time and self.start_time:
                remaining = max(
                    0, int(self.game_time - (time.time() - self.start_time))
                )
            return {
                "state": self.env.state_dict(),
                "score": self.score,
                "time_left": remaining,
                "terrain": self.env.spec.terrain_chars,
                "done": self.is_over(),
            }

    def get_data(self):
        """Recorded trajectory rows in the human-data schema."""
        with self.lock:
            return list(self.trajectory)


def greedy_npc(layout_name: str):
    """Build a greedy-human-model NPC policy for a layout (demo AI)."""
    import jax
    import jax.numpy as jnp

    from overcooked_ai_tpu.agents.agents import (
        GreedyTables,
        make_greedy_human_model,
    )
    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.core.state import state_from_dict
    from overcooked_ai_tpu.planning.greedy_tables import (
        build_first_action_table,
    )
    from overcooked_ai_tpu.planning.tables import build_motion_tables

    spec = from_layout_name(layout_name)
    mt = build_motion_tables(spec.layout.terrain)
    fa = build_first_action_table(spec.layout.terrain)
    greedy = make_greedy_human_model(
        spec, GreedyTables(jnp.asarray(mt.feature_cost), jnp.asarray(fa))
    )
    layout = jax.tree.map(jnp.asarray, spec.layout)
    greedy_jit = jax.jit(greedy, static_argnames=("agent_index",))
    rng = np.random.RandomState(0)
    prev = jnp.full((spec.num_players, 3), -1, jnp.int32)

    def policy(state_dict, seat):
        nonlocal prev
        state = jax.tree.map(jnp.asarray, state_from_dict(state_dict, spec))
        key = jax.random.PRNGKey(rng.randint(2**31))
        action = int(greedy_jit(key, layout, state, seat, prev))
        prev = jnp.concatenate([state.pos, state.orient[:, None]], axis=1)
        return action

    return policy
