"""Host-side single-environment driver (the reference OvercookedEnv API).

A thin episodic wrapper over the jitted transition for interactive use
(gym adapter, web demo, notebooks). The batched scan path in core/env.py is
the performance path; this one optimizes for ergonomics: python ints in,
reference-style info dicts out (reference overcooked_env.py:33-666).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from overcooked_ai_tpu.core.constants import EVENT_TYPES
from overcooked_ai_tpu.core.layout import LayoutSpec, from_layout_name
from overcooked_ai_tpu.core.state import State, state_to_dict
from overcooked_ai_tpu.core.step import step

DEFAULT_HORIZON = 400


class OvercookedEnv:
    """Episodic single-env driver (reference OvercookedEnv equivalent)."""

    def __init__(self, spec: LayoutSpec, horizon: int = DEFAULT_HORIZON):
        self.spec = spec
        self.horizon = horizon
        self._layout = jax.tree.map(jnp.asarray, spec.layout)
        self._step = jax.jit(step)
        self.reset()

    @classmethod
    def from_layout_name(cls, name, horizon=DEFAULT_HORIZON, **overrides):
        return cls(from_layout_name(name, **overrides), horizon)

    def reset(self):
        self.state: State = jax.tree.map(
            jnp.asarray, self.spec.layout.start_state
        )
        self.game_stats = {
            "cumulative_sparse_rewards_by_agent": np.zeros(
                self.spec.num_players, np.int64
            ),
            "cumulative_shaped_rewards_by_agent": np.zeros(
                self.spec.num_players, np.int64
            ),
            **{k: [[] for _ in range(self.spec.num_players)] for k in EVENT_TYPES},
        }
        return self.state

    def is_done(self) -> bool:
        return int(self.state.t) >= self.horizon

    def step(self, joint_action):
        """joint_action: sequence of action indices (0..5). Returns
        (next_state, sparse_reward_sum, done, info) like the reference
        (overcooked_env.py:244-274)."""
        assert not self.is_done()
        actions = jnp.asarray(joint_action, jnp.int32)
        t_before = int(self.state.t)
        next_state, info = self._step(self._layout, self.state, actions)
        info = jax.device_get(info)
        self.state = next_state

        self.game_stats["cumulative_sparse_rewards_by_agent"] += np.asarray(
            info.sparse_reward
        )
        self.game_stats["cumulative_shaped_rewards_by_agent"] += np.asarray(
            info.shaped_reward
        )
        events = np.asarray(info.events)
        for e, name in enumerate(EVENT_TYPES):
            for p in range(self.spec.num_players):
                if events[e, p]:
                    self.game_stats[name][p].append(t_before)

        done = self.is_done()
        env_info = {
            "sparse_r_by_agent": np.asarray(info.sparse_reward).tolist(),
            "shaped_r_by_agent": np.asarray(info.shaped_reward).tolist(),
            "event_infos": {
                name: events[e].tolist() for e, name in enumerate(EVENT_TYPES)
            },
        }
        if done:
            env_info["episode"] = {
                "ep_game_stats": self.game_stats,
                "ep_sparse_r": int(
                    self.game_stats["cumulative_sparse_rewards_by_agent"].sum()
                ),
                "ep_shaped_r": int(
                    self.game_stats["cumulative_shaped_rewards_by_agent"].sum()
                ),
                "ep_length": int(self.state.t),
            }
        reward = int(np.asarray(info.sparse_reward).sum())
        return next_state, reward, done, env_info

    def state_dict(self):
        return state_to_dict(jax.device_get(self.state), self.spec)
