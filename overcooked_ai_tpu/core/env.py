"""Vectorized episode runner: the TPU-native OvercookedEnv.

The reference `OvercookedEnv` (reference overcooked_env.py:33-666) drives one
Python env object step-by-step. Here the environment *is* the batch axis:
`vmap(step)` runs thousands of envs in lockstep, `lax.scan` runs the horizon,
auto-reset keeps every lane full, and the whole rollout is one jit region
(the replacement for the reference's 30 Ray rollout-worker processes,
reference ppo_rllib_client.py:97).

Cumulative per-episode stats mirror `OvercookedEnv.game_stats`
(overcooked_env.py:308-319): cumulative sparse/shaped reward by agent and
per-event cumulative counts (the reference stores per-event timestep lists;
a fixed-shape equivalent -- counts plus optional full (T, E, P) event
tensors from `rollout` -- carries the same information).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from overcooked_ai_tpu.core.constants import NUM_EVENTS
from overcooked_ai_tpu.core.layout import Layout
from overcooked_ai_tpu.core.state import State
from overcooked_ai_tpu.core.step import StepInfo, step

DEFAULT_HORIZON = 400  # reference DEFAULT_ENV_PARAMS (overcooked_env.py:28)


class EnvParams(NamedTuple):
    horizon: jnp.ndarray  # () int32


class Timestep(NamedTuple):
    """Per-step outputs of the batched env (leading axis = batch)."""

    state: State  # post-transition state (pre-reset)
    obs_state: State  # state after auto-reset (what the policy sees next)
    sparse_reward: jnp.ndarray  # (P,) int32
    shaped_reward: jnp.ndarray  # (P,) int32
    events: jnp.ndarray  # (NUM_EVENTS, P) bool
    done: jnp.ndarray  # () bool
    reward: jnp.ndarray  # () int32  sum of sparse rewards (reference step
    #                      return, overcooked_env.py:273)


def reset(layout: Layout) -> State:
    """Start state for one env (reference get_standard_start_state,
    overcooked_mdp.py:1297-1305)."""
    return layout.start_state


def env_step(
    layout: Layout, state: State, actions: jnp.ndarray, horizon
) -> Timestep:
    """One env transition with episode-horizon termination and auto-reset."""
    next_state, info = step(layout, state, actions)
    done = next_state.t >= horizon
    obs_state = jax.tree.map(
        lambda fresh, cur: jnp.where(
            _bcast(done, cur.ndim), fresh, cur
        ),
        layout.start_state,
        next_state,
    )
    return Timestep(
        state=next_state,
        obs_state=obs_state,
        sparse_reward=info.sparse_reward,
        shaped_reward=info.shaped_reward,
        events=info.events,
        done=done,
        reward=jnp.sum(info.sparse_reward),
    )


def _bcast(x, ndim):
    return x.reshape((1,) * ndim) if ndim else x


# ---------------------------------------------------------------------------
# Batched rollout
# ---------------------------------------------------------------------------


def batch_reset(layout: Layout, batch_size: int) -> State:
    """Broadcast the start state across a batch axis."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(
            jnp.asarray(x)[None], (batch_size,) + jnp.asarray(x).shape
        ),
        layout.start_state,
    )


@functools.partial(jax.jit, static_argnames=("policy", "unroll"))
def rollout(
    layout: Layout,
    state: State,
    key: jax.Array,
    num_steps: int,
    policy: Callable,
    horizon: int = DEFAULT_HORIZON,
    unroll: int = 1,
):
    """Scan `num_steps` batched env steps under `policy`.

    policy(key, layout, state) -> (B, P) int32 actions. The env batch axis is
    the leading axis of every `state` leaf.

    Returns (final_state, traj) where traj leaves have leading axis T.
    """
    batched_step = jax.vmap(env_step, in_axes=(None, 0, 0, None))

    def body(carry, key_t):
        st = carry
        actions = policy(key_t, layout, st)
        ts = batched_step(layout, st, actions, horizon)
        return ts.obs_state, Timestep(
            state=ts.state,
            obs_state=ts.obs_state,
            sparse_reward=ts.sparse_reward,
            shaped_reward=ts.shaped_reward,
            events=ts.events,
            done=ts.done,
            reward=ts.reward,
        )

    keys = jax.random.split(key, num_steps)
    final_state, traj = jax.lax.scan(
        body, state, keys, unroll=unroll
    )
    return final_state, traj


@functools.partial(jax.jit, static_argnames=("num_steps", "unroll"))
def rollout_random(
    layout: Layout,
    state: State,
    key: jax.Array,
    num_steps: int,
    horizon: int = DEFAULT_HORIZON,
    unroll: int = 1,
):
    """Random-uniform-policy rollout returning only summed rewards + final
    state; the minimal-output benchmark loop (nothing materialized per step)."""
    num_players = state.pos.shape[1]
    batch = state.pos.shape[0]
    batched_step = jax.vmap(env_step, in_axes=(None, 0, 0, None))

    def body(carry, key_t):
        st, acc = carry
        actions = jax.random.randint(
            key_t, (batch, num_players), 0, 6, dtype=jnp.int32
        )
        ts = batched_step(layout, st, actions, horizon)
        return (ts.obs_state, acc + jnp.sum(ts.reward)), None

    keys = jax.random.split(key, num_steps)
    (final_state, total), _ = jax.lax.scan(
        body, (state, jnp.zeros((), jnp.int32)), keys, unroll=unroll
    )
    return final_state, total
