"""Agent-pair rollouts and the canonical trajectory format.

The reference AgentEvaluator (reference agents/benchmarking.py:32-578)
drives Python agent objects step-by-step and collects a dict-of-lists
trajectory (DEFAULT_TRAJ_KEYS, overcooked_trajectory.py:14-42). Here the
rollout is one jitted scan over the horizon with all agents as pure
functions and per-agent carries; games are vmapped over a batch. The host
converts the resulting array trajectory into the reference schema (state
dicts, action tuples) for interchange, JSON save/load included.
"""

from __future__ import annotations

import json
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from overcooked_ai_tpu.core.constants import (
    ACTION_INTERACT,
    ACTION_STAY,
    DIRECTION_TO_TUPLE,
    EVENT_TYPES,
)
from overcooked_ai_tpu.core.env import batch_reset
from overcooked_ai_tpu.core.state import State, state_to_dict
from overcooked_ai_tpu.core.step import step as env_transition

# reference DEFAULT_TRAJ_KEYS (overcooked_trajectory.py:14-42)
TIMESTEP_TRAJ_KEYS = ["ep_states", "ep_actions", "ep_rewards", "ep_dones", "ep_infos"]
EPISODE_TRAJ_KEYS = ["ep_returns", "ep_lengths", "mdp_params", "env_params"]
DEFAULT_TRAJ_KEYS = TIMESTEP_TRAJ_KEYS + EPISODE_TRAJ_KEYS + ["metadatas"]


class AgentFn(NamedTuple):
    """A functional agent: policy(key, layout, state, agent_index, carry)
    -> (action, new_carry); init_carry(batch) -> pytree.

    stateful=False (scripted/feed-forward agents): `carry` is the SHARED
    (P, 3) prev pos/orient the rollout loop maintains for the greedy
    model's unstuck logic; the policy's returned carry is ignored.
    stateful=True (e.g. recurrent nets): `carry` is the agent's OWN state
    -- init_carry(batch) seeds it and the rollout threads the returned
    carry back in each step (reference recurrent policies carrying rllib
    RNN state, ppo_rllib.py:89-237)."""

    policy: Callable
    init_carry: Callable = staticmethod(lambda batch: jnp.zeros((batch,)))
    stateful: bool = False


def stateless(fn):
    """Wrap a carry-less policy fn(key, layout, state, agent_index)."""
    return AgentFn(
        policy=lambda key, layout, state, idx, carry: (
            fn(key, layout, state, idx),
            carry,
        )
    )


def greedy_agent_fn(greedy):
    """AgentFn for make_greedy_human_model (carry = prev (P,3) pos/or)."""

    def policy(key, layout, state, idx, carry):
        action = greedy(key, layout, state, idx, carry)
        return action, carry

    def init_carry(batch):
        # filled by the rollout loop after each step
        return None

    return AgentFn(policy=policy, init_carry=init_carry)


def run_agent_pair(
    spec,
    agents: Sequence[AgentFn],
    num_games: int = 1,
    horizon: int = 400,
    seed: int = 0,
    greedy_carry: bool = False,
):
    """Roll out an agent pair for `num_games` parallel games.

    greedy_carry=True threads the (P, 3) previous pos/orient carry that the
    greedy human model's auto-unstuck logic needs (shared by all agents).

    Returns a host-side dict of stacked arrays:
      states: State pytree with leading (T, ...) and batch minor
      actions (T, P, B), sparse/shaped (T, P, B), events (T, E, P, B)
    """
    layout = jax.tree.map(jnp.asarray, spec.layout)
    num_players = spec.num_players
    assert len(agents) == num_players
    B = num_games

    batched_transition = jax.vmap(
        env_transition, in_axes=(None, -1, -1), out_axes=-1
    )

    stateful = [bool(getattr(a, "stateful", False)) for a in agents]

    def single_actions(key, state, prev_pos_or, carries):
        keys = jax.random.split(key, num_players)
        acts = []
        new_carries = []
        for i, agent in enumerate(agents):
            c = carries[i] if stateful[i] else prev_pos_or
            a, nc = agent.policy(keys[i], layout, state, i, c)
            acts.append(a)
            new_carries.append(nc if stateful[i] else None)
        return jnp.stack(acts), tuple(new_carries)

    batched_actions = jax.vmap(
        single_actions, in_axes=(0, -1, -1, 0), out_axes=(-1, 0)
    )

    @jax.jit
    def rollout(key):
        state0 = batch_reset(layout, B)
        prev0 = jnp.full((num_players, 3, B), -1, jnp.int32)
        carries0 = tuple(
            agents[i].init_carry(B) if stateful[i] else None
            for i in range(num_players)
        )

        def body(carry, key_t):
            state, prev, carries = carry
            keys_b = jax.random.split(key_t, B)
            actions, carries = batched_actions(keys_b, state, prev, carries)
            next_state, info = batched_transition(layout, state, actions)
            new_prev = jnp.concatenate(
                [state.pos, state.orient[:, None]], axis=1
            )
            out = dict(
                state=next_state,
                actions=actions,
                sparse=info.sparse_reward,
                shaped=info.shaped_reward,
                events=info.events,
            )
            return (next_state, new_prev, carries), out

        keys = jax.random.split(key, horizon)
        (final_state, _, _), traj = jax.lax.scan(
            body, (state0, prev0, carries0), keys
        )
        return traj

    traj = jax.device_get(rollout(jax.random.PRNGKey(seed)))
    return traj


class VariableMDPEvaluator:
    """Evaluate agent pairs over per-game (re)generated MDPs (reference
    AgentEvaluator.from_mdp_params_{finite,infinite} + from_mdp_lst,
    benchmarking.py:76-201).

    Each game samples (finite) or freshly generates (infinite) a layout,
    rebuilds the agents for it via `agent_factory(spec) -> [AgentFn, ...]`
    (the reference rebuilds its MLAM per sampled MDP the same way), and
    rolls out one episode. Use training.ppo's pool mode for high-throughput
    variable-MDP rollouts; this is the evaluation-protocol path.
    """

    def __init__(self, spec_fn):
        self._spec_fn = spec_fn  # (game_index, rng) -> LayoutSpec

    @staticmethod
    def from_mdp_lst(specs, sampling_freq=None):
        """Finite pool with optional sampling frequencies
        (reference from_mdp_lst, benchmarking.py:177-201)."""
        specs = list(specs)
        if sampling_freq is not None:
            sampling_freq = np.asarray(sampling_freq, float)
            assert sampling_freq.shape == (len(specs),)

        def spec_fn(_g, rng):
            return specs[rng.choice(len(specs), p=sampling_freq)]

        return VariableMDPEvaluator(spec_fn)

    @staticmethod
    def from_mdp_params_finite(
        num_mdp,
        mdp_params=None,
        outer_shape=(5, 4),
        mdp_params_schedule_fn=None,
        seed=0,
    ):
        """Pre-generate `num_mdp` layouts, sample one per game
        (reference from_mdp_params_finite, benchmarking.py:96-137)."""
        assert np.isfinite(num_mdp) and num_mdp > 0
        from overcooked_ai_tpu.core.layout_generator import (
            spec_gen_fn_from_dict,
        )

        gen = spec_gen_fn_from_dict(
            mdp_params, outer_shape, mdp_params_schedule_fn, seed
        )
        return VariableMDPEvaluator.from_mdp_lst(
            [gen() for _ in range(int(num_mdp))]
        )

    @staticmethod
    def from_mdp_params_infinite(
        mdp_params=None,
        outer_shape=(5, 4),
        mdp_params_schedule_fn=None,
        seed=0,
    ):
        """A fresh layout for every game -- per-reset regeneration
        (reference from_mdp_params_infinite, benchmarking.py:65-95)."""
        from overcooked_ai_tpu.core.layout_generator import (
            spec_gen_fn_from_dict,
        )

        gen = spec_gen_fn_from_dict(
            mdp_params, outer_shape, mdp_params_schedule_fn, seed
        )
        return VariableMDPEvaluator(lambda _g, _rng: gen())

    def evaluate(
        self,
        agent_factory,
        num_games=1,
        horizon=400,
        seed=0,
        greedy_carry=False,
    ):
        """Returns a list of per-game dicts {spec, traj, ep_return}."""
        rng = np.random.RandomState(seed)
        out = []
        for g in range(num_games):
            spec = self._spec_fn(g, rng)
            agents = agent_factory(spec)
            traj = run_agent_pair(
                spec,
                agents,
                num_games=1,
                horizon=horizon,
                seed=seed + g,
                greedy_carry=greedy_carry,
            )
            out.append(
                {
                    "spec": spec,
                    "traj": traj,
                    "ep_return": int(np.sum(traj["sparse"])),
                }
            )
        return out


def trajectories_to_reference_format(spec, traj, horizon=400):
    """Convert a run_agent_pair result to the reference trajectory dict
    (reference get_rollouts, overcooked_env.py:485-585)."""
    actions = traj["actions"]  # (T, P, B)
    T, P, B = actions.shape
    index_to_action = [
        DIRECTION_TO_TUPLE[0],
        DIRECTION_TO_TUPLE[1],
        DIRECTION_TO_TUPLE[2],
        DIRECTION_TO_TUPLE[3],
        (0, 0),
        "interact",
    ]

    trajectories = {k: [] for k in DEFAULT_TRAJ_KEYS}
    # Reference schema: ep_states[t] is the state the joint action
    # ep_actions[t] was taken IN (s_t, a_t, r_t) -- overcooked_env.py:425-470.
    # The rollout records post-transition states, so prepend the start state
    # and drop the final one.
    start_dict = state_to_dict(
        jax.tree.map(np.asarray, spec.layout.start_state), spec
    )
    for b in range(B):
        ep_actions = [
            tuple(index_to_action[int(actions[t, p, b])] for p in range(P))
            for t in range(T)
        ]
        sparse_t = traj["sparse"][..., b].sum(axis=1)  # (T,)
        state_dicts = [start_dict]
        for t in range(T - 1):
            st = jax.tree.map(lambda x: np.asarray(x[t, ..., b]), _traj_state(traj))
            state_dicts.append(state_to_dict(st, spec))
        trajectories["ep_states"].append(state_dicts)
        trajectories["ep_actions"].append(ep_actions)
        trajectories["ep_rewards"].append(sparse_t.tolist())
        trajectories["ep_dones"].append(
            [t == T - 1 for t in range(T)]
        )
        trajectories["ep_infos"].append([{} for _ in range(T)])
        trajectories["ep_returns"].append(int(sparse_t.sum()))
        trajectories["ep_lengths"].append(T)
        trajectories["mdp_params"].append({"layout_name": spec.name})
        trajectories["env_params"].append({"horizon": horizon})
    trajectories["metadatas"] = {}
    return trajectories


def _traj_state(traj):
    return traj["state"]


def game_stats_from_traj(traj, game_index=0):
    """Reference game_stats equivalent (overcooked_env.py:308-319,382-401):
    cumulative rewards by agent + per-event timestep lists."""
    b = game_index
    sparse = traj["sparse"][..., b]  # (T, P)
    shaped = traj["shaped"][..., b]
    events = traj["events"][..., b]  # (T, E, P)
    stats = {
        "cumulative_sparse_rewards_by_agent": sparse.sum(axis=0),
        "cumulative_shaped_rewards_by_agent": shaped.sum(axis=0),
    }
    for e, name in enumerate(EVENT_TYPES):
        stats[name] = [
            np.nonzero(events[:, e, p])[0].tolist()
            for p in range(sparse.shape[1])
        ]
    return stats


def _action_to_index(a):
    """Reference Action.ACTION_TO_INDEX equivalent for interchange tuples."""
    if isinstance(a, str):
        assert a == "interact"
        return ACTION_INTERACT
    a = tuple(a)
    if a == (0, 0):
        return ACTION_STAY
    for d in range(4):
        if DIRECTION_TO_TUPLE[d] == a:
            return d
    raise ValueError(f"unknown action {a!r}")


def check_trajectories(trajectories, spec, verbose: bool = False):
    """Validate a reference-format trajectory dict by replaying the dynamics.

    Mirror of AgentEvaluator.check_trajectories (reference
    benchmarking.py:324-414, `_check_trajectories_dynamics` :365): for every
    consecutive (s_t, a_t, s_{t+1}) assert that stepping s_t with a_t
    reproduces s_{t+1} exactly and that the recorded reward matches the
    summed sparse reward. Raises AssertionError on any divergence.
    """
    from overcooked_ai_tpu.core.state import (
        canonical_state_dict,
        state_from_dict,
    )

    layout = jax.tree.map(jnp.asarray, spec.layout)
    step_jit = jax.jit(env_transition)
    for keys in (TIMESTEP_TRAJ_KEYS, EPISODE_TRAJ_KEYS):
        for k in keys:
            assert k in trajectories, f"missing trajectory key {k}"
    n_eps = len(trajectories["ep_states"])
    for b in range(n_eps):
        states = trajectories["ep_states"][b]
        acts = trajectories["ep_actions"][b]
        rews = trajectories["ep_rewards"][b]
        assert len(states) == len(acts) == len(rews), (
            f"episode {b}: inconsistent lengths"
        )
        for t in range(len(states) - 1):
            st = state_from_dict(states[t], spec)
            joint = jnp.asarray(
                [_action_to_index(a) for a in acts[t]], jnp.int32
            )
            nxt, info = step_jit(
                layout, jax.tree.map(jnp.asarray, st), joint
            )
            got = canonical_state_dict(
                state_to_dict(jax.tree.map(np.asarray, nxt), spec)
            )
            want = canonical_state_dict(states[t + 1])
            assert got == want, (
                f"episode {b} step {t}: replayed state diverges\n"
                f"got:  {got}\nwant: {want}"
            )
            reward = int(np.sum(np.asarray(info.sparse_reward)))
            assert reward == int(rews[t]), (
                f"episode {b} step {t}: reward {reward} != {rews[t]}"
            )
        if verbose:
            print(f"episode {b}: {len(states)} states consistent")


def save_trajectories(trajectories, path):
    with open(path, "w") as f:
        json.dump(trajectories, f, default=_json_default)


def load_trajectories(path):
    with open(path) as f:
        return json.load(f)


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, tuple):
        return list(o)
    raise TypeError(f"not serializable: {type(o)}")


def get_empty_trajectory():
    """Reference overcooked_trajectory.get_empty_trajectory (:44-46)."""
    return {k: [] if k != "metadatas" else {} for k in DEFAULT_TRAJ_KEYS}


def append_trajectories(traj_one, traj_two):
    """Concatenate two reference-format trajectory dicts (reference
    overcooked_trajectory.append_trajectories, :49-76; drops metadatas)."""
    if not traj_one and not traj_two:
        return {}
    traj_one = traj_one or get_empty_trajectory()
    traj_two = traj_two or get_empty_trajectory()
    if set(traj_one.keys()) != set(DEFAULT_TRAJ_KEYS) or set(
        traj_two.keys()
    ) != set(DEFAULT_TRAJ_KEYS):
        raise ValueError("trajectories must have the standard key set")
    out = {"metadatas": {}}
    for k in DEFAULT_TRAJ_KEYS:
        if k != "metadatas":
            out[k] = list(traj_one[k]) + list(traj_two[k])
    return out


def get_discounted_rewards(trajectories, gamma):
    """Per-episode discounted return (reference OvercookedEnv.
    get_discounted_rewards, overcooked_env.py:591-605)."""
    rews = np.asarray(trajectories["ep_rewards"], dtype=float)
    if rews.ndim == 3:  # (games, T, P) per-agent rewards -> summed
        rews = rews.sum(-1)
    horizon = rews.shape[1]
    discount = gamma ** np.arange(horizon)
    return np.sum(rews[:, :horizon] * discount, axis=1)


def proportion_stuck_time(trajectories, agent_idx, stuck_time=3):
    """Fraction of steps the agent's (pos, orient) was unchanged over the
    trailing `stuck_time` window (reference proportion_stuck_time,
    overcooked_env.py:637-666). ep_states entries are state dicts."""
    stuck_matrix = []
    for ep, length in zip(
        trajectories["ep_states"], trajectories["ep_lengths"]
    ):
        flags = []
        for t in range(stuck_time, int(length)):
            window = ep[t - stuck_time : t + 1]
            pos_or = {
                (
                    tuple(s["players"][agent_idx]["position"]),
                    tuple(s["players"][agent_idx]["orientation"]),
                )
                for s in window
            }
            flags.append(len(pos_or) == 1)
        stuck_matrix.append(np.mean(flags) if flags else 0.0)
    return np.mean(stuck_matrix)
