"""On-device PPO self-play: rollout + learner fused in one jit region.

Replaces the reference's Ray RLlib stack (reference rllib/rllib.py:656-782:
30 CPU rollout workers feeding a central PPOTrainer) with an anakin-style
actor-learner: the vectorized env, the lossless encoder, action sampling,
GAE, and minibatch SGD all live on the TPU; one `train_iteration` call is
one `trainer.train()` equivalent.

Faithful to the reference's algorithm and hyperparameters:
  * reward_i = summed sparse reward + factor * dense_i, dense = per-agent
    shaped events or the potential difference (OvercookedMultiAgent.step,
    rllib.py:293-342)
  * linear annealing of the reward-shaping factor and entropy coefficient
    by env timesteps (rllib.py:283-291, ppo_rllib_client.py:148-150)
  * PPO-clip + adaptive-KL loss, value clipping, advantage standardization,
    Adam + global-norm grad clip (RLlib PPO tf policy semantics; defaults
    from ppo_rllib_client.py:95-177)
  * rollout fragment = horizon = 400: each iteration collects whole
    episodes from the standard start state, terminal at the horizon
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from overcooked_ai_tpu.core.encoding import lossless_encode
from overcooked_ai_tpu.core.env import batch_reset
from overcooked_ai_tpu.core.layout import Layout
from overcooked_ai_tpu.core.step import step as env_transition
from overcooked_ai_tpu.training.networks import NetConfig, PPONet


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Defaults = reference production config (ppo_rllib_client.py:95-233)."""

    num_envs: int = 30  # train_batch_size / rollout length
    horizon: int = 400
    lr: float = 5e-5
    grad_clip: float = 0.1
    gamma: float = 0.99
    lmbda: float = 0.98
    vf_loss_coeff: float = 1e-4
    vf_clip_param: float = 10.0  # rllib default
    entropy_coeff_start: float = 0.2
    entropy_coeff_end: float = 0.1
    entropy_coeff_horizon: float = 3e5
    kl_coeff: float = 0.2
    kl_target: float = 0.01  # rllib default
    clip_param: float = 0.05
    num_sgd_iter: int = 8
    sgd_minibatch_size: int = 2000  # in env steps (x2 agents = samples)
    reward_shaping_factor: float = 1.0
    reward_shaping_horizon: float = float("inf")
    use_phi: bool = False
    # phi_event_mix: with use_phi, dense reward = delta-phi PLUS the event
    # shaping (both scaled by the annealed shaping factor). The reference's
    # production default (pure delta-phi) never lifts off -- its landscape
    # penalizes potting (PHI_STUDY.md) -- while events alone train well;
    # the mix keeps phi's global progress signal AND the event curriculum,
    # making --use-phi deliver soups at production scale.
    phi_event_mix: bool = False
    # PPO+BC: piecewise-linear (t, bc_factor) schedule; bc_factor is the
    # per-episode probability the partner seat is the BC policy
    # (reference OvercookedMultiAgent bc_schedule, rllib.py:262-281,370-385)
    bc_schedule: tuple = ((0, 0.0), (float("inf"), 0.0))
    # Fused rollout: run the env transition + events + shaped rewards +
    # 26-layer lossless encoding as ONE pallas kernel per step
    # (ops/fused_train.py) instead of the XLA scan path. None = auto
    # (enabled on single-layout, meshless runs whose batch is a multiple
    # of 128 lanes); True = require (raises if the batch is incompatible);
    # False = always use the XLA path. Bit-exact with the XLA path -- the
    # two produce identical trajectories for the same seed
    # (tests/test_ppo_fused.py).
    fused: Optional[bool] = None
    fused_block_b: int = 1024  # env lanes per pallas program instance
    net: NetConfig = NetConfig()

    @property
    def train_batch_size(self):
        return self.num_envs * self.horizon


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    key: jax.Array
    env_steps: jnp.ndarray  # () float32 total env timesteps sampled
    kl_coeff: jnp.ndarray  # () float32 adaptive KL coefficient


class IterMetrics(NamedTuple):
    episode_sparse_reward: jnp.ndarray  # mean per-episode summed sparse reward
    episode_shaped_reward: jnp.ndarray  # mean per-episode summed shaped reward
    # mean per-episode MIXED reward summed over both agents -- rllib's
    # episode_reward_mean, the metric behind every reference CI threshold
    # ("average_total_reward", ppo_rllib_client.py:408-411):
    # sum_agents(sparse_team + factor * dense_agent)
    episode_total_reward: jnp.ndarray
    policy_loss: jnp.ndarray
    vf_loss: jnp.ndarray
    kl: jnp.ndarray
    entropy: jnp.ndarray
    kl_coeff: jnp.ndarray
    reward_shaping_factor: jnp.ndarray
    entropy_coeff: jnp.ndarray
    bc_factor: jnp.ndarray  # scheduled BC-partner probability this iter
    bc_sample_fraction: jnp.ndarray  # fraction of samples masked out as BC


def _anneal(start_v, curr_t, end_t, end_v=0.0, start_t=0.0):
    """Reference OvercookedMultiAgent._anneal (rllib.py:283-291)."""
    if end_t == 0 or end_t == float("inf"):
        return jnp.asarray(start_v, jnp.float32)
    frac = jnp.maximum(1.0 - (curr_t - start_t) / (end_t - start_t), 0.0)
    return frac * start_v + (1.0 - frac) * end_v


def _bc_factor_at(schedule, t):
    """Piecewise-linear bc_factor (reference anneal_bc_factor, rllib.py:370)."""
    factor = jnp.asarray(schedule[0][1], jnp.float32)
    for (t0, v0), (t1, v1) in zip(schedule[:-1], schedule[1:]):
        if t1 == float("inf"):
            seg = jnp.asarray(v0, jnp.float32)
        else:
            frac = jnp.clip((t - t0) / max(t1 - t0, 1e-9), 0.0, 1.0)
            seg = (1 - frac) * v0 + frac * v1
        factor = jnp.where(t >= t0, seg, factor)
    return factor


def bc_seat_mask(k_bc, k_seat, bc_factor, num_players, batch):
    """Per-episode BC-partner seats: each env lane flips a coin
    (p = bc_factor) for whether one uniformly-chosen seat is BC-controlled
    (reference _populate_agents coin flip + shuffle, rllib.py:262-281).
    Returns (P, B) bool; at most one True per column."""
    is_bc = jax.random.uniform(k_bc, (batch,)) < bc_factor
    seat = jax.random.randint(k_seat, (batch,), 0, num_players)
    return (
        jnp.arange(num_players)[:, None] == seat[None, :]
    ) & is_bc[None, :]


def make_ppo(
    spec, config: PPOConfig, potential_fn=None, bc_policy=None, mesh=None
):
    """Build (init_fn, train_iteration_fn) for a layout spec.

    spec: a single LayoutSpec, OR a sequence of same-grid-shape LayoutSpecs
    -- the variable-MDP training mode (reference
    ppo_rllib_from_params_client.py:78-179): every iteration each env lane
    samples a fresh layout from the pool, the vectorized equivalent of the
    reference's per-reset MDP regeneration (num_mdp=inf). Since one
    iteration collects exactly one episode per lane, per-iteration
    resampling == per-episode regeneration.

    mesh: optional jax.sharding.Mesh with a "dp" axis. The env batch
    (minor axis) is shard-constrained over it; params stay replicated and
    XLA inserts the gradient all-reduce (see parallel/mesh.py).

    potential_fn(layout, state) -> (B,) float phi values; required when
    config.use_phi (dense reward = phi(s') - phi(s), rllib.py:314-319).
    In pool mode the signature is potential_fn(pool_idx, lane_layouts,
    state) -> (B,) (see core.potential.make_potential_fn_pool).

    bc_policy(params-free): batched fn (key, layout, state_batchminor) ->
    (P, B) int32 actions for every seat; used for BC-partner episodes when
    config.bc_schedule gives a nonzero bc_factor. Per episode, each env
    lane flips a coin (p = bc_factor) for whether one (uniformly chosen)
    seat is BC-controlled; BC-controlled samples are masked out of the PPO
    loss (reference policies_to_train={"ppo"}, rllib.py:720-760).
    """
    pool_mode = isinstance(spec, (list, tuple))
    if pool_mode:
        from overcooked_ai_tpu.core.layout_generator import stack_layouts

        specs = list(spec)
        spec = specs[0]
        layout_pool = stack_layouts(specs)  # leaves (..., N)
        n_pool = len(specs)
    layout = jax.tree.map(jnp.asarray, spec.layout)
    num_players = spec.num_players
    assert num_players == 2, "PPO self-play is 2-player (reference parity)"
    net = PPONet(config.net)
    height, width = spec.height, spec.width
    B = config.num_envs
    T = config.horizon
    if config.use_phi:
        assert potential_fn is not None, "use_phi requires a potential_fn"

    # ---- fused-rollout eligibility (pallas training-step kernel) ----
    # The kernel folds the batch as (B // lanes, lanes) vregs; it needs B
    # divisible by both the lane fold and the program tile. Pool mode uses
    # the dynamic-terrain kernel (ops/fused_pool.py), which additionally
    # needs the recipe tables / shaping params / old_dynamics uniform
    # across the pool (check_pool_uniform) — every LayoutGenerator pool
    # qualifies; a hand-built mixed-recipe pool falls back to XLA. With
    # a dp mesh the kernel runs under shard_map: each device launches its
    # own pallas grid over its batch shard (B/n_dp envs), so the LOCAL
    # batch must satisfy the divisibility rules.
    n_dp = int(mesh.shape["dp"]) if mesh is not None else 1
    B_local = B // n_dp if B % n_dp == 0 else 0
    fused_block_b = config.fused_block_b
    if B_local and B_local % fused_block_b != 0:
        fused_block_b = B_local
    from overcooked_ai_tpu.ops.fused_rollout import _lanes_for

    _lanes = _lanes_for(fused_block_b)
    pool_uniform = True
    if pool_mode:
        from overcooked_ai_tpu.ops.fused_pool import check_pool_uniform

        try:
            check_pool_uniform(specs)
        except AssertionError:
            pool_uniform = False
    fused_ok = (
        pool_uniform
        and B_local > 0
        and B_local % _lanes == 0
        and B_local % fused_block_b == 0
    )
    # The Mosaic kernel only lowers on TPU; elsewhere it needs interpret
    # mode (cpu). The real chip may report an experimental platform name
    # (e.g. "axon"), so sniff the device kind too. On any other backend
    # (gpu, ...) auto mode must fall back to the XLA path.
    _backend = jax.default_backend()
    _dev_kind = jax.devices()[0].device_kind if jax.devices() else ""
    _fused_backend_ok = (
        _backend in ("cpu", "tpu") or "tpu" in _dev_kind.lower()
    )
    if config.fused is None:
        fused_enabled = fused_ok and B_local % 128 == 0 and _fused_backend_ok
    elif config.fused:
        if not fused_ok:
            raise ValueError(
                "config.fused=True but the fused rollout kernel cannot run "
                f"this configuration (pool_uniform={pool_uniform}, "
                f"n_dp={n_dp}, B={B}, block_b={fused_block_b}, "
                f"lanes={_lanes}); use fused=None/False, fix the batch, or "
                "(pool mode) make the pool's recipe tables uniform"
            )
        fused_enabled = True
    else:
        fused_enabled = False
    # Off the TPU (unit tests, CPU smoke runs) the kernel runs in pallas
    # interpret mode -- same results, no Mosaic. The real chip may report
    # an experimental platform name (e.g. "axon"), so test for cpu.
    fused_interpret = jax.default_backend() == "cpu"

    layout_axis = -1 if pool_mode else None
    encode = jax.vmap(
        lambda lay, s: lossless_encode(lay, s, horizon=T),
        in_axes=(layout_axis, -1),
        out_axes=0,
    )

    def obs_of(lay, state):
        # (B, P, 26, H, W) -> (P*B, H, W, 26) player-major
        enc = encode(lay, state)
        enc = jnp.transpose(enc, (1, 0, 3, 4, 2))  # (P, B, H, W, 26)
        return enc.reshape(num_players * B, height, width, 26)

    tx = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adam(config.lr),
    )

    def init_fn(key) -> TrainState:
        key, sub = jax.random.split(key)
        dummy = jnp.zeros((1, height, width, 26), jnp.int32)
        params = net.init(sub, dummy)
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            key=key,
            env_steps=jnp.zeros((), jnp.float32),
            kl_coeff=jnp.asarray(config.kl_coeff, jnp.float32),
        )

    use_bc = bc_policy is not None and any(
        v for _, v in config.bc_schedule
    )

    class Transition(NamedTuple):
        obs: jnp.ndarray  # (P*B, H, W, 26) int8
        action: jnp.ndarray  # (P*B,)
        logp: jnp.ndarray  # (P*B,)
        logits: jnp.ndarray  # (P*B, A)
        value: jnp.ndarray  # (P*B,)
        reward: jnp.ndarray  # (P*B,) mixed reward
        mask: jnp.ndarray  # (P*B,) 1.0 for PPO-controlled samples
        sparse: jnp.ndarray  # (B,) summed sparse (metrics)
        shaped: jnp.ndarray  # (B,) summed shaped (metrics)

    batched_transition = jax.vmap(
        env_transition, in_axes=(layout_axis, -1, -1), out_axes=-1
    )

    def rollout(params, key, shaping_factor, bc_factor, pool=None):
        key, k_pool = jax.random.split(key)
        if pool_mode:
            # fresh layout per lane per episode. With `pool=None` lanes
            # sample the FIXED pool captured at build time; a passed
            # `pool` (same leaf shapes, fresh content — see
            # train_iteration) makes this the reference's true
            # num_mdp=inf: the host regenerates the pool between
            # iterations, so no layout repeats across the run
            # (ppo_rllib_from_params_client.py:232-234).
            src_pool = layout_pool if pool is None else pool
            pool_idx = jax.random.randint(k_pool, (B,), 0, n_pool)
            lay = jax.tree.map(
                lambda leaf: jnp.asarray(leaf)[..., pool_idx], src_pool
            )
            state0 = lay.start_state  # already (..., B) after the gather
        else:
            pool_idx = None
            lay = layout
            state0 = batch_reset(layout, B)
        if mesh is not None:
            from overcooked_ai_tpu.parallel.mesh import constrain_batch_minor

            state0 = constrain_batch_minor(mesh, state0)
        key, k_bc, k_seat = jax.random.split(key, 3)
        if use_bc:
            bc_mask = bc_seat_mask(k_bc, k_seat, bc_factor, num_players, B)
        else:
            bc_mask = jnp.zeros((num_players, B), bool)
        train_mask = (~bc_mask).reshape(num_players * B).astype(jnp.float32)

        def phi_of(state):
            if pool_mode:
                return potential_fn(pool_idx, lay, state)
            return potential_fn(lay, state)

        def body(carry, key_t):
            state = carry
            obs = obs_of(lay, state)
            logits, value = net.apply(params, obs)
            key_a, key_b = jax.random.split(key_t)
            action = jax.random.categorical(key_a, logits)  # (P*B,)
            logp = jax.nn.log_softmax(logits)[
                jnp.arange(action.shape[0]), action
            ]
            actions_pb = action.reshape(num_players, B)
            if use_bc:
                if pool_mode:
                    # pool-aware partner (bc_policy_batch_pool): per-lane
                    # layout + per-lane motion-cost table
                    bc_actions = bc_policy(key_b, lay, state, pool_idx)
                else:
                    bc_actions = bc_policy(key_b, lay, state)  # (P, B)
                actions_pb = jnp.where(bc_mask, bc_actions, actions_pb)
            if config.use_phi:
                phi_s = phi_of(state)
            next_state, info = batched_transition(lay, state, actions_pb)
            sparse_sum = jnp.sum(info.sparse_reward, axis=0)  # (B,)
            if config.use_phi:
                phi_sp = phi_of(next_state)
                dense = jnp.broadcast_to(
                    (phi_sp - phi_s)[None], (num_players, B)
                )
                if config.phi_event_mix:
                    dense = dense + info.shaped_reward.astype(jnp.float32)
            else:
                dense = info.shaped_reward.astype(jnp.float32)
            reward = (
                sparse_sum[None, :].astype(jnp.float32)
                + shaping_factor * dense
            ).reshape(num_players * B)
            tr = Transition(
                obs=obs.astype(jnp.int8),
                action=action,
                logp=logp,
                logits=logits,
                value=value,
                reward=reward,
                mask=train_mask,
                sparse=sparse_sum,
                shaped=jnp.sum(info.shaped_reward, axis=0),
            )
            return next_state, tr

        keys = jax.random.split(key, T)
        _, traj = jax.lax.scan(body, state0, keys)
        return traj

    def rollout_fused(params, key, shaping_factor, bc_factor, pool=None):
        """The same rollout, but the env side of each step -- transition +
        events + sparse/shaped rewards + post-step lossless encoding -- is
        ONE pallas kernel launch (ops/fused_train.py, or the dynamic-
        terrain ops/fused_pool.py kernel in pool mode with the per-lane
        layouts as packed operands) with the batch state VMEM-resident,
        instead of the ~dozens of XLA kernels of the scan path. The
        RNG-split structure matches `rollout` exactly, and the kernels are
        bit-exact vs core/step.py + core/encoding.py, so both paths
        produce identical trajectories for identical (params, key).
        """
        from overcooked_ai_tpu.ops import fused_train as _ft

        key, k_pool = jax.random.split(key)
        if pool_mode:
            # per-lane layout gather, same RNG structure as the XLA path
            from overcooked_ai_tpu.ops import fused_pool as _fp

            src_pool = layout_pool if pool is None else pool
            pool_idx = jax.random.randint(k_pool, (B,), 0, n_pool)
            lay = jax.tree.map(
                lambda leaf: jnp.asarray(leaf)[..., pool_idx], src_pool
            )
            state0 = lay.start_state
            # packed per-lane layout operands for the dynamic-terrain
            # kernel; the layouts are fixed within the episode batch, so
            # pack ONCE per rollout, not per step
            ptiles = _fp.pool_data_tiles(lay, fused_block_b)
        else:
            pool_idx = None
            lay = layout
            state0 = batch_reset(layout, B)
            ptiles = ()
        key, k_bc, k_seat = jax.random.split(key, 3)
        if use_bc:
            bc_mask = bc_seat_mask(k_bc, k_seat, bc_factor, num_players, B)
        else:
            bc_mask = jnp.zeros((num_players, B), bool)
        train_mask = (~bc_mask).reshape(num_players * B).astype(jnp.float32)

        # note: tiles fold the GLOBAL batch as (B // lanes, lanes); under a
        # dp mesh the fold axis (-2) is sharded and shard_map below hands
        # each device its own (B_local // lanes, lanes) shard
        tiles0 = _ft.state_to_tiles(spec, state0, _lanes)
        # XLA encode once for the initial obs; int8 to match the kernel's
        # obs dtype (the scan carry must be type-stable)
        obs0 = obs_of(lay, state0).astype(jnp.int8)

        def _kernel_call(tiles, act, pt):
            # exactly T steps from a fresh reset per iteration: never
            # auto-reset mid-rollout, so the terminal tiles are the
            # true pre-reset state (phi needs it; matches the XLA
            # path's env_transition semantics)
            if pool_mode:
                return _fp.fused_pool_train_step_tiles(
                    spec, pt, tiles, act,
                    horizon=T, block_b=fused_block_b,
                    interpret=fused_interpret, reset_horizon=T + 1,
                )
            return _ft.fused_train_step_tiles(
                spec, tiles, act,
                horizon=T, block_b=fused_block_b,
                interpret=fused_interpret, reset_horizon=T + 1,
            )

        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P_

            def _sp(x):  # batch-fold axis is -2 on every tile/IO tensor
                return P_(*([None] * (x.ndim - 2) + ["dp", None]))

            act_eg = jax.ShapeDtypeStruct(
                (num_players, B // _lanes, _lanes), jnp.int32
            )
            out_eg = jax.eval_shape(_kernel_call, tiles0, act_eg, ptiles)
            step_call = shard_map(
                _kernel_call,
                mesh=mesh,
                in_specs=(
                    jax.tree.map(_sp, tiles0),
                    _sp(act_eg),
                    jax.tree.map(_sp, ptiles),
                ),
                out_specs=jax.tree.map(_sp, out_eg),
                check_vma=False,
            )
        else:
            step_call = _kernel_call

        def phi_of(state):
            if pool_mode:
                return potential_fn(pool_idx, lay, state)
            return potential_fn(lay, state)

        phi0 = (
            phi_of(state0)
            if config.use_phi
            else jnp.zeros((B,), jnp.float32)
        )

        def body(carry, key_t):
            tiles, obs, phi_s = carry
            logits, value = net.apply(params, obs)
            key_a, key_b = jax.random.split(key_t)
            action = jax.random.categorical(key_a, logits)  # (P*B,)
            logp = jax.nn.log_softmax(logits)[
                jnp.arange(action.shape[0]), action
            ]
            actions_pb = action.reshape(num_players, B)
            if use_bc:
                state = _ft.tiles_to_state(spec, tiles)
                if pool_mode:
                    bc_actions = bc_policy(key_b, lay, state, pool_idx)
                else:
                    bc_actions = bc_policy(key_b, lay, state)  # (P, B)
                actions_pb = jnp.where(bc_mask, bc_actions, actions_pb)
            act_tiles = actions_pb.reshape(num_players, B // _lanes, _lanes)
            tiles, obs_t, sparse, shaped, _ev = step_call(
                tiles, act_tiles, ptiles
            )
            obs_next = _ft.obs_tiles_to_nhwc(spec, obs_t)
            sparse = sparse.reshape(num_players, B)
            shaped = shaped.reshape(num_players, B)
            sparse_sum = jnp.sum(sparse, axis=0)  # (B,)
            if config.use_phi:
                phi_sp = phi_of(_ft.tiles_to_state(spec, tiles))
                dense = jnp.broadcast_to(
                    (phi_sp - phi_s)[None], (num_players, B)
                )
                if config.phi_event_mix:
                    dense = dense + shaped.astype(jnp.float32)
            else:
                phi_sp = phi_s
                dense = shaped.astype(jnp.float32)
            reward = (
                sparse_sum[None, :].astype(jnp.float32)
                + shaping_factor * dense
            ).reshape(num_players * B)
            tr = Transition(
                obs=obs.astype(jnp.int8),
                action=action,
                logp=logp,
                logits=logits,
                value=value,
                reward=reward,
                mask=train_mask,
                sparse=sparse_sum,
                shaped=jnp.sum(shaped, axis=0),
            )
            return (tiles, obs_next, phi_sp), tr

        keys = jax.random.split(key, T)
        _, traj = jax.lax.scan(body, (tiles0, obs0, phi0), keys)
        return traj

    if fused_enabled:
        rollout = rollout_fused

    def gae(traj):
        """GAE(lambda) with terminal at the horizon (no bootstrap)."""

        def body(carry, tr):
            next_adv, next_value = carry
            delta = (
                tr.reward + config.gamma * next_value - tr.value
            )
            adv = delta + config.gamma * config.lmbda * next_adv
            return (adv, tr.value), adv

        zeros = jnp.zeros_like(traj.value[0])
        _, advantages = jax.lax.scan(
            body, (zeros, zeros), traj, reverse=True
        )
        value_targets = advantages + traj.value
        return advantages, value_targets

    def loss_fn(params, batch, kl_coeff, entropy_coeff):
        obs, action, logp_old, logits_old, value_old, adv, vt, mask = batch
        logits, value = net.apply(params, obs)
        wmean = lambda x: jnp.sum(x * mask) / jnp.maximum(  # noqa: E731
            jnp.sum(mask), 1.0
        )
        logp_all = jax.nn.log_softmax(logits)
        logp = logp_all[jnp.arange(action.shape[0]), action]
        ratio = jnp.exp(logp - logp_old)
        surr = jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1 - config.clip_param, 1 + config.clip_param)
            * adv,
        )
        policy_loss = -wmean(surr)
        # KL(old || new) between categorical distributions
        p_old = jax.nn.softmax(logits_old)
        kl = wmean(
            jnp.sum(p_old * (jax.nn.log_softmax(logits_old) - logp_all), -1)
        )
        entropy = -wmean(jnp.sum(jax.nn.softmax(logits) * logp_all, -1))
        # value clipping (rllib ppo_tf_policy semantics)
        vf_loss1 = jnp.square(value - vt)
        v_clipped = value_old + jnp.clip(
            value - value_old, -config.vf_clip_param, config.vf_clip_param
        )
        vf_loss2 = jnp.square(v_clipped - vt)
        vf_loss = wmean(jnp.maximum(vf_loss1, vf_loss2))
        total = (
            policy_loss
            + kl_coeff * kl
            + config.vf_loss_coeff * vf_loss
            - entropy_coeff * entropy
        )
        return total, (policy_loss, vf_loss, kl, entropy)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    n_samples = num_players * B * T
    mb_size = min(num_players * config.sgd_minibatch_size, n_samples)
    n_minibatches = n_samples // mb_size

    @jax.jit
    def train_iteration(ts: TrainState, pool=None):
        """One PPO iteration. `pool` (pool mode only): optional fresh
        layout-pool pytree with the SAME leaf shapes as the build-time
        pool — pass one regenerated per iteration for the reference's
        true num_mdp=inf (requires use_phi=False and no bc_policy,
        whose pool tables are host-precomputed for the fixed pool)."""
        key, k_roll, k_perm = jax.random.split(ts.key, 3)
        shaping_factor = _anneal(
            config.reward_shaping_factor,
            ts.env_steps,
            config.reward_shaping_horizon,
        )
        entropy_coeff = _anneal(
            config.entropy_coeff_start,
            ts.env_steps,
            config.entropy_coeff_horizon,
            config.entropy_coeff_end,
        )
        bc_factor = _bc_factor_at(config.bc_schedule, ts.env_steps)
        traj = rollout(ts.params, k_roll, shaping_factor, bc_factor, pool)
        advantages, value_targets = gae(traj)
        # standardize advantages across the trained samples (rllib
        # standardize_fields=["advantages"])
        m = traj.mask
        m_sum = jnp.maximum(jnp.sum(m), 1.0)
        a_mean = jnp.sum(advantages * m) / m_sum
        a_std = jnp.sqrt(
            jnp.sum(jnp.square(advantages - a_mean) * m) / m_sum
        )
        advantages = (advantages - a_mean) / (a_std + 1e-8)

        flat = lambda x: x.reshape((n_samples,) + x.shape[2:])  # noqa: E731
        data = (
            flat(traj.obs),
            flat(traj.action),
            flat(traj.logp),
            flat(traj.logits),
            flat(traj.value),
            flat(advantages),
            flat(value_targets),
            flat(traj.mask),
        )

        def epoch(carry, key_e):
            params, opt_state = carry
            perm = jax.random.permutation(key_e, n_samples)

            def minibatch(carry, idx):
                params, opt_state, _ = carry
                take = lambda x: x[idx]  # noqa: E731
                batch = tuple(take(d) for d in data)
                (_, aux), grads = grad_fn(
                    params, batch, ts.kl_coeff, entropy_coeff
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, aux), None

            idxs = perm[: n_minibatches * mb_size].reshape(
                n_minibatches, mb_size
            )
            zero_aux = tuple(jnp.zeros(()) for _ in range(4))
            (params, opt_state, aux), _ = jax.lax.scan(
                minibatch, (params, opt_state, zero_aux), idxs
            )
            return (params, opt_state), aux

        keys_e = jax.random.split(k_perm, config.num_sgd_iter)
        (params, opt_state), auxes = jax.lax.scan(
            epoch, (ts.params, ts.opt_state), keys_e
        )
        policy_loss, vf_loss, kl, entropy = (a[-1] for a in auxes)

        # adaptive KL coefficient update (rllib update_kl semantics)
        kl_coeff = jnp.where(
            kl > 2.0 * config.kl_target,
            ts.kl_coeff * 1.5,
            jnp.where(
                kl < 0.5 * config.kl_target, ts.kl_coeff * 0.5, ts.kl_coeff
            ),
        )

        new_ts = TrainState(
            params=params,
            opt_state=opt_state,
            key=key,
            env_steps=ts.env_steps + B * T,
            kl_coeff=kl_coeff,
        )
        metrics = IterMetrics(
            episode_sparse_reward=jnp.sum(traj.sparse) / B,
            episode_shaped_reward=jnp.sum(traj.shaped) / B,
            episode_total_reward=jnp.sum(traj.reward) / B,
            policy_loss=policy_loss,
            vf_loss=vf_loss,
            kl=kl,
            entropy=entropy,
            kl_coeff=kl_coeff,
            reward_shaping_factor=shaping_factor,
            entropy_coeff=entropy_coeff,
            bc_factor=bc_factor,
            bc_sample_fraction=jnp.mean(1.0 - traj.mask),
        )
        return new_ts, metrics

    return init_fn, train_iteration


def make_ppo_eval(spec, net_config=None, num_games: int = 8,
                  horizon: int = 400, bc_policy=None):
    """Evaluation rollout of the current policy, reward-shaping-free
    (reference custom eval fn, rllib.py:517-648: periodic self-play -- or
    ppo+bc -- games reporting mean sparse episode return).

    Returns eval(params, key) -> () f32 mean sparse return per episode;
    jitted, runs entirely on device. With bc_policy, seat 1 is the BC
    partner in every game (reference evaluate() agent pairing).
    """
    layout = jax.tree.map(jnp.asarray, spec.layout)
    num_players = spec.num_players
    net = PPONet(net_config or NetConfig())
    height, width = spec.height, spec.width
    B = num_games
    encode = jax.vmap(
        lambda lay, s: lossless_encode(lay, s, horizon=horizon),
        in_axes=(None, -1),
        out_axes=0,
    )

    @jax.jit
    def evaluate(params, key):
        state0 = batch_reset(layout, B)

        def body(state, key_t):
            enc = encode(layout, state)
            enc = jnp.transpose(enc, (1, 0, 3, 4, 2))
            obs = enc.reshape(num_players * B, height, width, 26)
            logits, _ = net.apply(params, obs)
            key_a, key_b = jax.random.split(key_t)
            action = jax.random.categorical(key_a, logits)
            actions_pb = action.reshape(num_players, B)
            if bc_policy is not None:
                bc_actions = bc_policy(key_b, layout, state)
                actions_pb = actions_pb.at[1].set(bc_actions[1])
            next_state, info = jax.vmap(
                env_transition, in_axes=(None, -1, -1), out_axes=-1
            )(layout, state, actions_pb)
            return next_state, jnp.sum(info.sparse_reward, axis=0)

        keys = jax.random.split(key, horizon)
        _, sparse = jax.lax.scan(body, state0, keys)
        return jnp.sum(sparse) / B

    return evaluate


def train(
    spec,
    config: PPOConfig,
    num_iterations: int,
    seed: int = 0,
    potential_fn=None,
    bc_policy=None,
    log_every: int = 0,
):
    """Convenience loop; returns (final TrainState, list of IterMetrics)."""
    init_fn, train_iteration = make_ppo(spec, config, potential_fn, bc_policy)
    ts = init_fn(jax.random.PRNGKey(seed))
    history = []
    for it in range(num_iterations):
        ts, m = train_iteration(ts)
        m = jax.device_get(m)
        history.append(m)
        if log_every and (it + 1) % log_every == 0:
            print(
                f"iter {it + 1}: sparse_r={float(m.episode_sparse_reward):.2f} "
                f"shaped_r={float(m.episode_shaped_reward):.2f} "
                f"kl={float(m.kl):.4f} entropy={float(m.entropy):.3f}"
            )
    return ts, history
