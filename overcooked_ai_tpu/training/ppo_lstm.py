"""Recurrent PPO self-play (reference use_lstm=True path).

Mirrors RllibLSTMPPOModel training (reference ppo/ppo_rllib.py:89-237 with
rllib's recurrent PPO semantics): the rollout threads the LSTM carry through
time; learning uses truncated BPTT over fixed `max_seq_len`-step chunks
(rllib max_seq_len=20) whose initial carries are the ones recorded during
the rollout (no gradient across chunk boundaries). Loss terms are identical
to the feed-forward learner in ppo.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from overcooked_ai_tpu.core.encoding import lossless_encode
from overcooked_ai_tpu.core.env import batch_reset
from overcooked_ai_tpu.core.step import step as env_transition
from overcooked_ai_tpu.training.networks import LSTMPPONet
from overcooked_ai_tpu.training.ppo import (
    IterMetrics,
    PPOConfig,
    TrainState,
    _anneal,
    _bc_factor_at,
    bc_seat_mask,
)

MAX_SEQ_LEN = 20  # rllib default


def make_ppo_lstm(spec, config: PPOConfig, bc_policy=None,
                  potential_fn=None):
    """Recurrent PPO; bc_policy enables BC-partner episodes exactly like
    the feed-forward learner (see training.ppo.make_ppo docstring).

    spec may also be a sequence of same-grid-shape LayoutSpecs: the
    variable-MDP pool mode (reference ppo_rllib_from_params_client.py:78-179
    with use_lstm=True) -- each iteration every env lane samples a fresh
    layout from the pool, exactly as in the feed-forward learner.

    potential_fn enables config.use_phi (dense reward = phi(s') - phi(s))
    with the same signatures as make_ppo: (layout, state) -> (B,), or in
    pool mode (pool_idx, lane_layouts, state) -> (B,). The reference's
    use_lstm and use_phi flags are orthogonal (rllib.py:314-319 applies
    to both model families).
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
    assert num_players == 2
    if config.use_phi:
        assert potential_fn is not None, "use_phi requires a potential_fn"
    net = LSTMPPONet(config.net)
    height, width = spec.height, spec.width
    B = config.num_envs
    T = config.horizon
    N = num_players * B  # sequence count
    assert T % MAX_SEQ_LEN == 0

    # ---- fused-rollout eligibility (pallas training-step kernel) ----
    # Same rules as the feed-forward learner (training/ppo.py): auto mode
    # needs a 128-lane batch; pool mode uses the dynamic-terrain kernel
    # (ops/fused_pool.py) and needs uniform recipe tables across the
    # pool. The LSTM learner has no mesh parameter, so no shard_map
    # wrapping here.
    fused_block_b = config.fused_block_b
    if B % fused_block_b != 0:
        fused_block_b = B
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
        pool_uniform and B % _lanes == 0 and B % fused_block_b == 0
    )
    # auto mode also requires a backend the kernel can actually run on
    # (tpu compiled, or cpu via interpret) -- see training/ppo.py
    _backend = jax.default_backend()
    _dev_kind = jax.devices()[0].device_kind if jax.devices() else ""
    _fused_backend_ok = (
        _backend in ("cpu", "tpu") or "tpu" in _dev_kind.lower()
    )
    if config.fused is None:
        fused_enabled = fused_ok and B % 128 == 0 and _fused_backend_ok
    elif config.fused:
        if not fused_ok:
            raise ValueError(
                "config.fused=True but the fused rollout kernel cannot run "
                f"this configuration (pool_uniform={pool_uniform}, B={B}, "
                f"block_b={fused_block_b}, lanes={_lanes})"
            )
        fused_enabled = True
    else:
        fused_enabled = False
    fused_interpret = jax.default_backend() == "cpu"

    layout_axis = -1 if pool_mode else None
    encode = jax.vmap(
        lambda lay, s: lossless_encode(lay, s, horizon=T),
        in_axes=(layout_axis, -1),
        out_axes=0,
    )

    def obs_of(lay, state):
        enc = encode(lay, state)  # (B, P, 26, H, W)
        enc = jnp.transpose(enc, (1, 0, 3, 4, 2))
        return enc.reshape(N, height, width, 26)

    tx = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adam(config.lr),
    )

    def init_fn(key) -> TrainState:
        key, sub = jax.random.split(key)
        dummy = jnp.zeros((1, 1, height, width, 26), jnp.int32)
        carry0 = net.initial_carry(1)
        params = net.init(sub, dummy, carry0)
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            key=key,
            env_steps=jnp.zeros((), jnp.float32),
            kl_coeff=jnp.asarray(config.kl_coeff, jnp.float32),
        )

    batched_transition = jax.vmap(
        env_transition, in_axes=(layout_axis, -1, -1), out_axes=-1
    )

    use_bc = bc_policy is not None and any(v for _, v in config.bc_schedule)

    def rollout(params, key, shaping_factor, bc_factor):
        if pool_mode:
            # fresh layout per lane per episode (reference num_mdp=inf);
            # split only in pool mode so non-pool runs keep the round-1
            # RNG stream for reproducible regression comparisons
            key, k_pool = jax.random.split(key)
            pool_idx = jax.random.randint(k_pool, (B,), 0, n_pool)
            lay = jax.tree.map(
                lambda leaf: jnp.asarray(leaf)[..., pool_idx], layout_pool
            )
            state0 = lay.start_state  # already (..., B) after the gather
        else:
            lay = layout
            state0 = batch_reset(layout, B)
        carry0 = net.initial_carry(N)
        key, k_bc, k_seat = jax.random.split(key, 3)
        if use_bc:
            bc_mask = bc_seat_mask(k_bc, k_seat, bc_factor, num_players, B)
        else:
            bc_mask = jnp.zeros((num_players, B), bool)
        train_mask = (~bc_mask).reshape(N).astype(jnp.float32)

        def phi_of(state):
            if pool_mode:
                return potential_fn(pool_idx, lay, state)
            return potential_fn(lay, state)

        def body(carry, key_t):
            state, lstm_carry = carry
            obs = obs_of(lay, state)
            logits_seq, value_seq, new_carry = net.apply(
                params, obs[:, None], lstm_carry
            )
            logits = logits_seq[:, 0]
            value = value_seq[:, 0]
            key_a, key_b = jax.random.split(key_t)
            action = jax.random.categorical(key_a, logits)
            logp = jax.nn.log_softmax(logits)[jnp.arange(N), action]
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
            sparse_sum = jnp.sum(info.sparse_reward, axis=0)
            if config.use_phi:
                dense = jnp.broadcast_to(
                    (phi_of(next_state) - phi_s)[None], (num_players, B)
                )
            else:
                dense = info.shaped_reward.astype(jnp.float32)
            reward = (
                sparse_sum[None, :].astype(jnp.float32)
                + shaping_factor * dense
            ).reshape(N)
            out = dict(
                obs=obs.astype(jnp.int8),
                action=action,
                logp=logp,
                logits=logits,
                value=value,
                reward=reward,
                carry_h=lstm_carry[0],
                carry_c=lstm_carry[1],
                mask=train_mask,
                sparse=sparse_sum,
                shaped=jnp.sum(info.shaped_reward, axis=0),
            )
            return (next_state, new_carry), out

        keys = jax.random.split(key, T)
        _, traj = jax.lax.scan(body, (state0, carry0), keys)
        return traj

    def rollout_fused(params, key, shaping_factor, bc_factor):
        """Recurrent rollout with the env side of each step as one pallas
        kernel (ops/fused_train.py, or ops/fused_pool.py's dynamic-
        terrain kernel in pool mode) -- same RNG structure as `rollout`,
        bit-exact kernel, so identical trajectories for the same seed
        (tests/test_ppo_fused.py::test_lstm_fused_equals_xla)."""
        from overcooked_ai_tpu.ops import fused_train as _ft

        if pool_mode:
            from overcooked_ai_tpu.ops import fused_pool as _fp

            key, k_pool = jax.random.split(key)  # matches `rollout`
            pool_idx = jax.random.randint(k_pool, (B,), 0, n_pool)
            lay = jax.tree.map(
                lambda leaf: jnp.asarray(leaf)[..., pool_idx], layout_pool
            )
            state0 = lay.start_state
            ptiles = _fp.pool_data_tiles(lay, fused_block_b)
        else:
            pool_idx = None
            lay = layout
            state0 = batch_reset(layout, B)
            ptiles = ()
        carry0 = net.initial_carry(N)
        key, k_bc, k_seat = jax.random.split(key, 3)
        if use_bc:
            bc_mask = bc_seat_mask(k_bc, k_seat, bc_factor, num_players, B)
        else:
            bc_mask = jnp.zeros((num_players, B), bool)
        train_mask = (~bc_mask).reshape(N).astype(jnp.float32)

        tiles0 = _ft.state_to_tiles(spec, state0, _lanes)
        enc0 = encode(lay, state0)  # (B, P, 26, H, W)
        enc0 = jnp.transpose(enc0, (1, 0, 3, 4, 2))
        obs0 = enc0.reshape(N, height, width, 26).astype(jnp.int8)

        def phi_of(state):
            if pool_mode:
                return potential_fn(pool_idx, lay, state)
            return potential_fn(lay, state)

        phi0 = (
            phi_of(state0)
            if config.use_phi
            else jnp.zeros((B,), jnp.float32)
        )

        def _env_step_call(tiles, act_tiles):
            if pool_mode:
                return _fp.fused_pool_train_step_tiles(
                    spec, ptiles, tiles, act_tiles,
                    horizon=T, block_b=fused_block_b,
                    interpret=fused_interpret,
                    reset_horizon=T + 1,  # fixed-length episodes
                )
            return _ft.fused_train_step_tiles(
                spec, tiles, act_tiles,
                horizon=T, block_b=fused_block_b,
                interpret=fused_interpret,
                reset_horizon=T + 1,  # fixed-length episodes, no auto-reset
            )

        def body(carry, key_t):
            tiles, obs, lstm_carry, phi_s = carry
            logits_seq, value_seq, new_carry = net.apply(
                params, obs[:, None], lstm_carry
            )
            logits = logits_seq[:, 0]
            value = value_seq[:, 0]
            key_a, key_b = jax.random.split(key_t)
            action = jax.random.categorical(key_a, logits)
            logp = jax.nn.log_softmax(logits)[jnp.arange(N), action]
            actions_pb = action.reshape(num_players, B)
            if use_bc:
                state = _ft.tiles_to_state(spec, tiles)
                if pool_mode:
                    bc_actions = bc_policy(key_b, lay, state, pool_idx)
                else:
                    bc_actions = bc_policy(key_b, lay, state)  # (P, B)
                actions_pb = jnp.where(bc_mask, bc_actions, actions_pb)
            act_tiles = actions_pb.reshape(num_players, B // _lanes, _lanes)
            tiles, obs_t, sparse, shaped, _ev = _env_step_call(
                tiles, act_tiles
            )
            obs_next = _ft.obs_tiles_to_nhwc(spec, obs_t).astype(jnp.int8)
            sparse = sparse.reshape(num_players, B)
            shaped = shaped.reshape(num_players, B)
            sparse_sum = jnp.sum(sparse, axis=0)
            if config.use_phi:
                phi_sp = phi_of(_ft.tiles_to_state(spec, tiles))
                dense = jnp.broadcast_to(
                    (phi_sp - phi_s)[None], (num_players, B)
                )
            else:
                phi_sp = phi_s
                dense = shaped.astype(jnp.float32)
            reward = (
                sparse_sum[None, :].astype(jnp.float32)
                + shaping_factor * dense
            ).reshape(N)
            out = dict(
                obs=obs,
                action=action,
                logp=logp,
                logits=logits,
                value=value,
                reward=reward,
                carry_h=lstm_carry[0],
                carry_c=lstm_carry[1],
                mask=train_mask,
                sparse=sparse_sum,
                shaped=jnp.sum(shaped, axis=0),
            )
            return (tiles, obs_next, new_carry, phi_sp), out

        keys = jax.random.split(key, T)
        _, traj = jax.lax.scan(body, (tiles0, obs0, carry0, phi0), keys)
        return traj

    if fused_enabled:
        rollout = rollout_fused

    def gae(traj):
        def body(carry, step_data):
            next_adv, next_value = carry
            reward, value = step_data
            delta = reward + config.gamma * next_value - value
            adv = delta + config.gamma * config.lmbda * next_adv
            return (adv, value), adv

        zeros = jnp.zeros_like(traj["value"][0])
        _, advantages = jax.lax.scan(
            body, (zeros, zeros), (traj["reward"], traj["value"]), reverse=True
        )
        return advantages, advantages + traj["value"]

    n_chunks_t = T // MAX_SEQ_LEN
    n_chunks = n_chunks_t * N
    mb_chunks = max(
        min(num_players * config.sgd_minibatch_size // MAX_SEQ_LEN, n_chunks),
        1,
    )
    n_minibatches = max(n_chunks // mb_chunks, 1)

    def loss_fn(params, batch, kl_coeff, entropy_coeff):
        (obs, action, logp_old, logits_old, value_old, adv, vt, mask,
         h0, c0) = batch
        # obs: (mb, L, H, W, 26); run the LSTM from the recorded carry
        logits, value, _ = net.apply(params, obs, (h0, c0))
        flat = lambda x: x.reshape((-1,) + x.shape[2:])  # noqa: E731
        logits, value = flat(logits), flat(value)
        action, logp_old = flat(action), flat(logp_old)
        logits_old, value_old = flat(logits_old), flat(value_old)
        adv, vt, mask = flat(adv), flat(vt), flat(mask)
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
        p_old = jax.nn.softmax(logits_old)
        kl = wmean(
            jnp.sum(p_old * (jax.nn.log_softmax(logits_old) - logp_all), -1)
        )
        entropy = -wmean(jnp.sum(jax.nn.softmax(logits) * logp_all, -1))
        vf_loss1 = jnp.square(value - vt)
        v_clipped = value_old + jnp.clip(
            value - value_old, -config.vf_clip_param, config.vf_clip_param
        )
        vf_loss = wmean(
            jnp.maximum(vf_loss1, jnp.square(v_clipped - vt))
        )
        total = (
            policy_loss
            + kl_coeff * kl
            + config.vf_loss_coeff * vf_loss
            - entropy_coeff * entropy
        )
        return total, (policy_loss, vf_loss, kl, entropy)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def train_iteration(ts: TrainState):
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
        traj = rollout(ts.params, k_roll, shaping_factor, bc_factor)
        advantages, value_targets = gae(traj)
        m = traj["mask"]
        m_sum = jnp.maximum(jnp.sum(m), 1.0)
        a_mean = jnp.sum(advantages * m) / m_sum
        a_std = jnp.sqrt(jnp.sum(jnp.square(advantages - a_mean) * m) / m_sum)
        advantages = (advantages - a_mean) / (a_std + 1e-8)

        # (T, N, ...) -> chunks (n_chunks, L, ...): split T into windows,
        # carries taken from the window's first step
        def chunk(x):
            x = x.reshape((n_chunks_t, MAX_SEQ_LEN, N) + x.shape[2:])
            x = jnp.moveaxis(x, 2, 0)  # (N, n_chunks_t, L, ...)
            return x.reshape((n_chunks, MAX_SEQ_LEN) + x.shape[3:])

        def chunk_first(x):  # carry at window start: (T, N, C) -> (n_chunks, C)
            x = x.reshape((n_chunks_t, MAX_SEQ_LEN, N) + x.shape[2:])[:, 0]
            x = jnp.moveaxis(x, 1, 0)
            return x.reshape((n_chunks,) + x.shape[2:])

        data = (
            chunk(traj["obs"]),
            chunk(traj["action"]),
            chunk(traj["logp"]),
            chunk(traj["logits"]),
            chunk(traj["value"]),
            chunk(advantages),
            chunk(value_targets),
            chunk(traj["mask"]),
            chunk_first(traj["carry_h"]),
            chunk_first(traj["carry_c"]),
        )

        def epoch(carry, key_e):
            params, opt_state = carry
            perm = jax.random.permutation(key_e, n_chunks)

            def minibatch(carry, idx):
                params, opt_state, _ = carry
                batch = tuple(d[idx] for d in data)
                (_, aux), grads = grad_fn(
                    params, batch, ts.kl_coeff, entropy_coeff
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, aux), None

            idxs = perm[: n_minibatches * mb_chunks].reshape(
                n_minibatches, mb_chunks
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
            episode_sparse_reward=jnp.sum(traj["sparse"]) / B,
            episode_shaped_reward=jnp.sum(traj["shaped"]) / B,
            episode_total_reward=jnp.sum(traj["reward"]) / B,
            policy_loss=policy_loss,
            vf_loss=vf_loss,
            kl=kl,
            entropy=entropy,
            kl_coeff=kl_coeff,
            reward_shaping_factor=shaping_factor,
            entropy_coeff=entropy_coeff,
            bc_factor=bc_factor,
            bc_sample_fraction=jnp.mean(1.0 - traj["mask"]),
        )
        return new_ts, metrics

    return init_fn, train_iteration


def make_ppo_lstm_eval(spec, net_config=None, num_games: int = 8,
                       horizon: int = 400):
    """Shaping-free self-play evaluation for the recurrent policy
    (make_ppo_eval's LSTM counterpart): the hidden state threads through
    the episode scan. Returns eval(params, key) -> mean sparse return."""
    from overcooked_ai_tpu.core.encoding import lossless_encode
    from overcooked_ai_tpu.core.step import step as env_transition
    from overcooked_ai_tpu.training.networks import NetConfig

    layout = jax.tree.map(jnp.asarray, spec.layout)
    num_players = spec.num_players
    net = LSTMPPONet(net_config or NetConfig())
    height, width = spec.height, spec.width
    B = num_games
    N = num_players * B
    encode = jax.vmap(
        lambda lay, s: lossless_encode(lay, s, horizon=horizon),
        in_axes=(None, -1),
        out_axes=0,
    )

    @jax.jit
    def evaluate(params, key):
        state0 = batch_reset(layout, B)
        carry0 = net.initial_carry(N)

        def body(carry, key_t):
            state, lstm_carry = carry
            enc = encode(layout, state)
            enc = jnp.transpose(enc, (1, 0, 3, 4, 2))
            obs = enc.reshape(N, height, width, 26)
            logits_seq, _, new_carry = net.apply(
                params, obs[:, None], lstm_carry
            )
            action = jax.random.categorical(key_t, logits_seq[:, 0])
            actions_pb = action.reshape(num_players, B)
            next_state, info = jax.vmap(
                env_transition, in_axes=(None, -1, -1), out_axes=-1
            )(layout, state, actions_pb)
            return (next_state, new_carry), jnp.sum(
                info.sparse_reward, axis=0
            )

        keys = jax.random.split(key, horizon)
        _, sparse = jax.lax.scan(body, (state0, carry0), keys)
        return jnp.sum(sparse) / B

    return evaluate
