"""Behavior cloning (flax): the reference's TF2 BC reimplemented.

Mirrors human_aware_rl/imitation/behavior_cloning_tf2.py: an MLP (default
2x64 relu, :357-374) or LSTM(256) (:377-420) over the 96-dim hand-crafted
featurization -> 6-way logits, trained with sparse softmax cross-entropy,
Adam(1e-3), batch 64, validation split 0.15, early stopping, optional class
weights (:175-270). Save/load uses flax msgpack + a JSON metadata file
(the reference uses .keras + metadata.pickle, :273-308).

The trained policy doubles as an Overcooked agent (BC partner for PPO and
the "human proxy" in the eval matrix) via `bc_policy_fn`.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.serialization import from_bytes, to_bytes


@dataclasses.dataclass(frozen=True)
class BCConfig:
    """Reference DEFAULT_MLP_PARAMS / DEFAULT_TRAINING_PARAMS
    (behavior_cloning_tf2.py:31-44)."""

    net_arch: Sequence[int] = (64, 64)
    num_actions: int = 6
    epochs: int = 100
    validation_split: float = 0.15
    batch_size: int = 64
    learning_rate: float = 1e-3
    use_class_weights: bool = False
    early_stopping_patience: int = 20  # keras EarlyStopping(patience=20)
    use_lstm: bool = False
    cell_size: int = 256


class BCNet(nn.Module):
    cfg: BCConfig

    @nn.compact
    def __call__(self, x):
        for units in self.cfg.net_arch:
            x = nn.relu(nn.Dense(units)(x))
        return nn.Dense(self.cfg.num_actions)(x)


class BCLSTMNet(nn.Module):
    """LSTM BC (reference _build_lstm_model, behavior_cloning_tf2.py:377-420):
    dense torso per timestep -> LSTM(cell_size) -> logits. Processes padded
    (B, T, F) sequences; returns (B, T, A) logits."""

    cfg: BCConfig

    @nn.compact
    def __call__(self, x_seq, carry=None):
        import jax

        x = x_seq
        for units in self.cfg.net_arch:
            x = nn.relu(nn.Dense(units)(x))
        cell = nn.OptimizedLSTMCell(self.cfg.cell_size, name="lstm")
        if carry is None:
            carry = cell.initialize_carry(
                jax.random.PRNGKey(0), (x.shape[0], x.shape[-1])
            )

        def scan_fn(cell, carry, xt):
            carry, y = cell(carry, xt)
            return carry, y

        scanner = nn.transforms.scan(
            scan_fn,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry, hs = scanner(cell, carry, x)
        logits = nn.Dense(self.cfg.num_actions, name="logits")(hs)
        return logits, carry


def train_bc_model(
    obs: np.ndarray,
    actions: np.ndarray,
    cfg: BCConfig = BCConfig(),
    seed: int = 0,
    verbose: bool = False,
):
    """Train a BC model; returns (params, history dict)."""
    assert not cfg.use_lstm, "LSTM BC: use train_bc_lstm (not yet needed)"
    n = obs.shape[0]
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    obs, actions = obs[perm], actions[perm]
    n_val = int(n * cfg.validation_split)
    val_obs, val_act = obs[:n_val], actions[:n_val]
    tr_obs, tr_act = obs[n_val:], actions[n_val:]

    class_weights = np.ones(cfg.num_actions, np.float32)
    if cfg.use_class_weights:
        counts = np.bincount(tr_act, minlength=cfg.num_actions).astype(
            np.float64
        )
        class_weights = (len(tr_act) / (cfg.num_actions * np.maximum(counts, 1))).astype(
            np.float32
        )

    net = BCNet(cfg)
    params = net.init(jax.random.PRNGKey(seed), jnp.zeros((1, obs.shape[1])))
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)
    cw = jnp.asarray(class_weights)

    @jax.jit
    def train_step(params, opt_state, bo, ba):
        def loss_fn(p):
            logits = net.apply(p, bo)
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, ba
            )
            return jnp.mean(losses * cw[ba])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_loss(params, bo, ba):
        logits = net.apply(params, bo)
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, ba)
        )
        acc = jnp.mean(jnp.argmax(logits, -1) == ba)
        return loss, acc

    n_train = len(tr_obs)
    steps = max(n_train // cfg.batch_size, 1)
    best_val, best_params, patience = np.inf, params, 0
    history = {"loss": [], "val_loss": [], "val_acc": []}
    for epoch in range(cfg.epochs):
        eperm = rng.permutation(n_train)
        ep_loss = 0.0
        for s in range(steps):
            idx = eperm[s * cfg.batch_size : (s + 1) * cfg.batch_size]
            params, opt_state, loss = train_step(
                params, opt_state, tr_obs[idx], tr_act[idx]
            )
            ep_loss += float(loss)
        ep_loss /= steps
        if n_val:
            v_loss, v_acc = map(float, eval_loss(params, val_obs, val_act))
        else:
            v_loss, v_acc = ep_loss, 0.0
        history["loss"].append(ep_loss)
        history["val_loss"].append(v_loss)
        history["val_acc"].append(v_acc)
        if verbose:
            print(
                f"epoch {epoch}: loss {ep_loss:.4f} val {v_loss:.4f} acc {v_acc:.3f}"
            )
        if v_loss < best_val - 1e-5:
            best_val, best_params, patience = v_loss, params, 0
        else:
            patience += 1
            if patience >= cfg.early_stopping_patience:
                break
    return best_params, history


def train_bc_lstm(
    sequences,
    cfg: BCConfig = BCConfig(use_lstm=True),
    seed: int = 0,
    verbose: bool = False,
):
    """Train the LSTM BC model on variable-length per-agent sequences.

    sequences: list of (obs (T_i, F) float32, actions (T_i,) int32).
    Pads to the max length with a loss mask (reference pads with zeros and
    masks via seq_lens, behavior_cloning_tf2.py:146-161).
    """
    assert sequences
    max_len = max(o.shape[0] for o, _ in sequences)
    feat = sequences[0][0].shape[1]
    n = len(sequences)
    obs = np.zeros((n, max_len, feat), np.float32)
    act = np.zeros((n, max_len), np.int32)
    mask = np.zeros((n, max_len), np.float32)
    for i, (o, a) in enumerate(sequences):
        obs[i, : len(a)] = o
        act[i, : len(a)] = a
        mask[i, : len(a)] = 1.0

    net = BCLSTMNet(cfg)
    params = net.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, max_len, feat))
    )
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, bo, ba, bm):
        def loss_fn(p):
            logits, _ = net.apply(p, bo)
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, ba
            )
            return jnp.sum(losses * bm) / jnp.maximum(jnp.sum(bm), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    bs = max(min(cfg.batch_size, n), 1)
    history = {"loss": []}
    for epoch in range(cfg.epochs):
        perm = rng.permutation(n)
        ep_loss, steps = 0.0, 0
        for s in range(0, n, bs):
            idx = perm[s : s + bs]
            params, opt_state, loss = train_step(
                params, opt_state, obs[idx], act[idx], mask[idx]
            )
            ep_loss += float(loss)
            steps += 1
        history["loss"].append(ep_loss / steps)
        if verbose:
            print(f"epoch {epoch}: loss {ep_loss / steps:.4f}")
    return params, history


def save_bc_model(model_dir, params, cfg: BCConfig, metadata=None):
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "params.msgpack"), "wb") as f:
        f.write(to_bytes(params))
    meta = dict(dataclasses.asdict(cfg))
    meta["net_arch"] = list(meta["net_arch"])
    # load_bc_model needs the input width to rebuild the params template;
    # derive it from the MLP input kernel so callers can't forget it
    try:
        meta["obs_dim"] = int(
            np.asarray(params["params"]["Dense_0"]["kernel"]).shape[0]
        )
    except (KeyError, TypeError):
        pass  # non-MLP nets: caller must supply obs_dim via metadata
    meta.update(metadata or {})
    with open(os.path.join(model_dir, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_bc_model(model_dir):
    with open(os.path.join(model_dir, "metadata.json")) as f:
        meta = json.load(f)
    cfg = BCConfig(
        **{
            k: (tuple(v) if k == "net_arch" else v)
            for k, v in meta.items()
            if k in {f.name for f in dataclasses.fields(BCConfig)}
        }
    )
    net = BCNet(cfg)
    # template params: need an input dim; stored in metadata
    obs_dim = meta["obs_dim"]
    template = net.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    with open(os.path.join(model_dir, "params.msgpack"), "rb") as f:
        params = from_bytes(template, f.read())
    return params, cfg


def bc_policy_fn(spec, feature_cost, params, cfg: BCConfig, stochastic=True):
    """Wrap a BC model as a functional agent over the array state.

    Returns policy(key, layout, state, agent_index) -> action, usable with
    agents.evaluation.stateless and as a PPO partner.
    """
    from overcooked_ai_tpu.core.featurize import featurize

    net = BCNet(cfg)
    fc = jnp.asarray(feature_cost)

    def policy(key, layout, state, agent_index):
        feats = featurize(layout, fc, state)  # (P, F)
        logits = net.apply(params, feats[agent_index][None])[0]
        if stochastic:
            return jax.random.categorical(key, logits).astype(jnp.int32)
        return jnp.argmax(logits).astype(jnp.int32)

    return policy


def bc_policy_batch(spec, feature_cost, params, cfg: BCConfig, stochastic=True):
    """Wrap a BC model as a batched every-seat policy for PPO+BC partners.

    Returns policy(key, layout, state_batchminor) -> (P, B) int32 actions,
    the signature `training.ppo.make_ppo(bc_policy=...)` expects (reference
    BehaviorCloningPolicy embedded in PPO training,
    behavior_cloning_tf2.py:428-590 + rllib.py:262-281).
    """
    from overcooked_ai_tpu.core.featurize import featurize_batch

    net = BCNet(cfg)
    fc = jnp.asarray(feature_cost)

    def policy(key, layout, state):
        feats = featurize_batch(layout, fc, state)  # (B, P, F)
        B, P, F = feats.shape
        logits = net.apply(params, feats.reshape(B * P, F))
        if stochastic:
            act = jax.random.categorical(key, logits)
        else:
            act = jnp.argmax(logits, axis=-1)
        return act.reshape(B, P).T.astype(jnp.int32)  # (P, B)

    return policy


def bc_policy_batch_pool(
    specs, feature_costs, params, cfg: BCConfig, stochastic=True
):
    """Pool-mode (variable-MDP) batched BC partner: every env lane carries
    its own layout, so featurization uses the lane's layout and that
    layout's motion-cost table (reference
    ppo_rllib_from_params_client.py variable-MDP training combined with a
    bc partner policy; one shared BC net -- the hand-crafted features are
    egocentric, so a single net generalizes across the pool).

    specs: the LayoutSpec list the learner's pool was built from;
    feature_costs: matching list of `build_motion_tables(...).feature_cost`
    tables (same grid shape). Returns
    policy(key, lane_layouts, state_batchminor, pool_idx) -> (P, B) int32,
    the 4-arg signature `make_ppo`/`make_ppo_lstm` use in pool mode.
    """
    from overcooked_ai_tpu.core.featurize import featurize

    net = BCNet(cfg)
    fc_stack = jnp.stack([jnp.asarray(f) for f in feature_costs])  # (N, ...)

    def policy(key, lay, state, pool_idx):
        fc_lanes = fc_stack[pool_idx]  # (B, ...)
        feats = jax.vmap(featurize, in_axes=(-1, 0, -1))(
            lay, fc_lanes, state
        )  # (B, P, F)
        B, P, F = feats.shape
        logits = net.apply(params, feats.reshape(B * P, F))
        if stochastic:
            act = jax.random.categorical(key, logits)
        else:
            act = jnp.argmax(logits, axis=-1)
        return act.reshape(B, P).T.astype(jnp.int32)  # (P, B)

    return policy
