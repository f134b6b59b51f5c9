"""Policy/value networks (flax) mirroring the reference architectures.

`PPONet` reproduces RllibPPOModel (reference ppo/ppo_rllib.py:7-86): an
initial 5x5 same conv, then 3x3 convs (last one 'valid'), leaky-ReLU
everywhere, flatten, N dense hidden layers (optional D2RL concat of conv
features), and linear logits + value heads sharing the torso
(vf_share_layers=True, reference ppo_rllib_client.py:142).

`LSTMPPONet` reproduces RllibLSTMPPOModel (ppo_rllib.py:89-237): the same
conv/dense torso applied per timestep, an LSTM(cell_size), then linear
logits/value heads.

Compute notes: observations arrive as small integer layer stacks; they are
cast to float32 at the input. The convs are tiny (26->25 channels over a
~5x9 grid); XLA maps them onto the MXU as implicit GEMMs.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# Match the reference's TF activations and initializers exactly:
# tf.nn.leaky_relu (alpha=0.2) after convs, keras.layers.LeakyReLU()
# (alpha=0.3) after dense layers, glorot_uniform kernel init everywhere
# (keras defaults; flax defaults differ and noticeably slow early learning).
_glorot = nn.initializers.glorot_uniform()


def _conv(features, kernel, padding, dtype=None):
    return nn.Conv(
        features, kernel, padding=padding, kernel_init=_glorot, dtype=dtype
    )


def _dense(features, dtype=None):
    return nn.Dense(features, kernel_init=_glorot, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """Reference model defaults (ppo_rllib_client.py:85-94)."""

    num_hidden_layers: int = 3
    size_hidden_layers: int = 64
    num_filters: int = 25
    num_conv_layers: int = 3
    d2rl: bool = False
    cell_size: int = 256  # LSTM only
    num_actions: int = 6
    # Activation/compute dtype ("float32" | "bfloat16"); params stay
    # float32 either way (flax dtype semantics = mixed precision). bf16
    # halves MXU/VPU work in the rollout's sequential forwards -- the
    # wall-clock bottleneck of a PPO iteration (NOTES.md) -- at the cost
    # of ~1e-2-level logit noise; default float32 preserves bit-stable
    # reproducibility with earlier rounds.
    compute_dtype: str = "float32"


class PPONet(nn.Module):
    cfg: NetConfig

    @nn.compact
    def __call__(self, obs):
        """obs: (B, H, W, C) int or float -> (logits (B, A), value (B,))."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        x = obs.astype(dt)
        if cfg.num_conv_layers > 0:
            x = _conv(cfg.num_filters, (5, 5), "SAME", dt)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        for i in range(cfg.num_conv_layers - 1):
            padding = "SAME" if i < cfg.num_conv_layers - 2 else "VALID"
            x = _conv(cfg.num_filters, (3, 3), padding, dt)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        conv_out = x.reshape(x.shape[0], -1)
        x = conv_out
        for i in range(cfg.num_hidden_layers):
            if i > 0 and cfg.d2rl:
                x = jnp.concatenate([x, conv_out], axis=-1)
            x = _dense(cfg.size_hidden_layers, dt)(x)
            x = nn.leaky_relu(x, negative_slope=0.3)
        # heads in float32: logits feed categorical sampling and the
        # value/ratio losses, where bf16 rounding hurts
        logits = _dense(cfg.num_actions)(x.astype(jnp.float32))
        value = _dense(1)(x.astype(jnp.float32))[:, 0]
        return logits, value


class LSTMPPONet(nn.Module):
    """Recurrent variant. __call__ processes a whole (B, T, ...) sequence;
    `step` advances one timestep for rollouts."""

    cfg: NetConfig

    def _torso(self, x):
        # conv/dense torso honors cfg.compute_dtype like PPONet; the LSTM
        # cell and heads stay float32 (recurrent state + losses are where
        # bf16 rounding hurts), so the caller casts back after the torso
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        x = x.astype(dt)
        if cfg.num_conv_layers > 0:
            x = _conv(cfg.num_filters, (5, 5), "SAME", dt)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        for i in range(cfg.num_conv_layers - 1):
            padding = "SAME" if i < cfg.num_conv_layers - 2 else "VALID"
            x = _conv(cfg.num_filters, (3, 3), padding, dt)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = x.reshape(x.shape[:-3] + (-1,))
        for _ in range(self.cfg.num_hidden_layers):
            x = _dense(self.cfg.size_hidden_layers, dt)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        return x.astype(jnp.float32)

    @nn.compact
    def __call__(self, obs_seq, carry=None):
        """obs_seq: (B, T, H, W, C). Returns (logits (B,T,A), value (B,T),
        final carry)."""
        feats = self._torso(obs_seq)
        cell = nn.OptimizedLSTMCell(self.cfg.cell_size, name="lstm")
        batch = feats.shape[0]
        if carry is None:
            carry = cell.initialize_carry(
                jax.random.PRNGKey(0), (batch, feats.shape[-1])
            )

        def scan_fn(cell, carry, x):
            carry, y = cell(carry, x)
            return carry, y

        scanner = nn.transforms.scan(
            scan_fn,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry, hs = scanner(cell, carry, feats)
        logits = nn.Dense(self.cfg.num_actions, name="logits")(hs)
        value = nn.Dense(1, name="values")(hs)[..., 0]
        return logits, value, carry

    def initial_carry(self, batch_size):
        zeros = jnp.zeros((batch_size, self.cfg.cell_size), jnp.float32)
        return (zeros, zeros)
