"""Bit-exact parity of the fused training-step kernel (step + events +
shaped rewards + lossless encoding in one pallas program) vs the XLA
reference path (core/step.py + core/encoding.py), in interpret mode.

Real-TPU (compiled Mosaic) parity is covered by the opt-in
OVERCOOKED_TPU_TESTS suite in test_tpu_parity.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from overcooked_ai_tpu.core.constants import NUM_EVENTS
from overcooked_ai_tpu.core.encoding import lossless_encode
from overcooked_ai_tpu.core.env import batch_reset, env_step
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.ops.fused_train import (
    fused_train_step,
    train_rollout_random,
    unpack_events,
)

HORIZON = 60  # short horizon so auto-reset is exercised mid-test
B = 128
BLOCK_B = 128


def make_ref_fns(layout, spec, horizon):
    """Jitted reference path: scan-step + batched encode (built once)."""

    @jax.jit
    def step_fn(state, actions):
        return env_step(layout, state, actions, horizon)

    @jax.jit
    def obs_fn(state):
        enc = jax.vmap(
            lambda s: lossless_encode(layout, s, horizon=horizon),
            in_axes=-1,
            out_axes=0,
        )(state)  # (B, P, 26, H, W)
        enc = jnp.transpose(enc, (1, 0, 3, 4, 2))  # (P, B, H, W, 26)
        return enc.reshape(
            spec.num_players * B, spec.height, spec.width, 26
        )

    return step_fn, obs_fn


# mdp_test: tomatoes + 2 pots + bonus orders in a small grid;
# counter_circuit: larger grid. (Bigger layouts run on real TPU via the
# opt-in OVERCOOKED_TPU_TESTS suite; interpret-mode eval cost scales with
# grid size.)
@pytest.mark.parametrize(
    "layout_name",
    [
        "cramped_room",
        "mdp_test",
        pytest.param(
            "counter_circuit",
            marks=pytest.mark.skipif(
                os.environ.get("OVERCOOKED_SLOW_TESTS") != "1",
                reason="large-grid interpret compile ~2 min; "
                "set OVERCOOKED_SLOW_TESTS=1 (also covered compiled by "
                "the OVERCOOKED_TPU_TESTS suite)",
            ),
        ),
    ],
)
def test_fused_train_step_parity(layout_name):
    spec = from_layout_name(layout_name)
    layout = jax.tree.map(jnp.asarray, spec.layout)
    P = spec.num_players

    rng = np.random.RandomState(3)
    state_ref = batch_reset(layout, B)
    state_fused = state_ref
    step_fn, obs_fn = make_ref_fns(layout, spec, HORIZON)

    for t in range(2 * HORIZON + 7):
        actions = jnp.asarray(
            rng.choice(6, size=(P, B), p=[0.13, 0.13, 0.13, 0.13, 0.08, 0.4]),
            jnp.int32,
        )
        ts = step_fn(state_ref, actions)
        state_ref = ts.obs_state

        state_fused, obs, sparse, shaped, ev = fused_train_step(
            spec,
            state_fused,
            actions,
            horizon=HORIZON,
            block_b=BLOCK_B,
            interpret=True,
        )

        for name in state_ref._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(state_fused, name)),
                np.asarray(getattr(state_ref, name)),
                err_msg=f"{layout_name} state.{name} t={t}",
            )
        np.testing.assert_array_equal(
            np.asarray(sparse), np.asarray(ts.sparse_reward),
            err_msg=f"sparse t={t}",
        )
        np.testing.assert_array_equal(
            np.asarray(shaped), np.asarray(ts.shaped_reward),
            err_msg=f"shaped t={t}",
        )
        np.testing.assert_array_equal(
            np.asarray(unpack_events(ev, NUM_EVENTS)),
            np.asarray(ts.events),
            err_msg=f"events t={t}",
        )
        np.testing.assert_array_equal(
            np.asarray(obs),
            np.asarray(obs_fn(state_ref)),
            err_msg=f"obs t={t}",
        )


def test_train_rollout_random_runs():
    spec = from_layout_name("cramped_room")
    layout = jax.tree.map(jnp.asarray, spec.layout)
    state = batch_reset(layout, B)
    final, totals = train_rollout_random(
        spec,
        state,
        jax.random.PRNGKey(0),
        num_steps=40,
        horizon=HORIZON,
        block_b=BLOCK_B,
        interpret=True,
    )
    assert int(totals["shaped"]) > 0, "random policy should pot something"
    assert int(totals["event_counts"].sum()) > 0
    assert final.t.shape == (B,)


def test_reset_horizon_decoupled_from_urgency():
    """reset_horizon > horizon disables the auto-reset (PPO needs the true
    pre-reset terminal state for phi) while the urgency layer still tracks
    `horizon` -- the two uses of the old single parameter."""
    spec = from_layout_name("cramped_room")
    layout = jax.tree.map(jnp.asarray, spec.layout)
    P = spec.num_players
    state = batch_reset(layout, B)
    stay = jnp.full((P, B), 4, jnp.int32)

    horizon = 6
    for t in range(horizon + 2):
        state, obs, _, _, _ = fused_train_step(
            spec, state, stay, horizon=horizon, block_b=BLOCK_B,
            interpret=True, reset_horizon=horizon + 100,
        )
        assert int(state.t[0]) == t + 1  # no reset at t == horizon
        # urgency layer (channel 25) flips on when horizon - t < 40;
        # horizon=6 means it is on from the first step
        assert int(obs[0, :, :, 25].max()) == 1

    # default (reset_horizon=None) keeps env_step auto-reset semantics
    state = batch_reset(layout, B)
    for t in range(horizon):
        state, *_ = fused_train_step(
            spec, state, stay, horizon=horizon, block_b=BLOCK_B,
            interpret=True,
        )
    assert int(state.t[0]) == 0  # wrapped at the horizon
