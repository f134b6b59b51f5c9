"""Parity tests for the fused pallas rollout kernel (interpret mode on CPU).

The kernel re-implements the step transition batch-explicitly (state held in
VMEM across the whole horizon), so we check it bit-for-bit against scanning
the reference-parity `core.env.env_step` over the SAME explicit action
sequence -- final state and per-env returns must match exactly, including
across auto-resets and on old-dynamics / tomato / multi-pot layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from overcooked_ai_tpu.core.env import batch_reset, env_step
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.ops.fused_rollout import (
    fused_rollout_actions,
    fused_rollout_random,
)

LAYOUTS = [
    "cramped_room",
    "counter_circuit",
    "asymmetric_advantages_tomato",
    "old_dynamics_cook_test",
]


def _scan_reference(spec, state, actions, horizon):
    layout = jax.tree.map(jnp.asarray, spec.layout)

    def body(st, a):
        ts = env_step(layout, st, a, horizon)
        return ts.obs_state, ts.reward

    final, rewards = jax.lax.scan(body, state, actions)
    return final, jnp.sum(rewards, axis=0)


@pytest.mark.parametrize("layout_name", LAYOUTS)
def test_fused_matches_scan(layout_name):
    spec = from_layout_name(layout_name)
    B, T, horizon = 8, 90, 40  # several auto-resets inside the window
    state = batch_reset(jax.tree.map(jnp.asarray, spec.layout), B)
    actions = jax.random.randint(
        jax.random.PRNGKey(3), (T, spec.num_players, B), 0, 6, dtype=jnp.int32
    )

    ref_final, ref_ret = _scan_reference(spec, state, actions, horizon)
    got_final, got_ret = fused_rollout_actions(
        spec, state, actions, horizon=horizon, block_b=4, interpret=True
    )

    np.testing.assert_array_equal(np.asarray(got_ret), np.asarray(ref_ret))
    for name, a, b in zip(ref_final._fields, ref_final, got_final):
        np.testing.assert_array_equal(
            np.asarray(b), np.asarray(a), err_msg=f"state field {name}"
        )


def test_fused_random_smoke():
    """RNG mode: runs, resets at the horizon, returns plausible rewards."""
    spec = from_layout_name("cramped_room")
    B, T, horizon = 8, 50, 25
    state = batch_reset(jax.tree.map(jnp.asarray, spec.layout), B)
    final, ret = fused_rollout_random(
        spec, state, seed=7, num_steps=T, horizon=horizon, block_b=4, interpret=True
    )
    assert ret.shape == (B,)
    assert np.all(np.asarray(ret) >= 0)
    # two horizon wraps in 50 steps: t ends at 50 - 2*25 = 0
    np.testing.assert_array_equal(np.asarray(final.t), np.zeros(B, np.int32))
