"""Parity tests for the fused layout-POOL kernels (interpret mode, CPU).

The pool kernels (ops/fused_pool.py) run a DIFFERENT layout in every env
lane, with terrain/reset data entering as per-lane kernel operands instead
of compile-time constants. Parity reference: vmapping the exact
`core.step.step` over the per-lane layout pytree (the training/ppo.py
pool-mode path) + `core.encoding.lossless_encode` — final state, returns,
rewards, events and the 26-layer obs must match bit-for-bit, including
across per-lane auto-resets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from overcooked_ai_tpu.core.constants import NUM_EVENTS
from overcooked_ai_tpu.core.encoding import lossless_encode
from overcooked_ai_tpu.core.layout_generator import (
    LayoutGenerator,
    stack_layouts,
)
from overcooked_ai_tpu.core.step import step
from overcooked_ai_tpu.ops.fused_pool import (
    check_pool_uniform,
    fused_pool_rollout_actions,
    fused_pool_rollout_random,
    fused_pool_train_step,
)
from overcooked_ai_tpu.ops.fused_train import unpack_events

B = 8
BLOCK_B = 4


def make_pool(n=6, seed=0, outer_shape=(5, 4)):
    gen = LayoutGenerator(
        outer_shape=outer_shape, prop_empty=0.95, prop_feats=0.1,
        rng=np.random.RandomState(seed),
    )
    return [gen.generate_spec(name=f"pool_{i}") for i in range(n)]


def gather_lanes(specs, idx):
    pool = stack_layouts(specs)
    return jax.tree.map(lambda leaf: jnp.asarray(leaf)[..., idx], pool)


def ref_scan(lay, state, actions, horizon):
    """Reference: scan the exact per-lane transition with auto-reset."""
    bstep = jax.vmap(step, in_axes=(-1, -1, -1), out_axes=-1)

    def body(st, a):
        ns, info = bstep(lay, st, a)
        done = ns.t >= horizon
        obs_state = jax.tree.map(
            lambda fresh, cur: jnp.where(done, fresh, cur),
            lay.start_state,
            ns,
        )
        return obs_state, jnp.sum(info.sparse_reward, axis=0)

    final, rew = jax.lax.scan(body, state, actions)
    return final, jnp.sum(rew, axis=0)


@pytest.mark.parametrize("outer_shape", [(5, 4), (7, 5)])
def test_pool_rollout_matches_scan(outer_shape):
    """(7, 5) crosses the 32-cell boundary: the per-lane floor bitmask
    needs two uint32 chunks (the multi-chunk _dyn_is_floor path)."""
    specs = make_pool(n=6, seed=0, outer_shape=outer_shape)
    spec0 = check_pool_uniform(specs)
    # every lane a different layout; lanes 6,7 repeat layouts 0,1
    idx = np.arange(B) % len(specs)
    lay = gather_lanes(specs, idx)
    # terrains must genuinely differ across lanes for this test to bite
    terr = np.asarray(lay.terrain)
    assert any(
        not np.array_equal(terr[..., 0], terr[..., i]) for i in range(1, 6)
    )
    state = lay.start_state
    T, horizon = 90, 40  # two auto-resets inside the window
    actions = jax.random.randint(
        jax.random.PRNGKey(5), (T, spec0.num_players, B), 0, 6,
        dtype=jnp.int32,
    )

    ref_final, ref_ret = ref_scan(lay, state, actions, horizon)
    got_final, got_ret = fused_pool_rollout_actions(
        spec0, lay, state, actions, horizon=horizon, block_b=BLOCK_B,
        interpret=True,
    )

    np.testing.assert_array_equal(np.asarray(got_ret), np.asarray(ref_ret))
    for name, a, b in zip(ref_final._fields, ref_final, got_final):
        np.testing.assert_array_equal(
            np.asarray(b), np.asarray(a), err_msg=f"state field {name}"
        )


def test_pool_rollout_random_smoke():
    specs = make_pool(n=4, seed=1)
    spec0 = check_pool_uniform(specs)
    idx = np.arange(B) % len(specs)
    lay = gather_lanes(specs, idx)
    final, ret = fused_pool_rollout_random(
        spec0, lay, lay.start_state, seed=9, num_steps=50, horizon=25,
        block_b=BLOCK_B, interpret=True,
    )
    assert ret.shape == (B,)
    assert np.all(np.asarray(ret) >= 0)
    # two horizon wraps in 50 steps: t ends at 0
    np.testing.assert_array_equal(np.asarray(final.t), np.zeros(B, np.int32))


def test_pool_train_step_parity():
    """Transition + sparse/shaped rewards + events + lossless obs vs the
    XLA pool path, stepwise across an auto-reset boundary."""
    specs = make_pool(n=6, seed=2)
    spec0 = check_pool_uniform(specs)
    P = spec0.num_players
    idx = np.arange(B) % len(specs)
    lay = gather_lanes(specs, idx)
    horizon = 20  # 2 per-lane auto-resets inside the 45-step window
    bstep = jax.jit(jax.vmap(step, in_axes=(-1, -1, -1), out_axes=-1))

    @jax.jit
    def obs_fn(state):
        enc = jax.vmap(
            lambda l, s: lossless_encode(l, s, horizon=horizon),
            in_axes=(-1, -1),
            out_axes=0,
        )(lay, state)  # (B, P, 26, H, W)
        enc = jnp.transpose(enc, (1, 0, 3, 4, 2))  # (P, B, H, W, 26)
        return enc.reshape(P * B, spec0.height, spec0.width, 26)

    rng = np.random.RandomState(7)
    state_ref = lay.start_state
    state_fused = state_ref
    for t in range(2 * horizon + 5):
        actions = jnp.asarray(
            rng.choice(6, size=(P, B), p=[0.13, 0.13, 0.13, 0.13, 0.08, 0.4]),
            jnp.int32,
        )
        ns, info = bstep(lay, state_ref, actions)
        done = ns.t >= horizon
        state_ref = jax.tree.map(
            lambda fresh, cur: jnp.where(done, fresh, cur),
            lay.start_state,
            ns,
        )

        state_fused, obs, sparse, shaped, ev = fused_pool_train_step(
            spec0, lay, state_fused, actions, horizon=horizon,
            block_b=BLOCK_B, interpret=True,
        )

        for name in state_ref._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(state_fused, name)),
                np.asarray(getattr(state_ref, name)),
                err_msg=f"state.{name} t={t}",
            )
        np.testing.assert_array_equal(
            np.asarray(sparse), np.asarray(info.sparse_reward),
            err_msg=f"sparse t={t}",
        )
        np.testing.assert_array_equal(
            np.asarray(shaped), np.asarray(info.shaped_reward),
            err_msg=f"shaped t={t}",
        )
        np.testing.assert_array_equal(
            np.asarray(unpack_events(ev, NUM_EVENTS)),
            np.asarray(info.events),
            err_msg=f"events t={t}",
        )
        np.testing.assert_array_equal(
            np.asarray(obs), np.asarray(obs_fn(state_fused)),
            err_msg=f"obs t={t}",
        )


def test_check_pool_uniform_rejects_mixed_recipes():
    gen = LayoutGenerator(
        outer_shape=(5, 4), prop_empty=0.95, prop_feats=0.1,
        rng=np.random.RandomState(3),
    )
    a = gen.generate_spec(name="a")
    b = gen.generate_spec(name="b", delivery_reward=37)
    with pytest.raises(AssertionError, match="uniform recipe tables"):
        check_pool_uniform([a, b])
