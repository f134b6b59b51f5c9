"""Bit-exact parity of the jitted step function vs the reference MDP.

Strategy mirrors the reference's own golden-data tests
(reference testing/overcooked_test.py:468-599): drive both implementations
with identical action sequences and compare full state dicts, per-agent
sparse/shaped rewards, and all 25 event flags at every step.
"""

import numpy as np
import pytest

import jax

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.core.state import (
    canonical_state_dict,
    state_from_dict,
    state_to_dict,
)
from overcooked_ai_tpu.core.step import step

from . import oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference oracle not mounted"
)

CLASSIC_LAYOUTS = [
    "cramped_room",
    "asymmetric_advantages",
    "coordination_ring",
    "forced_coordination",
    "counter_circuit",
]

_step_jit = jax.jit(step)


def run_parity(layout_name, action_seq, old_dynamics=False, check_score=None):
    """Drive oracle + our step with the same actions; assert exact parity."""
    overrides = {"old_dynamics": True} if old_dynamics else {}
    mdp = oracle.make_mdp(layout_name, **overrides)
    spec = from_layout_name(layout_name, **overrides)
    layout = spec.layout

    ref_state = mdp.get_standard_start_state()
    my_state = state_from_dict(ref_state.to_dict(), spec)
    my_state = jax.tree.map(np.asarray, my_state)

    # start states must already agree
    assert canonical_state_dict(state_to_dict(my_state, spec)) == (
        canonical_state_dict(ref_state.to_dict())
    )

    total_sparse = 0
    for t, acts in enumerate(action_seq):
        acts = np.asarray(acts, np.int32)
        ref_state, infos = oracle.ref_step(mdp, ref_state, acts)
        my_state, info = _step_jit(layout, my_state, acts)
        my_state_np, info = jax.device_get((my_state, info))

        ref_dict = canonical_state_dict(ref_state.to_dict())
        my_dict = canonical_state_dict(state_to_dict(my_state_np, spec))
        assert my_dict == ref_dict, f"{layout_name} state diverged at t={t}"

        ref_sparse = np.asarray(infos["sparse_reward_by_agent"])
        ref_shaped = np.asarray(infos["shaped_reward_by_agent"])
        np.testing.assert_array_equal(
            np.asarray(info.sparse_reward), ref_sparse, err_msg=f"sparse t={t}"
        )
        np.testing.assert_array_equal(
            np.asarray(info.shaped_reward), ref_shaped, err_msg=f"shaped t={t}"
        )
        ref_events = oracle.events_matrix(
            infos["event_infos"], mdp.num_players
        )
        np.testing.assert_array_equal(
            np.asarray(info.events), ref_events, err_msg=f"events t={t}"
        )
        total_sparse += int(ref_sparse.sum())

    if check_score is not None:
        assert total_sparse == check_score, (
            f"scripted rollout expected {check_score}, got {total_sparse}"
        )


def biased_random_actions(num_players, horizon, seed):
    rng = np.random.RandomState(seed)
    p = np.array([0.13, 0.13, 0.13, 0.13, 0.08, 0.40])
    return rng.choice(6, size=(horizon, num_players), p=p)


@pytest.mark.parametrize("layout_name", CLASSIC_LAYOUTS)
def test_fuzz_classic_layouts(layout_name):
    spec = from_layout_name(layout_name)
    acts = biased_random_actions(spec.num_players, 400, seed=hash(layout_name) % 2**31)
    run_parity(layout_name, acts)


# Scripted cramped_room rollout: cook and deliver one 3-onion soup, with a
# counter drop/pickup detour. Exercises every interact branch + usefulness
# events + delivery reward. (N=0, S=1, E=2, W=3, STAY=4, INTERACT=5)
N, S, E, W, ST, I = 0, 1, 2, 3, 4, 5


def _cramped_room_script():
    p0 = {}
    p1 = {}
    # p1: 3 onions into the pot at (2,0), then start cooking (t is 0-based)
    seq1 = [E, I, W, N, I, E, E, I, W, N, I, E, E, I, W, N, I, I]
    for t, a in enumerate(seq1):
        p1[t] = a
    # p1 clears out to (3,1), then counter-drop detour at (4,2)
    p1[18] = E  # (2,1)->(3,1)
    p1[23] = I  # facing E at onion dispenser (4,1): pick onion
    p1[24] = S  # -> (3,2)
    p1[25] = E  # face (4,2) counter
    p1[26] = I  # drop onion on counter
    p1[27] = I  # pick it back up
    p1[28] = N  # -> (3,1), out of p0's delivery path
    # p0: waits, then dish + soup + delivery
    p0[18] = S  # face dish dispenser (1,3)
    p0[19] = I  # pick dish (useful: pot is cooking)
    p0[20] = N  # -> (1,1)
    p0[21] = E  # -> (2,1)
    p0[22] = N  # face pot
    p0[37] = I  # soup ready (cook tick 20 reached): pick up soup
    p0[38] = S  # -> (2,2)
    p0[39] = E  # -> (3,2)
    p0[40] = S  # face serving location (3,3)
    p0[41] = I  # deliver: +20
    horizon = 43
    acts = np.full((horizon, 2), ST, np.int32)
    for t, a in p0.items():
        acts[t, 0] = a
    for t, a in p1.items():
        acts[t, 1] = a
    return acts


def test_scripted_delivery_cramped_room():
    run_parity("cramped_room", _cramped_room_script(), check_score=20)


@pytest.mark.parametrize(
    "layout_name", ["old_dynamics_cook_test", "old_dynamics_put_test"]
)
def test_old_dynamics_fuzz(layout_name):
    spec = from_layout_name(layout_name, old_dynamics=True)
    acts = biased_random_actions(spec.num_players, 300, seed=7)
    run_parity(layout_name, acts, old_dynamics=True)


def test_old_dynamics_scripted_cook():
    """Old dynamics: pot auto-starts at 3 ingredients; INTERACT never starts it."""
    # single player layout, pot at (2,0) already has 1 onion
    p = [W, W, I, E, N, I, W, W, I, E, N, I]  # add onions #2 and #3
    p += [ST] * 21  # soup auto-starts and cooks (20 ticks)
    p += [S, W, S, I]  # fetch dish from (1,3)
    p += [N, E, N, I]  # pick up soup at pot
    p += [S, E, S, I]  # deliver at (3,3)
    acts = np.asarray(p, np.int32)[:, None]
    run_parity(
        "old_dynamics_cook_test", acts, old_dynamics=True, check_score=20
    )


def test_fuzz_multiplayer():
    spec = from_layout_name("multiplayer_schelling")
    acts = biased_random_actions(spec.num_players, 300, seed=11)
    run_parity("multiplayer_schelling", acts)


def test_fuzz_tomato_recipes():
    # mdp_test has tomatoes, multiple orders, bonus orders, custom values
    spec = from_layout_name("mdp_test")
    acts = biased_random_actions(spec.num_players, 400, seed=3)
    run_parity("mdp_test", acts)


def test_fuzz_soup_coordination():
    # recipe_values / recipe_times layout
    spec = from_layout_name("soup_coordination")
    acts = biased_random_actions(spec.num_players, 400, seed=5)
    run_parity("soup_coordination", acts)
