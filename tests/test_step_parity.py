"""Bit-exact parity of the jitted step function vs the reference MDP.

Primary guard: committed golden fixtures (tests/golden/dynamics_*.json.gz)
holding per-step state dicts, rewards and 25-bit event masks recorded from
the reference implementation — so the dynamics contract holds without the
oracle mount. Regenerate with scripts/gen_golden_fixtures.py (the
`recompute=True` escape hatch of reference testing/overcooked_test.py:
468-525). A live-oracle cross-check (skipped when /root/reference is
absent) guards the generator itself.
"""

import numpy as np
import pytest

import jax

from overcooked_ai_tpu.core.constants import EVENT_TYPES, NUM_EVENTS
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.core.state import (
    canonical_state_dict,
    state_from_dict,
    state_string,
    state_to_dict,
)
from overcooked_ai_tpu.core.step import step

from . import golden_io, oracle
from .scenarios import CLASSIC_LAYOUTS, biased_random_actions  # noqa: F401
# re-exported for sibling parity tests
__all__ = ["biased_random_actions", "CLASSIC_LAYOUTS"]

_step_jit = jax.jit(step)


@pytest.mark.parametrize("name", golden_io.dynamics_names())
def test_golden_dynamics(name):
    """Replay a committed oracle rollout; assert exact per-step parity."""
    fx = golden_io.load(f"dynamics_{name}")
    assert fx["event_types"] == list(EVENT_TYPES)
    spec = from_layout_name(fx["layout"], **fx["overrides"])
    layout = spec.layout

    my_state = jax.tree.map(
        np.asarray, state_from_dict(fx["start_state"], spec)
    )
    # start states must already agree
    assert golden_io.jsonify(
        canonical_state_dict(state_to_dict(my_state, spec))
    ) == fx["start_state"]

    total_sparse = 0
    for t, (acts, rec) in enumerate(zip(fx["actions"], fx["steps"])):
        acts = np.asarray(acts, np.int32)
        my_state, info = _step_jit(layout, my_state, acts)
        my_state, info = jax.device_get((my_state, info))

        my_dict = golden_io.jsonify(
            canonical_state_dict(state_to_dict(my_state, spec))
        )
        # failure messages render the diverged state as ASCII art, the
        # reference's own debugging surface (overcooked_mdp.py:2314)
        assert my_dict == rec["state"], (
            f"{name} state diverged at t={t}; ours:\n"
            f"{state_string(spec, my_state)}"
        )
        np.testing.assert_array_equal(
            np.asarray(info.sparse_reward),
            np.asarray(rec["sparse"]),
            err_msg=f"sparse t={t}",
        )
        np.testing.assert_array_equal(
            np.asarray(info.shaped_reward),
            np.asarray(rec["shaped"]),
            err_msg=f"shaped t={t}",
        )
        np.testing.assert_array_equal(
            np.asarray(info.events),
            golden_io.unpack_events(rec["events"], NUM_EVENTS),
            err_msg=f"events t={t}",
        )
        total_sparse += int(np.sum(info.sparse_reward))
    assert total_sparse == fx["total_sparse"]


def test_golden_fixtures_complete():
    """All committed scenarios are present (guards accidental deletion)."""
    names = set(golden_io.dynamics_names())
    expected = set(CLASSIC_LAYOUTS) | {
        "cramped_room_scripted",
        "old_dynamics_cook_test_fuzz",
        "old_dynamics_put_test_fuzz",
        "old_dynamics_cook_scripted",
        "multiplayer_schelling",
        "mdp_test_tomato",
        "soup_coordination",
    }
    assert expected <= names, f"missing fixtures: {expected - names}"


@pytest.mark.skipif(
    not oracle.available(), reason="reference oracle not mounted"
)
def test_live_oracle_cross_check():
    """Drive the live reference with a stream NOT in any fixture; guards
    the fixture generator (and state_from_dict/to_dict) against drift."""
    layout_name = "cramped_room"
    mdp = oracle.make_mdp(layout_name)
    spec = from_layout_name(layout_name)
    layout = spec.layout

    ref_state = mdp.get_standard_start_state()
    my_state = jax.tree.map(np.asarray, state_from_dict(ref_state.to_dict(), spec))
    acts = biased_random_actions(spec.num_players, 400, seed=99)

    for t in range(len(acts)):
        a = np.asarray(acts[t], np.int32)
        ref_state, infos = oracle.ref_step(mdp, ref_state, a)
        my_state, info = _step_jit(layout, my_state, a)
        my_state, info = jax.device_get((my_state, info))
        assert canonical_state_dict(state_to_dict(my_state, spec)) == (
            canonical_state_dict(ref_state.to_dict())
        ), f"state diverged at t={t}"
        np.testing.assert_array_equal(
            np.asarray(info.sparse_reward),
            np.asarray(infos["sparse_reward_by_agent"]),
        )
        np.testing.assert_array_equal(
            np.asarray(info.shaped_reward),
            np.asarray(infos["shaped_reward_by_agent"]),
        )
        np.testing.assert_array_equal(
            np.asarray(info.events),
            oracle.events_matrix(infos["event_infos"], mdp.num_players),
        )
