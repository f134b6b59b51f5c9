"""Parity of the device potential function vs reference potential_function.

The reference computes in float64, ours in float32 -> compare with
rtol=1e-4 (values are O(100))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.core.potential import build_potential_tables, potential
from overcooked_ai_tpu.core.state import state_from_dict
from overcooked_ai_tpu.core.step import step
from overcooked_ai_tpu.planning.tables import build_motion_tables

from . import oracle
from .test_planning_parity import make_ref_motion_planner
from .test_step_parity import biased_random_actions

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference oracle not mounted"
)

_step_jit = jax.jit(step)


@pytest.mark.parametrize(
    "layout_name",
    ["cramped_room", "counter_circuit", "asymmetric_advantages", "mdp_test"],
)
def test_potential_parity(layout_name):
    mdp = oracle.make_mdp(layout_name)
    spec = from_layout_name(layout_name)
    mp = make_ref_motion_planner(mdp, counter_goals=[])
    tables = build_motion_tables(spec.layout.terrain, counter_goals=[])
    ptab = jax.tree.map(jnp.asarray, build_potential_tables(spec))
    fc = jnp.asarray(tables.feature_cost)
    pot_jit = jax.jit(potential)

    ref_state = mdp.get_standard_start_state()
    my_state = jax.tree.map(
        np.asarray, state_from_dict(ref_state.to_dict(), spec)
    )
    acts = biased_random_actions(spec.num_players, 250, seed=31)

    for t in range(len(acts)):
        ref_phi = mdp.potential_function(ref_state, mp)
        my_phi = float(pot_jit(spec.layout, ptab, fc, my_state))
        assert np.isclose(my_phi, ref_phi, rtol=1e-4), (
            f"{layout_name} t={t}: ref {ref_phi} vs mine {my_phi}"
        )
        ref_state, _ = oracle.ref_step(mdp, ref_state, acts[t])
        my_state, _ = _step_jit(spec.layout, my_state, acts[t])
        my_state = jax.device_get(my_state)
