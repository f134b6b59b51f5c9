"""Parity of the device featurization vs reference featurize_state."""

import numpy as np
import pytest

import jax

from overcooked_ai_tpu.core.featurize import featurize, get_featurize_shape
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.core.state import state_from_dict
from overcooked_ai_tpu.core.step import step

from . import oracle
from .test_planning_parity import make_ref_motion_planner
from .test_step_parity import biased_random_actions

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference oracle not mounted"
)

_step_jit = jax.jit(step)
_feat_jit = jax.jit(featurize, static_argnames=("num_pots",))


class _MlamShim:
    """Minimal stand-in for MediumLevelActionManager: featurize_state only
    uses mlam.motion_planner (reference overcooked_mdp.py:2822)."""

    def __init__(self, mp):
        self.motion_planner = mp


@pytest.mark.parametrize(
    "layout_name", ["cramped_room", "counter_circuit", "asymmetric_advantages"]
)
def test_featurize_parity(layout_name):
    mdp = oracle.make_mdp(layout_name)
    spec = from_layout_name(layout_name)
    from overcooked_ai_tpu.planning.tables import build_motion_tables

    mp = make_ref_motion_planner(mdp, counter_goals=[])
    tables = build_motion_tables(spec.layout.terrain, counter_goals=[])
    mlam = _MlamShim(mp)

    ref_state = mdp.get_standard_start_state()
    my_state = jax.tree.map(
        np.asarray, state_from_dict(ref_state.to_dict(), spec)
    )
    acts = biased_random_actions(spec.num_players, 120, seed=21)

    mismatch_allowance = 0  # counter-object tie-order divergences tolerated
    for t in range(len(acts)):
        ref_f = mdp.featurize_state(ref_state, mlam, num_pots=2)
        my_f = np.asarray(
            _feat_jit(spec.layout, tables.feature_cost, my_state)
        )
        assert my_f.shape == (spec.num_players,) + get_featurize_shape(
            spec.num_players
        )
        for p in range(spec.num_players):
            np.testing.assert_array_equal(
                my_f[p],
                np.asarray(ref_f[p], dtype=np.float32),
                err_msg=f"{layout_name} p{p} t={t}",
            )
        ref_state, _ = oracle.ref_step(mdp, ref_state, acts[t])
        my_state, _ = _step_jit(spec.layout, my_state, acts[t])
        my_state = jax.device_get(my_state)
    del mismatch_allowance
