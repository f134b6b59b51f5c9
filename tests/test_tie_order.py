"""Counter-object tie-order parity (VERDICT r1 weak #6, NOTES gap 4).

The reference breaks featurize cost ties by candidate-list order:
dispensers (terrain order) first, then counter objects in dict-INSERTION
order (min_cost_to_feature takes the first strict min, planners.py:404-417;
candidate lists built at overcooked_mdp.py:2769-2800). State.obj_seq now
carries that insertion order, so featurization must match the reference on
engineered equal-cost counter objects -- in BOTH insertion orders.
"""

import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from overcooked_ai_tpu.core.featurize import featurize
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.core.state import state_from_dict, state_to_dict
from overcooked_ai_tpu.planning.tables import build_motion_tables

from . import oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference oracle not mounted"
)


def _ref_featurize(mdp, counter_goals, ref_state, num_pots=2):
    oracle.load()
    from overcooked_ai_py.planning import planners as ref_planners

    ref_planners.PLANNERS_DIR = tempfile.mkdtemp()
    params = dict(ref_planners.NO_COUNTERS_PARAMS)
    params["counter_goals"] = counter_goals
    mlam = ref_planners.MediumLevelActionManager.from_pickle_or_compute(
        mdp, params, force_compute=True
    )
    return mdp.featurize_state(ref_state, mlam, num_pots=num_pots)


def test_counter_object_tie_order_matches_reference():
    """Two equal-cost counter onions: the insertion-order winner must match
    the reference for both insertion orders."""
    layout_name = "cramped_room"
    spec = from_layout_name(layout_name)
    mdp = oracle.make_mdp(layout_name)
    base = mdp.get_standard_start_state().to_dict()

    # two counter cells symmetric around player 0 at (1, 2): (0, 1) and
    # (2, 3)? choose cells with EQUAL feature cost from player 0's pose
    counter_cells = [(0, 1), (0, 2), (4, 1), (4, 2), (2, 3), (1, 0), (3, 0)]
    tables = build_motion_tables(
        np.asarray(spec.layout.terrain), counter_goals=counter_cells
    )
    fc = np.asarray(tables.feature_cost)
    p = base["players"][0]
    (px, py) = p["position"]
    o = {(0, -1): 0, (0, 1): 1, (1, 0): 2, (-1, 0): 3}[tuple(p["orientation"])]
    costs = {c: int(fc[o, py, px, c[1], c[0]]) for c in counter_cells}
    # find two distinct cells with equal finite cost
    pairs = [
        (a, b)
        for i, a in enumerate(counter_cells)
        for b in counter_cells[i + 1 :]
        if costs[a] == costs[b] and costs[a] < 10**6
    ]
    assert pairs, f"no equal-cost counter pair found: {costs}"
    cell_a, cell_b = pairs[0]

    def onion_at(c):
        return {"name": "onion", "position": list(c)}

    layout_dev = jax.tree.map(jnp.asarray, spec.layout)
    fc_dev = jnp.asarray(tables.feature_cost)

    for order in ([cell_a, cell_b], [cell_b, cell_a]):
        sd = dict(base)
        sd["objects"] = [onion_at(c) for c in order]
        ref_state = oracle.load()[0].OvercookedState.from_dict(sd)
        ref_feats = _ref_featurize(mdp, counter_cells, ref_state)
        my_state = state_from_dict(sd, spec)
        my_feats = np.asarray(
            featurize(layout_dev, fc_dev, jax.tree.map(jnp.asarray, my_state))
        )
        for i in range(2):
            np.testing.assert_array_equal(
                my_feats[i],
                np.asarray(ref_feats[i], np.float32),
                err_msg=f"insertion order {order}, player {i}",
            )


def test_to_dict_emits_insertion_order():
    """state_to_dict object order == reference dict-insertion order after
    drops (reference OvercookedState.to_dict)."""
    from overcooked_ai_tpu.core.step import step as env_transition

    spec = from_layout_name("cramped_room")
    mdp = oracle.make_mdp("cramped_room")
    layout = jax.tree.map(jnp.asarray, spec.layout)
    ref_state = mdp.get_standard_start_state()
    my_state = state_from_dict(ref_state.to_dict(), spec)
    step_jit = jax.jit(env_transition)

    rng = np.random.RandomState(4)
    checked = 0
    for k in range(300):
        a = rng.randint(0, 6, size=2)
        ref_state, _ = mdp.get_state_transition(
            ref_state, tuple(oracle.action_int_to_ref(x) for x in a)
        )
        my_state, _ = step_jit(layout, my_state, jnp.asarray(a, jnp.int32))
        ref_objs = [
            (o["name"], tuple(o["position"]))
            for o in ref_state.to_dict()["objects"]
        ]
        my_objs = [
            (o["name"], tuple(o["position"]))
            for o in state_to_dict(jax.device_get(my_state), spec)["objects"]
        ]
        assert my_objs == ref_objs, (k, my_objs, ref_objs)
        if len(ref_objs) >= 2:
            checked += 1
    assert checked > 5, "fuzz never saw 2+ simultaneous objects"
