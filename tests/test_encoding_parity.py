"""Parity of the lossless encoding vs reference lossless_state_encoding."""

import numpy as np
import pytest

import jax

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.core.encoding import lossless_encode_ref_format
from overcooked_ai_tpu.core.state import state_from_dict
from overcooked_ai_tpu.core.step import step

from . import oracle
from .test_step_parity import biased_random_actions

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference oracle not mounted"
)

_step_jit = jax.jit(step)


@pytest.mark.parametrize(
    "layout_name", ["cramped_room", "counter_circuit", "asymmetric_advantages"]
)
def test_lossless_encoding_parity(layout_name):
    mdp = oracle.make_mdp(layout_name)
    spec = from_layout_name(layout_name)
    layout = spec.layout

    ref_state = mdp.get_standard_start_state()
    my_state = jax.tree.map(
        np.asarray, state_from_dict(ref_state.to_dict(), spec)
    )
    acts = biased_random_actions(spec.num_players, 150, seed=13)

    for t in range(len(acts)):
        ref_enc = mdp.lossless_state_encoding(ref_state, horizon=400)
        my_enc = lossless_encode_ref_format(layout, my_state, horizon=400)
        for p in range(spec.num_players):
            np.testing.assert_array_equal(
                my_enc[p], ref_enc[p], err_msg=f"{layout_name} p{p} t={t}"
            )
        ref_state, _ = oracle.ref_step(mdp, ref_state, acts[t])
        my_state, _ = _step_jit(layout, my_state, acts[t])
        my_state = jax.device_get(my_state)


def test_encoding_near_horizon_urgency():
    """Urgency layer flips on when horizon - t < 40."""
    mdp = oracle.make_mdp("cramped_room")
    spec = from_layout_name("cramped_room")
    ref_state = mdp.get_standard_start_state()
    ref_state.timestep = 370
    my_state = jax.tree.map(
        np.asarray, state_from_dict(ref_state.to_dict(), spec)
    )
    ref_enc = mdp.lossless_state_encoding(ref_state, horizon=400)
    my_enc = lossless_encode_ref_format(spec.layout, my_state, horizon=400)
    for p in range(2):
        np.testing.assert_array_equal(my_enc[p], ref_enc[p])
    assert my_enc[0][..., 25].all(), "urgency layer should be all ones"
