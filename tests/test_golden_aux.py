"""Oracle-free parity for encoding / featurization / potential via the
committed aux golden fixtures (tests/golden/aux_*.json.gz).

Each fixture holds sampled mid-rollout states plus the reference's
lossless encoding, hand-crafted featurization, and potential value at
each sample (recorded by scripts/gen_golden_fixtures.py — the recompute
escape hatch). The live-oracle equivalents live in test_encoding_parity /
test_featurize_parity / test_potential_parity and are skipped without the
/root/reference mount; these run always.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from overcooked_ai_tpu.core.encoding import lossless_encode_ref_format
from overcooked_ai_tpu.core.featurize import featurize, get_featurize_shape
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.core.potential import build_potential_tables, potential
from overcooked_ai_tpu.core.state import state_from_dict
from overcooked_ai_tpu.planning.tables import build_motion_tables

from . import golden_io
from .scenarios import AUX_LAYOUTS

_feat_jit = jax.jit(featurize, static_argnames=("num_pots",))
_pot_jit = jax.jit(potential)


@pytest.fixture(scope="module", params=sorted(AUX_LAYOUTS))
def aux_case(request):
    layout_name = request.param
    fx = golden_io.load(f"aux_{layout_name}")
    spec = from_layout_name(layout_name)
    tables = build_motion_tables(spec.layout.terrain, counter_goals=[])
    return layout_name, fx, spec, tables


def _states(fx, spec):
    for s in fx["samples"]:
        yield s, jax.tree.map(np.asarray, state_from_dict(s["state"], spec))


def test_golden_encoding(aux_case):
    layout_name, fx, spec, _ = aux_case
    if spec.num_players != 2:
        pytest.skip("lossless encoding is 2-player only")
    for sample, state in _states(fx, spec):
        my_enc = lossless_encode_ref_format(spec.layout, state, horizon=400)
        for p in range(2):
            np.testing.assert_array_equal(
                my_enc[p],
                np.asarray(sample["encoding"][p]),
                err_msg=f"{layout_name} p{p} t={sample['t']}",
            )


def test_golden_featurize(aux_case):
    layout_name, fx, spec, tables = aux_case
    for sample, state in _states(fx, spec):
        my_f = np.asarray(
            _feat_jit(spec.layout, tables.feature_cost, state, num_pots=2)
        )
        assert my_f.shape == (spec.num_players,) + get_featurize_shape(
            spec.num_players
        )
        for p in range(spec.num_players):
            np.testing.assert_array_equal(
                my_f[p],
                np.asarray(sample["featurize"][p], np.float32),
                err_msg=f"{layout_name} p{p} t={sample['t']}",
            )


def test_golden_potential(aux_case):
    layout_name, fx, spec, tables = aux_case
    ptab = jax.tree.map(jnp.asarray, build_potential_tables(spec))
    fc = jnp.asarray(tables.feature_cost)
    for sample, state in _states(fx, spec):
        my_phi = float(_pot_jit(spec.layout, ptab, fc, state))
        assert np.isclose(my_phi, sample["potential"], rtol=1e-4), (
            f"{layout_name} t={sample['t']}: "
            f"ref {sample['potential']} vs mine {my_phi}"
        )
