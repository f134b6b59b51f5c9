"""Parity of motion distance tables vs reference MotionPlanner."""

import numpy as np
import pytest

from overcooked_ai_tpu.core.constants import (
    DIRECTION_TO_TUPLE,
    TERRAIN_EMPTY,
)
from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.planning.tables import INF_COST, build_motion_tables

from . import oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference oracle not mounted"
)


def make_ref_motion_planner(mdp, counter_goals=[]):
    """Build a reference MotionPlanner without touching its pickle cache dir."""
    import tempfile

    from overcooked_ai_py.planning import planners as ref_planners

    ref_planners.PLANNERS_DIR = tempfile.mkdtemp()  # never write /root/reference
    return ref_planners.MotionPlanner(mdp, counter_goals=counter_goals)


@pytest.mark.parametrize(
    "layout_name,with_counters",
    [
        ("cramped_room", False),
        ("coordination_ring", False),
        ("forced_coordination", False),  # disconnected components
        ("counter_circuit", True),
    ],
)
def test_min_cost_to_feature_parity(layout_name, with_counters):
    mdp = oracle.make_mdp(layout_name)
    spec = from_layout_name(layout_name)
    counter_goals = mdp.get_counter_locations() if with_counters else []
    mp = make_ref_motion_planner(mdp, counter_goals)
    tables = build_motion_tables(spec.layout.terrain, counter_goals)

    terrain = np.asarray(spec.layout.terrain)
    height, width = terrain.shape

    # every feature cell class the reference queries
    feature_cells = [
        (x, y)
        for y in range(height)
        for x in range(width)
        if terrain[y, x] != TERRAIN_EMPTY
    ]
    starts = [
        ((x, y), o)
        for y in range(height)
        for x in range(width)
        if terrain[y, x] == TERRAIN_EMPTY
        for o in range(4)
    ]
    checked = 0
    for (pos, o) in starts:
        start = (pos, DIRECTION_TO_TUPLE[o])
        for f in feature_cells:
            ref_cost = mp.min_cost_to_feature(start, [f])
            mine = int(tables.feature_cost[o, pos[1], pos[0], f[1], f[0]])
            if ref_cost == np.inf:
                assert mine >= INF_COST, f"{start}->{f}: ref inf, mine {mine}"
            else:
                assert mine == ref_cost, (
                    f"{start}->{f}: ref {ref_cost}, mine {mine}"
                )
            checked += 1
    assert checked > 100


def test_motion_table_disk_cache(tmp_path):
    """Planner-table cache (reference data/planners pickles): second build
    loads the .npz; corrupt cache falls back to recompute-and-rewrite."""
    import numpy as np

    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.planning.cache import cached_motion_tables

    terrain = np.asarray(from_layout_name("cramped_room").layout.terrain)
    t1 = cached_motion_tables(terrain, cache_dir=str(tmp_path))
    files = list(tmp_path.glob("mt_*.npz"))
    assert len(files) == 1
    t2 = cached_motion_tables(terrain, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(t1.feature_cost, t2.feature_cost)
    np.testing.assert_array_equal(t1.point_dist, t2.point_dist)
    # different counter_goals -> different key, no collision
    cached_motion_tables(terrain, counter_goals=[(2, 0)],
                         cache_dir=str(tmp_path))
    assert len(list(tmp_path.glob("mt_*.npz"))) == 2
    # corrupt cache: silently recomputed and rewritten
    files[0].write_bytes(b"garbage")
    t3 = cached_motion_tables(terrain, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(t1.feature_cost, t3.feature_cost)
