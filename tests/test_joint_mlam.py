"""Joint planner + MLAM enumeration tests (parity vs reference where the
reference exposes comparable quantities)."""

import numpy as np
import pytest

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.planning.joint import JointMotionTables
from overcooked_ai_tpu.planning.mlam import (
    MediumLevelActionManager,
    NO_COUNTERS_PARAMS,
)
from overcooked_ai_tpu.planning.tables import INF_COST

from . import oracle


def test_joint_distance_basic():
    spec = from_layout_name("cramped_room")
    jt = JointMotionTables(np.asarray(spec.layout.terrain))
    # identical start/goal
    assert jt.joint_distance(((1, 1), (3, 1)), ((1, 1), (3, 1))) == 0
    # simple two-step move for one agent
    d = jt.joint_distance(((1, 1), (3, 1)), ((1, 2), (3, 1)))
    assert d == 1
    # swapping two adjacent agents requires a detour, not a swap
    d_swap = jt.joint_distance(((1, 1), (2, 1)), ((2, 1), (1, 1)))
    assert 2 < d_swap < INF_COST
    plan = jt.joint_plan(((1, 1), (2, 1)), ((2, 1), (1, 1)))
    assert plan is not None and len(plan) >= 2


@pytest.mark.skipif(not oracle.available(), reason="no oracle")
def test_joint_distance_vs_reference_graph():
    """Spot-check joint distances against the reference JointMotionPlanner's
    joint graph (same node/edge semantics)."""
    import tempfile

    oracle.load()  # puts the reference on sys.path
    from overcooked_ai_py.planning import planners as ref_planners

    ref_planners.PLANNERS_DIR = tempfile.mkdtemp()
    mdp = oracle.make_mdp("cramped_room")
    jmp = ref_planners.JointMotionPlanner(
        mdp, ref_planners.NO_COUNTERS_PARAMS
    )
    spec = from_layout_name("cramped_room")
    jt = JointMotionTables(np.asarray(spec.layout.terrain))

    graph = jmp.joint_graph_problem
    encoder = graph._encoder  # joint position pair -> node index
    rng = np.random.RandomState(0)
    starts_goals = []
    nodes = list(encoder.keys())
    for _ in range(25):
        s = nodes[rng.randint(len(nodes))]
        g = nodes[rng.randint(len(nodes))]
        starts_goals.append((s, g))
    dist_matrix = graph.distance_matrix  # dense all-pairs matrix
    for s, g in starts_goals:
        ref_d = dist_matrix[encoder[s], encoder[g]]
        my_d = jt.joint_distance(s, g)
        if np.isinf(ref_d) or ref_d >= INF_COST:
            assert my_d >= INF_COST
        else:
            assert my_d == int(ref_d), f"{s}->{g}: ref {ref_d} vs {my_d}"


def test_mlam_enumeration():
    spec = from_layout_name("cramped_room")
    mlam = MediumLevelActionManager(spec, NO_COUNTERS_PARAMS)
    start = {
        "players": [
            {"position": (1, 2), "orientation": (0, -1), "held_object": None},
            {"position": (3, 1), "orientation": (0, -1), "held_object": None},
        ],
        "objects": [],
    }
    actions = mlam.get_medium_level_actions(start, 0)
    # empty-handed: onion + dish pickups possible (2 onion disps, 1 dish disp)
    assert len(actions) >= 3
    # holding a soup: only serving goals
    start["players"][0]["held_object"] = {
        "name": "soup",
        "position": (1, 2),
        "_ingredients": [{"name": "onion", "position": (1, 2)}] * 3,
        "cooking_tick": 20,
        "is_ready": True,
        "is_idle": False,
        "is_cooking": False,
        "cook_time": 20,
    }
    deliver = mlam.get_medium_level_actions(start, 0)
    assert len(deliver) == len(mlam.deliver_soup_actions())


def test_native_joint_tables_match_python():
    """The C++ all-pairs kernel (native/planner_tables.cpp) must produce
    the exact table the Python Dijkstra fallback does."""
    from overcooked_ai_tpu.planning import _native
    from overcooked_ai_tpu.planning.joint import JointMotionTables

    spec = from_layout_name("cramped_room")
    terrain = np.asarray(spec.layout.terrain)
    if not _native.available():
        pytest.skip("native toolchain unavailable")
    a = JointMotionTables(terrain)
    # force the Python path
    saved = (_native._lib, _native._load_failed)
    try:
        _native._lib, _native._load_failed = None, True
        b = JointMotionTables(terrain)
    finally:
        _native._lib, _native._load_failed = saved
    np.testing.assert_array_equal(a.dist, b.dist)
