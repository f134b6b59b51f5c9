"""Motion-planning distance tables (host precompute, device lookup).

The reference MotionPlanner precomputes a dict of full action plans between
every ((pos, orient), motion-goal) pair (reference planners.py:178-199) and
answers `min_cost_to_feature` queries by scanning goals per feature position
(:391-423). Here the same information is collapsed into one dense int32
table built once per layout on host:

    feature_cost[o, y, x, fy, fx] =
        min #actions for a player at ((x, y), o) to reach a valid motion
        goal adjacent to feature cell (fx, fy) facing it, +1 for the final
        INTERACT -- i.e. exactly the reference `min_cost_to_feature` for a
        single feature cell (planners.py:391-423, "+1" at :419).

    INF_COST where the feature is unreachable, not a feature cell, or an
    excluded counter (reference is_valid_motion_goal, :211-230: counters
    are valid goals only when listed in `counter_goals`; the default
    NO_COUNTERS_PARAMS excludes all of them, :27-34).

Graph semantics replicated (reference :315-358): nodes are (empty cell,
orientation); each of the 4 direction actions moves to the adjacent cell if
empty (re-orienting), else turns in place; all edges cost 1. Tiny graphs
(<=4*~50 nodes) -- plain numpy BFS.

The table is ~(4 * HW * HW) ints (tens of KB): device-resident, so
featurization, the potential function and the greedy agent become pure
lookups inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from overcooked_ai_tpu.core.constants import (
    DIRECTION_TO_TUPLE,
    TERRAIN_CODE_TO_CHAR,
    TERRAIN_COUNTER,
    TERRAIN_EMPTY,
)

INF_COST = 1 << 20  # additive-safe int32 infinity sentinel


class MotionTables(NamedTuple):
    """Device-side planning tables for one layout + counter_goals config."""

    feature_cost: np.ndarray  # (4, H, W, H, W) int32, see module docstring
    # min over the four goal orientations of the pure movement distance
    # between empty cells (no interact, no facing constraint); used by the
    # greedy agent's unstuck logic and debugging
    point_dist: np.ndarray  # (4, H, W, H, W) int32 node distance to
    #                          (target cell, any orientation), INF if blocked


def _bfs_from(adj, src):
    """Unit-cost BFS over an adjacency list; returns distance array."""
    n = len(adj)
    dist = np.full(n, INF_COST, np.int64)
    dist[src] = 0
    frontier = [src]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if dist[v] > d:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


def build_motion_tables(terrain: np.ndarray, counter_goals=()) -> MotionTables:
    """Build MotionTables for a terrain grid.

    counter_goals: iterable of (x, y) counter cells allowed as motion goals
    (reference MotionPlanner counter_goals, planners.py:56-61).
    """
    height, width = terrain.shape
    counter_goal_set = {tuple(p) for p in counter_goals}
    dirs = [DIRECTION_TO_TUPLE[d] for d in range(4)]

    empty = terrain == TERRAIN_EMPTY
    # node index = ((y * width) + x) * 4 + o for empty cells; dense over all
    # cells for simplicity (non-empty rows stay unreachable)
    n_nodes = height * width * 4

    def nid(x, y, o):
        return (y * width + x) * 4 + o

    adj = [[] for _ in range(n_nodes)]
    for y in range(height):
        for x in range(width):
            if not empty[y, x]:
                continue
            for o in range(4):
                u = nid(x, y, o)
                for d, (dx, dy) in enumerate(dirs):
                    nx, ny = x + dx, y + dy
                    if 0 <= nx < width and 0 <= ny < height and empty[ny, nx]:
                        adj[u].append(nid(nx, ny, d))
                    else:
                        adj[u].append(nid(x, y, d))

    # all-pairs node distances via BFS from every node
    node_dist = np.full((n_nodes, n_nodes), INF_COST, np.int64)
    for y in range(height):
        for x in range(width):
            if not empty[y, x]:
                continue
            for o in range(4):
                u = nid(x, y, o)
                node_dist[u] = _bfs_from(adj, u)

    # valid motion goals per feature cell: adjacent empty cell, facing it
    # (reference _get_possible_motion_goals_for_feature, planners.py:439-450)
    feature_cost = np.full((4, height, width, height, width), INF_COST, np.int64)
    point_dist = np.full((4, height, width, height, width), INF_COST, np.int64)
    for fy in range(height):
        for fx in range(width):
            t = terrain[fy, fx]
            goals = []
            if t != TERRAIN_EMPTY:
                if t == TERRAIN_COUNTER and (fx, fy) not in counter_goal_set:
                    goals = []  # excluded counter: no valid goals (:225-229)
                else:
                    for d, (dx, dy) in enumerate(dirs):
                        ax, ay = fx + dx, fy + dy
                        if (
                            0 <= ax < width
                            and 0 <= ay < height
                            and empty[ay, ax]
                        ):
                            # player stands at (ax, ay) facing OPPOSITE of d
                            opposite = {0: 1, 1: 0, 2: 3, 3: 2}[d]
                            goals.append((ax, ay, opposite))
            if goals:
                goal_ids = [nid(*g) for g in goals]
                d_to_goals = node_dist[:, goal_ids].min(axis=1) + 1  # +INTERACT
                feature_cost[:, :, :, fy, fx] = (
                    d_to_goals.reshape(height, width, 4)
                    .transpose(2, 0, 1)
                    .clip(max=INF_COST)
                )
            if empty[fy, fx]:
                tgt = [nid(fx, fy, o) for o in range(4)]
                d_to_cell = node_dist[:, tgt].min(axis=1)
                point_dist[:, :, :, fy, fx] = (
                    d_to_cell.reshape(height, width, 4).transpose(2, 0, 1)
                )

    return MotionTables(
        feature_cost=np.minimum(feature_cost, INF_COST).astype(np.int32),
        point_dist=np.minimum(point_dist, INF_COST).astype(np.int32),
    )


def terrain_to_chars(terrain: np.ndarray):
    return [
        "".join(TERRAIN_CODE_TO_CHAR[int(c)] for c in row) for row in terrain
    ]
