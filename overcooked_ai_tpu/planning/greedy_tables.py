"""First-action tables for the on-device greedy human model.

The reference GreedyHumanModel picks a motion goal (adjacent cell facing a
feature) with minimal precomputed plan cost and takes the plan's first
action (reference agents/agent.py:443-458, planners dict lookups). Here the
equivalent information is a dense table:

    first_action[o, y, x, fy, fx] = first action (0..5) of a canonical
    optimal plan from ((x, y), o) to the best motion goal of feature cell
    (fx, fy); INTERACT when already at a valid goal; STAY if unreachable.

Canonical plan tie-breaking is N,S,E,W action order (the reference's exact
tie-break depends on its graph path reconstruction; any optimal first
action is behaviorally equivalent, and scenario tests validate behavior).
"""

from __future__ import annotations

import numpy as np

from overcooked_ai_tpu.core.constants import (
    ACTION_INTERACT,
    ACTION_STAY,
    DIRECTION_TO_TUPLE,
    TERRAIN_COUNTER,
    TERRAIN_EMPTY,
)
from overcooked_ai_tpu.planning.tables import INF_COST, _bfs_from


def build_first_action_table(terrain: np.ndarray, counter_goals=()):
    """Returns (first_action (4,H,W,H,W) int8, feature_cost-consistent)."""
    height, width = terrain.shape
    counter_goal_set = {tuple(p) for p in counter_goals}
    dirs = [DIRECTION_TO_TUPLE[d] for d in range(4)]
    empty = terrain == TERRAIN_EMPTY
    n_nodes = height * width * 4

    def nid(x, y, o):
        return (y * width + x) * 4 + o

    adj = [[] for _ in range(n_nodes)]
    succ = {}  # (node, action) -> node
    for y in range(height):
        for x in range(width):
            if not empty[y, x]:
                continue
            for o in range(4):
                u = nid(x, y, o)
                for d, (dx, dy) in enumerate(dirs):
                    nx, ny = x + dx, y + dy
                    if 0 <= nx < width and 0 <= ny < height and empty[ny, nx]:
                        v = nid(nx, ny, d)
                    else:
                        v = nid(x, y, d)
                    adj[u].append(v)
                    succ[(u, d)] = v

    # distance FROM every node TO every node: BFS on reversed graph per goal
    radj = [[] for _ in range(n_nodes)]
    for u, vs in enumerate(adj):
        for v in vs:
            radj[v].append(u)

    dist_to = {}  # goal node -> array of dist from each node

    def dist_to_goal(g):
        if g not in dist_to:
            dist_to[g] = _bfs_from(radj, g)
        return dist_to[g]

    first_action = np.full(
        (4, height, width, height, width), ACTION_STAY, np.int8
    )
    for fy in range(height):
        for fx in range(width):
            t = terrain[fy, fx]
            if t == TERRAIN_EMPTY:
                continue
            if t == TERRAIN_COUNTER and (fx, fy) not in counter_goal_set:
                continue
            goals = []
            for d, (dx, dy) in enumerate(dirs):
                ax, ay = fx + dx, fy + dy
                if 0 <= ax < width and 0 <= ay < height and empty[ay, ax]:
                    opposite = {0: 1, 1: 0, 2: 3, 3: 2}[d]
                    goals.append(nid(ax, ay, opposite))
            if not goals:
                continue
            goal_dists = [dist_to_goal(g) for g in goals]
            for y in range(height):
                for x in range(width):
                    if not empty[y, x]:
                        continue
                    for o in range(4):
                        u = nid(x, y, o)
                        ds = [gd[u] for gd in goal_dists]
                        best = int(np.argmin(ds))  # first goal wins ties
                        if ds[best] >= INF_COST:
                            continue
                        g = goals[best]
                        if u == g:
                            first_action[o, y, x, fy, fx] = ACTION_INTERACT
                            continue
                        gd = goal_dists[best]
                        # first direction action on a shortest node path
                        for a in range(4):
                            v = succ[(u, a)]
                            if gd[v] == gd[u] - 1:
                                first_action[o, y, x, fy, fx] = a
                                break
    return first_action


def build_goal_tables(terrain: np.ndarray, counter_goals=()):
    """Per-goal (not per-cell-min) cost + first-action tables.

    The reference's Boltzmann-rational greedy human softmaxes over the
    individual motion goals -- one per (feature cell, approach direction)
    pair (reference agent.py:407-440, choose_motion_goal with
    hl_boltzmann_rational). Returns:

      goal_cost[o, y, x, d, fy, fx] int32: reference get_plan cost
        (#motion actions + 1 for INTERACT, planners.py:309-313) from
        ((x, y), o) to the goal "stand on the empty cell at (fx,fy)+dirs[d]
        facing the feature"; INF_COST for invalid/unreachable goals.
      goal_first_action[o, y, x, d, fy, fx] int8: first action of a
        canonical optimal plan (INTERACT when already at the goal, STAY if
        unreachable; N,S,E,W tie order).
    """
    height, width = terrain.shape
    counter_goal_set = {tuple(p) for p in counter_goals}
    dirs = [DIRECTION_TO_TUPLE[d] for d in range(4)]
    empty = terrain == TERRAIN_EMPTY
    n_nodes = height * width * 4

    def nid(x, y, o):
        return (y * width + x) * 4 + o

    adj = [[] for _ in range(n_nodes)]
    succ = {}
    for y in range(height):
        for x in range(width):
            if not empty[y, x]:
                continue
            for o in range(4):
                u = nid(x, y, o)
                for d, (dx, dy) in enumerate(dirs):
                    nx, ny = x + dx, y + dy
                    if 0 <= nx < width and 0 <= ny < height and empty[ny, nx]:
                        v = nid(nx, ny, d)
                    else:
                        v = nid(x, y, d)
                    adj[u].append(v)
                    succ[(u, d)] = v

    radj = [[] for _ in range(n_nodes)]
    for u, vs in enumerate(adj):
        for v in vs:
            radj[v].append(u)

    goal_cost = np.full(
        (4, height, width, 4, height, width), INF_COST, np.int64
    )
    goal_first_action = np.full(
        (4, height, width, 4, height, width), ACTION_STAY, np.int8
    )
    for fy in range(height):
        for fx in range(width):
            t = terrain[fy, fx]
            if t == TERRAIN_EMPTY:
                continue
            if t == TERRAIN_COUNTER and (fx, fy) not in counter_goal_set:
                continue
            for d, (dx, dy) in enumerate(dirs):
                ax, ay = fx + dx, fy + dy
                if not (
                    0 <= ax < width and 0 <= ay < height and empty[ay, ax]
                ):
                    continue
                opposite = {0: 1, 1: 0, 2: 3, 3: 2}[d]
                g = nid(ax, ay, opposite)
                gd = _bfs_from(radj, g)
                for y in range(height):
                    for x in range(width):
                        if not empty[y, x]:
                            continue
                        for o in range(4):
                            u = nid(x, y, o)
                            if gd[u] >= INF_COST:
                                continue
                            goal_cost[o, y, x, d, fy, fx] = gd[u] + 1
                            if u == g:
                                goal_first_action[
                                    o, y, x, d, fy, fx
                                ] = ACTION_INTERACT
                                continue
                            for a in range(4):
                                if gd[succ[(u, a)]] == gd[u] - 1:
                                    goal_first_action[o, y, x, d, fy, fx] = a
                                    break
    return (
        np.minimum(goal_cost, INF_COST).astype(np.int32),
        goal_first_action,
    )


def build_greedy_tables(spec, counter_goals=()):
    """One-call builder of the GreedyTables pytree for a LayoutSpec."""
    import jax.numpy as jnp

    from overcooked_ai_tpu.agents.agents import GreedyTables
    from overcooked_ai_tpu.planning.tables import build_motion_tables

    mt = build_motion_tables(spec.layout.terrain)
    fa = build_first_action_table(spec.layout.terrain, counter_goals)
    return GreedyTables(
        feature_cost=jnp.asarray(mt.feature_cost),
        first_action=jnp.asarray(fa),
    )
