"""Potential function phi(s) -- dense reward shaping.

Reproduces the reference `OvercookedGridworld.potential_function`
(reference overcooked_mdp.py:2920-3250): the discounted value of the
greedy-optimal completion of every soup/ingredient/dish in flight, plus a
steady-state term. The reference implementation is deeply sequential
(sorted dict/list iteration with mutation); this module splits it into

  * host precompute (`build_potential_tables`): all recipe-graph DFS
    results (exactly replicating the reference DFS visit order so ties
    resolve identically, :1976-2061), the steady-state constant, layout
    potential constants (POTENTIAL_CONSTANTS, :1060-1073), and -- the
    subtle one -- the CPython set-iteration order of
    `get_partially_full_pots` (:1882-1890), which the reference leaks into
    its processing order; we enumerate all 3^K pot-bucket combinations and
    record each resulting order.

  * a device function (`potential`) that is pure jnp over a static pot
    list: per-pot quantities, player->pot distance lookups from the
    planning tables, and unrolled loops over (<= K pots) x (<= 3 missing
    ingredients) with one-hot selection -- jit/vmap-able.

Numerics: the reference computes in float64; the device computes in
float32, so parity holds to ~1e-5 relative (tests use np.isclose).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from overcooked_ai_tpu.core.constants import (
    MAX_NUM_INGREDIENTS,
    OBJ_DISH,
    OBJ_NONE,
    OBJ_ONION,
    OBJ_SOUP,
    OBJ_TOMATO,
    TERRAIN_POT,
    TERRAIN_SERVE,
)
from overcooked_ai_tpu.core.state import State
from overcooked_ai_tpu.core.step import _slot_counts
from overcooked_ai_tpu.planning.tables import INF_COST

# reference POTENTIAL_CONSTANTS (overcooked_mdp.py:1060-1073)
POTENTIAL_CONSTANTS = {
    "default": {
        "max_delivery_steps": 10,
        "max_pickup_steps": 10,
        "pot_onion_steps": 10,
        "pot_tomato_steps": 10,
    },
    "mdp_test_tomato": {
        "max_delivery_steps": 4,
        "max_pickup_steps": 4,
        "pot_onion_steps": 5,
        "pot_tomato_steps": 6,
    },
}


class PotentialTables(NamedTuple):
    """Device-side tables for the potential function (one layout)."""

    gamma: np.ndarray  # ()
    steady_state_value: np.ndarray  # ()
    max_delivery_steps: np.ndarray  # ()
    max_pickup_steps: np.ndarray  # ()
    pot_onion_steps: np.ndarray  # ()
    pot_tomato_steps: np.ndarray  # ()
    onion_value: np.ndarray  # ()
    tomato_value: np.ndarray  # ()
    # discounted-opt recipe tables indexed [n_onions, n_tomatoes] (base)
    opt_no: np.ndarray  # (4, 4) int32   optimal recipe onion count
    opt_nt: np.ndarray  # (4, 4) int32   optimal recipe tomato count
    opt_disc_value: np.ndarray  # (4, 4) f32 discounted value of that recipe
    pot_xy: np.ndarray  # (K, 2) int32 pot positions, row-major
    partial_order: np.ndarray  # (3**K, K) int32: reference iteration order
    #   of partially-full pots for each bucket code; -1 padded


def _exact_dfs_opt(base, delivery_value, time_table, params):
    """Replicate _get_optimal_possible_recipe (reference :1976-2016) exactly,
    including DFS visit order for tie resolution. base=None or (n_o, n_t)."""
    gamma = params["gamma"]

    def disc_value(recipe):
        n_o, n_t = recipe
        base_no, base_nt = base if base is not None else (0, 0)
        miss_o, miss_t = n_o - base_no, n_t - base_nt
        val = float(delivery_value[n_o, n_t])
        t = float(time_table[n_o, n_t])
        return (
            gamma**t
            * gamma ** (params["pot_onion_steps"] * miss_o)
            * gamma ** (params["pot_tomato_steps"] * miss_t)
            * val
        )

    def neighbors(recipe):
        n_o, n_t = recipe
        if n_o + n_t == MAX_NUM_INGREDIENTS:
            return []
        # Recipe.neighbors iterates ALL_INGREDIENTS = [onion, tomato] (:201)
        return [(n_o + 1, n_t), (n_o, n_t + 1)]

    visited = set()
    stack = []
    best_recipe = base
    best_value = 0.0
    if base is None:
        # reference pushes Recipe([onion]) then Recipe([tomato]) (:1991-1992)
        stack.append((1, 0))
        stack.append((0, 1))
    else:
        stack.append(base)
    while stack:
        curr = stack.pop()
        if curr not in visited:
            visited.add(curr)
            v = disc_value(curr)
            if v > best_value:
                best_value, best_recipe = v, curr
            for nb in neighbors(curr):
                if nb not in visited:
                    stack.append(nb)
    return best_recipe, best_value


def _partial_order_table(pot_positions):
    """For every assignment of pots to buckets {none, 1_items, 2_items},
    record the order `list(set().union(ones, twos))` yields in CPython
    (reference get_partially_full_pots, overcooked_mdp.py:1882-1890)."""
    K = len(pot_positions)
    table = np.full((3**K, K), -1, np.int32)
    for code in range(3**K):
        buckets = [(code // 3**k) % 3 for k in range(K)]
        ones = [tuple(pot_positions[k]) for k in range(K) if buckets[k] == 1]
        twos = [tuple(pot_positions[k]) for k in range(K) if buckets[k] == 2]
        ordered = list(set().union(ones, twos))  # the actual CPython order
        idx_of = {tuple(p): k for k, p in enumerate(pot_positions)}
        for j, p in enumerate(ordered):
            table[code, j] = idx_of[p]
    return table


def build_potential_tables(spec, gamma: float = 0.99) -> PotentialTables:
    """Host precompute of PotentialTables for a LayoutSpec."""
    cfg = spec.config
    # reference: Recipe._tomato_value if set else 13 (overcooked_mdp.py:2973-2978)
    tomato_value = cfg.get("tomato_value") or 13
    onion_value = cfg.get("onion_value") or 21
    consts = POTENTIAL_CONSTANTS.get(
        spec.name, POTENTIAL_CONSTANTS["default"]
    )
    params = {"gamma": gamma, **consts}

    delivery_value = np.asarray(spec.layout.delivery_value)
    time_table = np.asarray(spec.time_np)

    n = MAX_NUM_INGREDIENTS + 1
    opt_no = np.zeros((n, n), np.int32)
    opt_nt = np.zeros((n, n), np.int32)
    opt_disc = np.zeros((n, n), np.float64)
    for a in range(n):
        for b in range(n):
            if a + b > MAX_NUM_INGREDIENTS:
                continue
            if a + b == 0:
                base = None
            else:
                base = (a, b)
            best, val = _exact_dfs_opt(base, delivery_value, time_table, params)
            if best is None:
                best = (0, 0)
            opt_no[a, b], opt_nt[a, b] = best
            opt_disc[a, b] = val

    # steady state (reference :2985-2999)
    opt_from_none = (opt_no[0, 0], opt_nt[0, 0])
    disc_val = opt_disc[0, 0]
    undisc = float(delivery_value[opt_from_none])
    discount = disc_val / undisc
    steady = (discount / (1.0 - discount)) * undisc

    terrain = np.asarray(spec.layout.terrain)
    pot_positions = [
        (x, y)
        for y in range(terrain.shape[0])
        for x in range(terrain.shape[1])
        if terrain[y, x] == TERRAIN_POT
    ]

    f32 = np.float32
    return PotentialTables(
        gamma=f32(gamma),
        steady_state_value=f32(steady),
        max_delivery_steps=np.int32(consts["max_delivery_steps"]),
        max_pickup_steps=np.int32(consts["max_pickup_steps"]),
        pot_onion_steps=np.int32(consts["pot_onion_steps"]),
        pot_tomato_steps=np.int32(consts["pot_tomato_steps"]),
        onion_value=f32(onion_value),
        tomato_value=f32(tomato_value),
        opt_no=opt_no,
        opt_nt=opt_nt,
        opt_disc_value=opt_disc.astype(f32),
        pot_xy=np.asarray(pot_positions, np.int32),
        partial_order=_partial_order_table(pot_positions),
    )


def potential(layout, ptab: PotentialTables, feature_cost, state: State):
    """phi(state) for one env; float32 scalar. 2-player layouts."""
    num_players = state.pos.shape[0]
    height, width = state.obj.shape
    K = ptab.pot_xy.shape[0]
    gamma = ptab.gamma
    f32 = jnp.float32
    INFf = f32(1e9)

    # player -> every-cell cost map (one matmul per player)
    flat = feature_cost.reshape(4 * height * width, height * width)

    def cost_map(i):
        lin = (state.orient[i] * height + state.pos[i, 1]) * width + state.pos[
            i, 0
        ]
        onehot = (jnp.arange(4 * height * width) == lin).astype(jnp.int32)
        return (onehot @ flat).reshape(height, width)

    cmaps = [cost_map(i) for i in range(num_players)]

    def pcost(i, fy, fx):
        c = cmaps[i][fy, fx]
        return jnp.where(c >= INF_COST, INFf, c.astype(f32))

    # per-pot quantities
    px_ = ptab.pot_xy[:, 0]
    py_ = ptab.pot_xy[:, 1]
    pot_obj = state.obj[py_, px_]  # (K,) -- static integer coords: gather ok
    pot_slots = state.soup_ing[py_, px_]
    pot_tick = state.soup_tick[py_, px_]
    k_no, k_nt = _slot_counts(pot_slots)
    k_n = k_no + k_nt
    has_soup = pot_obj == OBJ_SOUP
    cook_time = layout.time_table[k_no, k_nt].astype(jnp.int32)
    idle = pot_tick < 0
    ready = has_soup & ~idle & (pot_tick >= cook_time)
    cooking = has_soup & ~idle & ~ready
    empty_pot = ~has_soup
    idle_soup = has_soup & idle & (k_n > 0)
    full_not_cooking = idle_soup & (k_n == MAX_NUM_INGREDIENTS)
    partial = idle_soup & (k_n >= 1) & (k_n < MAX_NUM_INGREDIENTS)
    non_idle = cooking | ready

    # player -> pot cost matrix (P, K)
    p2pot = jnp.stack(
        [
            jnp.stack([pcost(i, py_[k], px_[k]) for k in range(K)])
            for i in range(num_players)
        ]
    )

    held = state.held
    h_no, h_nt = _slot_counts(state.held_soup)

    pot_value = layout.delivery_value[k_no, k_nt].astype(f32)  # undiscounted
    pot_value_c = jnp.maximum(pot_value, 1.0)

    phi = ptab.steady_state_value.astype(f32)

    # ---- Step 4: players holding soups (reference :3072-3084) ----
    serve_mask = layout.terrain == TERRAIN_SERVE
    for i in range(num_players):
        serve_cost = jnp.min(
            jnp.where(serve_mask, cmaps[i], INF_COST)
        )
        d = jnp.minimum(serve_cost, ptab.max_delivery_steps).astype(f32)
        held_val = jnp.maximum(
            layout.delivery_value[h_no[i], h_nt[i]].astype(f32), 1.0
        )
        phi = phi + jnp.where(
            held[i] == OBJ_SOUP, gamma**d * held_val, 0.0
        )

    # ---- non-idle soup base values (reference :3026-3043) ----
    ctr = (cook_time - pot_tick).astype(f32)  # cook time remaining
    vals = (
        gamma
        ** (
            ptab.max_delivery_steps.astype(f32)
            + jnp.maximum(ptab.max_pickup_steps.astype(f32), ctr)
        )
        * pot_value_c
    )
    vals = jnp.where(non_idle, vals, 0.0)

    # dict order of non_idle_soup_vals: cooking pots (row-major) then ready
    # pots (row-major) (reference :3026-3031); rank used for tie-breaking
    k_rank = jnp.arange(K)
    dict_rank = jnp.where(cooking, k_rank, jnp.where(ready, K + k_rank, 2 * K))

    # ---- Step 3: players holding dishes reweight soups (reference :3086-3132) ----
    best_updates = []
    for i in range(num_players):
        dist = p2pot[i]  # (K,)
        is_useful = (dist < INFf).astype(f32)
        pickup_soup_value = (
            gamma ** ptab.max_delivery_steps.astype(f32) * pot_value_c
        )
        discount = gamma ** jnp.maximum(
            ctr, jnp.minimum(dist, ptab.max_pickup_steps.astype(f32))
        )
        pickup_value = discount * pickup_soup_value * is_useful
        # candidates: non-idle soups with finite dist and value > current best
        cand = non_idle & (dist < INFf)
        cand_value = jnp.where(cand, pickup_value, -1.0)
        # strict '>' keeps the FIRST dict-order soup on ties: pick max value,
        # break ties by smallest dict_rank
        best_val = jnp.max(cand_value)
        is_best = cand & (cand_value >= best_val) & (best_val > 0)
        best_rank = jnp.min(jnp.where(is_best, dict_rank, 2 * K))
        sel = is_best & (dict_rank == best_rank)
        player_holds_dish = held[i] == OBJ_DISH
        best_updates.append(
            jnp.where(player_holds_dish & sel, best_val, 0.0)
        )
    for upd in best_updates:
        vals = jnp.maximum(vals, upd)
    phi = phi + jnp.sum(jnp.where(non_idle, vals, 0.0))

    # ---- Step 2: idle soups, greedy order (reference :3134-3210) ----
    # base order: full-not-cooking pots (row-major) then partially-full pots
    # in CPython-set order (host table), then stable sort by descending
    # discounted-opt value
    bucket = jnp.where(partial, k_n, 0)  # 1 or 2 items (0 = not partial)
    code = jnp.sum(bucket * (3 ** k_rank))
    partial_seq = ptab.partial_order[code]  # (K,) pot indices or -1

    # base rank: full-not-cooking get 0..K-1 by pot index order; partial get
    # K + position in partial_seq; others big
    fnc_rank = jnp.cumsum(full_not_cooking.astype(jnp.int32)) - 1
    base_rank = jnp.where(full_not_cooking, fnc_rank, 3 * K)
    for j in range(K):
        p_idx = partial_seq[j]
        base_rank = jnp.where(
            (k_rank == p_idx) & (p_idx >= 0), K + j, base_rank
        )

    disc_opt_val = ptab.opt_disc_value[k_no, k_nt]
    # sort key: descending value, stable on base_rank; implement by sorting
    # (value_neg * BIG + base_rank) would lose precision -> argsort twice:
    # first arrange by base_rank, then stable argsort by -value
    arrange = jnp.argsort(base_rank)  # stable: base order
    vals_arranged = -disc_opt_val[arrange]
    order_in_arranged = jnp.argsort(vals_arranged)  # stable by default
    order = arrange[order_in_arranged]  # pot indices in processing order

    avail_onion = jnp.array(
        [held[i] == OBJ_ONION for i in range(num_players)]
    )
    avail_tomato = jnp.array(
        [held[i] == OBJ_TOMATO for i in range(num_players)]
    )

    for j in range(K):
        k_sel = order[j]
        onehot_k = k_rank == k_sel
        active = jnp.sum(jnp.where(onehot_k, idle_soup, False))
        sel_i = lambda v: jnp.sum(jnp.where(onehot_k, v, 0))  # noqa: E731
        no_j = sel_i(k_no)
        nt_j = sel_i(k_nt)
        opt_no_j = ptab.opt_no[no_j, nt_j]
        opt_nt_j = ptab.opt_nt[no_j, nt_j]
        miss_o = opt_no_j - no_j
        miss_t = opt_nt_j - nt_j
        opt_time = layout.time_table[opt_no_j, opt_nt_j].astype(f32)
        discount = gamma ** (
            jnp.maximum(ptab.max_pickup_steps.astype(f32), opt_time)
            + ptab.max_delivery_steps.astype(f32)
        )
        dists_j = jnp.stack(
            [jnp.sum(jnp.where(onehot_k, p2pot[i], 0)) for i in range(num_players)]
        )  # (P,) player -> this pot
        # onions first, then tomatoes (missing_ingredients sorted, :3147-3150)
        for m in range(MAX_NUM_INGREDIENTS):
            need = m < miss_o
            cand = avail_onion & (dists_j < INFf)
            d_cand = jnp.where(cand, dists_j, INFf)
            d_min = jnp.min(d_cand)
            closest = jnp.argmin(d_cand)  # first player wins ties (strict <)
            found = d_min < INFf
            step_d = jnp.minimum(d_min, ptab.pot_onion_steps.astype(f32))
            discount = discount * jnp.where(
                need & active, gamma**step_d, 1.0
            )
            consume = need & active & found
            avail_onion = avail_onion & ~(
                (jnp.arange(num_players) == closest) & consume
            )
        for m in range(MAX_NUM_INGREDIENTS):
            need = m < miss_t
            cand = avail_tomato & (dists_j < INFf)
            d_cand = jnp.where(cand, dists_j, INFf)
            d_min = jnp.min(d_cand)
            closest = jnp.argmin(d_cand)
            found = d_min < INFf
            step_d = jnp.minimum(d_min, ptab.pot_tomato_steps.astype(f32))
            discount = discount * jnp.where(
                need & active, gamma**step_d, 1.0
            )
            consume = need & active & found
            avail_tomato = avail_tomato & ~(
                (jnp.arange(num_players) == closest) & consume
            )
        any_missing = (miss_o + miss_t) > 0
        # players holding nothing beeline to a complete optimal soup (:3193-3206)
        nothing_dists = jnp.stack(
            [
                jnp.where(held[i] == OBJ_NONE, dists_j[i], INFf)
                for i in range(num_players)
            ]
        )
        cook_dist = jnp.min(nothing_dists)
        discount = discount * jnp.where(
            any_missing,
            gamma,
            gamma
            ** jnp.minimum(cook_dist, ptab.max_pickup_steps.astype(f32)),
        )
        opt_val = jnp.maximum(
            layout.delivery_value[opt_no_j, opt_nt_j].astype(f32), 1.0
        )
        phi = phi + jnp.where(active, discount * opt_val, 0.0)

    # ---- Step 1: leftover held ingredients (reference :3212-3247) ----
    empty_pot_dists = jnp.where(empty_pot[None, :], p2pot, INFf)  # (P, K)
    min_empty = jnp.min(empty_pot_dists, axis=1) if K > 0 else jnp.full(
        (num_players,), INFf
    )
    for i in range(num_players):
        d = min_empty[i]
        useful = (d < INFf).astype(f32)
        disc_t = (
            gamma
            ** (
                jnp.minimum(ptab.pot_tomato_steps.astype(f32), d)
                + ptab.max_pickup_steps.astype(f32)
                + ptab.max_delivery_steps.astype(f32)
            )
            * useful
        )
        disc_o = (
            gamma
            ** (
                jnp.minimum(ptab.pot_onion_steps.astype(f32), d)
                + ptab.max_pickup_steps.astype(f32)
                + ptab.max_delivery_steps.astype(f32)
            )
            * useful
        )
        phi = phi + jnp.where(
            avail_tomato[i], disc_t * ptab.tomato_value, 0.0
        )
        phi = phi + jnp.where(
            avail_onion[i], disc_o * ptab.onion_value, 0.0
        )

    return phi


def make_potential_fn(spec, feature_cost, gamma: float = 0.99):
    """Returns a batched phi: (layout, batched_state(minor)) -> (B,) f32."""
    ptab = jax.tree.map(jnp.asarray, build_potential_tables(spec, gamma))
    fc = jnp.asarray(feature_cost)
    single = lambda layout, state: potential(layout, ptab, fc, state)  # noqa: E731
    return jax.vmap(single, in_axes=(None, -1), out_axes=-1)


def make_potential_fn_pool(specs, gamma: float = 0.99):
    """Per-lane phi for variable-MDP PPO (pool of same-shape layouts).

    Returns phi(pool_idx (B,) i32, lane_layouts (leaves ..., B), state) ->
    (B,) f32. Potential tables and motion feature-cost tables are
    precomputed per pool member on host and gathered per lane (the
    reference recomputes MotionPlanner + POTENTIAL_CONSTANTS per generated
    MDP, overcooked_mdp.py:2920-2935).
    """
    from overcooked_ai_tpu.planning.tables import build_motion_tables

    ptabs = [build_potential_tables(s, gamma) for s in specs]
    ptab_pool = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], axis=-1), *ptabs
    )
    fc_pool = jnp.stack(
        [
            jnp.asarray(build_motion_tables(s.layout.terrain).feature_cost)
            for s in specs
        ],
        axis=-1,
    )
    vm = jax.vmap(potential, in_axes=(-1, -1, -1, -1), out_axes=-1)

    def phi(pool_idx, lane_layouts, state):
        ptab_l = jax.tree.map(lambda x: x[..., pool_idx], ptab_pool)
        fc_l = fc_pool[..., pool_idx]
        return vm(lane_layouts, ptab_l, fc_l, state)

    return phi
