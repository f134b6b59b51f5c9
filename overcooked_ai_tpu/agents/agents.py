"""Agents: functional policies over the array state, jit/vmap-able.

The reference Agent framework (reference agents/agent.py:14-220) is an OO
`action(state) -> (action, info)` protocol. Here an agent is a pure
function `policy(key, layout, state, agent_index, carry) -> (action,
carry)` over the array state, so whole agent-pair rollouts stay on device
inside one scan. A thin host-side adapter (evaluation.py) gives the
reference-style episodic API.

Included:
  RandomAgent   motion actions only by default (reference :223-261)
  StayAgent     (:264-273)
  FixedPlanAgent(:276-295)
  GreedyHumanModel (:298-588) -- table-driven, see planning/greedy_tables
  SampleAgent   prob-averaging ensemble (:591-602)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from overcooked_ai_tpu.core.constants import (
    ACTION_INTERACT,
    ACTION_STAY,
    MAX_NUM_INGREDIENTS,
    OBJ_DISH,
    OBJ_NONE,
    OBJ_ONION,
    OBJ_SOUP,
    OBJ_TOMATO,
    TERRAIN_COUNTER,
    TERRAIN_DISH_DISP,
    TERRAIN_EMPTY,
    TERRAIN_ONION_DISP,
    TERRAIN_POT,
    TERRAIN_SERVE,
    TERRAIN_TOMATO_DISP,
)
from overcooked_ai_tpu.core.state import State
from overcooked_ai_tpu.core.step import _slot_counts, _t4x4
from overcooked_ai_tpu.planning.tables import INF_COST


def random_agent_probs(all_actions: bool = False):
    """Action probabilities of the reference RandomAgent (:236-244)."""
    if all_actions:
        return np.full((6,), 1 / 6, np.float32)
    p = np.zeros((6,), np.float32)
    p[:5] = 1 / 5  # motion actions: N,S,E,W,STAY
    return p


def random_agent(key, layout, state, agent_index, all_actions=False):
    probs = jnp.asarray(random_agent_probs(all_actions))
    return jax.random.choice(key, 6, p=probs)


def stay_agent(key, layout, state, agent_index):
    return jnp.asarray(ACTION_STAY, jnp.int32)


def make_fixed_plan_agent(plan):
    """Agent that executes a fixed action sequence, then STAYs.

    Mirror of the reference FixedPlanAgent (reference agents/agent.py:
    276-295): step i of the plan at env timestep i (the reference keeps a
    private counter incremented per call, which equals `state.t` for an
    agent queried once per step from episode start).
    """
    plan_arr = jnp.asarray(np.asarray(plan, np.int32))

    def fixed_plan(key, layout, state: State, agent_index: int):
        t = state.t
        in_plan = t < plan_arr.shape[0]
        idx = jnp.minimum(t, plan_arr.shape[0] - 1)
        return jnp.where(in_plan, plan_arr[idx], ACTION_STAY).astype(
            jnp.int32
        )

    return fixed_plan


def make_sample_agent(prob_fns):
    """Prob-averaging ensemble, the reference SampleAgent (agent.py:591-602).

    Each element of `prob_fns` maps (key, layout, state, agent_index) to a
    (6,) action distribution; the ensemble samples from the mean.
    """

    def sample(key, layout, state: State, agent_index: int):
        probs = jnp.stack(
            [fn(key, layout, state, agent_index) for fn in prob_fns]
        )
        mean = jnp.mean(probs, axis=0)
        return jax.random.choice(key, 6, p=mean).astype(jnp.int32)

    return sample


class GreedyTables(NamedTuple):
    feature_cost: jnp.ndarray  # (4, H, W, H, W) int32
    first_action: jnp.ndarray  # (4, H, W, H, W) int8


def make_greedy_human_model(
    spec,
    tables: GreedyTables,
    auto_unstuck=True,
    hl_boltzmann_rational=False,
    ll_boltzmann_rational=False,
    hl_temp=1.0,
    ll_temp=1.0,
    goal_tables=None,
):
    """Returns greedy(key, layout, state, agent_index, prev_pos_or) -> action.

    prev_pos_or: (P, 3) int32 [(x, y, orient)] of the previous step, or all
    -1 on the first step (auto-unstuck history, reference agent.py:366-404).
    Only supports the 3-onion order, like the reference (assert :519-524).

    hl_boltzmann_rational: sample the motion goal with probability
    softmax(-plan_cost * hl_temp) over all (feature cell, approach
    direction) goals instead of taking the cheapest (reference
    choose_motion_goal, agent.py:407-440). ll_boltzmann_rational: when the
    chosen goal's standing position equals the current position, sample the
    low-level action with probability softmax(-one_step_ahead_plan_cost *
    ll_temp) over all 6 actions (reference boltzmann_rational_ll_action,
    agent.py:460-483). Either flag requires `goal_tables` =
    planning.greedy_tables.build_goal_tables(terrain) (per-goal costs +
    first actions).
    """
    assert spec.sorted_all_orders == [("onion", "onion", "onion")], (
        "GreedyHumanModel only supports the single 3-onion order "
        f"(got {spec.sorted_all_orders})"
    )
    num_players = spec.num_players
    assert num_players == 2
    use_boltzmann = hl_boltzmann_rational or ll_boltzmann_rational
    if use_boltzmann:
        assert goal_tables is not None, (
            "hl/ll_boltzmann_rational requires goal_tables "
            "(build_goal_tables)"
        )
        goal_cost = jnp.asarray(goal_tables[0])
        goal_first = jnp.asarray(goal_tables[1]).astype(jnp.int32)

    def greedy(key, layout, state: State, agent_index: int, prev_pos_or):
        height, width = state.obj.shape
        terrain = layout.terrain
        i = agent_index
        other = 1 - agent_index
        obj = state.obj
        key_hl, key_ll, key_unstuck = jax.random.split(key, 3)

        # ---- pot state masks ----
        is_pot = terrain == TERRAIN_POT
        g_no, g_nt = _slot_counts(state.soup_ing)
        g_n = g_no + g_nt
        cook_time = _t4x4(layout.time_table, g_no, g_nt)
        has_soup = is_pot & (obj == OBJ_SOUP)
        idle = state.soup_tick < 0
        ready = has_soup & ~idle & (state.soup_tick >= cook_time)
        cooking = has_soup & ~idle & ~ready
        empty_pot = is_pot & (obj == OBJ_NONE)
        partially_full = has_soup & idle & (g_n >= 1) & (g_n < MAX_NUM_INGREDIENTS)
        three_items = has_soup & idle & (g_n == MAX_NUM_INGREDIENTS)

        held = state.held[i]
        other_held = state.held[other]
        soup_nearly_ready = jnp.any(ready | cooking)
        other_has_dish = other_held == OBJ_DISH

        # ---- candidate feature-cell masks per ml_action branch (:506-567),
        # split into terrain candidates (tie rank = row-major list order)
        # and counter-object candidates (tie rank = insertion order via
        # State.obj_seq), matching the reference's dispensers-then-
        # counter_objects list concatenation + first-strict-min scan ----
        is_counter_cell = terrain == TERRAIN_COUNTER
        dish_terr = terrain == TERRAIN_DISH_DISP
        dish_objs = is_counter_cell & (obj == OBJ_DISH)
        onion_terr = terrain == TERRAIN_ONION_DISP
        onion_objs = is_counter_cell & (obj == OBJ_ONION)
        no_cells = jnp.zeros_like(is_counter_cell)
        cookable = three_items  # order is 3 ingredients
        pick_dish = soup_nearly_ready & ~other_has_dish
        any_cookable = jnp.any(cookable)
        no_obj_terr = jnp.where(
            pick_dish,
            dish_terr,
            jnp.where(any_cookable, cookable, onion_terr),
        )
        no_obj_objs = jnp.where(
            pick_dish,
            dish_objs,
            jnp.where(any_cookable, no_cells, onion_objs),
        )
        fill_mask = partially_full | empty_pot
        held_mask = jnp.where(
            held == OBJ_ONION,
            fill_mask,
            jnp.where(
                held == OBJ_TOMATO,
                fill_mask,
                jnp.where(
                    held == OBJ_DISH,
                    ready | cooking,
                    terrain == TERRAIN_SERVE,  # held soup
                ),
            ),
        )
        no_obj = held == OBJ_NONE
        cand_terr = jnp.where(no_obj, no_obj_terr, held_mask)
        cand_objs = jnp.where(no_obj, no_obj_objs, no_cells)
        candidates = cand_terr | cand_objs

        # ---- cost map for this player (single dynamic gather) ----
        px, py, o_i = state.pos[i, 0], state.pos[i, 1], state.orient[i]
        cost_map = tables.feature_cost[o_i, py, px]  # (H, W)
        action_map = tables.first_action[o_i, py, px].astype(jnp.int32)

        # reference tie order: terrain list (row-major) before counter
        # objects (insertion order) -- see core/featurize._closest
        hw = height * width
        cell_rank = jnp.arange(hw, dtype=jnp.int32).reshape(height, width)
        obj_rank = jnp.minimum(state.obj_seq + 2 * hw, 4095)
        finite = cost_map < INF_COST
        key = jnp.minimum(
            jnp.where(
                cand_terr & finite, cost_map * 4096 + cell_rank, 2**31 - 1
            ),
            jnp.where(
                cand_objs & finite, cost_map * 4096 + obj_rank, 2**31 - 1
            ),
        ).reshape(-1)
        best = jnp.argmin(key)
        reachable = key[best] < 2**31 - 1

        # fallback: closest of onion/tomato disp + pots + dish disp (:577-586)
        feature_mask = (
            (terrain == TERRAIN_ONION_DISP)
            | (terrain == TERRAIN_TOMATO_DISP)
            | is_pot
            | (terrain == TERRAIN_DISH_DISP)
        )
        fcost = jnp.where(feature_mask, cost_map, INF_COST).reshape(-1)
        fbest = jnp.argmin(fcost)
        cell = jnp.where(reachable, best, fbest)
        chosen = action_map.reshape(-1)[cell]
        chosen = jnp.where(
            reachable | (fcost[fbest] < INF_COST), chosen, ACTION_STAY
        )

        if use_boltzmann:
            from overcooked_ai_tpu.core.constants import DIR_VECTORS

            dirvec = jnp.asarray(np.asarray(DIR_VECTORS, np.int32))  # (4, 2)
            gc = goal_cost[o_i, py, px]  # (4, H, W) per-goal costs
            gvalid = candidates[None] & (gc < INF_COST)
            if hl_boltzmann_rational:
                # softmax(-cost * T) over goals (reference agent.py:440-446)
                logits = jnp.where(
                    gvalid, -gc.astype(jnp.float32) * hl_temp, -jnp.inf
                )
                gidx = jax.random.categorical(key_hl, logits.reshape(-1))
                hl_action = goal_first[o_i, py, px].reshape(-1)[gidx]
                chosen = jnp.where(reachable, hl_action, chosen)
            else:
                # cheapest individual goal (for ll's goal identity)
                gidx = jnp.argmin(
                    jnp.where(gvalid, gc, INF_COST).reshape(-1)
                )
            if ll_boltzmann_rational:
                hw = height * width
                gd = gidx // hw
                gfy = (gidx % hw) // width
                gfx = gidx % width
                # standing position of the goal = feature cell + approach dir
                gpx = gfx + dirvec[gd, 0]
                gpy = gfy + dirvec[gd, 1]
                at_goal_pos = (gpx == px) & (gpy == py)
                # one-step-ahead plan cost per action (agent.py:460-483)
                future = []
                ys = jnp.arange(height)[:, None]
                xs = jnp.arange(width)[None, :]
                for a in range(6):
                    if a < 4:
                        tx = px + dirvec[a, 0]
                        ty = py + dirvec[a, 1]
                        tcell = jnp.sum(
                            jnp.where((ys == ty) & (xs == tx), terrain, -1)
                        )
                        can = tcell == TERRAIN_EMPTY
                        nx = jnp.where(can, tx, px)
                        ny = jnp.where(can, ty, py)
                        no = jnp.asarray(a)
                    else:  # STAY / INTERACT don't move (reference
                        #     _move_if_direction, overcooked_mdp.py:1718)
                        nx, ny, no = px, py, o_i
                    future.append(goal_cost[no, ny, nx, gd, gfy, gfx])
                fcosts = jnp.stack(future).astype(jnp.float32)
                ll_logits = jnp.where(
                    fcosts < INF_COST, -fcosts * ll_temp, -jnp.inf
                )
                ll_action = jax.random.categorical(key_ll, ll_logits)
                chosen = jnp.where(
                    reachable & at_goal_pos, ll_action, chosen
                )

        if auto_unstuck:
            # stuck if ALL players' (pos, orient) unchanged (:369-373)
            curr = jnp.concatenate([state.pos, state.orient[:, None]], axis=1)
            stuck = jnp.all(curr == prev_pos_or)
            # unblocking actions: directions that move this player given the
            # other stays (same-cell collision with the stationary other
            # bounces, reference :385-397)
            ys = jnp.arange(height)[:, None]
            xs = jnp.arange(width)[None, :]
            unblocking = []
            from overcooked_ai_tpu.core.constants import DIR_VECTORS

            for d in range(4):
                tx = state.pos[i, 0] + int(DIR_VECTORS[d][0])
                ty = state.pos[i, 1] + int(DIR_VECTORS[d][1])
                cell_t = jnp.sum(
                    jnp.where((ys == ty) & (xs == tx), terrain, 0)
                )
                ok = (cell_t == TERRAIN_EMPTY) & ~(
                    (tx == state.pos[other, 0]) & (ty == state.pos[other, 1])
                )
                unblocking.append(ok)
            unblocking = jnp.stack(unblocking + [jnp.asarray(False)] * 2)
            n_unblock = jnp.sum(unblocking)
            # uniform choice among unblocking actions; STAY if none (:396-400)
            r = jax.random.uniform(key_unstuck)
            csum = jnp.cumsum(unblocking.astype(jnp.float32))
            pick = jnp.argmax(
                (csum > r * jnp.maximum(n_unblock, 1)) & unblocking
            )
            unstuck_action = jnp.where(n_unblock > 0, pick, ACTION_STAY)
            chosen = jnp.where(stuck, unstuck_action, chosen)

        return chosen.astype(jnp.int32)

    return greedy


def save_agent(agent, path):
    """Serialize a policy/AgentFn with dill (reference Agent.save,
    agent.py:74-98: dill-pickles the whole agent object)."""
    import dill

    path = str(path)
    if not path.endswith(".dill"):
        path += ".dill"
    with open(path, "wb") as f:
        dill.dump(agent, f)
    return path


def load_agent(path):
    """Load an agent saved by save_agent (reference Agent.load)."""
    import dill

    with open(str(path), "rb") as f:
        return dill.load(f)
