"""Struct-of-arrays environment state.

The reference represents a state as a Python object graph
(`OvercookedState` with player/object instances, reference
overcooked_mdp.py:784-1015) that is deep-copied on every transition. Here a
state is a fixed-shape pytree of integer arrays so the transition can be
jit-compiled, vmapped over thousands of envs, and sharded with pjit.

Conversion helpers to/from the reference `to_dict()` schema live here; they
are used by parity tests and by the serving layer, never in the hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from overcooked_ai_tpu.core.constants import (
    DIRECTION_TO_TUPLE,
    ING_CODE_TO_NAME,
    MAX_NUM_INGREDIENTS,
    OBJ_CODE_TO_NAME,
    OBJ_NAME_TO_CODE,
    OBJ_NONE,
    OBJ_SOUP,
    TERRAIN_CODE_TO_CHAR,
    TUPLE_TO_DIRECTION,
)


class State(NamedTuple):
    """One Overcooked environment state (all int32 arrays).

    Shapes use P = num players, H/W = grid height/width, and the constant
    MAX_NUM_INGREDIENTS (=3) ingredient slots per soup. Soup ingredient
    slots preserve *insertion order* so that serialization round-trips
    bit-exactly with the reference `SoupState.to_dict()["_ingredients"]`
    (reference overcooked_mdp.py:615-630).
    """

    pos: np.ndarray  # (P, 2) player (x, y)
    orient: np.ndarray  # (P,)  direction index 0..3
    held: np.ndarray  # (P,)  OBJ_* code of held object (0 = none)
    held_soup: np.ndarray  # (P, 3) ingredient slots of held soup
    held_soup_tick: np.ndarray  # (P,) cooking tick of held soup (-1 if n/a)
    obj: np.ndarray  # (H, W) OBJ_* code of object at cell (0 = none)
    soup_ing: np.ndarray  # (H, W, 3) soup ingredient slots per cell
    soup_tick: np.ndarray  # (H, W) soup cooking tick per cell (-1 = idle/absent)
    # Placement stamp per cell: the reference keeps objects in a dict whose
    # *insertion order* breaks cost ties in featurize/greedy candidate scans
    # (min_cost_to_feature takes the first strict min, planners.py:404-417)
    # and orders to_dict()["objects"]. Stamp = t*P + i + 1 when player i
    # places an object at step t (strictly increasing in placement order);
    # negative values -n..-1 for pre-existing objects loaded via
    # state_from_dict (in their list order); 0 = no object ever placed.
    obj_seq: np.ndarray  # (H, W) int32 insertion stamp
    t: np.ndarray  # ()   timestep


def zeros_state(num_players: int, height: int, width: int) -> State:
    i32 = np.int32
    return State(
        pos=np.zeros((num_players, 2), i32),
        orient=np.zeros((num_players,), i32),
        held=np.zeros((num_players,), i32),
        held_soup=np.zeros((num_players, MAX_NUM_INGREDIENTS), i32),
        held_soup_tick=np.full((num_players,), -1, i32),
        obj=np.zeros((height, width), i32),
        soup_ing=np.zeros((height, width, MAX_NUM_INGREDIENTS), i32),
        soup_tick=np.full((height, width), -1, i32),
        obj_seq=np.zeros((height, width), i32),
        t=np.zeros((), i32),
    )


# ---------------------------------------------------------------------------
# Reference-dict conversion (parity / serialization boundary, not hot path)
# ---------------------------------------------------------------------------


def _slots_from_ingredient_dicts(ing_dicts) -> np.ndarray:
    slots = np.zeros((MAX_NUM_INGREDIENTS,), np.int32)
    assert len(ing_dicts) <= MAX_NUM_INGREDIENTS
    for k, ing in enumerate(ing_dicts):
        slots[k] = OBJ_NAME_TO_CODE[ing["name"]]
    return slots


def _soup_dict_from_slots(position, slots, tick, cook_time) -> dict:
    """Mirror of reference SoupState.to_dict() (overcooked_mdp.py:615-630)."""
    ingredients = [
        {"name": ING_CODE_TO_NAME[int(c)], "position": tuple(position)}
        for c in slots
        if c != 0
    ]
    tick = int(tick)
    is_idle = tick < 0
    is_ready = (not is_idle) and tick >= cook_time
    return {
        "name": "soup",
        "position": tuple(position),
        "_ingredients": ingredients,
        "cooking_tick": tick,
        "is_cooking": (not is_idle) and (not is_ready),
        "is_ready": is_ready,
        "is_idle": is_idle,
        "cook_time": -1 if is_idle else int(cook_time),
        "_cooking_tick": tick,
    }


def state_to_dict(state: State, spec) -> dict:
    """Convert a State to the reference `OvercookedState.to_dict()` schema.

    `spec` is a LayoutSpec (layout.py); it supplies the order lists and the
    recipe time table needed to emit `cook_time` fields. Grid objects are
    emitted in placement (obj_seq) order, matching the reference's dict
    insertion order; `canonical_state_dict` remains for order-insensitive
    comparison.
    """
    players = []
    for i in range(state.pos.shape[0]):
        held_code = int(state.held[i])
        if held_code == OBJ_NONE:
            held = None
        elif held_code == OBJ_SOUP:
            slots = np.asarray(state.held_soup[i])
            cook_time = spec.cook_time_of_slots(slots)
            held = _soup_dict_from_slots(
                (int(state.pos[i, 0]), int(state.pos[i, 1])),
                slots,
                int(state.held_soup_tick[i]),
                cook_time,
            )
        else:
            held = {
                "name": OBJ_CODE_TO_NAME[held_code],
                "position": (int(state.pos[i, 0]), int(state.pos[i, 1])),
            }
        players.append(
            {
                "position": (int(state.pos[i, 0]), int(state.pos[i, 1])),
                "orientation": DIRECTION_TO_TUPLE[int(state.orient[i])],
                "held_object": held,
            }
        )

    objects = []
    obj_grid = np.asarray(state.obj)
    seq_grid = np.asarray(state.obj_seq)
    cells = sorted(
        ((y, x) for y, x in np.argwhere(obj_grid != OBJ_NONE)),
        key=lambda yx: (int(seq_grid[yx[0], yx[1]]), int(yx[0]), int(yx[1])),
    )
    for y, x in cells:
        code = int(obj_grid[y, x])
        if code == OBJ_SOUP:
            slots = np.asarray(state.soup_ing[y, x])
            objects.append(
                _soup_dict_from_slots(
                    (int(x), int(y)),
                    slots,
                    int(state.soup_tick[y, x]),
                    spec.cook_time_of_slots(slots),
                )
            )
        else:
            objects.append(
                {"name": OBJ_CODE_TO_NAME[code], "position": (int(x), int(y))}
            )

    return {
        "players": players,
        "objects": objects,
        "bonus_orders": [
            {"ingredients": tuple(o)} for o in spec.sorted_bonus_orders
        ],
        "all_orders": [
            {"ingredients": tuple(o)} for o in spec.sorted_all_orders
        ],
        "timestep": int(state.t),
    }


def state_from_dict(state_dict: dict, spec) -> State:
    """Build a State from a reference `to_dict()` payload."""
    num_players = len(state_dict["players"])
    st = zeros_state(num_players, spec.height, spec.width)
    for i, p in enumerate(state_dict["players"]):
        st.pos[i] = np.asarray(p["position"], np.int32)
        st.orient[i] = TUPLE_TO_DIRECTION[tuple(p["orientation"])]
        held = p.get("held_object")
        if held is not None:
            code = OBJ_NAME_TO_CODE[held["name"]]
            st.held[i] = code
            if code == OBJ_SOUP:
                st.held_soup[i] = _slots_from_ingredient_dicts(
                    held["_ingredients"]
                )
                # NOTE: the reference from_dict reads only "cooking_tick";
                # a dict with just "_cooking_tick" gets the default -1
                # (SoupState.__init__ kwargs, overcooked_mdp.py:434-456).
                st.held_soup_tick[i] = int(held.get("cooking_tick", -1))
    n_obj = len(state_dict["objects"])
    for k, o in enumerate(state_dict["objects"]):
        x, y = (int(v) for v in o["position"])
        code = OBJ_NAME_TO_CODE[o["name"]]
        st.obj[y, x] = code
        # preserve the list's (= reference dict insertion) order as
        # negative stamps -n..-1, always earlier than any stepped placement
        st.obj_seq[y, x] = k - n_obj
        if code == OBJ_SOUP:
            st.soup_ing[y, x] = _slots_from_ingredient_dicts(o["_ingredients"])
            st.soup_tick[y, x] = int(o.get("cooking_tick", -1))
    st_t = st._replace(t=np.asarray(state_dict.get("timestep", 0), np.int32))
    return st_t


def canonical_state_dict(d: dict) -> dict:
    """Canonicalize a reference-format state dict for comparison.

    Sorts the position-keyed object list (the reference emits dict insertion
    order, which is history-dependent) and normalizes tuples/lists.
    """

    def canon(v):
        if isinstance(v, dict):
            return {k: canon(x) for k, x in sorted(v.items())}
        if isinstance(v, (list, tuple)):
            return [canon(x) for x in v]
        if isinstance(v, np.generic):
            return v.item()
        return v

    out = canon(d)
    out["objects"] = sorted(out["objects"], key=lambda o: tuple(o["position"]))
    return out


# --- ASCII debugging surface (reference state_string, overcooked_mdp.py:2314) ---

_DIR_CHARS = {0: "↑", 1: "↓", 2: "→", 3: "←"}  # N S E W
_ING_CHARS = {1: "ø", 2: "†"}  # onion, tomato (Recipe.STR_REP)


def _soup_str(slots, tick, cook_time) -> str:
    """Reference SoupState.__str__ (overcooked_mdp.py:486-494): '{' then
    one char per ingredient in sorted order (onions before tomatoes), then
    the cooking tick while cooking or a check mark when ready."""
    n_onion = int(np.sum(slots == 1))
    n_tomato = int(np.sum(slots == 2))
    res = "{" + _ING_CHARS[1] * n_onion + _ING_CHARS[2] * n_tomato
    tick = int(tick)
    if 0 <= tick < cook_time:
        res += str(tick)
    elif tick >= cook_time:
        res += "✓"
    return res


def state_string(spec, state: State) -> str:
    """ASCII-art rendering of a state over its terrain -- the reference's
    standard debugging / scenario-documentation surface
    (`OvercookedGridworld.state_string`, overcooked_mdp.py:2314-2380):
    7-char-padded cells; players as an orientation arrow + index (+ held
    object char / soup string); counter and pot contents inline; bonus
    orders appended.
    """
    terrain = np.asarray(spec.layout.terrain)
    time_table = np.asarray(spec.layout.time_table)
    H, W = terrain.shape
    pos = np.asarray(state.pos)
    players_at = {
        (int(pos[i, 0]), int(pos[i, 1])): i for i in range(pos.shape[0])
    }
    out = []
    for y in range(H):
        for x in range(W):
            cell = ""
            if (x, y) in players_at:
                i = players_at[(x, y)]
                cell += _DIR_CHARS[int(np.asarray(state.orient)[i])]
                held = int(np.asarray(state.held)[i])
                if held != OBJ_NONE:
                    cell += str(i)
                    if held == OBJ_SOUP:
                        slots = np.asarray(state.held_soup)[i]
                        n_o = int(np.sum(slots == 1))
                        n_t = int(np.sum(slots == 2))
                        cell += _soup_str(
                            slots,
                            np.asarray(state.held_soup_tick)[i],
                            int(time_table[n_o, n_t]),
                        )
                    else:
                        cell += OBJ_CODE_TO_NAME[held][:1]
                else:
                    cell += str(i)
            else:
                cell += TERRAIN_CODE_TO_CHAR[int(terrain[y, x])]
                obj = int(np.asarray(state.obj)[y, x])
                if obj != OBJ_NONE:
                    if obj == OBJ_SOUP:
                        slots = np.asarray(state.soup_ing)[y, x]
                        n_o = int(np.sum(slots == 1))
                        n_t = int(np.sum(slots == 2))
                        cell += _soup_str(
                            slots,
                            np.asarray(state.soup_tick)[y, x],
                            int(time_table[n_o, n_t]),
                        )
                    else:
                        cell += OBJ_CODE_TO_NAME[obj][:1]
            out.append(cell + " " * (7 - len(cell)) + " ")
        out.append("\n\n")
    s = "".join(out)
    if spec.sorted_bonus_orders:
        s += f"Bonus orders: {spec.sorted_bonus_orders}\n"
    return s
