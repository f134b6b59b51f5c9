"""Layout parsing and static per-layout tables.

The reference evaluates `.layout` files as Python literals
(reference utils.py:223-226) and configures a *class-global mutable* Recipe
(reference overcooked_mdp.py:220-336) whose value/time resolution runs per
delivery. Here all of that is folded, once, on host, into small integer
tables indexed by the (num_onions, num_tomatoes) multiset of a soup:

    delivery_value[n_o, n_t]  reward for delivering that soup
                              (order membership + bonus already applied;
                               reference get_recipe_value, overcooked_mdp.py:1581)
    time_table[n_o, n_t]      cook time of that soup (Recipe.time, :164-188)
    opt_value[n_o, n_t]       best delivery value reachable by adding
                              ingredients (get_optimal_possible_recipe DFS,
                              :1976-2061) -- used for potting-event labels

The device-side `Layout` is a pytree of arrays (one jitted step function
serves every layout of a given grid shape); `LayoutSpec` keeps the host-side
metadata (names, order lists) for converters and tests.
"""

from __future__ import annotations

import ast
import dataclasses
import json
import os
from typing import NamedTuple, Optional

import numpy as np

from overcooked_ai_tpu.core.constants import (
    BASE_REW_SHAPING_PARAMS,
    MAX_NUM_INGREDIENTS,
    TERRAIN_CHAR_TO_CODE,
)
from overcooked_ai_tpu.core.state import State, state_from_dict, zeros_state

LAYOUT_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "layouts")

# Large finite stand-in for float('inf') order_bonus (tutorial_3.layout);
# keeps reward arithmetic in int32 range after multiplication.
INF_VALUE = 1 << 24


class Layout(NamedTuple):
    """Device-side static layout data (all array leaves; a valid pytree).

    Grid shape, player count and ingredient-slot count are carried by array
    shapes; `old_dynamics` is a traced scalar since it only gates `where`s.
    """

    terrain: np.ndarray  # (H, W) int32 terrain codes
    delivery_value: np.ndarray  # (4, 4) int32 [n_onions, n_tomatoes]
    time_table: np.ndarray  # (4, 4) int32
    opt_value: np.ndarray  # (4, 4) int32
    placement_in_pot_rew: np.ndarray  # () int32
    dish_pickup_rew: np.ndarray  # () int32
    soup_pickup_rew: np.ndarray  # () int32
    old_dynamics: np.ndarray  # () bool
    num_pots: np.ndarray  # () int32
    start_state: State


def _recipe_sort_key(n_onions: int, n_tomatoes: int) -> int:
    """Total order on recipes: reference Recipe.__int__ (overcooked_mdp.py:71-81)."""
    mixed_mask = int(bool(n_onions * n_tomatoes))
    mixed_shift = (MAX_NUM_INGREDIENTS + 1) ** 2
    encoding = n_onions + (MAX_NUM_INGREDIENTS + 1) * n_tomatoes
    return mixed_mask * encoding * mixed_shift + encoding


def _counts(ingredients) -> tuple:
    n_o = sum(1 for i in ingredients if i == "onion")
    n_t = sum(1 for i in ingredients if i == "tomato")
    assert n_o + n_t == len(ingredients), f"bad ingredients {ingredients}"
    return n_o, n_t


def _all_recipe_counts():
    for n in range(1, MAX_NUM_INGREDIENTS + 1):
        for n_t in range(n + 1):
            yield n - n_t, n_t


@dataclasses.dataclass(eq=False)  # identity hash/eq: usable as a static jit arg
class LayoutSpec:
    """Host-side layout description; owns the device `Layout` pytree."""

    name: str
    height: int
    width: int
    num_players: int
    terrain_chars: list  # list[str] rows
    sorted_all_orders: list  # list[tuple[str, ...]] sorted by recipe key
    sorted_bonus_orders: list
    time_np: np.ndarray  # (4, 4) int32 cook times
    layout: Layout
    config: dict  # raw layout params (post-overwrite)

    def cook_time_of_slots(self, slots) -> int:
        n_o = int(np.sum(np.asarray(slots) == 1))
        n_t = int(np.sum(np.asarray(slots) == 2))
        return int(self.time_np[n_o, n_t])


def _resolve_base_value(n_o, n_t, cfg, order_value_map) -> float:
    """Recipe.value resolution order (reference overcooked_mdp.py:137-161)."""
    if cfg.get("delivery_reward") is not None:
        return cfg["delivery_reward"]
    if order_value_map is not None and (n_o, n_t) in order_value_map:
        return order_value_map[(n_o, n_t)]
    if cfg.get("onion_value") is not None and cfg.get("tomato_value") is not None:
        return cfg["onion_value"] * n_o + cfg["tomato_value"] * n_t
    return 20


def _resolve_time(n_o, n_t, cfg, order_time_map) -> float:
    """Recipe.time resolution order (reference overcooked_mdp.py:164-188)."""
    if cfg.get("cook_time") is not None:
        return cfg["cook_time"]
    if order_time_map is not None and (n_o, n_t) in order_time_map:
        return order_time_map[(n_o, n_t)]
    if cfg.get("onion_time") is not None and cfg.get("tomato_time") is not None:
        return cfg["onion_time"] * n_o + cfg["tomato_time"] * n_t
    return 20


def _validate_grid(rows):
    """Grid validation (reference _assert_valid_grid, overcooked_mdp.py:2063-2115)."""
    width = len(rows[0])
    assert all(len(r) == width for r in rows), "Ragged grid"
    for r in rows:
        assert r[0] in "XOPDST" and r[-1] in "XOPDST", "Border must not be free"
    for x in range(width):
        assert rows[0][x] in "XOPDST" and rows[-1][x] in "XOPDST", (
            "Border must not be free"
        )
    flat = [c for r in rows for c in r]
    digits = sorted(int(c) for c in flat if c in "123456789")
    assert digits, "No players (digits) in grid"
    assert digits == list(range(1, len(digits) + 1)), "Some players were missing"
    assert all(c in "XOPDST123456789 " for c in flat), "Invalid character in grid"
    assert flat.count("1") == 1
    assert flat.count("D") >= 1 and flat.count("S") >= 1 and flat.count("P") >= 1
    assert flat.count("O") >= 1 or flat.count("T") >= 1


def build_layout(name: str, config: dict, **params_to_overwrite) -> LayoutSpec:
    """Build a LayoutSpec from a parsed layout config dict."""
    cfg = dict(config)
    cfg.update(params_to_overwrite)

    grid_rows = [row.strip() for row in cfg["grid"].split("\n")]
    _validate_grid(grid_rows)
    height, width = len(grid_rows), len(grid_rows[0])

    player_pos = {}
    terrain = np.zeros((height, width), np.int32)
    chars = []
    for y, row in enumerate(grid_rows):
        out_row = []
        for x, c in enumerate(row):
            if c in "123456789":
                player_pos[int(c)] = (x, y)
                c = " "
            terrain[y, x] = TERRAIN_CHAR_TO_CODE[c]
            out_row.append(c)
        chars.append("".join(out_row))
    num_players = len(player_pos)
    start_positions = [player_pos[i + 1] for i in range(num_players)]

    assert cfg.get("max_num_ingredients", 3) == MAX_NUM_INGREDIENTS, (
        "only max_num_ingredients=3 supported"
    )

    # --- order lists ---
    raw_orders = cfg.get("start_all_orders") or []
    if raw_orders:
        order_counts = [_counts(o["ingredients"]) for o in raw_orders]
    else:
        order_counts = list(_all_recipe_counts())
    assert len(set(order_counts)) == len(order_counts), "duplicate orders"
    if cfg.get("old_dynamics", False):
        # reference overcooked_mdp.py:1121-1127
        assert all(sum(c) == 3 for c in order_counts), (
            "Only accept orders with 3 items when using the old_dynamics"
        )
    bonus_counts = [
        _counts(o["ingredients"]) for o in (cfg.get("start_bonus_orders") or [])
    ]
    assert set(bonus_counts) <= set(order_counts), "bonus must be subset of all"

    order_value_map = None
    if cfg.get("recipe_values") is not None:
        assert raw_orders and len(raw_orders) == len(cfg["recipe_values"])
        order_value_map = dict(zip(order_counts, cfg["recipe_values"]))
    order_time_map = None
    if cfg.get("recipe_times") is not None:
        assert raw_orders and len(raw_orders) == len(cfg["recipe_times"])
        order_time_map = dict(zip(order_counts, cfg["recipe_times"]))

    order_bonus = cfg.get("order_bonus", 2)
    if order_bonus == float("inf"):
        order_bonus = INF_VALUE

    # --- tables ---
    n = MAX_NUM_INGREDIENTS + 1
    delivery_value = np.zeros((n, n), np.int64)
    time_table = np.full((n, n), 20, np.int64)
    order_set, bonus_set = set(order_counts), set(bonus_counts)
    for n_o, n_t in _all_recipe_counts():
        time_table[n_o, n_t] = _resolve_time(n_o, n_t, cfg, order_time_map)
        if (n_o, n_t) in order_set:
            base = _resolve_base_value(n_o, n_t, cfg, order_value_map)
            mult = order_bonus if (n_o, n_t) in bonus_set else 1
            delivery_value[n_o, n_t] = min(base * mult, INF_VALUE)

    # int8 state storage (env.compress_state) bounds the cook tick
    assert (time_table <= 127).all(), "cook times > 127 unsupported"

    opt_value = np.zeros((n, n), np.int64)
    for a in range(n):
        for b in range(n):
            best = 0
            for n_o, n_t in _all_recipe_counts():
                if n_o >= a and n_t >= b:
                    best = max(best, delivery_value[n_o, n_t])
            opt_value[a, b] = best

    shaping = cfg.get("rew_shaping_params") or BASE_REW_SHAPING_PARAMS

    sorted_orders = sorted(order_counts, key=lambda c: _recipe_sort_key(*c))
    sorted_bonus = sorted(bonus_counts, key=lambda c: _recipe_sort_key(*c))

    def order_tuple(c):
        return ("onion",) * c[0] + ("tomato",) * c[1]

    spec = LayoutSpec(
        name=name,
        height=height,
        width=width,
        num_players=num_players,
        terrain_chars=chars,
        sorted_all_orders=[order_tuple(c) for c in sorted_orders],
        sorted_bonus_orders=[order_tuple(c) for c in sorted_bonus],
        time_np=time_table.astype(np.int32),
        layout=None,  # filled below
        config=cfg,
    )

    # --- start state ---
    if cfg.get("start_state") is not None:
        start = state_from_dict(cfg["start_state"], spec)
    else:
        start = zeros_state(num_players, height, width)
        for i, (x, y) in enumerate(start_positions):
            start.pos[i] = (x, y)  # facing NORTH = 0 already

    spec.layout = Layout(
        terrain=terrain,
        delivery_value=delivery_value.astype(np.int32),
        time_table=time_table.astype(np.int32),
        opt_value=opt_value.astype(np.int32),
        placement_in_pot_rew=np.int32(shaping["PLACEMENT_IN_POT_REW"]),
        dish_pickup_rew=np.int32(shaping["DISH_PICKUP_REWARD"]),
        soup_pickup_rew=np.int32(shaping["SOUP_PICKUP_REWARD"]),
        old_dynamics=np.bool_(cfg.get("old_dynamics", False)),
        num_pots=np.int32(int((terrain == TERRAIN_CHAR_TO_CODE["P"]).sum())),
        start_state=start,
    )
    return spec


def read_layout_config(name: str) -> dict:
    """Load a layout config from the package JSON data dir."""
    path = os.path.join(LAYOUT_DIR, name + ".json")
    with open(path) as f:
        return json.load(f)


def from_layout_name(name: str, **params_to_overwrite) -> LayoutSpec:
    return build_layout(name, read_layout_config(name), **params_to_overwrite)


def available_layouts():
    return sorted(
        f[:-5] for f in os.listdir(LAYOUT_DIR) if f.endswith(".json")
    )


def convert_reference_layout_text(text: str) -> dict:
    """Parse a reference `.layout` Python-literal file into a plain dict.

    Handles the one non-literal construct in the corpus
    (`float('inf')` in tutorial_3.layout).
    """
    try:
        return ast.literal_eval(text)
    except ValueError:
        return ast.literal_eval(text.replace("float('inf')", "1e999"))
