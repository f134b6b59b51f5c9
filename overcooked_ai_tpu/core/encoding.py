"""State encodings for neural-net consumption.

Lossless encoding: the reference builds, per player, a stack of 26 (W, H)
mask layers with Python loops over objects
(reference lossless_state_encoding, overcooked_mdp.py:2385-2561). Here the
whole stack is computed with elementwise grid ops + player one-hot masks --
no loops, no scatters -- and is vmappable over the minor-axis env batch.

Layer order (exactly the reference LAYERS list for player i, :2420-2442):

    0  player_i_loc                13 tomato_disp_loc
    1  player_other_loc            14 dish_disp_loc
    2  player_i_orientation_0      15 serve_loc
    3  player_i_orientation_1      16 onions_in_pot      (idle pot soups)
    4  player_i_orientation_2      17 tomatoes_in_pot
    5  player_i_orientation_3      18 onions_in_soup     (cooking/ready pot
    6  player_other_orientation_0                         soups + all other
    7  player_other_orientation_1                         soups anywhere)
    8  player_other_orientation_2  19 tomatoes_in_soup
    9  player_other_orientation_3  20 soup_cook_time_remaining
    10 pot_loc                     21 soup_done
    11 counter_loc                 22 dishes
    12 onion_disp_loc              23 onions
    13.. (see right column)        24 tomatoes
                                   25 urgency (horizon - t < 40)

Output is (P, 26, H, W) int32 per env; `lossless_encode_ref_format` returns
the reference's (W, H, 26) per-player ordering for parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from overcooked_ai_tpu.core.constants import (
    MAX_NUM_INGREDIENTS,
    OBJ_DISH,
    OBJ_ONION,
    OBJ_SOUP,
    OBJ_TOMATO,
    TERRAIN_COUNTER,
    TERRAIN_DISH_DISP,
    TERRAIN_ONION_DISP,
    TERRAIN_POT,
    TERRAIN_SERVE,
    TERRAIN_TOMATO_DISP,
)
from overcooked_ai_tpu.core.layout import Layout
from overcooked_ai_tpu.core.state import State
from overcooked_ai_tpu.core.step import _slot_counts, _t4x4

NUM_LAYERS = 26
URGENCY_WINDOW = 40  # reference overcooked_mdp.py:2446


def lossless_encode(
    layout: Layout, state: State, horizon: int = 400, dtype=jnp.int32
):
    """Encode one env state for both players.

    Returns (P, 26, H, W) `dtype`; player p's stack has p's own layers first
    (reference process_for_player, overcooked_mdp.py:2420). Two-player only,
    like the reference (assert at :2389).
    """
    num_players = state.pos.shape[0]
    assert num_players == 2, "lossless encoding is 2-player only"
    height, width = state.obj.shape

    terrain = layout.terrain
    i32 = jnp.int32

    # --- player one-hot location grids (H, W) ---
    ys = jnp.arange(height, dtype=i32)[:, None]
    xs = jnp.arange(width, dtype=i32)[None, :]
    ploc = [
        ((ys == state.pos[p, 1]) & (xs == state.pos[p, 0])).astype(i32)
        for p in range(num_players)
    ]
    porient = [
        [ploc[p] * (state.orient[p] == d).astype(i32) for d in range(4)]
        for p in range(num_players)
    ]

    # --- static terrain layers ---
    pot_loc = (terrain == TERRAIN_POT).astype(i32)
    counter_loc = (terrain == TERRAIN_COUNTER).astype(i32)
    onion_disp = (terrain == TERRAIN_ONION_DISP).astype(i32)
    tomato_disp = (terrain == TERRAIN_TOMATO_DISP).astype(i32)
    dish_disp = (terrain == TERRAIN_DISH_DISP).astype(i32)
    serve_loc = (terrain == TERRAIN_SERVE).astype(i32)

    # --- grid objects ---
    obj = state.obj
    g_no, g_nt = _slot_counts(state.soup_ing)
    g_cook_time = _t4x4(layout.time_table, g_no, g_nt)
    is_soup = obj == OBJ_SOUP
    at_pot = terrain == TERRAIN_POT
    idle = state.soup_tick < 0
    soup_idle_at_pot = is_soup & at_pot & idle
    soup_active_at_pot = is_soup & at_pot & ~idle
    soup_ready_at_pot = soup_active_at_pot & (state.soup_tick >= g_cook_time)
    # soups not on a pot (counters): treated as done with 0 time remaining
    # (reference :2515-2525)
    soup_off_pot = is_soup & ~at_pot

    onions_in_pot = jnp.where(soup_idle_at_pot, g_no, 0)
    tomatoes_in_pot = jnp.where(soup_idle_at_pot, g_nt, 0)
    onions_in_soup = jnp.where(soup_active_at_pot | soup_off_pot, g_no, 0)
    tomatoes_in_soup = jnp.where(soup_active_at_pot | soup_off_pot, g_nt, 0)
    cook_time_remaining = jnp.where(
        soup_active_at_pot, g_cook_time - state.soup_tick, 0
    )
    soup_done = (soup_ready_at_pot | soup_off_pot).astype(i32)
    dishes = (obj == OBJ_DISH).astype(i32)
    onions = (obj == OBJ_ONION).astype(i32)
    tomatoes = (obj == OBJ_TOMATO).astype(i32)

    # --- held objects contribute at the holder's position (all_objects_list
    # includes player-held objects, reference :2413,877-879) ---
    h_no, h_nt = _slot_counts(state.held_soup)  # (P,)
    for p in range(num_players):
        held = state.held[p]
        mask = ploc[p]
        # held soups are always off-pot soups: done, 0 time remaining
        held_soup_here = mask * (held == OBJ_SOUP)
        onions_in_soup = onions_in_soup + held_soup_here * h_no[p]
        tomatoes_in_soup = tomatoes_in_soup + held_soup_here * h_nt[p]
        soup_done = soup_done + held_soup_here
        dishes = dishes + mask * (held == OBJ_DISH)
        onions = onions + mask * (held == OBJ_ONION)
        tomatoes = tomatoes + mask * (held == OBJ_TOMATO)

    urgency = jnp.broadcast_to(
        (horizon - state.t < URGENCY_WINDOW).astype(i32), (height, width)
    )

    common = [
        pot_loc,
        counter_loc,
        onion_disp,
        tomato_disp,
        dish_disp,
        serve_loc,
        onions_in_pot,
        tomatoes_in_pot,
        onions_in_soup,
        tomatoes_in_soup,
        cook_time_remaining,
        soup_done,
        dishes,
        onions,
        tomatoes,
        urgency,
    ]

    stacks = []
    for p in range(num_players):
        q = 1 - p
        layers = (
            [ploc[p], ploc[q]] + porient[p] + porient[q] + common
        )
        stacks.append(jnp.stack(layers))
    return jnp.stack(stacks).astype(dtype)  # (P, 26, H, W)


def lossless_encode_ref_format(layout: Layout, state: State, horizon=400):
    """Reference-format output: tuple of per-player (W, H, 26) int arrays
    (reference returns np.transpose stacks indexed [x][y],
    overcooked_mdp.py:2547-2554)."""
    enc = lossless_encode(layout, state, horizon)  # (P, 26, H, W)
    out = jnp.transpose(enc, (0, 3, 2, 1))  # -> (P, W, H, 26)
    return tuple(np.asarray(out[p]) for p in range(enc.shape[0]))


# Batched encode: env batch on the minor axis of state, batch-major output
# (B, P, 26, H, W) ready for an NHWC conv net after a reshape/transpose.
lossless_encode_batch = jax.vmap(
    lossless_encode, in_axes=(None, -1), out_axes=0
)


def get_lossless_encoding_shape(layout: Layout):
    h, w = layout.terrain.shape
    return (w, h, NUM_LAYERS)  # reference shape convention (:2382)
