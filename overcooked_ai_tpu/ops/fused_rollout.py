"""Fused multi-step rollout as a single pallas TPU kernel.

The XLA path (`core/env.rollout_random`) lowers each env step to dozens of
fused VPU kernels whose intermediates round-trip HBM between fusion
boundaries; at 16k envs that caps throughput near 90M env-steps/s. This
kernel instead runs the ENTIRE horizon loop inside one pallas program per
batch tile: the state lives in VMEM/vector registers for all T steps, HBM
is touched exactly twice (load initial state, store final state), and
actions come from an in-kernel counter-based PRNG.

Three structural choices set the VPU economics (round-2 rewrite):

1. **Full-vreg batch fold.** The env batch is reshaped to (B/L, L) with
   L=128 lanes, so every per-player quantity is a dense (sublane, lane)
   tile instead of a 1-D row that occupies 1/8 of each int32 vreg. All
   ~150 per-player ops in the transition get 8x denser.
2. **Per-cell registers, not a grid tensor.** The grid state (object code,
   3 ingredient slots, cook tick, insertion stamp — bit-packed into one
   int32 word per cell, terrain code riding in bits 28-30) is carried as a
   Python list of K (B/L, L) registers, one per *mutable* cell: the
   non-EMPTY cells a player can face (4-adjacent to floor) plus pot /
   start-state-soup cells. Corner counters, walls behind walls and all
   EMPTY cells are statically inert — they pass through the kernel
   untouched (with a `ever_done ? start : input` fix-up so auto-reset
   stays bit-exact). Facing-cell reads/writes are K scalar-constant
   compares instead of an (HW, B) masked reduction, and terrain + reset
   values fold into Python int immediates, so the kernel captures NO
   array constants and needs NO layout operands.
3. **Static effect rows + terrain bitmask movement.** Cook-tick
   environment effects (reference overcooked_mdp.py:1691-1703) only ever
   fire on pot cells (a held soup is always ready, so counter-dropped
   soups never cook) — they run on the static pot∪start-soup rows only.
   Movement's "is the target cell floor" test is a bitmask lookup
   `(EMPTY_MASK >> lin) & 1` against a compile-time constant instead of a
   grid reduction.

Semantics are the same exact transition as `core/step.py` (reference
overcooked_mdp.py:1375-1709) minus the outputs this path never consumes:
the 25-channel event tensor and shaped rewards (XLA dead-code-eliminates
them in the random-rollout program too, so the comparison is fair). Parity
with `core.step.step` is tested bit-for-bit via the explicit-actions entry
point (`fused_rollout_actions`) in tests/test_fused_rollout.py, including
across auto-resets.

Known (documented) approximations, identical to the scan path or strictly
narrower than round 1:
  - insertion stamps clamp at 2047 (exact for 2-player horizon-400; see
    core/state.py) — but only on carried rows; inert rows now round-trip
    unclamped.
  - a *hand-crafted* initial state with a mid-cook soup on a plain counter
    (unreachable through play) would tick in the scan path but not here
    unless that cell also holds a soup in the layout's start state.

Batch layout matches the rest of the framework: env batch on the minor
axes of every array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from overcooked_ai_tpu.core.constants import (
    ACTION_INTERACT,
    EVENT_TYPES,
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

_SLOTS = MAX_NUM_INGREDIENTS  # 3 ingredient slots per soup
_SEQ_MAX = 2047
_TICK_MASK = 255 << 9


class _Meta:
    """Static per-layout analysis: which cells are live, constants per cell."""

    def __init__(self, spec):
        lay = spec.layout
        H, W = spec.height, spec.width
        HW = H * W
        terr = np.asarray(lay.terrain, np.int64).reshape(HW)
        start = lay.start_state
        s_obj = np.asarray(start.obj, np.int64).reshape(HW)
        s_sing = np.asarray(start.soup_ing, np.int64).reshape(HW, _SLOTS)
        s_stick = np.asarray(start.soup_tick, np.int64).reshape(HW)
        s_seq = np.asarray(start.obj_seq, np.int64).reshape(HW)

        empty = terr == TERRAIN_EMPTY
        # cells a player (standing on floor) can face
        adj = np.zeros(HW, bool)
        for lin in range(HW):
            y, x = divmod(lin, W)
            for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ny, nx = y + dy, x + dx
                if 0 <= ny < H and 0 <= nx < W and empty[ny * W + nx]:
                    adj[lin] = True
        faceable = ~empty & adj
        effects = (terr == TERRAIN_POT) | (s_obj == OBJ_SOUP)
        mutable = faceable | effects

        self.lins = [int(l) for l in np.nonzero(mutable)[0]]
        self.k_of_lin = {l: k for k, l in enumerate(self.lins)}
        self.effect_ks = [self.k_of_lin[int(l)] for l in np.nonzero(effects)[0]]
        self.tt = [int(terr[l]) for l in self.lins]
        # packed reset word per carried cell (terrain folded in)
        self.reset_word = [
            int(
                s_obj[l]
                | (s_sing[l, 0] << 3)
                | (s_sing[l, 1] << 5)
                | (s_sing[l, 2] << 7)
                | ((s_stick[l] + 1) << 9)
                | (min(s_seq[l] + HW, _SEQ_MAX) << 17)
                | (terr[l] << 28)
            )
            for l in self.lins
        ]
        # raw start values for the statically-inert rows (reset fix-up)
        self.inert = [
            (int(l), int(s_obj[l]), tuple(int(v) for v in s_sing[l]),
             int(s_stick[l]), int(s_seq[l]))
            for l in range(HW)
            if not mutable[l]
        ]
        # floor bitmask, 32 cells per chunk, for movement checks
        self.empty_masks = []
        for c in range((HW + 31) // 32):
            m = 0
            for b in range(32):
                l = c * 32 + b
                if l < HW and empty[l]:
                    m |= 1 << b
            self.empty_masks.append(m)
        # player start constants, packed like the loop-carried player words
        pos = np.asarray(start.pos)
        orient = np.asarray(start.orient)
        held = np.asarray(start.held)
        hsoup = np.asarray(start.held_soup)
        htick = np.asarray(start.held_soup_tick)
        self.start_pword = [
            int(pos[i, 0] | (pos[i, 1] << 5) | (orient[i] << 10)
                | (held[i] << 12))
            for i in range(pos.shape[0])
        ]
        self.start_hword = [
            int(hsoup[i, 0] | (hsoup[i, 1] << 2) | (hsoup[i, 2] << 4)
                | ((htick[i] + 1) << 6))
            for i in range(pos.shape[0])
        ]


def _table_select(table_np: np.ndarray, n_o, n_t):
    """Look up a (4,4) host-constant int table at traced (n_o, n_t).

    Zero entries are skipped and a constant table folds to a scalar, so the
    common all-20s cook-time table costs nothing at runtime.
    """
    flat = np.asarray(table_np, np.int32).reshape(-1)
    if np.all(flat == flat[0]):
        return jnp.full(jnp.broadcast_shapes(n_o.shape, n_t.shape), int(flat[0]), jnp.int32)
    lin = n_o * (_SLOTS + 1) + n_t
    out = jnp.zeros(lin.shape, jnp.int32)
    for k in range(flat.shape[0]):
        if flat[k] != 0:
            out = jnp.where(lin == k, int(flat[k]), out)
    return out


def _make_step(spec, meta: _Meta, emit_train: bool = False):
    """Build the batch-dense single-step transition for one layout.

    All state is Python lists of (Bs, L) int32 tiles:
      rows: K packed cell words        px/py/orient/held/htick: P tiles
      hslots: P lists of 3 slot tiles  actions: P tiles   t: one tile
    Returns the updated lists plus per-player sparse reward tiles.

    emit_train additionally computes, per player, the shaped reward and
    the 25-event bitmask (EVENT_TYPES bit order) exactly as core/step.py
    (reference resolve_interacts event logging + usefulness classifiers,
    overcooked_mdp.py:1432-1579, 2121-2308) — the training hot path.

    meta may be the static per-layout `_Meta` (terrain folded into Python
    constants) or a duck-typed dynamic meta (`ops/fused_pool._PoolMeta`,
    `meta.dynamic = True`): ALL HW cells carried, terrain read from bits
    28-30 of each cell word at runtime, and the caller passes `dyn`
    (per-lane floor bitmask registers + pot count) into `step`. The
    dynamic mode is the variable-MDP (layout-pool) kernel path; recipe
    tables / shaping params / old_dynamics stay compile-time constants
    (asserted uniform across the pool by the fused_pool wrappers).
    """
    lay = spec.layout
    W = spec.width
    HW = spec.height * W
    P = spec.num_players
    K = len(meta.lins)
    dynamic = bool(getattr(meta, "dynamic", False))
    old_dynamics = bool(lay.old_dynamics)
    time_t = np.asarray(lay.time_table)
    deliv_t = np.asarray(lay.delivery_value)
    i32 = jnp.int32
    if emit_train:
        opt_t = np.asarray(lay.opt_value)
        num_pots = int(lay.num_pots)
        rew_pot = int(lay.placement_in_pot_rew)
        rew_dish = int(lay.dish_pickup_rew)
        rew_soup = int(lay.soup_pickup_rew)
        if dynamic:
            # every cell is a pot candidate; predicated on the word's
            # terrain bits inside the snapshot loop below
            pot_ks = list(range(K))
            inert_dishes = 0
        else:
            pot_ks = [k for k in range(K) if meta.tt[k] == TERRAIN_POT]
            inert_dishes = sum(
                1 for (_l, o, _s, _st, _sq) in meta.inert if o == OBJ_DISH
            )
        two_player = P == 2

    def _static_is_floor(lin):
        """(EMPTY_MASK >> lin) & 1 against the static floor bitmask."""
        if len(meta.empty_masks) == 1:
            bit = (jnp.uint32(meta.empty_masks[0]) >> lin.astype(jnp.uint32)) & 1
            return bit == 1
        ok = jnp.zeros(lin.shape, jnp.bool_)
        for c, m in enumerate(meta.empty_masks):
            if not m:
                continue
            bit = (jnp.uint32(m) >> (lin & 31).astype(jnp.uint32)) & 1
            ok = ok | (((lin >> 5) == c) & (bit == 1))
        return ok

    def _dyn_is_floor(emask, lin):
        """Same test against per-lane floor bitmask registers."""
        if len(emask) == 1:
            bit = (emask[0] >> lin.astype(jnp.uint32)) & 1
            return bit == 1
        ok = jnp.zeros(lin.shape, jnp.bool_)
        for c, m in enumerate(emask):
            bit = (m >> (lin & 31).astype(jnp.uint32)) & 1
            ok = ok | (((lin >> 5) == c) & (bit == 1))
        return ok

    def step(rows, px, py, orient, held, hslots, htick, t, actions, dyn=None):
        if dynamic:
            is_floor = functools.partial(_dyn_is_floor, dyn["emask"])
            num_pots_v = dyn["num_pots"] if emit_train else None
        else:
            is_floor = _static_is_floor
            num_pots_v = num_pots if emit_train else None
        rows = list(rows)
        sparse = []
        if emit_train:
            shaped_out = []
            ev_out = []
            zero = jnp.zeros(t.shape, i32)
            # pot snapshot BEFORE any interact (reference get_pot_states at
            # :1439; mirrors core/step.py _PotSnapshot) -- pot rows only
            n_full = zero
            n_nonempty = zero
            for k in pot_ks:
                w = rows[k]
                isp = (
                    (((w >> 28) & 7) == TERRAIN_POT) if dynamic else None
                )
                s0 = (w >> 3) & 3
                s1 = (w >> 5) & 3
                s2 = (w >> 7) & 3
                p_no = (
                    (s0 == 1).astype(i32) + (s1 == 1).astype(i32)
                    + (s2 == 1).astype(i32)
                )
                p_nt = (
                    (s0 == 2).astype(i32) + (s1 == 2).astype(i32)
                    + (s2 == 2).astype(i32)
                )
                p_n = p_no + p_nt
                tickp1 = (w >> 9) & 255
                p_soup = (w & 7) == OBJ_SOUP
                p_idle = tickp1 == 0
                cook_t = _table_select(time_t, p_no, p_nt)
                p_ready = p_soup & ~p_idle & (tickp1 - 1 >= cook_t)
                p_cooking = p_soup & ~p_idle & ~p_ready
                part_full = p_soup & p_idle & (p_n >= 1) & (p_n < _SLOTS)
                full_idle = p_soup & p_idle & (p_n == _SLOTS)
                fullish = p_cooking | p_ready | full_idle
                nonemptyish = p_ready | p_cooking | part_full
                if dynamic:  # only actual pot cells count
                    fullish = fullish & isp
                    nonemptyish = nonemptyish & isp
                n_full = n_full + fullish.astype(i32)
                n_nonempty = n_nonempty + nonemptyish.astype(i32)

        # ---- 1. resolve_interacts: sequential per player (reference :1432)
        for i in range(P):
            act_i = actions[i]
            inter = act_i == ACTION_INTERACT
            o = orient[i]
            dx = jnp.where(o == 2, 1, 0) - jnp.where(o == 3, 1, 0)
            dy = jnp.where(o == 1, 1, 0) - jnp.where(o == 0, 1, 0)
            lin = (py[i] + dy) * W + (px[i] + dx)

            # facing-cell read: K scalar-constant compares; facing floor
            # reads an all-zero word = empty cell, no interaction possible
            eqs = [lin == meta.lins[k] for k in range(K)]
            w = jnp.zeros(lin.shape, i32)
            for k in range(K):
                w = w | jnp.where(eqs[k], rows[k], 0)

            tt = (w >> 28) & 7  # terrain rides in the word: one read total
            cell_obj = w & 7
            s0 = (w >> 3) & 3
            s1 = (w >> 5) & 3
            s2 = (w >> 7) & 3
            cell_tick = ((w >> 9) & 255) - 1
            c_no = (
                (s0 == 1).astype(i32) + (s1 == 1).astype(i32)
                + (s2 == 1).astype(i32)
            )
            c_nt = (
                (s0 == 2).astype(i32) + (s1 == 2).astype(i32)
                + (s2 == 2).astype(i32)
            )
            c_n = c_no + c_nt
            cook_time = _table_select(time_t, c_no, c_nt)
            cell_is_soup = cell_obj == OBJ_SOUP
            cell_idle = cell_tick < 0
            cell_ready = cell_is_soup & ~cell_idle & (cell_tick >= cook_time)

            held_i = held[i]
            has_obj = held_i != OBJ_NONE

            counter_drop = inter & (tt == TERRAIN_COUNTER) & has_obj & (cell_obj == OBJ_NONE)
            counter_pickup = inter & (tt == TERRAIN_COUNTER) & ~has_obj & (cell_obj != OBJ_NONE)
            onion_disp = inter & (tt == TERRAIN_ONION_DISP) & ~has_obj
            tomato_disp = inter & (tt == TERRAIN_TOMATO_DISP) & ~has_obj
            dish_disp = inter & (tt == TERRAIN_DISH_DISP) & ~has_obj
            if old_dynamics:
                start_cook = jnp.zeros_like(inter)
            else:
                start_cook = (
                    inter & (tt == TERRAIN_POT) & ~has_obj
                    & cell_is_soup & cell_idle & (c_n > 0)
                )
            soup_pickup = inter & (tt == TERRAIN_POT) & (held_i == OBJ_DISH) & cell_ready
            pot_try = inter & (tt == TERRAIN_POT) & (
                (held_i == OBJ_ONION) | (held_i == OBJ_TOMATO)
            )
            # empty pot cell counts as a fresh idle soup (reference :1544-1546)
            pot_ok = pot_try & (
                (cell_obj == OBJ_NONE)
                | (cell_is_soup & cell_idle & (c_n < _SLOTS))
            )
            deliver = inter & (tt == TERRAIN_SERVE) & (held_i == OBJ_SOUP)

            h0, h1, h2 = hslots[i]
            h_no = (
                (h0 == OBJ_ONION).astype(i32) + (h1 == OBJ_ONION).astype(i32)
                + (h2 == OBJ_ONION).astype(i32)
            )
            h_nt = (
                (h0 == OBJ_TOMATO).astype(i32) + (h1 == OBJ_TOMATO).astype(i32)
                + (h2 == OBJ_TOMATO).astype(i32)
            )
            sparse.append(jnp.where(deliver, _table_select(deliv_t, h_no, h_nt), 0))

            if emit_train:
                # usefulness classifiers read the CURRENT (partially
                # mutated) held/object state, like core/step.py's loop
                # (reference :2180-2254); pot snapshot is pre-interact.
                if two_player:
                    other_held = held[1 - i]
                    all_pots_full = n_full == num_pots_v
                    no_full_pots = n_full == 0
                    doc = zero + inert_dishes  # dishes on counters
                    for k in range(K):
                        doc = doc + ((rows[k] & 7) == OBJ_DISH).astype(i32)
                    npd = (held[0] == OBJ_DISH).astype(i32) + (
                        held[1] == OBJ_DISH
                    ).astype(i32)
                    dish_pickup_useful = (doc == 0) & (npd < n_nonempty)
                    dish_drop_useful = no_full_pots & ~(
                        other_held == OBJ_ONION
                    )
                    ing_pickup_useful = ~(
                        all_pots_full & ~(other_held == OBJ_DISH)
                    )
                    ing_drop_useful = all_pots_full & ~(
                        other_held == OBJ_DISH
                    )
                else:
                    false = zero > 0
                    dish_pickup_useful = dish_drop_useful = false
                    ing_pickup_useful = ing_drop_useful = false

                picked = lambda c: counter_pickup & (cell_obj == c)  # noqa: E731
                dropped = lambda c: counter_drop & (held_i == c)  # noqa: E731
                evd = {}
                evd["onion_pickup"] = picked(OBJ_ONION) | onion_disp
                # tomato dispenser pickups are NOT logged (reference :1496)
                evd["tomato_pickup"] = picked(OBJ_TOMATO)
                evd["dish_pickup"] = picked(OBJ_DISH) | dish_disp
                evd["soup_pickup"] = picked(OBJ_SOUP) | soup_pickup
                evd["onion_drop"] = dropped(OBJ_ONION)
                evd["tomato_drop"] = dropped(OBJ_TOMATO)
                evd["dish_drop"] = dropped(OBJ_DISH)
                evd["soup_drop"] = dropped(OBJ_SOUP)
                evd["useful_onion_pickup"] = (
                    evd["onion_pickup"] & ing_pickup_useful
                )
                evd["useful_tomato_pickup"] = (
                    evd["tomato_pickup"] & ing_pickup_useful
                )
                evd["useful_dish_pickup"] = (
                    evd["dish_pickup"] & dish_pickup_useful
                )
                evd["useful_onion_drop"] = evd["onion_drop"] & ing_drop_useful
                evd["useful_tomato_drop"] = (
                    evd["tomato_drop"] & ing_drop_useful
                )
                evd["useful_dish_drop"] = evd["dish_drop"] & dish_drop_useful
                evd["soup_delivery"] = deliver
                # potting outcome labels via the opt_value table
                # (reference :2121-2140, :2256-2308)
                pot_onion = pot_ok & (held_i == OBJ_ONION)
                pot_tomato = pot_ok & (held_i == OBJ_TOMATO)
                old_no = jnp.where(cell_obj == OBJ_NONE, 0, c_no)
                old_nt = jnp.where(cell_obj == OBJ_NONE, 0, c_nt)
                new_no = old_no + (held_i == OBJ_ONION).astype(i32)
                new_nt = old_nt + (held_i == OBJ_TOMATO).astype(i32)
                old_val = _table_select(opt_t, old_no, old_nt)
                new_val = _table_select(opt_t, new_no, new_nt)
                optimal = old_val == new_val
                viable = new_val > 0
                catastrophic = (old_val > 0) & (new_val == 0)
                useless = old_val == 0
                evd["potting_onion"] = pot_onion
                evd["potting_tomato"] = pot_tomato
                evd["optimal_onion_potting"] = pot_onion & optimal
                evd["optimal_tomato_potting"] = pot_tomato & optimal
                evd["viable_onion_potting"] = pot_onion & viable
                evd["viable_tomato_potting"] = pot_tomato & viable
                evd["catastrophic_onion_potting"] = pot_onion & catastrophic
                evd["catastrophic_tomato_potting"] = pot_tomato & catastrophic
                evd["useless_onion_potting"] = pot_onion & useless
                evd["useless_tomato_potting"] = pot_tomato & useless
                m = zero
                for bit, name in enumerate(EVENT_TYPES):
                    m = m | jnp.where(evd[name], i32(1 << bit), 0)
                ev_out.append(m)
                shaped_out.append(
                    jnp.where(dish_disp & dish_pickup_useful, rew_dish, 0)
                    + jnp.where(soup_pickup, rew_soup, 0)
                    + jnp.where(pot_ok, rew_pot, 0)
                )

            # --- held mutations ---
            held[i] = jnp.where(
                counter_drop | deliver | pot_ok,
                OBJ_NONE,
                jnp.where(
                    counter_pickup,
                    cell_obj,
                    jnp.where(
                        onion_disp,
                        OBJ_ONION,
                        jnp.where(
                            tomato_disp,
                            OBJ_TOMATO,
                            jnp.where(
                                dish_disp,
                                OBJ_DISH,
                                jnp.where(soup_pickup, OBJ_SOUP, held_i),
                            ),
                        ),
                    ),
                ),
            )
            gained = (counter_pickup & cell_is_soup) | soup_pickup
            lost = counter_drop | deliver
            hslots[i] = [
                jnp.where(gained, c, jnp.where(lost, 0, h))
                for c, h in zip((s0, s1, s2), (h0, h1, h2))
            ]
            htick_pre = htick[i]  # cell write below needs the PRE-drop tick
            htick[i] = jnp.where(gained, cell_tick, jnp.where(lost, -1, htick_pre))

            # --- packed cell mutation (one masked write per carried cell) ---
            obj_f = jnp.where(
                counter_drop,
                held_i,
                jnp.where(
                    counter_pickup | soup_pickup,
                    OBJ_NONE,
                    jnp.where(pot_ok, OBJ_SOUP, cell_obj),
                ),
            )
            old_bits = w & (0x3F << 3)
            hs_bits = (h0 << 3) | (h1 << 5) | (h2 << 7)
            base = jnp.where(cell_obj == OBJ_NONE, 0, c_n)
            add_bits = jnp.where(
                base == 0,
                held_i << 3,
                jnp.where(base == 1, held_i << 5, held_i << 7),
            )
            pot_bits = jnp.where(cell_obj == OBJ_NONE, 0, old_bits) | add_bits
            slots_f = jnp.where(
                counter_drop & (held_i == OBJ_SOUP),
                hs_bits,
                jnp.where(
                    counter_pickup | soup_pickup,
                    0,
                    jnp.where(pot_ok, pot_bits, old_bits),
                ),
            )
            tickp1_f = jnp.where(
                counter_drop & (held_i == OBJ_SOUP),
                htick_pre + 1,
                jnp.where(
                    counter_pickup | soup_pickup,
                    0,
                    jnp.where(
                        start_cook,
                        1,
                        jnp.where(pot_ok, 0, (w >> 9) & 255),
                    ),
                ),
            )
            placed = counter_drop | (pot_ok & (cell_obj == OBJ_NONE))
            removed = counter_pickup | soup_pickup
            stamp = jnp.minimum(t * P + (i + 1) + HW, _SEQ_MAX)
            seq_f = jnp.where(
                placed, stamp, jnp.where(removed, HW, (w >> 17) & _SEQ_MAX)
            )
            new_w = (
                obj_f | slots_f | (tickp1_f << 9) | (seq_f << 17) | (tt << 28)
            )
            changed = (
                counter_drop | counter_pickup | soup_pickup | pot_ok | start_cook
            )
            for k in range(K):
                rows[k] = jnp.where(eqs[k] & changed, new_w, rows[k])

        # ---- 2. resolve_movement (reference :1644-1709)
        nx, ny = [], []
        for i in range(P):
            a = actions[i]
            is_dir = a < 4
            mdx = jnp.where(a == 2, 1, 0) - jnp.where(a == 3, 1, 0)
            mdy = jnp.where(a == 1, 1, 0) - jnp.where(a == 0, 1, 0)
            orient[i] = jnp.where(is_dir, a, orient[i])
            cx, cy = px[i] + mdx, py[i] + mdy
            moved = is_dir & is_floor(cy * W + cx)
            nx.append(jnp.where(moved, cx, px[i]))
            ny.append(jnp.where(moved, cy, py[i]))
        collision = jnp.zeros(px[0].shape, jnp.bool_)
        for i in range(P):
            for j in range(i + 1, P):
                same = (nx[i] == nx[j]) & (ny[i] == ny[j])
                swap = (
                    (nx[i] == px[j]) & (ny[i] == py[j])
                    & (px[i] == nx[j]) & (py[i] == ny[j])
                )
                collision = collision | same | swap
        for i in range(P):
            px[i] = jnp.where(collision, px[i], nx[i])
            py[i] = jnp.where(collision, py[i], ny[i])

        # ---- 3. step_environment_effects (reference :1691-1703). Static
        # mode: pot rows only (held soups are always ready, so counter
        # soups never tick). Dynamic mode: every cell, is_soup-guarded —
        # exactly core/step.py's whole-grid formulation (its off-pot soups
        # are ready, so `cooking` is false and the word passes through).
        for k in (range(K) if dynamic else meta.effect_ks):
            w = rows[k]
            s0 = (w >> 3) & 3
            s1 = (w >> 5) & 3
            s2 = (w >> 7) & 3
            g_no = (
                (s0 == 1).astype(i32) + (s1 == 1).astype(i32)
                + (s2 == 1).astype(i32)
            )
            g_nt = (
                (s0 == 2).astype(i32) + (s1 == 2).astype(i32)
                + (s2 == 2).astype(i32)
            )
            is_soup = (w & 7) == OBJ_SOUP
            tickp1 = (w >> 9) & 255
            if old_dynamics:
                auto = is_soup & (tickp1 == 0) & ((g_no + g_nt) == 3)
                tickp1 = jnp.where(auto, 1, tickp1)
            cook_t = _table_select(time_t, g_no, g_nt)
            cooking = is_soup & (tickp1 > 0) & (tickp1 - 1 < cook_t)
            rows[k] = (w & ~_TICK_MASK) | ((tickp1 + cooking.astype(i32)) << 9)

        if emit_train:
            return (
                rows, px, py, orient, held, hslots, htick, sparse,
                shaped_out, ev_out,
            )
        return rows, px, py, orient, held, hslots, htick, sparse

    return step


def _state_to_tiles(state: State, bs: int, lanes: int):
    """State pytree (batch-minor) -> flat kernel array tuple, batch folded
    to (..., bs, lanes)."""
    H, W, _, B = state.soup_ing.shape

    def fold(a, *lead):
        return a.reshape(*lead, bs, lanes).astype(jnp.int32)

    HW = H * W
    P = state.held.shape[0]
    return (
        fold(state.pos[:, 0, :], P),
        fold(state.pos[:, 1, :], P),
        fold(state.orient, P),
        fold(state.held, P),
        fold(jnp.moveaxis(state.held_soup, 1, 0), _SLOTS, P),  # (3, P, bs, L)
        fold(state.held_soup_tick, P),
        fold(state.obj.reshape(HW, B), HW),
        fold(jnp.moveaxis(state.soup_ing.reshape(HW, _SLOTS, B), 1, 0), _SLOTS, HW),
        fold(state.soup_tick.reshape(HW, B), HW),
        fold(state.obj_seq.reshape(HW, B), HW),
        fold(state.t, ),
    )


def _tiles_to_state(arrs, H, W) -> State:
    px, py, orient, held, hsoup, htick, obj, sing, stick, seq, t = arrs
    P, bs, lanes = px.shape
    B = bs * lanes
    HW = H * W
    return State(
        pos=jnp.stack([px.reshape(P, B), py.reshape(P, B)], axis=1),
        orient=orient.reshape(P, B),
        held=held.reshape(P, B),
        held_soup=jnp.moveaxis(hsoup.reshape(_SLOTS, P, B), 0, 1),
        held_soup_tick=htick.reshape(P, B),
        obj=obj.reshape(H, W, B),
        soup_ing=jnp.moveaxis(sing.reshape(_SLOTS, HW, B), 0, 1).reshape(H, W, _SLOTS, B),
        soup_tick=stick.reshape(H, W, B),
        obj_seq=seq.reshape(H, W, B),
        t=t.reshape(B),
    )


def _state_specs(spec, blk_bs: int, lanes: int):
    """BlockSpecs for the 11 state arrays; tile over the folded-batch
    sublane axis (dim -2)."""
    H, W, P = spec.height, spec.width, spec.num_players
    HW = H * W

    def bs(*lead):
        ndim = len(lead)
        return pl.BlockSpec(
            lead + (blk_bs, lanes),
            (lambda *gi, _n=ndim: (0,) * _n + (gi[0], 0)),
            memory_space=pltpu.VMEM,
        )

    return [
        bs(P), bs(P), bs(P), bs(P),  # px, py, orient, held
        bs(_SLOTS, P),  # hsoup
        bs(P),  # htick
        bs(HW),  # obj
        bs(_SLOTS, HW),  # sing
        bs(HW),  # stick
        bs(HW),  # obj_seq
        bs(),  # t
    ]


def _build_kernel(spec, meta: _Meta, num_steps: int, horizon: int, use_rng: bool):
    step = _make_step(spec, meta)
    P = spec.num_players
    HW = spec.height * spec.width
    K = len(meta.lins)

    def kernel(seed_ref, actions_ref, *refs):
        state_in = refs[0:11]
        state_out = refs[11:22]
        ret_ref = refs[22]
        raw = tuple(r[:] for r in state_in)
        (px_a, py_a, or_a, held_a, hs_a, ht_a,
         obj_a, sing_a, stick_a, seq_a, t0) = raw

        # pack the carried cells into one word register each; terrain is a
        # Python constant per cell, so no layout operand is needed
        rows = [
            (
                obj_a[l]
                | (sing_a[0, l] << 3)
                | (sing_a[1, l] << 5)
                | (sing_a[2, l] << 7)
                | ((stick_a[l] + 1) << 9)
                | (jnp.minimum(seq_a[l] + HW, _SEQ_MAX) << 17)
                | (meta.tt[k] << 28)
            )
            for k, l in enumerate(meta.lins)
        ]
        # player state packed 2 words per player (pos/orient/held + soup
        # slots/tick): fewer loop-carried vectors = less spill traffic
        pword = [
            px_a[i] | (py_a[i] << 5) | (or_a[i] << 10) | (held_a[i] << 12)
            for i in range(P)
        ]
        hword = [
            hs_a[0, i] | (hs_a[1, i] << 2) | (hs_a[2, i] << 4)
            | ((ht_a[i] + 1) << 6)
            for i in range(P)
        ]

        def unpack_players(pword, hword):
            px = [w & 31 for w in pword]
            py = [(w >> 5) & 31 for w in pword]
            orient = [(w >> 10) & 3 for w in pword]
            held = [(w >> 12) & 7 for w in pword]
            hslots = [
                [hw & 3, (hw >> 2) & 3, (hw >> 4) & 3] for hw in hword
            ]
            htick = [((hw >> 6) & 255) - 1 for hw in hword]
            return px, py, orient, held, hslots, htick

        def pack_players(px, py, orient, held, hslots, htick):
            pword = [
                px[i] | (py[i] << 5) | (orient[i] << 10) | (held[i] << 12)
                for i in range(P)
            ]
            hword = [
                hslots[i][0] | (hslots[i][1] << 2) | (hslots[i][2] << 4)
                | ((htick[i] + 1) << 6)
                for i in range(P)
            ]
            return pword, hword

        shape = t0.shape
        ret0 = jnp.zeros(shape, jnp.int32)
        # carried as i32, not bool: Mosaic cannot legalize an i1 vector as a
        # loop-carried value in scf.for
        ever0 = jnp.zeros(shape, jnp.int32)
        if use_rng:
            # Stateless counter-based stream (murmur3 finalizer over
            # seed/global-lane/player/step) -- identical compiled and
            # interpreted, no dependence on the per-core hardware PRNG.
            sub = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
            lane = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            gl = (
                jnp.uint32(pl.program_id(0)) * jnp.uint32(shape[0] * shape[1])
                + sub * jnp.uint32(shape[1])
                + lane
            )
            seed_base = seed_ref[0, 0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9)

        def _hash_actions(i, k):
            x = (
                seed_base + gl
                + jnp.uint32(i) * jnp.uint32(0x85EBCA6B)
                + jnp.uint32(k) * jnp.uint32(0x27D4EB2F)
            )
            x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
            x = (x ^ (x >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
            x = x ^ (x >> jnp.uint32(16))
            # range-map without integer division: floor(x24 * 6 / 2^24)
            # (bias 6/2^24 ~ 4e-7 vs exact uniform -- negligible for a
            # random rollout policy, and VPU int division is slow)
            return (((x >> jnp.uint32(8)) * jnp.uint32(6))
                    >> jnp.uint32(24)).astype(jnp.int32)

        def body(k, carry):
            (rows, pword, hword, t, ever, ret) = carry
            rows = list(rows)
            px, py, orient, held, hslots, htick = unpack_players(
                list(pword), list(hword)
            )
            if use_rng:
                actions = [_hash_actions(i, k) for i in range(P)]
            else:
                act = actions_ref[k]  # (P, bs, L)
                actions = [act[i] for i in range(P)]
            rows, px, py, orient, held, hslots, htick, sparse = step(
                rows, px, py, orient, held, hslots, htick, t, actions
            )
            for s in sparse:
                ret = ret + s
            t = t + 1
            done = t >= horizon
            ever = ever | done.astype(jnp.int32)
            # NOTE: unconditional reset selects beat a lax.cond skip here
            # (measured round 1) -- Mosaic pays more for the per-step branch
            # than for the predicated selects
            rows = [
                jnp.where(done, meta.reset_word[k], rows[k]) for k in range(K)
            ]
            pword, hword = pack_players(px, py, orient, held, hslots, htick)
            pword = [
                jnp.where(done, meta.start_pword[i], pword[i])
                for i in range(P)
            ]
            hword = [
                jnp.where(done, meta.start_hword[i], hword[i])
                for i in range(P)
            ]
            t = jnp.where(done, 0, t)
            return (
                tuple(rows), tuple(pword), tuple(hword), t, ever, ret,
            )

        init = (tuple(rows), tuple(pword), tuple(hword), t0, ever0, ret0)
        (rows, pword, hword, t, ever, ret) = jax.lax.fori_loop(
            0, num_steps, body, init
        )
        px, py, orient, held, hslots, htick = unpack_players(pword, hword)

        ever = ever != 0

        # ---- unpack to the State layout; inert rows pass through with an
        # ever-reset fix-up so auto-reset stays bit-exact
        obj_rows = [None] * HW
        s_rows = [[None] * HW for _ in range(_SLOTS)]
        stick_rows = [None] * HW
        seq_rows = [None] * HW
        for k, l in enumerate(meta.lins):
            w = rows[k]
            obj_rows[l] = w & 7
            s_rows[0][l] = (w >> 3) & 3
            s_rows[1][l] = (w >> 5) & 3
            s_rows[2][l] = (w >> 7) & 3
            stick_rows[l] = ((w >> 9) & 255) - 1
            seq_rows[l] = ((w >> 17) & _SEQ_MAX) - HW
        for (l, r_obj, r_sing, r_stick, r_seq) in meta.inert:
            obj_rows[l] = jnp.where(ever, r_obj, obj_a[l])
            for s in range(_SLOTS):
                s_rows[s][l] = jnp.where(ever, r_sing[s], sing_a[s, l])
            stick_rows[l] = jnp.where(ever, r_stick, stick_a[l])
            seq_rows[l] = jnp.where(ever, r_seq, seq_a[l])

        out_vals = (
            jnp.stack(px), jnp.stack(py), jnp.stack(orient), jnp.stack(held),
            jnp.stack([jnp.stack([hslots[i][s] for i in range(P)])
                       for s in range(_SLOTS)]),
            jnp.stack(htick),
            jnp.stack(obj_rows),
            jnp.stack([jnp.stack(s_rows[s]) for s in range(_SLOTS)]),
            jnp.stack(stick_rows),
            jnp.stack(seq_rows),
            t,
        )
        for r, v in zip(state_out, out_vals):
            r[:] = v
        ret_ref[:] = ret

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("spec", "num_steps", "horizon", "block_b", "interpret"),
)
def _fused_rollout(
    spec,
    state_arrs,
    seed,
    actions,
    num_steps: int,
    horizon: int,
    block_b: int,
    interpret: bool,
):
    B = state_arrs[-1].shape[-2] * state_arrs[-1].shape[-1]
    if B % block_b:
        raise ValueError(f"batch {B} not divisible by block_b {block_b}")
    lanes = state_arrs[-1].shape[-1]
    blk_bs = block_b // lanes
    grid = (B // block_b,)
    P = spec.num_players
    use_rng = actions is None
    if use_rng:
        actions = jnp.zeros((1, P, B // lanes, lanes), jnp.int32)
        act_block_t = 1
    else:
        act_block_t = actions.shape[0]
    meta = _Meta(spec)
    state_specs = _state_specs(spec, blk_bs, lanes)
    kernel = _build_kernel(spec, meta, num_steps, horizon, use_rng)
    out_shapes = [
        jax.ShapeDtypeStruct(a.shape, jnp.int32) for a in state_arrs
    ] + [jax.ShapeDtypeStruct(state_arrs[-1].shape, jnp.int32)]
    out_specs = state_specs + [state_specs[-1]]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,1)
        pl.BlockSpec(
            (act_block_t, P, blk_bs, lanes),
            lambda i: (0, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
    ] + state_specs
    HW = spec.height * spec.width
    # rough VPU cost: ~5 ops per carried cell per player + ~160 dense ops
    flops_per_step = (5 * len(meta.lins) * P + 160) * B
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        # state inputs are donated to the matching outputs: halves the VMEM
        # footprint and skips the copy back to fresh HBM buffers
        input_output_aliases={2 + i: i for i in range(11)},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step * num_steps,
            bytes_accessed=B * (HW * 6 + 8 * P) * 4 * 2,
            transcendentals=0,
        ),
    )(
        seed.reshape(1, 1).astype(jnp.int32),
        actions,
        *state_arrs,
    )
    return tuple(outs[:11]), outs[11]


def _lanes_for(block_b: int) -> int:
    return 128 if block_b % 128 == 0 else block_b


def _check_batch(B: int, block_b: int, lanes: int) -> None:
    """Fail early with a clear message instead of an opaque reshape error."""
    if B % lanes or B % block_b:
        raise ValueError(
            f"fused rollout needs the env batch ({B}) divisible by both the "
            f"lane fold ({lanes}) and block_b ({block_b}); pick B a multiple "
            f"of {max(lanes, block_b)} or pass a smaller block_b"
        )


def fused_rollout_random(
    spec,
    state: State,
    seed,
    num_steps: int,
    horizon: int = 400,
    block_b: int = 1024,
    interpret: bool = False,
):
    """Run `num_steps` env steps under a uniform-random policy, fully fused.

    Returns (final_state, per_env_return[int32 (B,)]). The action stream is
    an in-kernel counter-based PRNG (seeded per global lane), not
    jax.random -- the policy distribution is identical, the draws differ.
    """
    lanes = _lanes_for(block_b)
    B = state.t.shape[-1]
    _check_batch(B, block_b, lanes)
    arrs = _state_to_tiles(state, B // lanes, lanes)
    out_arrs, ret = _fused_rollout(
        spec, arrs, jnp.asarray(seed), None, num_steps, horizon, block_b, interpret
    )
    return _tiles_to_state(out_arrs, spec.height, spec.width), ret.reshape(B)


def fused_rollout_actions(
    spec,
    state: State,
    actions,
    horizon: int = 400,
    block_b: int = 1024,
    interpret: bool = False,
):
    """Replay an explicit (T, P, B) int32 action sequence, fully fused.

    Bit-exact with scanning `core.env.env_step` over the same actions; used
    by the parity tests and any deterministic replay.
    """
    lanes = _lanes_for(block_b)
    B = state.t.shape[-1]
    _check_batch(B, block_b, lanes)
    arrs = _state_to_tiles(state, B // lanes, lanes)
    actions = jnp.asarray(actions, jnp.int32).reshape(
        actions.shape[0], spec.num_players, B // lanes, lanes
    )
    num_steps = actions.shape[0]
    out_arrs, ret = _fused_rollout(
        spec,
        arrs,
        jnp.zeros((), jnp.int32),
        actions,
        num_steps,
        horizon,
        block_b,
        interpret,
    )
    return _tiles_to_state(out_arrs, spec.height, spec.width), ret.reshape(B)
