"""Fused multi-step rollout as a single pallas TPU kernel.

The XLA path (`core/env.rollout_random`) lowers each env step to dozens of
fused VPU kernels whose intermediates round-trip HBM between fusion
boundaries; at 16k envs that caps throughput near 90M env-steps/s. This
kernel instead runs the ENTIRE horizon loop inside one pallas program per
batch tile: the (HW, B)-shaped state lives in VMEM/vector registers for all
T steps, HBM is touched exactly twice (load initial state, store final
state), and actions come from the in-kernel PRNG. Scalar layout data
(recipe value/time tables, `old_dynamics`) folds in at trace time; the
array-shaped layout data (terrain grid, reset state) is passed as small
broadcast VMEM operands (pallas kernels may not capture array constants).

Semantics are the same exact transition as `core/step.py` (reference
overcooked_mdp.py:1375-1709) minus the outputs this path never consumes:
the 25-channel event tensor and shaped rewards (XLA dead-code-eliminates
them in the random-rollout program too, so the comparison is fair). Parity
with `core.step.step` is tested bit-for-bit via the explicit-actions entry
point (`fused_rollout_actions`) in tests/test_fused_rollout.py.

Batch layout matches the rest of the framework: env batch on the minor
(lane) axis of every array.
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


def _make_step(spec):
    """Build the batch-explicit single-step transition for one layout.

    Scalar layout data is baked in as trace-time constants; the terrain
    grid arrives as `terr_col` (HW, 1) read from a kernel operand.

    The per-cell state (object code, 3 ingredient slots, cook tick,
    insertion stamp) is BIT-PACKED into one int32 word per cell:

        bits 0-2   object code (0..4)
        bits 3-8   ingredient slots, 2 bits each (0 empty / 1 onion /
                   2 tomato -- the OBJ_* codes fit directly)
        bits 9-16  cook tick + 1 (0 = idle/-1; cook times <= 127)
        bits 17-27 insertion stamp + HW, clamped to 2047 (stamps >= -HW;
                   exact for 2-player/horizon-400; see core/state.py)
        bits 28-30 terrain code (0..6, static)

    so each player's interact resolves with ONE masked grid read and ONE
    masked grid write instead of six separate reads plus a terrain read --
    the dominant VPU cost of the unpacked kernel (the round-1 NOTES
    bit-packing idea).

    Arrays carried per tile (batch axis = minor, size Bt):
      px, py, orient, held: (P, Bt) i32    hsoup: (P, 3, Bt)   htick: (P, Bt)
      grid: (HW, Bt) i32 packed cell words
    """
    lay = spec.layout
    H, W = spec.height, spec.width
    HW = H * W
    P = spec.num_players
    old_dynamics = bool(lay.old_dynamics)
    time_t = np.asarray(lay.time_table)
    deliv_t = np.asarray(lay.delivery_value)

    _TICK_MASK = 255 << 9
    _SEQ_MAX = 2047

    def step(terr_col, px, py, orient, held, hsoup, htick, grid, tvec, actions):
        """actions: (P, Bt) i32; tvec: (1, Bt) current timestep.
        Returns updated arrays + sparse (P, Bt)."""
        Bt = px.shape[-1]
        iota_hw = jax.lax.broadcasted_iota(jnp.int32, (HW, Bt), 0)

        # Per-player rows as Python lists: static-index slices + a final
        # stack lower to slice/concat (TPU pallas has no scatter).
        sparse_rows = [jnp.zeros((Bt,), jnp.int32) for _ in range(P)]
        held_rows = [held[p] for p in range(P)]
        hsoup_rows = [hsoup[p] for p in range(P)]
        htick_rows = [htick[p] for p in range(P)]

        # ---- 1. resolve_interacts: sequential per player (reference :1432)
        for i in range(P):
            act_i = actions[i]
            inter = act_i == ACTION_INTERACT
            o = orient[i]
            dx = jnp.where(o == 2, 1, 0) - jnp.where(o == 3, 1, 0)
            dy = jnp.where(o == 1, 1, 0) - jnp.where(o == 0, 1, 0)
            lin = (py[i] + dy) * W + (px[i] + dx)  # (Bt,)
            mask = iota_hw == lin[None, :]  # (HW, Bt)

            w = jnp.sum(jnp.where(mask, grid, 0), axis=0)  # packed cell word
            tt = (w >> 28) & 7  # terrain rides in the word: one read total
            cell_obj = w & 7
            s0 = (w >> 3) & 3
            s1 = (w >> 5) & 3
            s2 = (w >> 7) & 3
            cell_tick = ((w >> 9) & 255) - 1
            i32 = jnp.int32
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

            hs = hsoup[i]  # (3, Bt) slot codes
            h_no = jnp.sum((hs == OBJ_ONION).astype(i32), 0)
            h_nt = jnp.sum((hs == OBJ_TOMATO).astype(i32), 0)
            sparse_rows[i] = sparse_rows[i] + jnp.where(
                deliver, _table_select(deliv_t, h_no, h_nt), 0
            )

            # --- held mutations ---
            new_held_i = jnp.where(
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
            cell_slots = jnp.stack([s0, s1, s2])  # codes == slot values
            new_hsoup_i = jnp.where(
                gained[None], cell_slots, jnp.where(lost[None], 0, hs)
            )
            new_htick_i = jnp.where(gained, cell_tick, jnp.where(lost, -1, htick[i]))

            # --- packed cell mutation (one masked write) ---
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
            hs_bits = (hs[0] << 3) | (hs[1] << 5) | (hs[2] << 7)
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
                htick[i] + 1,
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
            stamp = jnp.minimum(tvec[0] * P + (i + 1) + HW, _SEQ_MAX)
            seq_f = jnp.where(
                placed, stamp, jnp.where(removed, HW, (w >> 17) & _SEQ_MAX)
            )
            new_w = (
                obj_f | slots_f | (tickp1_f << 9) | (seq_f << 17) | (tt << 28)
            )

            changed = counter_drop | counter_pickup | soup_pickup | pot_ok | start_cook
            held_rows[i] = new_held_i
            hsoup_rows[i] = new_hsoup_i
            htick_rows[i] = new_htick_i
            grid = jnp.where(mask & changed[None, :], new_w[None, :], grid)

        sparse = jnp.stack(sparse_rows)
        held = jnp.stack(held_rows)
        hsoup = jnp.stack(hsoup_rows)
        htick = jnp.stack(htick_rows)

        # ---- 2. resolve_movement (reference :1644-1709)
        is_dir = actions < 4
        mdx = jnp.where(actions == 2, 1, 0) - jnp.where(actions == 3, 1, 0)
        mdy = jnp.where(actions == 1, 1, 0) - jnp.where(actions == 0, 1, 0)
        new_orient = jnp.where(is_dir, actions, orient)
        cx, cy = px + mdx, py + mdy  # (P, Bt)
        empty_col = terr_col == TERRAIN_EMPTY  # (HW, 1)
        nx, ny = px, py
        cand_oks = []
        for i in range(P):
            clin = cy[i] * W + cx[i]
            cmask = iota_hw == clin[None, :]
            # int32 reduce: Mosaic can't truncate an i8 bool-sum back to i1
            cand_oks.append(
                jnp.sum((cmask & empty_col).astype(jnp.int32), axis=0) > 0
            )
        moved = [is_dir[i] & cand_oks[i] for i in range(P)]
        nx = jnp.stack([jnp.where(moved[i], cx[i], px[i]) for i in range(P)])
        ny = jnp.stack([jnp.where(moved[i], cy[i], py[i]) for i in range(P)])
        collision = jnp.zeros((px.shape[-1],), jnp.bool_)
        for i in range(P):
            for j in range(i + 1, P):
                same = (nx[i] == nx[j]) & (ny[i] == ny[j])
                swap = (
                    (nx[i] == px[j]) & (ny[i] == py[j])
                    & (px[i] == nx[j]) & (py[i] == ny[j])
                )
                collision = collision | same | swap
        fx = jnp.where(collision[None], px, nx)
        fy = jnp.where(collision[None], py, ny)

        # ---- 3. step_environment_effects (reference :1691-1703)
        i32 = jnp.int32
        s0 = (grid >> 3) & 3
        s1 = (grid >> 5) & 3
        s2 = (grid >> 7) & 3
        g_no = (
            (s0 == 1).astype(i32) + (s1 == 1).astype(i32)
            + (s2 == 1).astype(i32)
        )
        g_nt = (
            (s0 == 2).astype(i32) + (s1 == 2).astype(i32)
            + (s2 == 2).astype(i32)
        )
        is_soup = (grid & 7) == OBJ_SOUP
        tickp1 = (grid >> 9) & 255
        if old_dynamics:
            auto = is_soup & (tickp1 == 0) & ((g_no + g_nt) == 3)
            tickp1 = jnp.where(auto, 1, tickp1)
        cook_t = _table_select(time_t, g_no, g_nt)
        cooking = is_soup & (tickp1 > 0) & (tickp1 - 1 < cook_t)
        new_tickp1 = tickp1 + cooking.astype(i32)
        grid = (grid & ~_TICK_MASK) | (new_tickp1 << 9)

        return fx, fy, new_orient, held, hsoup, htick, grid, sparse

    return step


def _pack_grid(obj, sing, stick, seq, terr, hw_offset):
    """(HW, B) obj/stick/seq + (3, HW, B) sing + (HW, 1) terrain ->
    packed (HW, B) words."""
    return (
        obj
        | (sing[0] << 3)
        | (sing[1] << 5)
        | (sing[2] << 7)
        | ((stick + 1) << 9)
        | (jnp.minimum(seq + hw_offset, 2047) << 17)
        | (terr << 28)
    )


def _unpack_grid(grid, hw_offset):
    """packed words -> (obj, sing (3, HW, B), stick, seq)."""
    obj = grid & 7
    sing = jnp.stack([(grid >> 3) & 3, (grid >> 5) & 3, (grid >> 7) & 3])
    stick = ((grid >> 9) & 255) - 1
    seq = ((grid >> 17) & 2047) - hw_offset
    return obj, sing, stick, seq


def _reset_operands(spec):
    """Layout start state as 10 column-vector numpy arrays (kernel operands).

    Shapes broadcast directly against the (lead..., Bt) carried state, so the
    done-predicated reset is a single jnp.where per field.
    """
    start = spec.layout.start_state
    HW = spec.height * spec.width
    return (
        np.asarray(start.pos[:, 0], np.int32)[:, None],  # px0 (P, 1)
        np.asarray(start.pos[:, 1], np.int32)[:, None],
        np.asarray(start.orient, np.int32)[:, None],
        np.asarray(start.held, np.int32)[:, None],
        np.asarray(start.held_soup, np.int32)[:, :, None],  # (P, 3, 1)
        np.asarray(start.held_soup_tick, np.int32)[:, None],
        np.asarray(start.obj, np.int32).reshape(HW)[:, None],  # (HW, 1)
        np.asarray(start.soup_ing, np.int32).reshape(HW, _SLOTS).T[:, :, None].copy(),
        np.asarray(start.soup_tick, np.int32).reshape(HW)[:, None],
        np.asarray(start.obj_seq, np.int32).reshape(HW)[:, None],
    )


def _apply_reset(reset_vals, done, state_arrs):
    """done-predicated reset. reset_vals: 9 (lead..., 1) arrays; done: (Bt,)."""
    d1 = done[None]  # (1, Bt)
    out = []
    for r0, v in zip(reset_vals, state_arrs):
        d = d1[None] if v.ndim == 3 else d1
        out.append(jnp.where(d, r0, v))
    return tuple(out)


def _state_to_tiles(state: State):
    """State pytree (batch-minor) -> flat kernel array tuple."""
    H, W, _, B = state.soup_ing.shape
    return (
        state.pos[:, 0, :].astype(jnp.int32),  # px (P, B)
        state.pos[:, 1, :].astype(jnp.int32),  # py
        state.orient.astype(jnp.int32),
        state.held.astype(jnp.int32),
        state.held_soup.astype(jnp.int32),  # (P, 3, B)
        state.held_soup_tick.astype(jnp.int32),
        state.obj.reshape(H * W, B).astype(jnp.int32),
        jnp.moveaxis(state.soup_ing.reshape(H * W, _SLOTS, B), 1, 0).astype(jnp.int32),
        state.soup_tick.reshape(H * W, B).astype(jnp.int32),
        state.obj_seq.reshape(H * W, B).astype(jnp.int32),
        state.t.reshape(1, B).astype(jnp.int32),
    )


def _tiles_to_state(arrs, H, W) -> State:
    px, py, orient, held, hsoup, htick, obj, sing, stick, seq, t = arrs
    B = px.shape[-1]
    return State(
        pos=jnp.stack([px, py], axis=1),
        orient=orient,
        held=held,
        held_soup=hsoup,
        held_soup_tick=htick,
        obj=obj.reshape(H, W, B),
        soup_ing=jnp.moveaxis(sing, 0, 1).reshape(H, W, _SLOTS, B),
        soup_tick=stick.reshape(H, W, B),
        obj_seq=seq.reshape(H, W, B),
        t=t.reshape(B),
    )


def _state_specs(spec, block_b):
    """BlockSpecs for the 10 state arrays, tiling only the minor batch axis."""
    H, W, P = spec.height, spec.width, spec.num_players
    HW = H * W

    def bs(*lead):
        ndim = len(lead)
        return pl.BlockSpec(
            lead + (block_b,),
            (lambda *gi: (0,) * ndim + (gi[0],)),
            memory_space=pltpu.VMEM,
        )

    return [
        bs(P), bs(P), bs(P), bs(P),  # px, py, orient, held
        bs(P, _SLOTS),  # hsoup
        bs(P),  # htick
        bs(HW),  # obj
        bs(_SLOTS, HW),  # sing
        bs(HW),  # stick
        bs(HW),  # obj_seq
        bs(1),  # t
    ]


def _build_kernel(spec, num_steps: int, horizon: int, use_rng: bool):
    step = _make_step(spec)
    P = spec.num_players

    def kernel(seed_ref, actions_ref, terr_ref, *refs):
        raw_reset = tuple(r[:] for r in refs[:10])
        state_in = refs[10:21]
        state_out = refs[21:32]
        ret_ref = refs[32]
        terr_col = terr_ref[:]  # (HW, 1)
        HW = terr_col.shape[0]

        raw = tuple(r[:] for r in state_in)
        # pack obj/sing/stick/seq into one word grid for the loop; I/O stays
        # in the State layout
        grid0 = _pack_grid(raw[6], raw[7], raw[8], raw[9], terr_col, HW)
        carry = raw[:6] + (grid0, raw[10])
        reset_vals = raw_reset[:6] + (
            _pack_grid(raw_reset[6], raw_reset[7], raw_reset[8],
                       raw_reset[9], terr_col, HW),
        )
        Bt = carry[0].shape[-1]
        ret0 = jnp.zeros((1, Bt), jnp.int32)
        if use_rng:
            # Stateless counter-based stream (murmur3 finalizer over
            # seed/tile/lane/player/step) -- identical compiled and
            # interpreted, no dependence on the per-core hardware PRNG.
            lane = jax.lax.broadcasted_iota(jnp.uint32, (P, Bt), 1)
            player = jax.lax.broadcasted_iota(jnp.uint32, (P, Bt), 0)
            base = (
                seed_ref[0, 0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                + jnp.uint32(pl.program_id(0)) * jnp.uint32(Bt)
                + lane
                + player * jnp.uint32(0x85EBCA6B)
            )

        def _hash_actions(k):
            x = base + jnp.uint32(k) * jnp.uint32(0x27D4EB2F)
            x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
            x = (x ^ (x >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
            x = x ^ (x >> jnp.uint32(16))
            return (x >> jnp.uint32(8)).astype(jnp.int32) % 6

        def body(k, loop_carry):
            (px, py, orient, held, hsoup, htick, grid, t), ret = loop_carry
            if use_rng:
                actions = _hash_actions(k)
            else:
                actions = actions_ref[k]  # (P, Bt)
            px, py, orient, held, hsoup, htick, grid, sparse = step(
                terr_col, px, py, orient, held, hsoup, htick, grid, t, actions
            )
            ret = ret + jnp.sum(sparse, axis=0, keepdims=True)
            t = t + 1
            done = (t >= horizon)[0]  # (Bt,)
            # NOTE: unconditional reset selects beat a lax.cond skip here
            # (measured 150M vs 143M steps/s) -- Mosaic pays more for the
            # per-step branch than for the predicated selects
            carry_next = _apply_reset(
                reset_vals,
                done,
                (px, py, orient, held, hsoup, htick, grid),
            )
            t = jnp.where(done[None], 0, t)
            return carry_next + (t,), ret

        carry, ret = jax.lax.fori_loop(0, num_steps, body, (carry, ret0))
        obj_o, sing_o, stick_o, seq_o = _unpack_grid(carry[6], HW)
        out_vals = carry[:6] + (obj_o, sing_o, stick_o, seq_o, carry[7])
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
    B = state_arrs[0].shape[-1]
    if B % block_b:
        raise ValueError(f"batch {B} not divisible by block_b {block_b}")
    grid = (B // block_b,)
    use_rng = actions is None
    if use_rng:
        actions = jnp.zeros((1, spec.num_players, B), jnp.int32)
        act_block_t = 1
    else:
        act_block_t = actions.shape[0]
    state_specs = _state_specs(spec, block_b)
    kernel = _build_kernel(spec, num_steps, horizon, use_rng)
    HW = spec.height * spec.width
    P = spec.num_players
    out_shapes = [
        jax.ShapeDtypeStruct(a.shape, jnp.int32) for a in state_arrs
    ] + [jax.ShapeDtypeStruct((1, B), jnp.int32)]
    out_specs = state_specs + [
        pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    ]
    terrain = np.asarray(spec.layout.terrain, np.int32).reshape(HW)[:, None]
    reset_ops = _reset_operands(spec)

    def bcast(a):  # whole (tiny) array replicated to every batch tile
        return pl.BlockSpec(
            a.shape, (lambda *gi: (0,) * a.ndim), memory_space=pltpu.VMEM
        )

    in_specs = (
        [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,1)
            pl.BlockSpec(
                (act_block_t, P, block_b),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            bcast(terrain),
        ]
        + [bcast(r) for r in reset_ops]
        + state_specs
    )
    flops_per_step = 60 * HW * B  # rough: ~60 HW-sized VPU ops per step
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step * num_steps, bytes_accessed=B * 200, transcendentals=0
        ),
    )(
        seed.reshape(1, 1).astype(jnp.int32),
        actions,
        jnp.asarray(terrain),
        *[jnp.asarray(r) for r in reset_ops],
        *state_arrs,
    )
    return tuple(outs[:11]), outs[11].reshape(B)


def fused_rollout_random(
    spec,
    state: State,
    seed,
    num_steps: int,
    horizon: int = 400,
    block_b: int = 2048,
    interpret: bool = False,
):
    """Run `num_steps` env steps under a uniform-random policy, fully fused.

    Returns (final_state, per_env_return[int32 (B,)]). The action stream is
    the in-kernel TPU PRNG (seeded per batch tile), not jax.random -- the
    policy distribution is identical, the draws differ.
    """
    arrs = _state_to_tiles(state)
    out_arrs, ret = _fused_rollout(
        spec, arrs, jnp.asarray(seed), None, num_steps, horizon, block_b, interpret
    )
    return _tiles_to_state(out_arrs, spec.height, spec.width), ret


def fused_rollout_actions(
    spec,
    state: State,
    actions,
    horizon: int = 400,
    block_b: int = 2048,
    interpret: bool = False,
):
    """Replay an explicit (T, P, B) int32 action sequence, fully fused.

    Bit-exact with scanning `core.env.env_step` over the same actions; used
    by the parity tests and any deterministic replay.
    """
    arrs = _state_to_tiles(state)
    actions = jnp.asarray(actions, jnp.int32)
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
    return _tiles_to_state(out_arrs, spec.height, spec.width), ret
