"""Fused PPO-training env step: transition + events + shaped rewards +
26-layer lossless encoding in ONE pallas TPU kernel.

The training hot loop (reference OvercookedMultiAgent.step,
rllib/rllib.py:293-342: env transition -> event/shaped-reward logging ->
lossless_state_encoding for the policy net) alternates the env with a
policy network, so unlike ops/fused_rollout.py the horizon cannot live
inside one pallas program — the fusible unit is a single step. This
kernel runs that unit: given the batch state and the joint actions it
produces, in one launch,

  * the exact next state (auto-reset at the horizon),
  * per-player sparse + shaped rewards (reference resolve_interacts
    rewards, overcooked_mdp.py:1581-1643 + BASE_REW_SHAPING_PARAMS),
  * the 25 event flags bit-packed into one int32 per player (EVENT_TYPES
    order, reference :1027-1058 incl. the usefulness classifiers
    :2180-2308),
  * the post-step 26-layer lossless encoding for BOTH players as int8
    (reference lossless_state_encoding :2385-2561), ready for the conv
    net after a layout transpose.

Versus the XLA scan path (step + encode as ~dozens of fused kernels whose
intermediates round-trip HBM), everything here happens on VMEM-resident
vregs; HBM sees only the packed int32 state (twice) and the int8 obs
(once). Bit-exactness vs core/step.py + core/encoding.py is tested in
tests/test_fused_train.py (interpret mode) and, on real TPU, by the
opt-in OVERCOOKED_TPU_TESTS suite.

Encoding channel order (reference LAYERS, overcooked_mdp.py:2420-2442):
0 self loc, 1 other loc, 2-5 self orientation, 6-9 other orientation,
10-15 static terrain (pot/counter/onion/tomato/dish/serve), 16-17
onions/tomatoes in idle pot soups, 18-19 onions/tomatoes in active/other
soups, 20 cook time remaining, 21 soup done, 22 dishes, 23 onions,
24 tomatoes, 25 urgency.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from overcooked_ai_tpu.core.constants import (
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
from overcooked_ai_tpu.ops.fused_rollout import (
    _SEQ_MAX,
    _SLOTS,
    _check_batch,
    _lanes_for,
    _make_step,
    _Meta,
    _state_specs,
    _state_to_tiles,
    _table_select,
    _tiles_to_state,
)

NUM_LAYERS = 26
URGENCY_WINDOW = 40  # reference overcooked_mdp.py:2446


def _host_cook_time(time_t, n_o, n_t):
    return int(np.asarray(time_t)[n_o, n_t])


def _build_train_kernel(spec, meta: _Meta, horizon: int, obs_dtype,
                        reset_horizon: int):
    step = _make_step(spec, meta, emit_train=True)
    lay = spec.layout
    H, W, P = spec.height, spec.width, spec.num_players
    HW = H * W
    K = len(meta.lins)
    terr = np.asarray(lay.terrain, np.int64).reshape(HW)
    time_t = np.asarray(lay.time_table)
    empty_lins = [l for l in range(HW) if terr[l] == TERRAIN_EMPTY]
    inert_by_lin = {l: rest for (l, *rest) in
                    [(i[0], i[1], i[2], i[3], i[4]) for i in meta.inert]}
    i32 = jnp.int32

    def kernel(actions_ref, *refs):
        state_in = refs[0:11]
        state_out = refs[11:22]
        obs_ref, sparse_ref, shaped_ref, ev_ref = refs[22:26]
        raw = tuple(r[:] for r in state_in)
        (px_a, py_a, or_a, held_a, hs_a, ht_a,
         obj_a, sing_a, stick_a, seq_a, t0) = raw

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
        px = [px_a[i] for i in range(P)]
        py = [py_a[i] for i in range(P)]
        orient = [or_a[i] for i in range(P)]
        held = [held_a[i] for i in range(P)]
        hslots = [[hs_a[s, i] for s in range(_SLOTS)] for i in range(P)]
        htick = [ht_a[i] for i in range(P)]
        actions = [actions_ref[i] for i in range(P)]

        (rows, px, py, orient, held, hslots, htick,
         sparse, shaped, evmask) = step(
            rows, px, py, orient, held, hslots, htick, t0, actions
        )

        # horizon termination + auto-reset (core/env.env_step semantics).
        # reset_horizon > horizon disables the reset within a fixed-length
        # rollout (PPO collects exactly `horizon` steps from a fresh reset,
        # and needs the true pre-reset terminal state for phi); urgency
        # below always uses `horizon`.
        t1 = t0 + 1
        done = t1 >= reset_horizon
        rows = [
            jnp.where(done, meta.reset_word[k], rows[k]) for k in range(K)
        ]
        for i in range(P):
            pw = meta.start_pword[i]
            px[i] = jnp.where(done, pw & 31, px[i])
            py[i] = jnp.where(done, (pw >> 5) & 31, py[i])
            orient[i] = jnp.where(done, (pw >> 10) & 3, orient[i])
            held[i] = jnp.where(done, (pw >> 12) & 7, held[i])
            hw = meta.start_hword[i]
            hslots[i] = [
                jnp.where(done, (hw >> (2 * s)) & 3, hslots[i][s])
                for s in range(_SLOTS)
            ]
            htick[i] = jnp.where(done, ((hw >> 6) & 255) - 1, htick[i])
        t1 = jnp.where(done, 0, t1)

        # ---- write next state; inert rows pass through w/ reset fix-up
        # (single stacked store per output, the horizon-kernel pattern --
        # per-index stores blow up both interpret mode and Mosaic)
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
            obj_rows[l] = jnp.where(done, r_obj, obj_a[l])
            for s in range(_SLOTS):
                s_rows[s][l] = jnp.where(done, r_sing[s], sing_a[s, l])
            stick_rows[l] = jnp.where(done, r_stick, stick_a[l])
            seq_rows[l] = jnp.where(done, r_seq, seq_a[l])
        state_out[6][:] = jnp.stack(obj_rows)
        state_out[7][:] = jnp.stack(
            [jnp.stack(s_rows[s]) for s in range(_SLOTS)]
        )
        state_out[8][:] = jnp.stack(stick_rows)
        state_out[9][:] = jnp.stack(seq_rows)
        state_out[0][:] = jnp.stack(px)
        state_out[1][:] = jnp.stack(py)
        state_out[2][:] = jnp.stack(orient)
        state_out[3][:] = jnp.stack(held)
        state_out[4][:] = jnp.stack(
            [jnp.stack([hslots[i][s] for i in range(P)])
             for s in range(_SLOTS)]
        )
        state_out[5][:] = jnp.stack(htick)
        state_out[10][:] = t1

        sparse_ref[:] = jnp.stack(sparse)
        shaped_ref[:] = jnp.stack(shaped)
        ev_ref[:] = jnp.stack(evmask)

        # ================= lossless encoding of the POST-step state ======
        shape = t1.shape
        od = obs_dtype
        obs_cell = [
            [[None] * HW for _ in range(NUM_LAYERS)] for _ in range(P)
        ]
        const_cache = {}

        def store(p, c, l, val):
            obs_cell[p][c][l] = val.astype(od)

        def store_const(p, c, l, v):
            if v not in const_cache:
                const_cache[v] = jnp.full(shape, v, od)
            obs_cell[p][c][l] = const_cache[v]

        # per-player precomputes
        d_eq = [[orient[p] == d for d in range(4)] for p in range(P)]
        held_soup_p = [held[p] == OBJ_SOUP for p in range(P)]
        held_dish_p = [held[p] == OBJ_DISH for p in range(P)]
        held_onion_p = [held[p] == OBJ_ONION for p in range(P)]
        held_tomato_p = [held[p] == OBJ_TOMATO for p in range(P)]
        hs_no = [
            (hslots[p][0] == 1).astype(i32)
            + (hslots[p][1] == 1).astype(i32)
            + (hslots[p][2] == 1).astype(i32)
            for p in range(P)
        ]
        hs_nt = [
            (hslots[p][0] == 2).astype(i32)
            + (hslots[p][1] == 2).astype(i32)
            + (hslots[p][2] == 2).astype(i32)
            for p in range(P)
        ]
        urg = (t1 > horizon - URGENCY_WINDOW).astype(i32)

        def content_from_word(w, tt):
            """Channels 16-24 for a non-empty cell's packed word."""
            obj = w & 7
            s0 = (w >> 3) & 3
            s1 = (w >> 5) & 3
            s2 = (w >> 7) & 3
            n_o = (
                (s0 == 1).astype(i32) + (s1 == 1).astype(i32)
                + (s2 == 1).astype(i32)
            )
            n_t = (
                (s0 == 2).astype(i32) + (s1 == 2).astype(i32)
                + (s2 == 2).astype(i32)
            )
            tickp1 = (w >> 9) & 255
            is_soup = obj == OBJ_SOUP
            zero = jnp.zeros_like(w)
            out = {}
            if tt == TERRAIN_POT:
                idle = tickp1 == 0
                active = is_soup & ~idle
                cook_t = _table_select(time_t, n_o, n_t)
                out[16] = jnp.where(is_soup & idle, n_o, 0)
                out[17] = jnp.where(is_soup & idle, n_t, 0)
                out[18] = jnp.where(active, n_o, 0)
                out[19] = jnp.where(active, n_t, 0)
                out[20] = jnp.where(active, cook_t - (tickp1 - 1), 0)
                out[21] = (active & (tickp1 - 1 >= cook_t)).astype(i32)
            else:
                # soups off pots are done with 0 time left (ref :2515-2525)
                out[16] = zero
                out[17] = zero
                out[18] = jnp.where(is_soup, n_o, 0)
                out[19] = jnp.where(is_soup, n_t, 0)
                out[20] = zero
                out[21] = is_soup.astype(i32)
            out[22] = (obj == OBJ_DISH).astype(i32)
            out[23] = (obj == OBJ_ONION).astype(i32)
            out[24] = (obj == OBJ_TOMATO).astype(i32)
            return out

        # static terrain channels 10-15 (constants per cell)
        tt_chan = {
            10: TERRAIN_POT,
            11: TERRAIN_COUNTER,
            12: TERRAIN_ONION_DISP,
            13: TERRAIN_TOMATO_DISP,
            14: TERRAIN_DISH_DISP,
            15: TERRAIN_SERVE,
        }

        k_of_lin = meta.k_of_lin
        for l in range(HW):
            tt = int(terr[l])
            is_empty = tt == TERRAIN_EMPTY
            # player location/orientation channels (players stand only on
            # floor cells)
            if is_empty:
                y, x = divmod(l, W)
                loc = [(px[p] == x) & (py[p] == y) for p in range(P)]
            else:
                loc = None
            for p in range(P):
                q = 1 - p  # encoding is 2-player only (reference :2389)
                if is_empty:
                    store(p, 0, l, loc[p].astype(i32))
                    store(p, 1, l, loc[q].astype(i32))
                    for d in range(4):
                        store(p, 2 + d, l, (loc[p] & d_eq[p][d]).astype(i32))
                        store(p, 6 + d, l, (loc[q] & d_eq[q][d]).astype(i32))
                else:
                    for c in range(10):
                        store_const(p, c, l, 0)
                for c, code in tt_chan.items():
                    store_const(p, c, l, int(tt == code))
                store(p, 25, l, urg)

            # content channels 16-24, identical for both players
            if is_empty:
                # held objects contribute at the holder's position
                # (reference all_objects_list includes held, :2413)
                zero = jnp.zeros(shape, i32)
                ch = {c: zero for c in range(16, 25)}
                for p in range(P):
                    lp = loc[p]
                    ch[18] = ch[18] + jnp.where(lp & held_soup_p[p], hs_no[p], 0)
                    ch[19] = ch[19] + jnp.where(lp & held_soup_p[p], hs_nt[p], 0)
                    ch[21] = ch[21] + (lp & held_soup_p[p]).astype(i32)
                    ch[22] = ch[22] + (lp & held_dish_p[p]).astype(i32)
                    ch[23] = ch[23] + (lp & held_onion_p[p]).astype(i32)
                    ch[24] = ch[24] + (lp & held_tomato_p[p]).astype(i32)
            elif l in k_of_lin:
                ch = content_from_word(rows[k_of_lin[l]], tt)
            else:
                # statically inert non-empty cell: contents from the input
                # arrays with the auto-reset fix-up
                r_obj, r_sing, r_stick, _r_seq = inert_by_lin[l]
                w_in = (
                    obj_a[l]
                    | (sing_a[0, l] << 3)
                    | (sing_a[1, l] << 5)
                    | (sing_a[2, l] << 7)
                    | ((stick_a[l] + 1) << 9)
                )
                w_reset = (
                    r_obj
                    | (r_sing[0] << 3)
                    | (r_sing[1] << 5)
                    | (r_sing[2] << 7)
                    | ((r_stick + 1) << 9)
                )
                ch = content_from_word(jnp.where(done, w_reset, w_in), tt)
            for p in range(P):
                for c in range(16, 25):
                    store(p, c, l, ch[c])

        obs_ref[:] = jnp.stack(
            [
                jnp.stack([jnp.stack(obs_cell[p][c]) for c in range(NUM_LAYERS)])
                for p in range(P)
            ]
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec", "horizon", "block_b", "interpret", "obs_dtype",
        "reset_horizon",
    ),
)
def _fused_train_step(
    spec, state_arrs, actions, horizon, block_b, interpret, obs_dtype,
    reset_horizon=None,
):
    B = state_arrs[-1].shape[-2] * state_arrs[-1].shape[-1]
    lanes = state_arrs[-1].shape[-1]
    blk_bs = block_b // lanes
    grid = (B // block_b,)
    P = spec.num_players
    H, W = spec.height, spec.width
    HW = H * W
    meta = _Meta(spec)
    state_specs = _state_specs(spec, blk_bs, lanes)
    kernel = _build_train_kernel(
        spec, meta, horizon, jnp.dtype(obs_dtype),
        horizon if reset_horizon is None else reset_horizon,
    )

    def bspec(*lead):
        ndim = len(lead)
        return pl.BlockSpec(
            lead + (blk_bs, lanes),
            (lambda *gi, _n=ndim: (0,) * _n + (gi[0], 0)),
            memory_space=pltpu.VMEM,
        )

    pb = state_arrs[-1].shape[-2]
    out_shapes = (
        [jax.ShapeDtypeStruct(a.shape, jnp.int32) for a in state_arrs]
        + [
            jax.ShapeDtypeStruct((P, NUM_LAYERS, HW, pb, lanes), obs_dtype),
            jax.ShapeDtypeStruct((P, pb, lanes), jnp.int32),
            jax.ShapeDtypeStruct((P, pb, lanes), jnp.int32),
            jax.ShapeDtypeStruct((P, pb, lanes), jnp.int32),
        ]
    )
    out_specs = state_specs + [
        bspec(P, NUM_LAYERS, HW),
        bspec(P),
        bspec(P),
        bspec(P),
    ]
    in_specs = [bspec(P)] + state_specs
    flops_per_step = (5 * len(meta.lins) * P + 160 + 60 * HW) * B
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases={1 + i: i for i in range(11)},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step,
            bytes_accessed=B * (HW * 6 + 8 * P) * 4 * 2
            + B * P * NUM_LAYERS * HW,
            transcendentals=0,
        ),
    )(actions, *state_arrs)
    return tuple(outs[:11]), outs[11], outs[12], outs[13], outs[14]


def fused_train_step_tiles(
    spec,
    tiles,
    actions,
    horizon: int = 400,
    block_b: int = 1024,
    interpret: bool = False,
    obs_dtype=jnp.int8,
    reset_horizon=None,
):
    """One fused training env step on pre-folded state tiles.

    tiles: the tuple from `state_to_tiles`; actions: (P, bs, L) int32.
    Returns (tiles', obs (P, 26, HW, bs, L) obs_dtype, sparse (P, bs, L),
    shaped (P, bs, L), events (P, bs, L) int32 bitmasks).
    """
    return _fused_train_step(
        spec, tiles, actions, horizon, block_b, interpret, obs_dtype,
        reset_horizon,
    )


def state_to_tiles(spec, state: State, block_b: int = 1024):
    lanes = _lanes_for(block_b)
    B = state.t.shape[-1]
    _check_batch(B, block_b, lanes)
    return _state_to_tiles(state, B // lanes, lanes)


def tiles_to_state(spec, tiles) -> State:
    return _tiles_to_state(tiles, spec.height, spec.width)


def obs_tiles_to_nhwc(spec, obs):
    """Kernel obs (P, 26, HW, bs, L) -> network format (P*B, H, W, 26)."""
    P, C, HW, bs, L = obs.shape
    obs = jnp.transpose(obs, (0, 3, 4, 2, 1))  # (P, bs, L, HW, C)
    return obs.reshape(P * bs * L, spec.height, spec.width, C)


def fused_train_step(
    spec,
    state: State,
    actions,
    horizon: int = 400,
    block_b: int = 1024,
    interpret: bool = False,
    obs_dtype=jnp.int8,
    reset_horizon=None,
):
    """Ergonomic entry on a State pytree (batch-minor) + (P, B) actions.

    Returns (next_state, obs_nhwc (P*B, H, W, 26), sparse (P, B),
    shaped (P, B), events (P, B) int32 bitmasks). The obs is the encoding
    of the POST-step (post-auto-reset) state — what the policy net
    consumes to pick the next action.
    """
    lanes = _lanes_for(block_b)
    B = state.t.shape[-1]
    _check_batch(B, block_b, lanes)
    P = spec.num_players
    tiles = _state_to_tiles(state, B // lanes, lanes)
    act = jnp.asarray(actions, jnp.int32).reshape(P, B // lanes, lanes)
    tiles, obs, sparse, shaped, ev = _fused_train_step(
        spec, tiles, act, horizon, block_b, interpret, jnp.dtype(obs_dtype),
        reset_horizon,
    )
    return (
        _tiles_to_state(tiles, spec.height, spec.width),
        obs_tiles_to_nhwc(spec, obs),
        sparse.reshape(P, B),
        shaped.reshape(P, B),
        ev.reshape(P, B),
    )


def unpack_events(ev, num_events: int = 25):
    """(..., ) int32 bitmasks -> (num_events, ...) bool (EVENT_TYPES order)."""
    bits = jnp.arange(num_events, dtype=jnp.int32)
    shape = (num_events,) + (1,) * ev.ndim
    return ((ev[None] >> bits.reshape(shape)) & 1).astype(bool)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "num_steps", "horizon", "block_b", "interpret"),
)
def train_rollout_random(
    spec,
    state: State,
    key,
    num_steps: int,
    horizon: int = 400,
    block_b: int = 1024,
    interpret: bool = False,
):
    """Benchmark drive of the training hot path: `num_steps` fused env
    steps under a uniform-random policy with events + shaped rewards +
    lossless encoding emitted EVERY step (BASELINE config 3's
    "shaped-reward events + featurization fused in-step").

    Returns (final_state, totals dict). The obs tensor is produced and
    written by the kernel each step; a slice is folded into the checksum
    so the output dependency is real.
    """
    lanes = _lanes_for(block_b)
    B = state.t.shape[-1]
    P = spec.num_players
    tiles = _state_to_tiles(state, B // lanes, lanes)

    def body(carry, key_t):
        tiles, sp, sh, evc, chk = carry
        actions = jax.random.randint(
            key_t, (P, B // lanes, lanes), 0, 6, dtype=jnp.int32
        )
        tiles, obs, sparse, shaped, ev = _fused_train_step(
            spec, tiles, actions, horizon, block_b, interpret,
            jnp.dtype(jnp.int8),
        )
        sp = sp + jnp.sum(sparse)
        sh = sh + jnp.sum(shaped)
        evc = evc + jnp.sum(
            unpack_events(ev).astype(jnp.int32), axis=(1, 2, 3)
        )
        chk = chk + jnp.sum(obs[:, :, :, 0, :].astype(jnp.int32))
        return (tiles, sp, sh, evc, chk), None

    z = jnp.zeros((), jnp.int32)
    keys = jax.random.split(key, num_steps)
    (tiles, sp, sh, evc, chk), _ = jax.lax.scan(
        body, (tiles, z, z, jnp.zeros((25,), jnp.int32), z), keys
    )
    final = _tiles_to_state(tiles, spec.height, spec.width)
    return final, {
        "sparse": sp, "shaped": sh, "event_counts": evc, "obs_checksum": chk
    }
