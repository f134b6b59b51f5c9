"""Fused pallas kernels for the variable-MDP (layout-pool) path.

`ops/fused_rollout.py` specializes the kernel to ONE layout: terrain,
reset values and the floor bitmask fold into Python int immediates and
only the layout's mutable cells are loop-carried. Variable-MDP training
(the reference's `num_mdp=inf` from-params mode,
ppo_rllib_from_params_client.py:78-179) gives every env lane its OWN
layout drawn from a generated pool, so none of that folding applies.
This module is the dynamic-terrain counterpart: the per-lane layout
enters the kernel as DATA —

  * one packed int32 "reset word" per cell per lane, the start-state
    cell contents in the usual bit layout with the terrain code riding
    in bits 28-30 (the same word layout the static kernel uses, so the
    whole interact body — which already reads terrain from the word —
    is shared verbatim via `_make_step(..., meta.dynamic=True)`),
  * one packed start word per player per lane (pos/orient/held and
    soup slots/tick),

and the kernel derives the per-lane floor bitmask and pot count from
the terrain bits once per launch. ALL H*W cells are loop-carried (no
static liveness pruning — any cell may be a pot on some lane), cook
ticks run is_soup-guarded on every cell (exactly core/step.py's
whole-grid formulation), and auto-reset selects the per-lane reset
words instead of immediates.

What must still be UNIFORM across the pool (asserted by
`check_pool_uniform`): grid shape and player count (stack_layouts
already requires these), the recipe value/time/opt tables, the shaped-
reward params, and the old_dynamics flag — they stay compile-time
constants. Every pool the bundled LayoutGenerator produces satisfies
this (generated layouts share the all-onion order book and default
shaping); a hand-built mixed-recipe pool falls back to the XLA scan
path (training/ppo.py pool mode).

Two kernels, mirroring the single-layout pair:
  * `fused_pool_rollout_random` / `fused_pool_rollout_actions` — the
    whole horizon inside one pallas program per batch tile (bench /
    replay; auto-resets to each lane's own start state).
  * `fused_pool_train_step_tiles` — one training env step: transition +
    events + shaped rewards + the 26-layer lossless encoding, with the
    static terrain channels (10-15) computed from the lane's terrain
    bits (reference lossless_state_encoding, overcooked_mdp.py:2385-
    2561, whose terrain layers are per-MDP).

Parity is tested in tests/test_fused_pool.py (interpret mode on CPU)
against vmapped `core.step.step` + `core.encoding.lossless_encode`
over generated pools, including auto-reset boundaries.
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
    _state_specs,
    _state_to_tiles,
    _table_select,
    _tiles_to_state,
)
from overcooked_ai_tpu.ops.fused_train import (
    NUM_LAYERS,
    URGENCY_WINDOW,
)


class _PoolMeta:
    """Duck-typed meta for `_make_step`'s dynamic-terrain mode: every
    cell carried, terrain read from the packed word at runtime."""

    dynamic = True

    def __init__(self, spec):
        HW = spec.height * spec.width
        self.lins = list(range(HW))
        self.k_of_lin = {l: l for l in range(HW)}
        self.effect_ks = list(range(HW))
        self.inert = []
        self.tt = None  # terrain is per-lane data, not a constant
        self.empty_masks = None  # per-lane registers, see dyn["emask"]


def check_pool_uniform(specs):
    """Assert the pool-constant layout fields really are constant.

    Returns the representative spec (specs[0]). The fused pool kernels
    fold these into the compiled program; a pool violating this must use
    the XLA scan path instead.
    """
    s0 = specs[0]
    l0 = s0.layout

    def same(a, b):
        return np.array_equal(np.asarray(a), np.asarray(b))

    for s in specs[1:]:
        l = s.layout
        assert (s.height, s.width, s.num_players) == (
            s0.height, s0.width, s0.num_players
        ), "pool layouts must share grid shape and player count"
        assert same(l.delivery_value, l0.delivery_value) and same(
            l.time_table, l0.time_table
        ) and same(l.opt_value, l0.opt_value), (
            "fused pool kernels need uniform recipe tables across the "
            f"pool (layout {s.name!r} differs); use the XLA pool path"
        )
        assert same(l.old_dynamics, l0.old_dynamics), (
            "fused pool kernels need a uniform old_dynamics flag"
        )
        assert (
            same(l.placement_in_pot_rew, l0.placement_in_pot_rew)
            and same(l.dish_pickup_rew, l0.dish_pickup_rew)
            and same(l.soup_pickup_rew, l0.soup_pickup_rew)
        ), "fused pool kernels need uniform reward-shaping params"
    return s0


def pool_data_tiles(lay, block_b: int = 1024):
    """Pack a per-env gathered layout pytree into the kernel's data tiles.

    lay: a Layout pytree whose leaves carry the env batch on the minor
    axis (the `jax.tree.map(lambda leaf: leaf[..., idx], pool)` gather
    from training/ppo.py pool mode). Returns (reset_rows (HW, bs, L),
    start_pw (P, bs, L), start_hw (P, bs, L)) int32, where the batch is
    folded exactly like `state_to_tiles`.
    """
    lanes = _lanes_for(block_b)
    terr = jnp.asarray(lay.terrain)
    H, W = terr.shape[0], terr.shape[1]
    HW = H * W
    B = terr.shape[-1]
    _check_batch(B, block_b, lanes)
    bs = B // lanes
    st = lay.start_state
    obj = jnp.asarray(st.obj).reshape(HW, B)
    sing = jnp.asarray(st.soup_ing).reshape(HW, _SLOTS, B)
    stick = jnp.asarray(st.soup_tick).reshape(HW, B)
    seq = jnp.asarray(st.obj_seq).reshape(HW, B)
    reset_rows = (
        obj
        | (sing[:, 0] << 3)
        | (sing[:, 1] << 5)
        | (sing[:, 2] << 7)
        | ((stick + 1) << 9)
        | (jnp.minimum(seq + HW, _SEQ_MAX) << 17)
        | (terr.reshape(HW, B) << 28)
    ).astype(jnp.int32)
    pos = jnp.asarray(st.pos)  # (P, 2, B)
    start_pw = (
        pos[:, 0] | (pos[:, 1] << 5)
        | (jnp.asarray(st.orient) << 10)
        | (jnp.asarray(st.held) << 12)
    ).astype(jnp.int32)
    hs = jnp.asarray(st.held_soup)  # (P, 3, B)
    start_hw = (
        hs[:, 0] | (hs[:, 1] << 2) | (hs[:, 2] << 4)
        | ((jnp.asarray(st.held_soup_tick) + 1) << 6)
    ).astype(jnp.int32)
    return (
        reset_rows.reshape(HW, bs, lanes),
        start_pw.reshape(-1, bs, lanes),
        start_hw.reshape(-1, bs, lanes),
    )


def _emask_num_pots(reset_rows, shape, need_pots: bool):
    """Per-lane floor bitmask chunks (+ pot count) from the terrain bits
    of the reset words. Terrain is immutable: computed once per launch."""
    HW = len(reset_rows)
    tts = [(r >> 28) & 7 for r in reset_rows]
    emask = []
    for c in range((HW + 31) // 32):
        m = jnp.zeros(shape, jnp.uint32)
        for b in range(32):
            l = c * 32 + b
            if l < HW:
                m = m | (
                    (tts[l] == TERRAIN_EMPTY).astype(jnp.uint32)
                    << jnp.uint32(b)
                )
        emask.append(m)
    num_pots = None
    if need_pots:
        num_pots = jnp.zeros(shape, jnp.int32)
        for tt in tts:
            num_pots = num_pots + (tt == TERRAIN_POT).astype(jnp.int32)
    return emask, num_pots


def _unpack_players(pword, hword):
    px = [w & 31 for w in pword]
    py = [(w >> 5) & 31 for w in pword]
    orient = [(w >> 10) & 3 for w in pword]
    held = [(w >> 12) & 7 for w in pword]
    hslots = [[hw & 3, (hw >> 2) & 3, (hw >> 4) & 3] for hw in hword]
    htick = [((hw >> 6) & 255) - 1 for hw in hword]
    return px, py, orient, held, hslots, htick


def _pack_players(px, py, orient, held, hslots, htick):
    P = len(px)
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


def _pack_rows(obj_a, sing_a, stick_a, seq_a, reset_rows, HW):
    """State arrays -> packed cell words, terrain bits from the lane's
    reset word (state arrays never carry terrain)."""
    return [
        (
            obj_a[l]
            | (sing_a[0, l] << 3)
            | (sing_a[1, l] << 5)
            | (sing_a[2, l] << 7)
            | ((stick_a[l] + 1) << 9)
            | (jnp.minimum(seq_a[l] + HW, _SEQ_MAX) << 17)
            | (reset_rows[l] & (7 << 28))
        )
        for l in range(HW)
    ]


def _unpack_rows(rows, HW):
    obj_rows = [w & 7 for w in rows]
    s_rows = [
        [(w >> 3) & 3 for w in rows],
        [(w >> 5) & 3 for w in rows],
        [(w >> 7) & 3 for w in rows],
    ]
    stick_rows = [((w >> 9) & 255) - 1 for w in rows]
    seq_rows = [((w >> 17) & _SEQ_MAX) - HW for w in rows]
    return obj_rows, s_rows, stick_rows, seq_rows


def _store_state(state_out, px, py, orient, held, hslots, htick,
                 obj_rows, s_rows, stick_rows, seq_rows, t1):
    P = len(px)
    state_out[0][:] = jnp.stack(px)
    state_out[1][:] = jnp.stack(py)
    state_out[2][:] = jnp.stack(orient)
    state_out[3][:] = jnp.stack(held)
    state_out[4][:] = jnp.stack(
        [jnp.stack([hslots[i][s] for i in range(P)]) for s in range(_SLOTS)]
    )
    state_out[5][:] = jnp.stack(htick)
    state_out[6][:] = jnp.stack(obj_rows)
    state_out[7][:] = jnp.stack([jnp.stack(s) for s in s_rows])
    state_out[8][:] = jnp.stack(stick_rows)
    state_out[9][:] = jnp.stack(seq_rows)
    state_out[10][:] = t1


def _build_pool_kernel(spec0, num_steps: int, horizon: int, use_rng: bool):
    """Whole-horizon pool rollout kernel (dynamic-terrain twin of
    fused_rollout._build_kernel)."""
    meta = _PoolMeta(spec0)
    step = _make_step(spec0, meta)
    P = spec0.num_players
    HW = spec0.height * spec0.width
    K = HW

    def kernel(seed_ref, actions_ref, reset_ref, spw_ref, shw_ref, *refs):
        state_in = refs[0:11]
        state_out = refs[11:22]
        ret_ref = refs[22]
        raw = tuple(r[:] for r in state_in)
        (px_a, py_a, or_a, held_a, hs_a, ht_a,
         obj_a, sing_a, stick_a, seq_a, t0) = raw
        reset_rows = [reset_ref[l] for l in range(HW)]
        start_pw = [spw_ref[i] for i in range(P)]
        start_hw = [shw_ref[i] for i in range(P)]
        rows = _pack_rows(obj_a, sing_a, stick_a, seq_a, reset_rows, HW)
        pword = [
            px_a[i] | (py_a[i] << 5) | (or_a[i] << 10) | (held_a[i] << 12)
            for i in range(P)
        ]
        hword = [
            hs_a[0, i] | (hs_a[1, i] << 2) | (hs_a[2, i] << 4)
            | ((ht_a[i] + 1) << 6)
            for i in range(P)
        ]
        emask, _ = _emask_num_pots(reset_rows, t0.shape, need_pots=False)
        dyn = {"emask": emask, "num_pots": None}

        shape = t0.shape
        ret0 = jnp.zeros(shape, jnp.int32)
        if use_rng:
            # same murmur3-finalizer counter PRNG as the static kernel
            sub = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
            lane = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            gl = (
                jnp.uint32(pl.program_id(0)) * jnp.uint32(shape[0] * shape[1])
                + sub * jnp.uint32(shape[1])
                + lane
            )
            seed_base = seed_ref[0, 0].astype(jnp.uint32) * jnp.uint32(
                0x9E3779B9
            )

        def _hash_actions(i, k):
            x = (
                seed_base + gl
                + jnp.uint32(i) * jnp.uint32(0x85EBCA6B)
                + jnp.uint32(k) * jnp.uint32(0x27D4EB2F)
            )
            x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x85EBCA6B)
            x = (x ^ (x >> jnp.uint32(13))) * jnp.uint32(0xC2B2AE35)
            x = x ^ (x >> jnp.uint32(16))
            return (((x >> jnp.uint32(8)) * jnp.uint32(6))
                    >> jnp.uint32(24)).astype(jnp.int32)

        def body(k, carry):
            (rows, pword, hword, t, ret) = carry
            rows = list(rows)
            px, py, orient, held, hslots, htick = _unpack_players(
                list(pword), list(hword)
            )
            if use_rng:
                actions = [_hash_actions(i, k) for i in range(P)]
            else:
                act = actions_ref[k]
                actions = [act[i] for i in range(P)]
            rows, px, py, orient, held, hslots, htick, sparse = step(
                rows, px, py, orient, held, hslots, htick, t, actions,
                dyn=dyn,
            )
            for s in sparse:
                ret = ret + s
            t = t + 1
            done = t >= horizon
            # per-lane reset: each lane returns to ITS layout's start
            rows = [
                jnp.where(done, reset_rows[k2], rows[k2]) for k2 in range(K)
            ]
            pword, hword = _pack_players(px, py, orient, held, hslots, htick)
            pword = [jnp.where(done, start_pw[i], pword[i]) for i in range(P)]
            hword = [jnp.where(done, start_hw[i], hword[i]) for i in range(P)]
            t = jnp.where(done, 0, t)
            return (tuple(rows), tuple(pword), tuple(hword), t, ret)

        init = (tuple(rows), tuple(pword), tuple(hword), t0, ret0)
        (rows, pword, hword, t, ret) = jax.lax.fori_loop(
            0, num_steps, body, init
        )
        px, py, orient, held, hslots, htick = _unpack_players(
            list(pword), list(hword)
        )
        obj_rows, s_rows, stick_rows, seq_rows = _unpack_rows(list(rows), HW)
        _store_state(
            state_out, px, py, orient, held, hslots, htick,
            obj_rows, s_rows, stick_rows, seq_rows, t,
        )
        ret_ref[:] = ret

    return kernel


def _pool_specs(spec0, blk_bs: int, lanes: int):
    """BlockSpecs for (reset_rows, start_pw, start_hw)."""
    HW = spec0.height * spec0.width
    P = spec0.num_players

    def bs(*lead):
        ndim = len(lead)
        return pl.BlockSpec(
            lead + (blk_bs, lanes),
            (lambda *gi, _n=ndim: (0,) * _n + (gi[0], 0)),
            memory_space=pltpu.VMEM,
        )

    return [bs(HW), bs(P), bs(P)]


@functools.partial(
    jax.jit,
    static_argnames=("spec0", "num_steps", "horizon", "block_b", "interpret"),
)
def _fused_pool_rollout(
    spec0, pool_tiles, state_arrs, seed, actions,
    num_steps: int, horizon: int, block_b: int, interpret: bool,
):
    B = state_arrs[-1].shape[-2] * state_arrs[-1].shape[-1]
    lanes = state_arrs[-1].shape[-1]
    blk_bs = block_b // lanes
    grid = (B // block_b,)
    P = spec0.num_players
    use_rng = actions is None
    if use_rng:
        actions = jnp.zeros((1, P, B // lanes, lanes), jnp.int32)
        act_block_t = 1
    else:
        act_block_t = actions.shape[0]
    state_specs = _state_specs(spec0, blk_bs, lanes)
    kernel = _build_pool_kernel(spec0, num_steps, horizon, use_rng)
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
    ] + _pool_specs(spec0, blk_bs, lanes) + state_specs
    HW = spec0.height * spec0.width
    flops_per_step = (7 * HW * P + 160) * B
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        # state inputs (after seed+actions+3 pool tiles) alias the outputs
        input_output_aliases={5 + i: i for i in range(11)},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step * num_steps,
            bytes_accessed=B * (HW * 7 + 10 * P) * 4 * 2,
            transcendentals=0,
        ),
    )(
        jnp.asarray(seed).reshape(1, 1).astype(jnp.int32),
        actions,
        *pool_tiles,
        *state_arrs,
    )
    return tuple(outs[:11]), outs[11]


def fused_pool_rollout_random(
    spec0, lay, state: State, seed, num_steps: int,
    horizon: int = 400, block_b: int = 1024, interpret: bool = False,
):
    """`num_steps` random-policy env steps with a PER-LANE layout, fused.

    spec0: the representative spec (see check_pool_uniform). lay: the
    per-env gathered Layout pytree (leaves (..., B)). state: batch-minor
    State. Returns (final_state, per-env return (B,) int32).
    """
    lanes = _lanes_for(block_b)
    B = state.t.shape[-1]
    _check_batch(B, block_b, lanes)
    arrs = _state_to_tiles(state, B // lanes, lanes)
    pool_tiles = pool_data_tiles(lay, block_b)
    out_arrs, ret = _fused_pool_rollout(
        spec0, pool_tiles, arrs, jnp.asarray(seed), None,
        num_steps, horizon, block_b, interpret,
    )
    return _tiles_to_state(out_arrs, spec0.height, spec0.width), ret.reshape(B)


def fused_pool_rollout_actions(
    spec0, lay, state: State, actions,
    horizon: int = 400, block_b: int = 1024, interpret: bool = False,
):
    """Replay an explicit (T, P, B) action sequence on per-lane layouts.

    Bit-exact with scanning vmapped `core.step.step` over the same
    per-lane layouts; the parity-test entry point."""
    lanes = _lanes_for(block_b)
    B = state.t.shape[-1]
    _check_batch(B, block_b, lanes)
    arrs = _state_to_tiles(state, B // lanes, lanes)
    pool_tiles = pool_data_tiles(lay, block_b)
    actions = jnp.asarray(actions, jnp.int32).reshape(
        actions.shape[0], spec0.num_players, B // lanes, lanes
    )
    out_arrs, ret = _fused_pool_rollout(
        spec0, pool_tiles, arrs, jnp.zeros((), jnp.int32), actions,
        actions.shape[0], horizon, block_b, interpret,
    )
    return _tiles_to_state(out_arrs, spec0.height, spec0.width), ret.reshape(B)


# ===================== training step kernel ==========================


def _build_pool_train_kernel(spec0, horizon: int, obs_dtype,
                             reset_horizon: int):
    """One fused training env step with per-lane layouts: transition +
    events + shaped rewards + 26-layer lossless encoding (dynamic-terrain
    twin of fused_train._build_train_kernel; every per-cell branch that
    was a Python `if tt == ...` there is a predicated select here)."""
    meta = _PoolMeta(spec0)
    step = _make_step(spec0, meta, emit_train=True)
    lay0 = spec0.layout
    H, W, P = spec0.height, spec0.width, spec0.num_players
    HW = H * W
    K = HW
    time_t = np.asarray(lay0.time_table)
    i32 = jnp.int32

    def kernel(actions_ref, reset_ref, spw_ref, shw_ref, *refs):
        state_in = refs[0:11]
        state_out = refs[11:22]
        obs_ref, sparse_ref, shaped_ref, ev_ref = refs[22:26]
        raw = tuple(r[:] for r in state_in)
        (px_a, py_a, or_a, held_a, hs_a, ht_a,
         obj_a, sing_a, stick_a, seq_a, t0) = raw
        reset_rows = [reset_ref[l] for l in range(HW)]
        start_pw = [spw_ref[i] for i in range(P)]
        start_hw = [shw_ref[i] for i in range(P)]
        rows = _pack_rows(obj_a, sing_a, stick_a, seq_a, reset_rows, HW)
        px = [px_a[i] for i in range(P)]
        py = [py_a[i] for i in range(P)]
        orient = [or_a[i] for i in range(P)]
        held = [held_a[i] for i in range(P)]
        hslots = [[hs_a[s, i] for s in range(_SLOTS)] for i in range(P)]
        htick = [ht_a[i] for i in range(P)]
        actions = [actions_ref[i] for i in range(P)]
        emask, num_pots = _emask_num_pots(
            reset_rows, t0.shape, need_pots=True
        )
        dyn = {"emask": emask, "num_pots": num_pots}

        (rows, px, py, orient, held, hslots, htick,
         sparse, shaped, evmask) = step(
            rows, px, py, orient, held, hslots, htick, t0, actions, dyn=dyn
        )

        # horizon termination + per-lane auto-reset
        t1 = t0 + 1
        done = t1 >= reset_horizon
        rows = [jnp.where(done, reset_rows[k], rows[k]) for k in range(K)]
        for i in range(P):
            pw = start_pw[i]
            px[i] = jnp.where(done, pw & 31, px[i])
            py[i] = jnp.where(done, (pw >> 5) & 31, py[i])
            orient[i] = jnp.where(done, (pw >> 10) & 3, orient[i])
            held[i] = jnp.where(done, (pw >> 12) & 7, held[i])
            hw = start_hw[i]
            hslots[i] = [
                jnp.where(done, (hw >> (2 * s)) & 3, hslots[i][s])
                for s in range(_SLOTS)
            ]
            htick[i] = jnp.where(done, ((hw >> 6) & 255) - 1, htick[i])
        t1 = jnp.where(done, 0, t1)

        obj_rows, s_rows, stick_rows, seq_rows = _unpack_rows(list(rows), HW)
        _store_state(
            state_out, px, py, orient, held, hslots, htick,
            obj_rows, s_rows, stick_rows, seq_rows, t1,
        )
        sparse_ref[:] = jnp.stack(sparse)
        shaped_ref[:] = jnp.stack(shaped)
        ev_ref[:] = jnp.stack(evmask)

        # ========= lossless encoding of the POST-step state ==========
        # (reference lossless_state_encoding overcooked_mdp.py:2385-2561;
        # same channel order as fused_train, but the per-cell terrain
        # branches become selects on the lane's terrain bits)
        shape = t1.shape
        od = obs_dtype
        obs_cell = [
            [[None] * HW for _ in range(NUM_LAYERS)] for _ in range(P)
        ]

        def store(p, c, l, val):
            obs_cell[p][c][l] = val.astype(od)

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
        tt_chan = {
            10: TERRAIN_POT,
            11: TERRAIN_COUNTER,
            12: TERRAIN_ONION_DISP,
            13: TERRAIN_TOMATO_DISP,
            14: TERRAIN_DISH_DISP,
            15: TERRAIN_SERVE,
        }

        for l in range(HW):
            w = rows[l]
            ttl = (w >> 28) & 7
            y, x = divmod(l, W)
            # players stand only on floor cells, so loc is identically
            # False elsewhere — no is_empty gate needed (the static
            # kernel's per-terrain Python branches collapse to this)
            loc = [(px[p] == x) & (py[p] == y) for p in range(P)]
            for p in range(P):
                q = 1 - p  # encoding is 2-player only (reference :2389)
                store(p, 0, l, loc[p].astype(i32))
                store(p, 1, l, loc[q].astype(i32))
                for d in range(4):
                    store(p, 2 + d, l, (loc[p] & d_eq[p][d]).astype(i32))
                    store(p, 6 + d, l, (loc[q] & d_eq[q][d]).astype(i32))
                for c, code in tt_chan.items():
                    store(p, c, l, (ttl == code).astype(i32))
                store(p, 25, l, urg)

            # content channels 16-24, identical for both players
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
            is_pot = ttl == TERRAIN_POT
            idle = tickp1 == 0
            active = is_soup & ~idle
            cook_t = _table_select(time_t, n_o, n_t)
            pot_idle_soup = is_pot & is_soup & idle
            # off-pot soups are done with 0 time left (reference
            # :2515-2525); pot soups split idle (16/17) vs active (18/19)
            soup_counts = is_soup & (active | ~is_pot)
            ch = {}
            ch[16] = jnp.where(pot_idle_soup, n_o, 0)
            ch[17] = jnp.where(pot_idle_soup, n_t, 0)
            ch[18] = jnp.where(soup_counts, n_o, 0)
            ch[19] = jnp.where(soup_counts, n_t, 0)
            ch[20] = jnp.where(is_pot & active, cook_t - (tickp1 - 1), 0)
            ch[21] = jnp.where(
                is_pot, (active & (tickp1 - 1 >= cook_t)).astype(i32),
                is_soup.astype(i32),
            )
            ch[22] = (obj == OBJ_DISH).astype(i32)
            ch[23] = (obj == OBJ_ONION).astype(i32)
            ch[24] = (obj == OBJ_TOMATO).astype(i32)
            # held objects contribute at the holder's floor cell
            # (reference all_objects_list includes held, :2413); loc is
            # False on non-floor cells so these add nothing there
            for p in range(P):
                lp = loc[p]
                ch[18] = ch[18] + jnp.where(lp & held_soup_p[p], hs_no[p], 0)
                ch[19] = ch[19] + jnp.where(lp & held_soup_p[p], hs_nt[p], 0)
                ch[21] = ch[21] + (lp & held_soup_p[p]).astype(i32)
                ch[22] = ch[22] + (lp & held_dish_p[p]).astype(i32)
                ch[23] = ch[23] + (lp & held_onion_p[p]).astype(i32)
                ch[24] = ch[24] + (lp & held_tomato_p[p]).astype(i32)
            for p in range(P):
                for c in range(16, 25):
                    store(p, c, l, ch[c])

        obs_ref[:] = jnp.stack(
            [
                jnp.stack(
                    [jnp.stack(obs_cell[p][c]) for c in range(NUM_LAYERS)]
                )
                for p in range(P)
            ]
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "spec0", "horizon", "block_b", "interpret", "obs_dtype",
        "reset_horizon",
    ),
)
def _fused_pool_train_step(
    spec0, pool_tiles, state_arrs, actions, horizon, block_b, interpret,
    obs_dtype, reset_horizon=None,
):
    B = state_arrs[-1].shape[-2] * state_arrs[-1].shape[-1]
    lanes = state_arrs[-1].shape[-1]
    blk_bs = block_b // lanes
    grid = (B // block_b,)
    P = spec0.num_players
    HW = spec0.height * spec0.width
    state_specs = _state_specs(spec0, blk_bs, lanes)
    kernel = _build_pool_train_kernel(
        spec0, horizon, jnp.dtype(obs_dtype),
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
    in_specs = [bspec(P)] + _pool_specs(spec0, blk_bs, lanes) + state_specs
    flops_per_step = (7 * HW * P + 160 + 70 * HW) * B
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        # state inputs (after actions + 3 pool tiles) alias the outputs
        input_output_aliases={4 + i: i for i in range(11)},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_step,
            bytes_accessed=B * (HW * 7 + 10 * P) * 4 * 2
            + B * P * NUM_LAYERS * HW,
            transcendentals=0,
        ),
    )(actions, *pool_tiles, *state_arrs)
    return tuple(outs[:11]), outs[11], outs[12], outs[13], outs[14]


def fused_pool_train_step_tiles(
    spec0, pool_tiles, tiles, actions,
    horizon: int = 400, block_b: int = 1024, interpret: bool = False,
    obs_dtype=jnp.int8, reset_horizon=None,
):
    """One fused pool training env step on pre-folded tiles.

    pool_tiles: from `pool_data_tiles` (pack ONCE per rollout — the
    layouts don't change within an episode batch). tiles: from
    fused_train.state_to_tiles; actions (P, bs, L) int32. Returns
    (tiles', obs (P, 26, HW, bs, L), sparse, shaped, events) exactly
    like fused_train.fused_train_step_tiles.
    """
    return _fused_pool_train_step(
        spec0, pool_tiles, tiles, actions, horizon, block_b, interpret,
        obs_dtype, reset_horizon,
    )


def fused_pool_train_step(
    spec0, lay, state: State, actions,
    horizon: int = 400, block_b: int = 1024, interpret: bool = False,
    obs_dtype=jnp.int8, reset_horizon=None,
):
    """Ergonomic entry on a State pytree + per-env layout pytree.

    Returns (next_state, obs_nhwc (P*B, H, W, 26), sparse (P, B),
    shaped (P, B), events (P, B) int32 bitmasks)."""
    from overcooked_ai_tpu.ops.fused_train import obs_tiles_to_nhwc

    lanes = _lanes_for(block_b)
    B = state.t.shape[-1]
    _check_batch(B, block_b, lanes)
    P = spec0.num_players
    tiles = _state_to_tiles(state, B // lanes, lanes)
    pool_tiles = pool_data_tiles(lay, block_b)
    act = jnp.asarray(actions, jnp.int32).reshape(P, B // lanes, lanes)
    tiles, obs, sparse, shaped, ev = _fused_pool_train_step(
        spec0, pool_tiles, tiles, act, horizon, block_b, interpret,
        jnp.dtype(obs_dtype), reset_horizon,
    )
    return (
        _tiles_to_state(tiles, spec0.height, spec0.width),
        obs_tiles_to_nhwc(spec0, obs),
        sparse.reshape(P, B),
        shaped.reshape(P, B),
        ev.reshape(P, B),
    )
