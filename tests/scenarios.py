"""Shared parity-scenario registry: layouts + deterministic action streams.

Used by both the golden-fixture generator (scripts/gen_golden_fixtures.py)
and the parity tests, so the committed fixtures and the tests always agree
on what is being replayed. Mirrors the reference's golden-data strategy
(reference testing/overcooked_test.py:468-525 + data/testing/*) where
seeded rollouts are frozen to disk with a recompute escape hatch.
"""

import zlib

import numpy as np

# our action indices (core/constants.py): N=0 S=1 E=2 W=3 STAY=4 INTERACT=5
N, S, E, W, ST, I = 0, 1, 2, 3, 4, 5

CLASSIC_LAYOUTS = [
    "cramped_room",
    "asymmetric_advantages",
    "coordination_ring",
    "forced_coordination",
    "counter_circuit",
]


def biased_random_actions(num_players, horizon, seed):
    """Interact-heavy random streams: exercises every interact branch far
    more often than uniform actions."""
    rng = np.random.RandomState(seed)
    p = np.array([0.13, 0.13, 0.13, 0.13, 0.08, 0.40])
    return rng.choice(6, size=(horizon, num_players), p=p)


def _cramped_room_script():
    """Cook and deliver one 3-onion soup with a counter drop/pickup detour.

    Exercises every interact branch + usefulness events + delivery reward.
    """
    p0 = {}
    p1 = {}
    # p1: 3 onions into the pot at (2,0), then start cooking (t is 0-based)
    seq1 = [E, I, W, N, I, E, E, I, W, N, I, E, E, I, W, N, I, I]
    for t, a in enumerate(seq1):
        p1[t] = a
    # p1 clears out to (3,1), then counter-drop detour at (4,2)
    p1[18] = E  # (2,1)->(3,1)
    p1[23] = I  # facing E at onion dispenser (4,1): pick onion
    p1[24] = S  # -> (3,2)
    p1[25] = E  # face (4,2) counter
    p1[26] = I  # drop onion on counter
    p1[27] = I  # pick it back up
    p1[28] = N  # -> (3,1), out of p0's delivery path
    # p0: waits, then dish + soup + delivery
    p0[18] = S  # face dish dispenser (1,3)
    p0[19] = I  # pick dish (useful: pot is cooking)
    p0[20] = N  # -> (1,1)
    p0[21] = E  # -> (2,1)
    p0[22] = N  # face pot
    p0[37] = I  # soup ready (cook tick 20 reached): pick up soup
    p0[38] = S  # -> (2,2)
    p0[39] = E  # -> (3,2)
    p0[40] = S  # face serving location (3,3)
    p0[41] = I  # deliver: +20
    horizon = 43
    acts = np.full((horizon, 2), ST, np.int32)
    for t, a in p0.items():
        acts[t, 0] = a
    for t, a in p1.items():
        acts[t, 1] = a
    return acts


def _old_dynamics_cook_script():
    """Old dynamics: pot auto-starts at 3 ingredients; INTERACT never
    starts it. Single-player layout with 1 onion already in the pot."""
    p = [W, W, I, E, N, I, W, W, I, E, N, I]  # add onions #2 and #3
    p += [ST] * 21  # soup auto-starts and cooks (20 ticks)
    p += [S, W, S, I]  # fetch dish from (1,3)
    p += [N, E, N, I]  # pick up soup at pot
    p += [S, E, S, I]  # deliver at (3,3)
    return np.asarray(p, np.int32)[:, None]


def _players_of(layout_name):
    # avoids importing the package at registry-definition time
    from overcooked_ai_tpu.core.layout import from_layout_name

    return from_layout_name(layout_name).num_players


def dynamics_scenarios():
    """name -> dict(layout, overrides, actions (T, P) int, check_score)."""
    scen = {}
    for name in CLASSIC_LAYOUTS:
        scen[name] = dict(
            layout=name,
            overrides={},
            actions=biased_random_actions(
                _players_of(name), 400, seed=zlib.crc32(name.encode()) % 2**31
            ),
            check_score=None,
        )
    scen["cramped_room_scripted"] = dict(
        layout="cramped_room",
        overrides={},
        actions=_cramped_room_script(),
        check_score=20,
    )
    for name in ["old_dynamics_cook_test", "old_dynamics_put_test"]:
        scen[f"{name}_fuzz"] = dict(
            layout=name,
            overrides={"old_dynamics": True},
            actions=biased_random_actions(_players_of(name), 300, seed=7),
            check_score=None,
        )
    scen["old_dynamics_cook_scripted"] = dict(
        layout="old_dynamics_cook_test",
        overrides={"old_dynamics": True},
        actions=_old_dynamics_cook_script(),
        check_score=20,
    )
    scen["multiplayer_schelling"] = dict(
        layout="multiplayer_schelling",
        overrides={},
        actions=biased_random_actions(
            _players_of("multiplayer_schelling"), 300, seed=11
        ),
        check_score=None,
    )
    scen["mdp_test_tomato"] = dict(
        layout="mdp_test",
        overrides={},
        actions=biased_random_actions(_players_of("mdp_test"), 400, seed=3),
        check_score=None,
    )
    scen["soup_coordination"] = dict(
        layout="soup_coordination",
        overrides={},
        actions=biased_random_actions(
            _players_of("soup_coordination"), 400, seed=5
        ),
        check_score=None,
    )
    return scen


# aux fixtures: (layout, rollout length, sampling stride, featurize seed)
AUX_LAYOUTS = {
    "cramped_room": dict(horizon=150, stride=10, seed=13),
    "counter_circuit": dict(horizon=150, stride=10, seed=13),
    "asymmetric_advantages": dict(horizon=150, stride=10, seed=13),
    "mdp_test": dict(horizon=150, stride=10, seed=31),
}
