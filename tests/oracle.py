"""Bridge to the reference implementation, used as a parity oracle.

The reference (HumanCompatibleAI/overcooked_ai) is mounted read-only at
/root/reference and imported on CPU only inside tests; it is never a runtime
dependency of the framework.
"""

import sys

import numpy as np

REFERENCE_SRC = "/root/reference/src"


def available() -> bool:
    import os

    return os.path.isdir(REFERENCE_SRC)


_CACHE = {}


def load():
    """Import and return the reference mdp module namespace (cached)."""
    if _CACHE:
        return _CACHE["mdp"], _CACHE["actions"]
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    from overcooked_ai_py.mdp import actions as ref_actions
    from overcooked_ai_py.mdp import overcooked_mdp as ref_mdp

    # Some start_state layouts need a configured Recipe class before
    # from_layout_name can deserialize them (reference footgun; their tests
    # configure Recipe first). Only done once here; OvercookedGridworld
    # re-configures per layout and that config must not be clobbered.
    ref_mdp.Recipe.configure({})
    _CACHE["mdp"] = ref_mdp
    _CACHE["actions"] = ref_actions
    return ref_mdp, ref_actions


def make_mdp(layout_name: str, **overrides):
    ref_mdp, _ = load()
    return ref_mdp.OvercookedGridworld.from_layout_name(
        layout_name, **overrides
    )


def action_int_to_ref(a: int):
    """Our action index -> reference Action (same ordering)."""
    _, ref_actions = load()
    return ref_actions.Action.INDEX_TO_ACTION[int(a)]


def ref_step(mdp, state, action_ints):
    """Run one reference transition; returns (next_state, infos)."""
    joint = tuple(action_int_to_ref(a) for a in action_ints)
    return mdp.get_state_transition(state, joint)


def events_matrix(event_infos, num_players) -> np.ndarray:
    """Reference event_infos dict -> (NUM_EVENTS, P) bool in our order."""
    from overcooked_ai_tpu.core.constants import EVENT_TYPES

    out = np.zeros((len(EVENT_TYPES), num_players), bool)
    for i, name in enumerate(EVENT_TYPES):
        out[i] = [bool(x) for x in event_infos[name]]
    return out
