"""Generate committed golden parity fixtures from the reference oracle.

This is the `recompute=True` escape hatch of the reference's golden-data
tests (reference testing/overcooked_test.py:468-525): run once with the
reference mounted at /root/reference, commit the outputs under
tests/golden/, and the parity contract survives without the oracle.

Fixture files (gzipped JSON):
  tests/golden/dynamics_<scenario>.json.gz
      layout, overrides, actions (T,P), start_state dict, per-step
      canonical state dicts, sparse/shaped rewards, 25-bit event masks.
  tests/golden/aux_<layout>.json.gz
      sampled state dicts from a seeded rollout + the reference's lossless
      encoding, hand-crafted featurization and potential value at each.

Usage:
    python scripts/gen_golden_fixtures.py            # everything
    python scripts/gen_golden_fixtures.py --only dynamics
    python scripts/gen_golden_fixtures.py --only aux
"""

import argparse
import gzip
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")

from tests import oracle  # noqa: E402
from tests.scenarios import AUX_LAYOUTS, dynamics_scenarios  # noqa: E402


def _jsonify(x):
    return json.loads(json.dumps(x))


def events_mask(event_infos, num_players, event_types):
    out = []
    for p in range(num_players):
        m = 0
        for i, name in enumerate(event_types):
            if event_infos[name][p]:
                m |= 1 << i
        out.append(m)
    return out


def write_fixture(path, payload):
    with gzip.open(path, "wt") as f:
        json.dump(payload, f, separators=(",", ":"))
    print(f"wrote {os.path.relpath(path, REPO)} "
          f"({os.path.getsize(path) // 1024} KiB)")


def gen_dynamics():
    from overcooked_ai_tpu.core.constants import EVENT_TYPES
    from overcooked_ai_tpu.core.state import canonical_state_dict

    for name, sc in dynamics_scenarios().items():
        mdp = oracle.make_mdp(sc["layout"], **sc["overrides"])
        state = mdp.get_standard_start_state()
        P = mdp.num_players
        steps = []
        total_sparse = 0
        for acts in sc["actions"]:
            state, infos = oracle.ref_step(mdp, state, acts)
            sparse = [int(v) for v in infos["sparse_reward_by_agent"]]
            shaped = [int(v) for v in infos["shaped_reward_by_agent"]]
            total_sparse += sum(sparse)
            steps.append(
                dict(
                    state=_jsonify(canonical_state_dict(state.to_dict())),
                    sparse=sparse,
                    shaped=shaped,
                    events=events_mask(infos["event_infos"], P, EVENT_TYPES),
                )
            )
        if sc["check_score"] is not None:
            assert total_sparse == sc["check_score"], (
                name, total_sparse, sc["check_score"]
            )
        payload = dict(
            layout=sc["layout"],
            overrides=sc["overrides"],
            event_types=list(EVENT_TYPES),
            actions=sc["actions"].tolist(),
            start_state=_jsonify(
                canonical_state_dict(
                    mdp.get_standard_start_state().to_dict()
                )
            ),
            total_sparse=total_sparse,
            steps=steps,
        )
        write_fixture(
            os.path.join(GOLDEN_DIR, f"dynamics_{name}.json.gz"), payload
        )


def gen_aux():
    from tests.scenarios import biased_random_actions
    from tests.test_planning_parity import make_ref_motion_planner

    class _MlamShim:
        def __init__(self, mp):
            self.motion_planner = mp

    for layout_name, cfg in AUX_LAYOUTS.items():
        mdp = oracle.make_mdp(layout_name)
        mp = make_ref_motion_planner(mdp, counter_goals=[])
        mlam = _MlamShim(mp)
        state = mdp.get_standard_start_state()
        acts = biased_random_actions(
            mdp.num_players, cfg["horizon"], cfg["seed"]
        )
        two_player = mdp.num_players == 2
        samples = []
        for t in range(cfg["horizon"] + 1):
            if t % cfg["stride"] == 0:
                entry = dict(t=t, state=_jsonify(state.to_dict()))
                if two_player:
                    enc = mdp.lossless_state_encoding(state, horizon=400)
                    entry["encoding"] = [
                        np.asarray(e, np.int64).tolist() for e in enc
                    ]
                feat = mdp.featurize_state(state, mlam, num_pots=2)
                entry["featurize"] = [
                    np.asarray(f, np.float64).tolist() for f in feat
                ]
                entry["potential"] = float(mdp.potential_function(state, mp))
                samples.append(entry)
            if t < cfg["horizon"]:
                state, _ = oracle.ref_step(mdp, state, acts[t])
        payload = dict(layout=layout_name, samples=samples)
        write_fixture(
            os.path.join(GOLDEN_DIR, f"aux_{layout_name}.json.gz"), payload
        )


def gen_state_strings():
    """Per-step reference `state_string` renders of the scripted dynamics
    fixtures (consumed by tests/test_state_string.py)."""
    import gzip
    import json

    oracle.load()
    from overcooked_ai_py.mdp.overcooked_mdp import OvercookedState

    for fix in [
        "dynamics_cramped_room_scripted",
        "dynamics_old_dynamics_cook_scripted",
    ]:
        path = os.path.join(GOLDEN_DIR, fix + ".json.gz")
        with gzip.open(path, "rt") as f:
            d = json.load(f)
        mdp = oracle.make_mdp(d["layout"], **d["overrides"])
        strings = [
            mdp.state_string(OvercookedState.from_dict(s))
            for s in [d["start_state"]]
            + [st["state"] for st in d["steps"]]
        ]
        write_fixture(
            os.path.join(
                GOLDEN_DIR, f"state_string_{d['layout']}.json.gz"
            ),
            dict(
                layout=d["layout"],
                overrides=d["overrides"],
                fixture=fix,
                strings=strings,
            ),
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only", choices=["dynamics", "aux", "state_strings"], default=None
    )
    args = ap.parse_args()
    if not oracle.available():
        raise SystemExit(
            "reference oracle not mounted at /root/reference; fixtures can "
            "only be regenerated with the oracle present"
        )
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    if args.only in (None, "dynamics"):
        gen_dynamics()
    if args.only in (None, "aux"):
        gen_aux()
    if args.only in (None, "state_strings"):
        gen_state_strings()


if __name__ == "__main__":
    main()
