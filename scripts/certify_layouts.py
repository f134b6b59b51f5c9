"""Certify OUR dynamics against the live reference on EVERY shipped layout.

The reference treats all 49 files in data/layouts/ as playable under its
MDP (reference overcooked_mdp.py:2063-2115 validation + data/layouts/);
the per-layout parity fuzzes in tests/golden/dynamics_* cover ~12
scenarios. This script closes the rest: for every layout json it drives
400 biased-random steps through BOTH the live reference
(get_state_transition) and our jitted step, asserts exact per-step parity
(canonical state dict, per-player sparse/shaped rewards, all 25 event
channels), and freezes a COMPACT hermetic certificate per layout:

    {seed, horizon, final_state_sha256, total_sparse, total_shaped,
     event_totals (per-channel summed over steps+players)}

written to tests/golden/certification_49.json.gz. The hermetic test
(tests/test_layout_certification.py) replays the same action streams
through our step alone and checks the certificate, so the 49-layout
guarantee holds without the oracle mount; this generator is the
recompute escape hatch (and the live proof).

Usage: python scripts/certify_layouts.py  (needs /root/reference mounted)
"""

import gzip
import hashlib
import json
import os
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from overcooked_ai_tpu.utils.platform import force_platform

force_platform("cpu")

HORIZON = 400
OLD_DYNAMICS = False  # set by --old-dynamics (module-level so the test
                      # can flip it when replaying the old certificate)


def _overrides():
    return {"old_dynamics": True} if OLD_DYNAMICS else {}


def cert_file():
    return "certification_49_old" if OLD_DYNAMICS else "certification_49"


def layout_names():
    d = os.path.join(
        os.path.dirname(__file__), "..", "overcooked_ai_tpu", "data",
        "layouts",
    )
    return sorted(
        os.path.splitext(f)[0] for f in os.listdir(d) if f.endswith(".json")
    )


def cert_seed(name):
    return zlib.crc32(name.encode()) & 0xFFFF


def state_sha(spec, state):
    from overcooked_ai_tpu.core.state import (
        canonical_state_dict,
        state_to_dict,
    )

    d = canonical_state_dict(state_to_dict(state, spec))
    return hashlib.sha256(
        json.dumps(d, sort_keys=True).encode()
    ).hexdigest()


def run_ours(name):
    """Replay the certification stream through our step; return the
    certificate fields (shared with the hermetic test)."""
    import jax
    import numpy as np

    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.core.step import step

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from scenarios import biased_random_actions

    spec = from_layout_name(name, **_overrides())
    layout = spec.layout
    acts = biased_random_actions(spec.num_players, HORIZON, cert_seed(name))
    state = jax.tree.map(np.asarray, spec.layout.start_state)
    step_jit = jax.jit(step)
    total_sparse = 0
    total_shaped = 0
    event_totals = None
    for t in range(HORIZON):
        state, info = step_jit(layout, state, np.asarray(acts[t], np.int32))
        state, info = jax.device_get((state, info))
        total_sparse += int(np.sum(info.sparse_reward))
        total_shaped += int(np.sum(info.shaped_reward))
        ev = np.asarray(info.events).sum(axis=1).astype(int)
        event_totals = ev if event_totals is None else event_totals + ev
    return spec, state, {
        "seed": cert_seed(name),
        "horizon": HORIZON,
        "final_state_sha256": state_sha(spec, state),
        "total_sparse": total_sparse,
        "total_shaped": total_shaped,
        "event_totals": event_totals.tolist(),
    }


def certify_live(name):
    """Per-step live-oracle parity for one layout; returns (ok, detail)."""
    import jax
    import numpy as np

    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.core.state import (
        canonical_state_dict,
        state_from_dict,
        state_to_dict,
    )
    from overcooked_ai_tpu.core.step import step

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import oracle
    from scenarios import biased_random_actions

    try:
        mdp = oracle.make_mdp(name, **_overrides())
        ref_raised = False
    except AssertionError:
        ref_raised = True
    try:
        spec = from_layout_name(name, **_overrides())
        ours_raised = False
    except AssertionError:
        ours_raised = True
    if ref_raised or ours_raised:
        # both must refuse identically (old dynamics only accepts
        # 3-item orders; reference overcooked_mdp.py:1121-1127 == our
        # layout.py guard). Refusal parity is part of the certificate.
        if ref_raised and ours_raised:
            return True, "unsupported"
        return False, (
            f"construction mismatch: ref_raised={ref_raised}, "
            f"ours_raised={ours_raised}"
        )
    layout = spec.layout
    ref_state = mdp.get_standard_start_state()
    my_state = jax.tree.map(
        np.asarray, state_from_dict(ref_state.to_dict(), spec)
    )
    acts = biased_random_actions(spec.num_players, HORIZON, cert_seed(name))
    step_jit = jax.jit(step)
    for t in range(HORIZON):
        a = np.asarray(acts[t], np.int32)
        ref_state, infos = oracle.ref_step(mdp, ref_state, a)
        my_state, info = step_jit(layout, my_state, a)
        my_state, info = jax.device_get((my_state, info))
        if canonical_state_dict(state_to_dict(my_state, spec)) != (
            canonical_state_dict(ref_state.to_dict())
        ):
            return False, f"state diverged at t={t}"
        if not np.array_equal(
            np.asarray(info.sparse_reward),
            np.asarray(infos["sparse_reward_by_agent"]),
        ):
            return False, f"sparse diverged at t={t}"
        if not np.array_equal(
            np.asarray(info.shaped_reward),
            np.asarray(infos["shaped_reward_by_agent"]),
        ):
            return False, f"shaped diverged at t={t}"
        if not np.array_equal(
            np.asarray(info.events),
            oracle.events_matrix(infos["event_infos"], mdp.num_players),
        ):
            return False, f"events diverged at t={t}"
    return True, "ok"


def main():
    import argparse

    global OLD_DYNAMICS
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-dynamics", action="store_true",
                    help="certify under old (auto-cook) dynamics; writes "
                    "certification_49_old.json.gz")
    OLD_DYNAMICS = ap.parse_args().old_dynamics
    names = layout_names()
    certs = {}
    failures = {}
    for i, name in enumerate(names):
        ok, detail = certify_live(name)
        if not ok:
            failures[name] = detail
            print(f"[{i + 1}/{len(names)}] {name}: FAIL ({detail})",
                  flush=True)
            continue
        if detail == "unsupported":
            certs[name] = {"unsupported": True}
            print(f"[{i + 1}/{len(names)}] {name}: unsupported under "
                  "these dynamics (refusal parity verified)", flush=True)
            continue
        _, _, cert = run_ours(name)
        certs[name] = cert
        print(f"[{i + 1}/{len(names)}] {name}: ok "
              f"(sparse {cert['total_sparse']})", flush=True)
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        cert_file() + ".json.gz",
    )
    if failures:
        print(f"\n{len(failures)} layouts DIVERGED: {failures}")
        print("certificate NOT written")
        sys.exit(1)
    with gzip.open(out, "wt") as f:
        json.dump({"horizon": HORIZON, "layouts": certs}, f, indent=0)
    print(f"\nall {len(certs)} layouts certified -> {out}")


if __name__ == "__main__":
    main()
