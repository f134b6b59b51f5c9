"""Dynamics certification across ALL 49 shipped layouts.

The reference treats every file in data/layouts/ as playable under its
MDP (reference overcooked_mdp.py:2063-2115 validation + data/layouts/,
49 files). scripts/certify_layouts.py drove 400 biased-random steps per
layout through BOTH the live reference and our jitted step with exact
per-step parity (state dicts, rewards, all 25 event channels) and froze
a compact certificate per layout (final-state sha256 + reward/event
totals) into tests/golden/certification_49.json.gz.

This hermetic test replays the same seeded streams through OUR step
alone and checks every certificate, so the 49-layout guarantee holds
without the oracle mount. The live-oracle sweep itself can be re-run
any time with the generator (it refuses to write on any divergence).
"""

import os
import sys

import pytest

from overcooked_ai_tpu.core.layout import from_layout_name  # noqa: F401

from . import golden_io

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import certify_layouts  # noqa: E402


def _cert():
    return golden_io.load("certification_49")["layouts"]


def test_certificate_covers_every_layout_file():
    """Every shipped layout json has a certificate (and vice versa)."""
    assert sorted(_cert()) == certify_layouts.layout_names()


@pytest.mark.parametrize("name", sorted(certify_layouts.layout_names()))
def test_layout_certified(name):
    cert = _cert()[name]
    _, _, got = certify_layouts.run_ours(name)
    assert got == cert, (
        f"{name}: dynamics drifted from the oracle-certified replay\n"
        f"got:  {got}\nwant: {cert}"
    )


@pytest.mark.skipif(
    not os.environ.get("OVERCOOKED_SLOW_TESTS"),
    reason="old-dynamics certification sweep is SLOW-gated (adds ~35 s "
    "serial; the new-dynamics sweep above runs in the default suite)",
)
@pytest.mark.parametrize("name", sorted(certify_layouts.layout_names()))
def test_layout_certified_old_dynamics(name):
    """Same 49-layout certificate under old (auto-cook) dynamics
    (certification_49_old.json.gz, generated with
    certify_layouts.py --old-dynamics)."""
    cert = golden_io.load("certification_49_old")["layouts"][name]
    prev = certify_layouts.OLD_DYNAMICS
    certify_layouts.OLD_DYNAMICS = True
    try:
        if cert.get("unsupported"):
            # refusal parity: old dynamics only accepts 3-item orders
            # (reference overcooked_mdp.py:1121-1127); the reference
            # refused this layout too (verified at generation time)
            with pytest.raises(AssertionError):
                from_layout_name(name, old_dynamics=True)
            return
        _, _, got = certify_layouts.run_ours(name)
    finally:
        certify_layouts.OLD_DYNAMICS = prev
    assert got == cert, (
        f"{name} (old dynamics): drifted from the oracle-certified "
        f"replay\ngot:  {got}\nwant: {cert}"
    )
