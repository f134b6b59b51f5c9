"""Loader for the committed golden parity fixtures (tests/golden/*.json.gz).

Regenerate with `python scripts/gen_golden_fixtures.py` (needs the
reference mounted at /root/reference) — the recompute escape hatch,
mirroring reference testing/overcooked_test.py:468-525.
"""

import glob
import gzip
import json
import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def jsonify(x):
    """Normalize tuples/ints so dicts compare equal across a JSON trip."""
    return json.loads(json.dumps(x))


def load(name: str) -> dict:
    path = os.path.join(GOLDEN_DIR, f"{name}.json.gz")
    with gzip.open(path, "rt") as f:
        return json.load(f)


def dynamics_names():
    return sorted(
        os.path.basename(p)[len("dynamics_"):-len(".json.gz")]
        for p in glob.glob(os.path.join(GOLDEN_DIR, "dynamics_*.json.gz"))
    )


def unpack_events(masks, num_events) -> np.ndarray:
    """Per-player int bitmasks -> (num_events, P) bool."""
    m = np.asarray(masks, np.int64)  # (P,)
    bits = (m[None, :] >> np.arange(num_events)[:, None]) & 1
    return bits.astype(bool)
