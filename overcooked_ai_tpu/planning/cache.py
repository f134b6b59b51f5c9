"""Disk cache for planner tables (reference `data/planners/<layout>_mp.pkl`
with staleness fallback, planners.py:79-137,1136-1202).

The reference pickles whole planner objects keyed by layout name and
recomputes when the pickle predates the layout file. Here the tables are
plain arrays, so the cache is an `.npz` keyed by a HASH of everything the
build depends on (terrain bytes + counter_goals) -- staleness detection
by construction rather than by mtime comparison.

    from overcooked_ai_tpu.planning.cache import cached_motion_tables
    tables = cached_motion_tables(spec.layout.terrain)           # builds once
    tables = cached_motion_tables(spec.layout.terrain)           # loads .npz

Default cache dir: `<package>/data/planners` (reference location);
override with OVERCOOKED_PLANNER_CACHE or the cache_dir argument.
force_compute=True mirrors the reference's `force_compute` flag.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from overcooked_ai_tpu.planning.tables import MotionTables, build_motion_tables

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "data", "planners"
)


def _cache_dir(cache_dir=None):
    return (
        cache_dir
        or os.environ.get("OVERCOOKED_PLANNER_CACHE")
        or _DEFAULT_DIR
    )


def _key(terrain: np.ndarray, counter_goals) -> str:
    h = hashlib.sha1()
    t = np.ascontiguousarray(np.asarray(terrain, np.int32))
    h.update(t.shape[0].to_bytes(4, "little"))
    h.update(t.shape[1].to_bytes(4, "little"))
    h.update(t.tobytes())
    for x, y in sorted(tuple(p) for p in counter_goals):
        h.update(int(x).to_bytes(2, "little"))
        h.update(int(y).to_bytes(2, "little"))
    return h.hexdigest()[:16]


def cached_motion_tables(
    terrain,
    counter_goals=(),
    cache_dir=None,
    force_compute: bool = False,
) -> MotionTables:
    """`build_motion_tables` behind an .npz disk cache.

    A corrupt/unreadable cache file falls back to recompute-and-rewrite,
    like the reference's stale-pickle fallback.
    """
    d = _cache_dir(cache_dir)
    path = os.path.join(d, f"mt_{_key(terrain, counter_goals)}.npz")
    if not force_compute and os.path.exists(path):
        try:
            with np.load(path) as z:
                return MotionTables(
                    feature_cost=z["feature_cost"],
                    point_dist=z["point_dist"],
                )
        except Exception:  # noqa: BLE001 - stale/corrupt: recompute
            pass
    tables = build_motion_tables(np.asarray(terrain), counter_goals)
    os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file handle: savez won't append .npz
        np.savez_compressed(
            f,
            feature_cost=tables.feature_cost,
            point_dist=tables.point_dist,
        )
    os.replace(tmp, path)
    return tables
