"""Pairwise agent evaluation matrix (reference ppo/evaluate.py:28-189).

Evaluates pairs from {ppo:<ckpt_dir>, bc:<model_dir>, greedy, random, stay}
on a list of layouts, in both seat orders, for N games each; prints a JSON
results table and writes it to --out.

Example:
    python scripts/eval_matrix.py --layouts cramped_room \
        --agents greedy random --games 8 --platform cpu
"""

import argparse
import itertools
import json
import os



def build_agent(kind, spec, tables):
    """Thin wrapper over the package loader (agents/loading.py)."""
    from overcooked_ai_tpu.agents.loading import build_agent as _build

    return _build(kind, spec, tables)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layouts", nargs="+", default=["cramped_room"])
    ap.add_argument(
        "--agents",
        nargs="+",
        default=["greedy", "random"],
        help="agent kinds: greedy | random | stay | bc:<dir> | ppo:<dir>",
    )
    ap.add_argument("--games", type=int, default=4)
    ap.add_argument("--horizon", type=int, default=400)
    ap.add_argument("--out", default="eval_matrix.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        from overcooked_ai_tpu.utils.platform import force_platform

        force_platform(args.platform)

    from overcooked_ai_tpu.agents.evaluation import run_agent_pair
    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.planning.tables import build_motion_tables

    results = {}
    for layout_name in args.layouts:
        spec = from_layout_name(layout_name)
        tables = build_motion_tables(spec.layout.terrain)
        agents = {}
        for kind in args.agents:
            try:
                agents[kind] = build_agent(kind, spec, tables)
            except AssertionError as e:
                print(f"skip {kind} on {layout_name}: {e}")
        for a, b in itertools.product(agents, repeat=2):
            traj = run_agent_pair(
                spec,
                [agents[a], agents[b]],
                num_games=args.games,
                horizon=args.horizon,
            )
            returns = traj["sparse"].sum(axis=(0, 1))
            key = f"{layout_name}:{a}+{b}"
            results[key] = {
                "mean": float(returns.mean()),
                "std": float(returns.std()),
                "games": args.games,
            }
            print(f"{key}: {returns.mean():.1f} +- {returns.std():.1f}")
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
