"""Calibration eval for variable-MDP (from-params) checkpoints.

The from-params production artifact reports sparse reward on the
TRAINING pool; this script answers "is that good?" by evaluating the
checkpoint against yardstick partners on a HELD-OUT generated pool
(fresh LayoutGenerator seed, same generation params as training —
reference evaluates from-params agents on newly generated MDPs the same
way, ppo_rllib_from_params_client.py:124-179 num_mdp=inf):

    ppo+ppo   self-play on unseen layouts (the headline)
    ppo+greedy / greedy+ppo  cross-play vs the scripted model
    greedy+greedy            the scripted-pair yardstick

Usage:
    python scripts/eval_pool.py --ckpt runs/r4_from_params_v2 \
        --pool-size 32 --games 4 --platform cpu
"""

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--outer-shape", default="5,4", help="width,height")
    ap.add_argument("--pool-size", type=int, default=32)
    ap.add_argument("--prop-empty", type=float, default=0.95)
    ap.add_argument("--prop-feats", type=float, default=0.1)
    ap.add_argument("--games", type=int, default=4, help="per pair per layout")
    ap.add_argument("--horizon", type=int, default=400)
    ap.add_argument("--seed", type=int, default=1000,
                    help="generator seed; keep != the training seed so the "
                    "pool is held out (training default is 0)")
    ap.add_argument("--out", default=None, help="write results JSON here")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        from overcooked_ai_tpu.utils.platform import force_platform

        force_platform(args.platform)

    import numpy as np

    from overcooked_ai_tpu.agents.evaluation import run_agent_pair
    from overcooked_ai_tpu.agents.loading import build_agent
    from overcooked_ai_tpu.core.layout_generator import LayoutGenerator
    from overcooked_ai_tpu.planning.tables import build_motion_tables

    w, h = (int(x) for x in args.outer_shape.split(","))
    gen = LayoutGenerator(
        outer_shape=(w, h), prop_empty=args.prop_empty,
        prop_feats=args.prop_feats,
        rng=np.random.RandomState(args.seed),
    )
    specs = [
        gen.generate_spec(name=f"heldout_{i}")
        for i in range(args.pool_size)
    ]
    pairs = ["ppo+ppo", "ppo+greedy", "greedy+ppo", "greedy+greedy"]
    per_layout = {p: [] for p in pairs}
    for i, spec in enumerate(specs):
        tables = build_motion_tables(spec.layout.terrain)
        ppo = build_agent(f"ppo:{args.ckpt}", spec, tables)
        greedy = build_agent("greedy", spec, tables)
        agents = {"ppo": ppo, "greedy": greedy}
        for p in pairs:
            n0, n1 = p.split("+")
            # greedy_carry threads the auto-unstuck memory the scripted
            # model needs; harmless for ppo seats
            traj = run_agent_pair(
                spec, [agents[n0], agents[n1]], num_games=args.games,
                horizon=args.horizon, seed=args.seed + i,
                greedy_carry=True,
            )
            per_layout[p].append(
                float(np.asarray(traj["sparse"]).sum(axis=(0, 1)).mean())
            )
        print(
            f"[{i + 1}/{len(specs)}] " + " ".join(
                f"{p}={per_layout[p][-1]:.0f}" for p in pairs
            ),
            flush=True,
        )
    results = {
        p: {
            "mean": float(np.mean(per_layout[p])),
            "std": float(np.std(per_layout[p])),
            "per_layout": per_layout[p],
        }
        for p in pairs
    }
    summary = {
        "ckpt": args.ckpt,
        "pool": f"{args.pool_size} held-out layouts, seed {args.seed}, "
        f"outer {w}x{h}, prop_empty {args.prop_empty}, "
        f"prop_feats {args.prop_feats}",
        "games_per_pair_per_layout": args.games,
        "horizon": args.horizon,
        "results": {
            p: {k: results[p][k] for k in ("mean", "std")} for p in pairs
        },
    }
    print(json.dumps(summary, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({**summary, "per_layout": per_layout}, f, indent=1)


if __name__ == "__main__":
    main()
