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
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_agent(kind, spec, tables):
    import jax
    import jax.numpy as jnp

    from overcooked_ai_tpu.agents.agents import (
        GreedyTables,
        make_greedy_human_model,
        random_agent,
        stay_agent,
    )
    from overcooked_ai_tpu.agents.evaluation import AgentFn, stateless

    if kind == "greedy":
        from overcooked_ai_tpu.planning.greedy_tables import (
            build_first_action_table,
        )

        fa = build_first_action_table(spec.layout.terrain)
        greedy = make_greedy_human_model(
            spec,
            GreedyTables(jnp.asarray(tables.feature_cost), jnp.asarray(fa)),
        )
        return AgentFn(
            policy=lambda k, l, s, i, c: (greedy(k, l, s, i, c), c)
        )
    if kind == "random":
        return stateless(random_agent)
    if kind == "stay":
        return stateless(stay_agent)
    if kind.startswith("bc:"):
        from overcooked_ai_tpu.training.bc import bc_policy_fn, load_bc_model

        params, cfg = load_bc_model(kind[3:])
        return stateless(
            bc_policy_fn(spec, tables.feature_cost, params, cfg)
        )
    if kind.startswith("ppo:"):
        from overcooked_ai_tpu.core.encoding import lossless_encode
        from overcooked_ai_tpu.training.checkpoint import restore_checkpoint
        from overcooked_ai_tpu.training.networks import PPONet
        from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo

        ckpt_dir = kind[4:]
        with open(os.path.join(ckpt_dir, "config.json")) as f:
            saved = json.load(f)["config"]
        from overcooked_ai_tpu.training.networks import NetConfig

        net_cfg = NetConfig(**saved["net"])
        cfg = PPOConfig(
            num_envs=2, net=net_cfg
        )  # only the net matters for inference
        init_fn, _ = make_ppo(spec, cfg)
        import jax.random

        ts, _ = restore_checkpoint(ckpt_dir, init_fn(jax.random.PRNGKey(0)))
        net = PPONet(net_cfg)

        def policy(key, layout, state, idx):
            obs = lossless_encode(layout, state)  # (P, 26, H, W)
            x = jnp.transpose(obs[idx], (1, 2, 0))[None]
            logits, _ = net.apply(ts.params, x)
            return jax.random.categorical(key, logits[0]).astype(jnp.int32)

        return stateless(policy)
    raise ValueError(f"unknown agent kind {kind}")


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
