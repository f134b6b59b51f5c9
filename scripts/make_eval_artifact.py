"""Assemble the canonical evaluation artifact (reference
human_aware_rl/ppo/evaluate.py:116-189): the 5-layout pairwise matrix of
{PPO_SP, BC human-proxy, greedy} agents, BOTH seat orders, plus a
small-multiples heatmap and a markdown summary.

Inputs are the checkpoints produced by:
    for L in ...: python scripts/train_ppo.py --layout $L --out runs/eval_artifact/ppo_sp_$L
    python scripts/train_bc_proxy.py --out runs/eval_artifact

Outputs: EVAL_MATRIX.md, eval_matrix_results.json, eval_matrix.png at the
repo root.

    python scripts/make_eval_artifact.py --games 10 --platform cpu
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LAYOUTS = [
    "cramped_room",
    "asymmetric_advantages",
    "coordination_ring",
    "forced_coordination",
    "counter_circuit_o_1order",
]

ART = "runs/eval_artifact"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=10)
    ap.add_argument("--horizon", type=int, default=400)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--layouts", nargs="+", default=LAYOUTS)
    args = ap.parse_args()

    if args.platform:
        from overcooked_ai_tpu.utils.platform import force_platform

        force_platform(args.platform)

    import numpy as np

    from overcooked_ai_tpu.agents.evaluation import run_agent_pair
    from overcooked_ai_tpu.agents.loading import build_agent
    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.planning.tables import build_motion_tables

    results = {}
    for layout_name in args.layouts:
        spec = from_layout_name(layout_name)
        tables = build_motion_tables(spec.layout.terrain)
        kinds = {
            "PPO_SP": f"ppo:{ART}/ppo_sp_{layout_name}",
            "BC": f"bc:{ART}/bc_proxy_{layout_name}",
            "greedy": "greedy",
        }
        agents = {k: build_agent(v, spec, tables) for k, v in kinds.items()}
        lay_res = {}
        for a in kinds:
            for b in kinds:
                traj = run_agent_pair(
                    spec,
                    [agents[a], agents[b]],
                    num_games=args.games,
                    horizon=args.horizon,
                    seed=0,
                    greedy_carry=True,
                )
                per_game = np.asarray(traj["sparse"]).sum(axis=(0, 1))
                lay_res[f"{a}+{b}"] = {
                    "mean": round(float(per_game.mean()), 1),
                    "std": round(float(per_game.std()), 1),
                    "games": int(per_game.shape[0]),
                }
                print(
                    f"{layout_name} {a}+{b}: "
                    f"{lay_res[f'{a}+{b}']['mean']} "
                    f"+- {lay_res[f'{a}+{b}']['std']}",
                    flush=True,
                )
        results[layout_name] = lay_res

    with open("eval_matrix_results.json", "w") as f:
        json.dump(
            {
                "protocol": "reference evaluate.py:116-189 analogue: "
                "mean per-game sparse reward, horizon 400, both seat "
                "orders (A+B and B+A rows)",
                "games_per_pair": args.games,
                "results": results,
            },
            f,
            indent=1,
        )

    _write_markdown(results, args.games)
    _plot(results)
    print("wrote EVAL_MATRIX.md, eval_matrix_results.json, eval_matrix.png")


def _write_markdown(results, games):
    kinds = ["PPO_SP", "BC", "greedy"]
    lines = [
        "# Canonical evaluation matrix",
        "",
        "Mean per-game sparse reward over "
        f"{games} games (horizon 400, seed 0), both seat orders -- the "
        "reference's 5-layout eval protocol "
        "(`human_aware_rl/ppo/evaluate.py:116-189`). Agents: `PPO_SP` = "
        "self-play PPO at the reference production config "
        "(`runs/eval_artifact/ppo_sp_*`, 2500 iters x 12k steps); `BC` = "
        "behavior-cloned greedy human proxy (the reference ships no real "
        "human data; see `scripts/train_bc_proxy.py`); `greedy` = the "
        "scripted GreedyHumanModel. Dynamics: current (the reference "
        "evaluates its legacy 2019 agents with `old_dynamics=True`; both "
        "dynamics are supported and parity-tested here).",
        "",
        "Row = seat 0, column = seat 1 (cell: mean ± std).",
        "",
    ]
    for layout, lay_res in results.items():
        lines.append(f"### {layout}")
        lines.append("")
        lines.append("| seat0 \\ seat1 | " + " | ".join(kinds) + " |")
        lines.append("|---|" + "---|" * len(kinds))
        for a in kinds:
            row = [
                f"{lay_res[f'{a}+{b}']['mean']} ± "
                f"{lay_res[f'{a}+{b}']['std']}"
                for b in kinds
            ]
            lines.append(f"| **{a}** | " + " | ".join(row) + " |")
        lines.append("")
    lines.append("![pairwise matrix heatmaps](eval_matrix.png)")
    lines.append("")
    with open("EVAL_MATRIX.md", "w") as f:
        f.write("\n".join(lines))


def _plot(results):
    """Small-multiples heatmap: magnitude -> ONE sequential hue
    (light->dark), direct value labels in text ink, recessive axes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    kinds = ["PPO_SP", "BC", "greedy"]
    n = len(results)
    fig, axes = plt.subplots(1, n, figsize=(3.1 * n, 3.4))
    if n == 1:
        axes = [axes]
    vmax = max(
        v["mean"] for lay in results.values() for v in lay.values()
    ) or 1.0
    for ax, (layout, lay_res) in zip(axes, results.items()):
        m = np.array(
            [[lay_res[f"{a}+{b}"]["mean"] for b in kinds] for a in kinds]
        )
        ax.imshow(m, cmap="Blues", vmin=0, vmax=vmax)
        for i in range(len(kinds)):
            for j in range(len(kinds)):
                frac = m[i, j] / vmax
                ax.text(
                    j, i, f"{m[i, j]:.0f}",
                    ha="center", va="center", fontsize=11,
                    color="#f0f0f4" if frac > 0.6 else "#26262c",
                )
        ax.set_xticks(range(len(kinds)), kinds, fontsize=8)
        ax.set_yticks(range(len(kinds)), kinds, fontsize=8)
        ax.set_title(layout, fontsize=10)
        ax.set_xlabel("seat 1", fontsize=8, color="#555")
        if ax is axes[0]:
            ax.set_ylabel("seat 0", fontsize=8, color="#555")
        for s in ax.spines.values():
            s.set_visible(False)
    fig.suptitle(
        "Mean sparse reward per game -- pairwise agent matrix", fontsize=12
    )
    fig.tight_layout()
    fig.savefig("eval_matrix.png", dpi=130)


if __name__ == "__main__":
    main()
