"""Assemble the canonical evaluation artifact (reference
human_aware_rl/ppo/evaluate.py:100-189): the 5-layout pairwise matrix of
{PPO_SP, PPO_BC, BC human-proxy, greedy} agents, BOTH seat orders, plus a
small-multiples heatmap and a markdown summary. The PPO_BC column is the
reference protocol's headline pairing: PPO trained WITH a BC partner,
paired against BC at test time (evaluate.py:100-123).

Inputs are the checkpoints produced by:
    for L in ...: python scripts/train_ppo.py --layout $L --out <art>/ppo_sp_$L
    for L in ...: python scripts/train_ppo.py --layout $L \
        --bc-model <art>/bc_proxy_$L --bc-schedule 0:0,4e6:1 \
        --out <art>/ppo_bc_$L
    python scripts/train_bc_proxy.py --out <art>

Outputs (new dynamics): EVAL_MATRIX.md, eval_matrix_results.json,
eval_matrix.png at the repo root. With --old-dynamics (the reference's
published protocol evaluates with old_dynamics=True, evaluate.py:105):
EVAL_MATRIX_OLD_DYNAMICS.md etc., reading checkpoints trained with
--old-dynamics.

    python scripts/make_eval_artifact.py --games 10 --platform cpu
    python scripts/make_eval_artifact.py --games 10 --old-dynamics \
        --art-dir runs/eval_artifact_old
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

KINDS = ["PPO_SP", "PPO_BC", "BC", "greedy"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=10)
    ap.add_argument("--horizon", type=int, default=400)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--layouts", nargs="+", default=LAYOUTS)
    ap.add_argument("--art-dir", default="runs/eval_artifact")
    ap.add_argument("--old-dynamics", action="store_true")
    ap.add_argument(
        "--suffix", default=None,
        help="output-file suffix; default '' or '_OLD_DYNAMICS'",
    )
    ap.add_argument(
        "--render-only", action="store_true",
        help="skip evaluation; rewrite the markdown + heatmap from the "
        "existing results JSON",
    )
    ap.add_argument(
        "--merge", action="store_true",
        help="re-evaluate only --layouts and merge into the existing "
        "results JSON (other layouts' cells kept; same seeds => they "
        "would reproduce identically)",
    )
    args = ap.parse_args()

    if args.platform:
        from overcooked_ai_tpu.utils.platform import force_platform

        force_platform(args.platform)

    suffix = args.suffix
    if suffix is None:
        suffix = "_OLD_DYNAMICS" if args.old_dynamics else ""

    import numpy as np

    from overcooked_ai_tpu.agents.evaluation import run_agent_pair
    from overcooked_ai_tpu.agents.loading import build_agent
    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.planning.tables import build_motion_tables

    overrides = {"old_dynamics": True} if args.old_dynamics else {}
    art = args.art_dir
    if args.render_only:
        with open(f"eval_matrix_results{suffix.lower()}.json") as f:
            results = json.load(f)["results"]
        _write_markdown(results, args.games, suffix, args.old_dynamics, art)
        _plot(results, suffix)
        print(f"re-rendered EVAL_MATRIX{suffix}.md + heatmap")
        return
    results = {}
    for layout_name in args.layouts:
        spec = from_layout_name(layout_name, **overrides)
        tables = build_motion_tables(spec.layout.terrain)
        kinds = {
            "PPO_SP": f"ppo:{art}/ppo_sp_{layout_name}",
            "PPO_BC": f"ppo:{art}/ppo_bc_{layout_name}",
            "BC": f"bc:{art}/bc_proxy_{layout_name}",
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

    if args.merge:
        with open(f"eval_matrix_results{suffix.lower()}.json") as f:
            prev = json.load(f)["results"]
        prev.update(results)
        # keep canonical layout order
        results = {
            k: prev[k]
            for k in list(LAYOUTS) + [x for x in prev if x not in LAYOUTS]
            if k in prev
        }

    with open(f"eval_matrix_results{suffix.lower()}.json", "w") as f:
        json.dump(
            {
                "protocol": "reference evaluate.py:100-189 analogue: "
                "mean per-game sparse reward, horizon 400, both seat "
                "orders (A+B and B+A rows)",
                "dynamics": "old" if args.old_dynamics else "new",
                "games_per_pair": args.games,
                "results": results,
            },
            f,
            indent=1,
        )

    _write_markdown(results, args.games, suffix, args.old_dynamics, art)
    _plot(results, suffix)
    print(
        f"wrote EVAL_MATRIX{suffix}.md, "
        f"eval_matrix_results{suffix.lower()}.json, "
        f"eval_matrix{suffix.lower()}.png"
    )


def _write_markdown(results, games, suffix, old_dynamics, art):
    dyn = (
        "old (auto-cook) dynamics -- the reference's published protocol "
        "(`evaluate.py:105` sets `old_dynamics=True`)"
        if old_dynamics
        else "current dynamics (explicit INTERACT starts cooking)"
    )
    lines = [
        f"# Canonical evaluation matrix{' (old dynamics)' if old_dynamics else ''}",
        "",
        "Mean per-game sparse reward over "
        f"{games} games (horizon 400, seed 0), both seat orders -- the "
        "reference's 5-layout eval protocol "
        "(`human_aware_rl/ppo/evaluate.py:100-189`). Agents: `PPO_SP` = "
        "self-play PPO at the reference production config with the "
        "entropy floor annealed to 0.01; `PPO_BC` = PPO trained with the "
        "BC proxy as partner (bc_factor 0 -> 1 over 4M steps, the "
        "reference protocol's headline human-aware agent); `BC` = "
        "behavior-cloned human proxy fit to mixed-partner greedy "
        "demonstrations — except on forced_coordination, whose proxy "
        "clones the trained PPO_SP pair (`train_bc_proxy --from-ppo`) "
        "because the greedy lineage cannot do the counter hand-offs "
        "that layout requires (the reference ships no real human data; "
        "see `scripts/train_bc_proxy.py`); `greedy` = the scripted "
        f"GreedyHumanModel. Checkpoints: `{art}`. Dynamics: {dyn}.",
        "",
        "Row = seat 0, column = seat 1 (cell: mean ± std).",
        "",
        "> **Self-pair pathology note:** PPO_BC×PPO_BC cells can hit an "
        "exact 0.0 on layouts where training against the BC partner let "
        "the policy delegate one pipeline role entirely (traced: on "
        "coordination_ring neither copy ever issues the cook-start "
        "interact — the pot sits full for 300+ steps while both wander "
        "holding onions; on counter_circuit neither copy pots). This is "
        "role specialization, not a positional freeze — the agents keep "
        "moving, so the reference's auto-unstuck (agent.py:366-404) "
        "would not change it. Diagnosis + traces: NOTES.md "
        "'PPO_BC self-pair zeros'.",
        "",
    ]
    for layout, lay_res in results.items():
        lines.append(f"### {layout}")
        lines.append("")
        lines.append("| seat0 \\ seat1 | " + " | ".join(KINDS) + " |")
        lines.append("|---|" + "---|" * len(KINDS))
        for a in KINDS:
            row = [
                f"{lay_res[f'{a}+{b}']['mean']} ± "
                f"{lay_res[f'{a}+{b}']['std']}"
                for b in KINDS
            ]
            lines.append(f"| **{a}** | " + " | ".join(row) + " |")
        lines.append("")
    lines.append(
        f"![pairwise matrix heatmaps](eval_matrix{suffix.lower()}.png)"
    )
    lines.append("")
    with open(f"EVAL_MATRIX{suffix}.md", "w") as f:
        f.write("\n".join(lines))


def _plot(results, suffix):
    """Small-multiples heatmap: magnitude -> ONE sequential hue
    (light->dark), direct value labels in text ink, recessive axes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    n = len(results)
    fig, axes = plt.subplots(1, n, figsize=(3.4 * n, 3.8))
    if n == 1:
        axes = [axes]
    vmax = max(
        v["mean"] for lay in results.values() for v in lay.values()
    ) or 1.0
    for ax, (layout, lay_res) in zip(axes, results.items()):
        m = np.array(
            [[lay_res[f"{a}+{b}"]["mean"] for b in KINDS] for a in KINDS]
        )
        ax.imshow(m, cmap="Blues", vmin=0, vmax=vmax)
        for i in range(len(KINDS)):
            for j in range(len(KINDS)):
                frac = m[i, j] / vmax
                ax.text(
                    j, i, f"{m[i, j]:.0f}",
                    ha="center", va="center", fontsize=10,
                    color="#f0f0f4" if frac > 0.6 else "#26262c",
                )
        ax.set_xticks(range(len(KINDS)), KINDS, fontsize=7)
        ax.set_yticks(range(len(KINDS)), KINDS, fontsize=7)
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
    fig.savefig(f"eval_matrix{suffix.lower()}.png", dpi=130)


if __name__ == "__main__":
    main()
