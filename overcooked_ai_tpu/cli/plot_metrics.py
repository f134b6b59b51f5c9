"""Plot training curves from a metrics.jsonl run directory (the reference's
plot_graph.py / plot_example_experiments.py equivalent).

Usage:
    python scripts/plot_metrics.py runs/ppo_cramped_room_shaped [more runs]
        [--keys episode_sparse_reward episode_total_reward] [--out curves.png]
"""

import argparse
import json
import os


def load_metrics(run_dir):
    path = (
        run_dir if run_dir.endswith(".jsonl")
        else os.path.join(run_dir, "metrics.jsonl")
    )
    rows = [json.loads(line) for line in open(path)]
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument(
        "--keys", nargs="+",
        default=["episode_sparse_reward", "episode_total_reward"],
    )
    ap.add_argument("--out", default="curves.png")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(
        1, len(args.keys), figsize=(6 * len(args.keys), 4), squeeze=False
    )
    for run in args.runs:
        rows = load_metrics(run)
        steps = [r["step"] for r in rows]
        label = os.path.basename(os.path.normpath(run))
        for j, key in enumerate(args.keys):
            vals = [r.get(key) for r in rows]
            axes[0][j].plot(steps, vals, label=label)
            axes[0][j].set_title(key)
            axes[0][j].set_xlabel("iteration")
    for j in range(len(args.keys)):
        axes[0][j].legend()
        axes[0][j].grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
