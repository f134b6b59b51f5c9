"""Seed-variance study of phi-shaped PPO at the reference's own CI scale.

The reference cannot run here (its rllib/sacred stack is not installed),
so this replicates its exact CI hyperparameters in the JAX learner
(reference ppo_rllib_test.py:203-225: train batch 1600 = 4 envs x 400,
sgd minibatch 800, 30 iters, entropy 0, lr 5e-3 -- note the reference
itself overrides lr to 100x its production default for the phi test) and
adds the production-default combination (phi + lr 5e-5) at the same scale
as direct evidence for the "dead config" diagnosis (NOTES.md, VERDICT r2
weak #1). Results are written to runs/phi_study/results.json and
summarized in PHI_STUDY.md.

    python scripts/phi_study.py [--seeds 5] [--out runs/phi_study]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", default="runs/phi_study")
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--only", nargs="*", default=None,
        help="run only these config names (results.json is merged, so "
        "interrupted studies resume per-config)",
    )
    args = ap.parse_args()

    if args.platform:
        from overcooked_ai_tpu.utils.platform import force_platform

        force_platform(args.platform)

    import numpy as np

    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.core.potential import make_potential_fn
    from overcooked_ai_tpu.planning.tables import build_motion_tables
    from overcooked_ai_tpu.training.ppo import PPOConfig, train

    spec = from_layout_name("cramped_room")
    tables = build_motion_tables(spec.layout.terrain)
    phi = make_potential_fn(spec, tables.feature_cost)

    def ci_cfg(use_phi, lr, num_envs):
        # reference CI shapes: batch = num_envs x 400
        return PPOConfig(
            num_envs=num_envs,
            horizon=400,
            sgd_minibatch_size=800,
            num_sgd_iter=8,
            entropy_coeff_start=0.0,
            entropy_coeff_end=0.0,
            lr=lr,
            use_phi=use_phi,
        )

    # (name, cfg, reference threshold on average_total_reward, source)
    configs = [
        (
            "phi_ci_lr5e-3",
            ci_cfg(True, 5e-3, 4),
            13.0,
            "ppo_rllib_test.py:203-225 (the reference's own phi CI config)",
        ),
        (
            "phi_prod_lr5e-5",
            ci_cfg(True, 5e-5, 4),
            None,
            "phi + the production default lr (ppo_rllib_client.py:126) "
            "at CI scale -- the dead-config check",
        ),
        (
            "nophi_ci",
            ci_cfg(False, 5e-3, 2),
            5.0,
            "ppo_rllib_test.py:172-194 shape (batch 800); lr 5e-3 as in "
            "tests/test_ppo.py (see PHI_STUDY.md note on worker semantics)",
        ),
    ]

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    results = {}
    if (out / "results.json").exists():  # merge across interrupted runs
        results = json.loads((out / "results.json").read_text())
    for name, cfg, threshold, source in configs:
        if args.only is not None and name not in args.only:
            continue
        rows = []
        for seed in range(args.seeds):
            t0 = time.time()
            pot = phi if cfg.use_phi else None
            ts, hist = train(spec, cfg, num_iterations=30, seed=seed,
                             potential_fn=pot)
            total = float(np.mean(
                [float(m.episode_total_reward) for m in hist[-5:]]
            ))
            sparse = float(np.mean(
                [float(m.episode_sparse_reward) for m in hist[-5:]]
            ))
            curve = [round(float(m.episode_total_reward), 2) for m in hist]
            rows.append(
                {
                    "seed": seed,
                    "avg_total_reward_last5": round(total, 2),
                    "avg_sparse_last5": round(sparse, 2),
                    "curve_total_reward": curve,
                    "wall_s": round(time.time() - t0, 1),
                }
            )
            print(f"{name} seed={seed}: total={total:.1f} sparse={sparse:.1f} "
                  f"({rows[-1]['wall_s']}s)", flush=True)
        vals = [r["avg_total_reward_last5"] for r in rows]
        results[name] = {
            "source": source,
            "reference_threshold": threshold,
            "config": {
                "num_envs": cfg.num_envs,
                "horizon": cfg.horizon,
                "lr": cfg.lr,
                "use_phi": cfg.use_phi,
                "sgd_minibatch_size": cfg.sgd_minibatch_size,
                "num_sgd_iter": cfg.num_sgd_iter,
            },
            "seeds": rows,
            "mean": round(float(np.mean(vals)), 2),
            "std": round(float(np.std(vals)), 2),
            "min": round(float(np.min(vals)), 2),
            "max": round(float(np.max(vals)), 2),
        }
        (out / "results.json").write_text(json.dumps(results, indent=1))

    print(json.dumps(
        {k: {kk: v[kk] for kk in ("mean", "std", "min", "max",
                                  "reference_threshold")}
         for k, v in results.items()},
        indent=1,
    ))


if __name__ == "__main__":
    main()
