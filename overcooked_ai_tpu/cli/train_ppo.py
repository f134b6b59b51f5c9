"""PPO training CLI (the reference ppo_rllib_client.py equivalent).

Examples:
    python scripts/train_ppo.py --layout cramped_room --iters 420
    python scripts/train_ppo.py --use-phi --iters 420 --out runs/phi
    python scripts/train_ppo.py --local-testing   # CI-scale smoke

Defaults mirror the reference production config
(reference ppo_rllib_client.py:95-233): 30 envs x 400-step fragments
(train batch 12000), lr 5e-5, entropy 0.2 -> 0.1 over 3e5 steps, 8 SGD
iters, minibatch 2000, use_phi on.
"""

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", default="cramped_room")
    ap.add_argument("--iters", type=int, default=420)
    ap.add_argument(
        "--num-envs", type=int, default=30,
        help="parallel envs (reference: 30 workers x 400 = batch 12000). "
        "Multiples of 128 auto-enable the fused pallas rollout kernel "
        "(~5x the env-side throughput; see --fused)",
    )
    ap.add_argument(
        "--fused", choices=["auto", "on", "off"], default="auto",
        help="env side of each training step as one pallas kernel "
        "(PPOConfig.fused): auto enables it for 128-lane batches; "
        "on forces it (errors if the batch is incompatible)",
    )
    ap.add_argument(
        "--lr", type=float, default=None,
        help="learning rate; defaults to the reference's 5e-5, EXCEPT with "
        "--use-phi where the default is 5e-4: the reference's own "
        "phi + lr 5e-5 combination never lifts off at production scale "
        "(sparse reward 0.0 after 30M steps; see PHI_STUDY.md), while "
        "5e-4 demonstrably trains",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--entropy-end", type=float, default=None,
        help="entropy coefficient floor (reference entropy_coeff_end=0.1; "
        "the reference schedule leaves the converged policy at ~1.57 nats "
        "of 1.79 max -- near-random. Lower floors (e.g. 0.01) let the "
        "policy commit and lift eval scores well past the scripted pair)",
    )
    ap.add_argument(
        "--entropy-horizon", type=float, default=None,
        help="entropy anneal horizon in env steps (reference 3e5)",
    )
    ap.add_argument(
        "--shaping-horizon", type=float, default=None,
        help="linear reward-shaping-factor anneal horizon in env steps "
        "(reference reward_shaping_horizon, default inf = no anneal)",
    )
    ap.add_argument(
        "--sgd-minibatch", type=int, default=None,
        help="SGD minibatch size in env steps (reference "
        "sgd_minibatch_size=2000). Scale with --num-envs to keep the "
        "SGD-step count per iteration constant at large batch",
    )
    ap.add_argument(
        "--num-sgd-iter", type=int, default=None,
        help="SGD epochs per iteration (reference num_sgd_iter=8)",
    )
    ap.add_argument("--use-phi", action="store_true")
    ap.add_argument(
        "--phi-event-mix", action="store_true",
        help="with --use-phi: dense reward = delta-phi + event shaping "
        "(the working production phi recipe; pure delta-phi is dead at "
        "every lr tested, see PHI_STUDY.md)",
    )
    ap.add_argument("--use-lstm", action="store_true")
    ap.add_argument("--old-dynamics", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--save-freq", type=int, default=100)
    ap.add_argument("--local-testing", action="store_true")
    ap.add_argument(
        "--bc-model", default=None,
        help="dir of a saved BC model to use as the partner policy",
    )
    ap.add_argument(
        "--bc-schedule", default=None,
        help="piecewise-linear bc_factor schedule as 't:v,t:v,...' "
        "(reference bc_schedule, e.g. '0:0,8e6:1'); requires --bc-model",
    )
    ap.add_argument(
        "--resume", action="store_true",
        help="resume from the latest checkpoint in --out",
    )
    ap.add_argument("--platform", default=None, help="cpu to force local CPU")
    ap.add_argument(
        "--eval-interval", type=int, default=0,
        help="every N iters, run shaping-free eval games and log "
        "eval_sparse_reward (reference evaluation_interval + custom eval)",
    )
    ap.add_argument("--eval-games", type=int, default=8)
    ap.add_argument(
        "--target-eval", type=float, default=None,
        help="speedrun mode: stop as soon as eval_sparse_reward reaches "
        "this value, checkpoint, and report wall-clock (total and "
        "post-compile). Requires --eval-interval",
    )
    args = ap.parse_args()
    if args.target_eval is not None:
        assert args.eval_interval, "--target-eval requires --eval-interval"

    if args.lr is None:
        args.lr = 5e-4 if args.use_phi else 5e-5  # see --lr help

    if args.platform:
        from overcooked_ai_tpu.utils.platform import force_platform

        force_platform(args.platform)

    import jax

    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.training.checkpoint import (
        MetricsLogger,
        save_checkpoint,
    )
    from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo

    overrides = {"old_dynamics": True} if args.old_dynamics else {}
    spec = from_layout_name(args.layout, **overrides)

    bc_schedule = ((0, 0.0), (float("inf"), 0.0))
    if args.bc_schedule:
        pts = []
        for part in args.bc_schedule.split(","):
            t, v = part.split(":")
            pts.append((float(t), float(v)))
        pts.append((float("inf"), pts[-1][1]))
        bc_schedule = tuple(pts)
        assert args.bc_model, "--bc-schedule requires --bc-model"

    fused = {"auto": None, "on": True, "off": False}[args.fused]
    sched = {}
    if args.entropy_end is not None:
        sched["entropy_coeff_end"] = args.entropy_end
    if args.entropy_horizon is not None:
        sched["entropy_coeff_horizon"] = args.entropy_horizon
    if args.shaping_horizon is not None:
        sched["reward_shaping_horizon"] = args.shaping_horizon
    if args.phi_event_mix:
        sched["phi_event_mix"] = True
    if args.sgd_minibatch is not None:
        sched["sgd_minibatch_size"] = args.sgd_minibatch
    if args.num_sgd_iter is not None:
        sched["num_sgd_iter"] = args.num_sgd_iter
    if args.local_testing:
        config = PPOConfig(
            num_envs=2,
            sgd_minibatch_size=sched.pop("sgd_minibatch_size", 800),
            num_sgd_iter=sched.pop("num_sgd_iter", 8),
            entropy_coeff_start=0.0,
            entropy_coeff_end=0.0,
            lr=args.lr,
            use_phi=args.use_phi,
            bc_schedule=bc_schedule,
            fused=fused,
            **sched,
        )
    else:
        config = PPOConfig(
            num_envs=args.num_envs,
            lr=args.lr,
            use_phi=args.use_phi,
            bc_schedule=bc_schedule,
            fused=fused,
            **sched,
        )

    bc_policy = None
    if args.bc_model:
        from overcooked_ai_tpu.planning.tables import build_motion_tables
        from overcooked_ai_tpu.training.bc import bc_policy_batch, load_bc_model

        bc_params, bc_cfg = load_bc_model(args.bc_model)
        tables = build_motion_tables(spec.layout.terrain)
        bc_policy = bc_policy_batch(spec, tables.feature_cost, bc_params, bc_cfg)

    potential_fn = None
    if args.use_phi:
        from overcooked_ai_tpu.core.potential import make_potential_fn
        from overcooked_ai_tpu.planning.tables import build_motion_tables

        tables = build_motion_tables(spec.layout.terrain)
        potential_fn = make_potential_fn(spec, tables.feature_cost)

    out_dir = args.out or f"runs/ppo_{args.layout}_{'phi' if args.use_phi else 'shaped'}"
    os.makedirs(out_dir, exist_ok=True)
    log = MetricsLogger(os.path.join(out_dir, "metrics.jsonl"))

    if args.use_lstm:
        from overcooked_ai_tpu.training.ppo_lstm import make_ppo_lstm

        init_fn, train_it = make_ppo_lstm(
            spec, config, bc_policy=bc_policy, potential_fn=potential_fn
        )
    else:
        init_fn, train_it = make_ppo(
            spec, config, potential_fn, bc_policy=bc_policy
        )
    ts = init_fn(jax.random.PRNGKey(args.seed))
    start_iter = 0
    if args.resume:
        from overcooked_ai_tpu.training.checkpoint import restore_checkpoint

        ts, start_iter = restore_checkpoint(out_dir, ts)
        print(f"resumed from step {start_iter}", flush=True)
    print(
        f"training {args.layout} ({'phi' if args.use_phi else 'shaped'}) "
        f"for {args.iters} iters x {config.train_batch_size} env steps",
        flush=True,
    )
    eval_fn = None
    if args.eval_interval:
        if args.use_lstm:
            from overcooked_ai_tpu.training.ppo_lstm import make_ppo_lstm_eval

            eval_fn = make_ppo_lstm_eval(
                spec, config.net, num_games=args.eval_games
            )
        else:
            from overcooked_ai_tpu.training.ppo import make_ppo_eval

            eval_fn = make_ppo_eval(
                spec, config.net, num_games=args.eval_games,
                bc_policy=bc_policy,
            )

    t_start = time.time()
    t_post_compile = None  # set after iter 1 (first call pays the compile)
    for it in range(start_iter + 1, start_iter + args.iters + 1):
        t0 = time.time()
        ts, m = train_it(ts)
        m = jax.device_get(m)
        log.log(it, m)
        if t_post_compile is None:
            t_post_compile = time.time()
            log.log(it, {"compile_s": round(t_post_compile - t_start, 2)})
        if eval_fn and it % args.eval_interval == 0:
            ev = float(eval_fn(ts.params, jax.random.PRNGKey(it)))
            log.log(it, {
                "eval_sparse_reward": ev,
                "elapsed_s": round(time.time() - t_start, 2),
                "train_s": round(time.time() - t_post_compile, 2),
            })
            print(
                f"iter {it}: eval_sparse={ev:.1f} "
                f"({time.time() - t_start:.0f}s total, "
                f"{time.time() - t_post_compile:.0f}s post-compile)",
                flush=True,
            )
            if args.target_eval is not None and ev >= args.target_eval:
                save_checkpoint(out_dir, ts, config, step=it,
                                extra={"use_lstm": args.use_lstm,
                                       "layout": args.layout})
                log.log(it, {
                    "speedrun_target": args.target_eval,
                    "speedrun_reached": ev,
                    "speedrun_total_s": round(time.time() - t_start, 2),
                    "speedrun_train_s": round(
                        time.time() - t_post_compile, 2),
                    "speedrun_env_steps": it * config.train_batch_size,
                })
                print(
                    f"SPEEDRUN: eval {ev:.1f} >= {args.target_eval} at "
                    f"iter {it} ({it * config.train_batch_size} env steps) "
                    f"in {time.time() - t_start:.1f}s total / "
                    f"{time.time() - t_post_compile:.1f}s post-compile",
                    flush=True,
                )
                return
        if it % 10 == 0 or it == 1:
            print(
                f"iter {it}: sparse={float(m.episode_sparse_reward):.1f} "
                f"shaped={float(m.episode_shaped_reward):.1f} "
                f"kl={float(m.kl):.4f} ent={float(m.entropy):.3f} "
                f"({time.time() - t0:.2f}s/iter, "
                f"{time.time() - t_start:.0f}s total)",
                flush=True,
            )
        if it % args.save_freq == 0 or it == args.iters:
            save_checkpoint(out_dir, ts, config, step=it,
                            extra={"use_lstm": args.use_lstm,
                                   "layout": args.layout})
    print(f"done in {time.time() - t_start:.0f}s -> {out_dir}", flush=True)


if __name__ == "__main__":
    main()
