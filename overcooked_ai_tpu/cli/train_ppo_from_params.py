"""Variable-MDP PPO training CLI (the reference
ppo_rllib_from_params_client.py equivalent).

Generates a pool of procedural layouts (LayoutGenerator) and trains PPO
self-play over them: every iteration each env lane samples a fresh layout
from the pool -- the vectorized equivalent of the reference's per-reset MDP
regeneration with `num_mdp=inf` (reference
ppo_rllib_from_params_client.py:78-179,232-234).

Examples:
    python scripts/train_ppo_from_params.py --iters 400 --pool-size 64
    python scripts/train_ppo_from_params.py --use-phi --local-testing
"""

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outer-shape", default="5,4", help="width,height")
    ap.add_argument("--pool-size", type=int, default=64)
    ap.add_argument("--prop-empty", type=float, default=0.95)
    ap.add_argument("--prop-feats", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=400)
    # reference from-params config: train_batch 100000, minibatch 25000,
    # lr 5e-3, entropy 0.02 -> 5e-5, shaping horizon 1e6 (:124-179)
    ap.add_argument("--num-envs", type=int, default=250)  # x400 = 100k batch
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument(
        "--shaping-horizon", type=float, default=1e6,
        help="reward-shaping anneal horizon in env steps. The reference's "
        "default (1e6, ppo_rllib_from_params_client.py:270) anneals to "
        "ZERO within 10 iterations at the production batch (100k "
        "steps/iter), leaving only the (still ~0) sparse signal -- its CI "
        "runs never reach 1e6 steps so the trap never fires there. Use "
        "~2e7 (half a 400-iter run) for a from-params run that learns",
    )
    ap.add_argument("--entropy-horizon", type=float, default=3e5)
    ap.add_argument(
        "--entropy-start", type=float, default=0.02,
        help="entropy coefficient start (reference from-params 0.02; the "
        "fixed-layout production recipe's 0.2 -> 0.01 anneal also "
        "trains pool mode well -- see NOTES.md r5)",
    )
    ap.add_argument(
        "--entropy-end", type=float, default=5e-5,
        help="entropy coefficient floor (reference from-params 5e-5)",
    )
    ap.add_argument(
        "--regen-every", type=int, default=0,
        help="regenerate the whole layout pool on the host every N "
        "iterations (0 = fixed pool). N>=1 is the reference's TRUE "
        "num_mdp=inf: no layout ever repeats across the run "
        "(ppo_rllib_from_params_client.py:232-234), which measurably "
        "fixes held-out generalization (fixed pools memorize; see "
        "NOTES.md r5 + runs/r5_pool_eval). Incompatible with --use-phi/"
        "--use-lstm (their pool tables are host-precomputed)",
    )
    ap.add_argument(
        "--fused", choices=["auto", "on", "off"], default="auto",
        help="env side of each training step as one pallas kernel — in "
        "pool mode the dynamic-terrain ops/fused_pool.py kernel "
        "(PPOConfig.fused): auto enables it for 128-lane batches (the "
        "default --num-envs 250 is NOT lane-divisible; use e.g. "
        "--num-envs 256); on forces it (errors if incompatible)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--use-phi", action="store_true")
    ap.add_argument("--use-lstm", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--save-freq", type=int, default=100)
    ap.add_argument("--local-testing", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        from overcooked_ai_tpu.utils.platform import force_platform

        force_platform(args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from overcooked_ai_tpu.core.layout_generator import LayoutGenerator
    from overcooked_ai_tpu.training.checkpoint import (
        MetricsLogger,
        save_checkpoint,
    )
    from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo

    w, h = (int(x) for x in args.outer_shape.split(","))
    gen = LayoutGenerator(
        outer_shape=(w, h),
        prop_empty=args.prop_empty,
        prop_feats=args.prop_feats,
        rng=np.random.RandomState(args.seed),
    )
    specs = [
        gen.generate_spec(name=f"gen_{i}") for i in range(args.pool_size)
    ]
    print(f"generated pool of {len(specs)} {w}x{h} layouts", flush=True)

    fused = {"auto": None, "on": True, "off": False}[args.fused]
    if args.local_testing:
        config = PPOConfig(
            num_envs=6,  # x400 = 2400 (reference CI from-params batch)
            sgd_minibatch_size=800,
            num_sgd_iter=8,
            entropy_coeff_start=args.entropy_start,
            entropy_coeff_end=args.entropy_end,
            entropy_coeff_horizon=args.entropy_horizon,
            lr=args.lr,
            use_phi=args.use_phi,
            reward_shaping_horizon=args.shaping_horizon,
            fused=fused,
        )
    else:
        config = PPOConfig(
            num_envs=args.num_envs,
            sgd_minibatch_size=12500,  # x2 agents = 25000 samples
            entropy_coeff_start=args.entropy_start,
            entropy_coeff_end=args.entropy_end,
            entropy_coeff_horizon=args.entropy_horizon,
            lr=args.lr,
            use_phi=args.use_phi,
            reward_shaping_horizon=args.shaping_horizon,
            fused=fused,
        )

    potential_fn = None
    if args.use_phi:
        from overcooked_ai_tpu.core.potential import make_potential_fn_pool

        potential_fn = make_potential_fn_pool(specs)

    out_dir = args.out or "runs/ppo_from_params"
    os.makedirs(out_dir, exist_ok=True)
    log = MetricsLogger(os.path.join(out_dir, "metrics.jsonl"))

    if args.regen_every:
        assert not args.use_phi and not args.use_lstm, (
            "--regen-every requires plain PPO (phi/lstm pool tables are "
            "precomputed for a fixed pool)"
        )
    if args.use_lstm:
        assert not args.use_phi, "lstm+phi combination not wired yet"
        from overcooked_ai_tpu.training.ppo_lstm import make_ppo_lstm

        init_fn, train_it = make_ppo_lstm(specs, config)
    else:
        init_fn, train_it = make_ppo(specs, config, potential_fn)
    ts = init_fn(jax.random.PRNGKey(args.seed))
    start_iter = 0
    if args.resume:
        from overcooked_ai_tpu.training.checkpoint import restore_checkpoint

        ts, start_iter = restore_checkpoint(out_dir, ts)
        print(f"resumed from step {start_iter}", flush=True)

    t_start = time.time()
    from overcooked_ai_tpu.core.layout_generator import stack_layouts

    fresh_pool = None
    for it in range(start_iter + 1, start_iter + args.iters + 1):
        t0 = time.time()
        if args.regen_every and (it - start_iter - 1) % args.regen_every == 0:
            specs = [
                gen.generate_spec(name=f"gen_{it}_{i}")
                for i in range(args.pool_size)
            ]
            fresh_pool = jax.tree.map(jnp.asarray, stack_layouts(specs))
        ts, m = train_it(ts, fresh_pool) if fresh_pool is not None \
            else train_it(ts)
        m = jax.device_get(m)
        log.log(it, m)
        if it % 10 == 0 or it == 1:
            print(
                f"iter {it}: sparse={float(m.episode_sparse_reward):.1f} "
                f"shaped={float(m.episode_shaped_reward):.1f} "
                f"kl={float(m.kl):.4f} ent={float(m.entropy):.3f} "
                f"({time.time() - t0:.2f}s/iter)",
                flush=True,
            )
        if it % args.save_freq == 0 or it == args.iters:
            save_checkpoint(out_dir, ts, config, step=it)
    print(f"done in {time.time() - t_start:.0f}s -> {out_dir}", flush=True)


if __name__ == "__main__":
    main()
