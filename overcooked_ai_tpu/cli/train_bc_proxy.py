"""Train behavior-cloning "human proxy" models on scripted rollouts.

The reference's canonical eval protocol pairs PPO agents with BC models
trained on human data (human_aware_rl/ppo/evaluate.py:116-189), but the
reference repo ships only dummy CSVs (static/human_data/README.md) -- the
real 2019/2020 datasets are a separate download. The committed stand-in,
here as there, is a BC model fit to the greedy human model's behavior
(reference GreedyHumanModel, planners-based scripted agent).

    python scripts/train_bc_proxy.py --layouts cramped_room ... \
        --out runs/eval_artifact --platform cpu
"""

import argparse
import os



def train_proxy(layout_name, out_dir, num_games, horizon, epochs, seed,
                epsilon=0.1, old_dynamics=False, from_ppo=None):
    """Fit a BC clone on MIXED-PARTNER greedy demonstrations.

    A clone trained only on greedy+greedy self-play mirror-deadlocks in
    BC+BC evaluation: two identical clones collide early (e.g. both head
    for the same dispenser), reach states the demonstrations never
    visit, and the OOD logits freeze them in place (observed: one seat
    spamming NORTH for 400 steps). The fix is data diversity, matching
    the role human data plays for the reference: the greedy demonstrator
    is also recorded alongside a Boltzmann-rational partner and a random
    partner (cloning only the GREEDY seat there), so blockage states and
    the greedy's auto-unstuck responses are in-distribution for the
    clone.

    from_ppo: path to a PPO checkpoint whose (stochastic) policy is
    demonstrated INSTEAD of the greedy model — the hand-off-capable
    proxy. The greedy lineage has no counter hand-off goals, so on
    layouts that REQUIRE hand-offs (forced_coordination: dispensers and
    pots are in disconnected rooms) a greedy clone scores an exact 0 and
    PPO_BC trained against it learns nothing. The reference's published
    PPO_BC works there because its BC is fit to real human data
    (behavior_cloning_tf2.py) and humans pass items over the divider; no
    human data exists in this environment, so the stand-in demonstrator
    is the trained PPO_SP pair (which does hand off, 172+ sparse/ep) —
    cloned from BOTH seats plus mixed random-partner games for state
    diversity, with the same epsilon noise.
    """
    import jax
    import jax.numpy as jnp

    from overcooked_ai_tpu.agents.agents import (
        GreedyTables,
        make_greedy_human_model,
        random_agent,
    )
    from overcooked_ai_tpu.agents.evaluation import (
        AgentFn,
        run_agent_pair,
        stateless,
    )
    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.human_data.pipeline import (
        featurize_trajectories,
        rollout_to_bc_trajectories,
    )
    from overcooked_ai_tpu.planning.greedy_tables import (
        build_first_action_table,
        build_goal_tables,
    )
    from overcooked_ai_tpu.planning.tables import build_motion_tables
    from overcooked_ai_tpu.training.bc import (
        BCConfig,
        save_bc_model,
        train_bc_model,
    )

    overrides = {"old_dynamics": True} if old_dynamics else {}
    spec = from_layout_name(layout_name, **overrides)
    mt = build_motion_tables(spec.layout.terrain)
    if not from_ppo:
        fa = build_first_action_table(spec.layout.terrain)
        tables = GreedyTables(jnp.asarray(mt.feature_cost), jnp.asarray(fa))
        greedy = make_greedy_human_model(spec, tables)
        boltz = make_greedy_human_model(
            spec, tables, hl_boltzmann_rational=True,
            ll_boltzmann_rational=True,
            goal_tables=build_goal_tables(spec.layout.terrain),
        )

    def noisy_policy(base):
        def policy(key, layout, state, idx, carry):
            # epsilon-noisy: the clone inherits ~epsilon exploration,
            # standing in for human imperfection
            k_g, k_eps, k_rand = jax.random.split(key, 3)
            a = base(k_g, layout, state, idx, carry)
            if epsilon > 0:
                a = jnp.where(
                    jax.random.uniform(k_eps) < epsilon,
                    jax.random.randint(k_rand, (), 0, 6),
                    a,
                ).astype(jnp.int32)
            return a, carry

        return AgentFn(policy=policy, init_carry=lambda batch: None)

    def noisy_agent(agent_fn):
        """Epsilon-noise an AgentFn (PPO demonstrator path)."""
        def policy(key, layout, state, idx, carry):
            k_g, k_eps, k_rand = jax.random.split(key, 3)
            a, c2 = agent_fn.policy(k_g, layout, state, idx, carry)
            if epsilon > 0:
                a = jnp.where(
                    jax.random.uniform(k_eps) < epsilon,
                    jax.random.randint(k_rand, (), 0, 6),
                    a,
                ).astype(jnp.int32)
            return a, c2

        return AgentFn(
            policy=policy,
            init_carry=agent_fn.init_carry,
            stateful=getattr(agent_fn, "stateful", False),
        )

    rand = stateless(random_agent)
    half = max(1, num_games // 2)
    if from_ppo:
        from overcooked_ai_tpu.agents.loading import build_agent

        demo = noisy_agent(build_agent(f"ppo:{from_ppo}", spec, mt))
        # (seat0, seat1, seats whose actions to clone, games)
        pairings = [
            (demo, demo, [0, 1], num_games),
            (demo, rand, [0], half),
            (rand, demo, [1], half),
        ]
        greedy_carry = False
    else:
        pairings = [
            (noisy_policy(greedy), noisy_policy(greedy), [0, 1], num_games),
            (noisy_policy(greedy), noisy_policy(boltz), [0], half),
            (noisy_policy(boltz), noisy_policy(greedy), [1], half),
            (noisy_policy(greedy), rand, [0], half),
            (rand, noisy_policy(greedy), [1], half),
        ]
        greedy_carry = True
    trajectories = []
    for k, (a0, a1, seats, games) in enumerate(pairings):
        traj = run_agent_pair(
            spec, [a0, a1], num_games=games, horizon=horizon,
            seed=seed * 1000 + k, greedy_carry=greedy_carry,
        )
        trajectories.extend(
            rollout_to_bc_trajectories(spec, traj, games, horizon, seats)
        )
    obs, actions = featurize_trajectories(spec, mt.feature_cost, trajectories)
    cfg = BCConfig(epochs=epochs)
    params, history = train_bc_model(obs, actions, cfg, seed=seed)
    model_dir = os.path.join(out_dir, f"bc_proxy_{layout_name}")
    save_bc_model(
        model_dir,
        params,
        cfg,
        metadata={
            "layout": layout_name,
            "old_dynamics": old_dynamics,
            "source": (
                f"PPO demonstrations from {from_ppo} "
                f"({num_games} self-play + 2x{half} random-partner games "
                f"x {horizon} steps, epsilon={epsilon}; both seats cloned)"
                if from_ppo else
                "mixed-partner greedy demonstrations "
                f"({num_games} self-play + 4x{half} mixed games x "
                f"{horizon} steps, epsilon={epsilon}; partners: "
                "boltzmann, random)"
            ),
            "final_train_loss": float(history["loss"][-1]),
            "final_val_loss": float(history["val_loss"][-1])
            if history.get("val_loss") else None,
        },
    )
    print(
        f"{layout_name}: {obs.shape[0]} samples, "
        f"loss {history['loss'][0]:.3f} -> {history['loss'][-1]:.3f}, "
        f"saved {model_dir}",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--layouts",
        nargs="+",
        default=[
            "cramped_room",
            "asymmetric_advantages",
            "coordination_ring",
            "forced_coordination",
            "counter_circuit_o_1order",
        ],
    )
    ap.add_argument("--out", default="runs/eval_artifact")
    ap.add_argument("--num-games", type=int, default=16)
    ap.add_argument("--horizon", type=int, default=400)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument(
        "--epsilon", type=float, default=0.1,
        help="random-action rate in the cloned behavior (0 = pure greedy)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--old-dynamics", action="store_true",
        help="demonstrate + clone under old (auto-cook) dynamics",
    )
    ap.add_argument(
        "--from-ppo", default=None,
        help="PPO checkpoint dir to demonstrate instead of the greedy "
        "model: the hand-off-capable proxy for layouts the greedy "
        "lineage cannot solve (forced_coordination). Applies to every "
        "--layouts entry, so pass one layout per invocation",
    )
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        from overcooked_ai_tpu.utils.platform import force_platform

        force_platform(args.platform)

    for layout in args.layouts:
        train_proxy(
            layout, args.out, args.num_games, args.horizon, args.epochs,
            args.seed, epsilon=args.epsilon, old_dynamics=args.old_dynamics,
            from_ppo=args.from_ppo,
        )


if __name__ == "__main__":
    main()
