"""Agent loading by kind string -- the reference `load_agent` equivalent.

The reference loads trained policies from disk into its Agent protocol
(rllib checkpoints via load_agent, rllib.py:857-892; dill-pickled agents,
agent.py:74-98; demo NPC loading, overcooked_demo/server/game.py:674-692).
Here a single `build_agent(kind, spec, tables)` maps a kind string to a
functional AgentFn:

    greedy | boltzmann | random | stay | ppo:<ckpt_dir> | bc:<model_dir>

Shared by the eval-matrix CLI (scripts/eval_matrix.py) and the web demo
(demo/game.py npc_from_kind).
"""

from __future__ import annotations

import json
import os


def build_agent(kind: str, spec, tables):
    """kind string -> AgentFn over the array state (see module docstring).

    tables: planning.tables.MotionTables for spec's terrain.
    """
    import jax
    import jax.numpy as jnp

    from overcooked_ai_tpu.agents.agents import (
        GreedyTables,
        make_greedy_human_model,
        random_agent,
        stay_agent,
    )
    from overcooked_ai_tpu.agents.evaluation import AgentFn, stateless

    if kind in ("greedy", "boltzmann"):
        from overcooked_ai_tpu.planning.greedy_tables import (
            build_first_action_table,
            build_goal_tables,
        )

        fa = build_first_action_table(spec.layout.terrain)
        kwargs = {}
        if kind == "boltzmann":
            kwargs = dict(
                hl_boltzmann_rational=True,
                ll_boltzmann_rational=True,
                goal_tables=build_goal_tables(spec.layout.terrain),
            )
        greedy = make_greedy_human_model(
            spec,
            GreedyTables(jnp.asarray(tables.feature_cost), jnp.asarray(fa)),
            **kwargs,
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
        from overcooked_ai_tpu.training.networks import NetConfig, PPONet
        from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo

        ckpt_dir = kind[4:]
        with open(os.path.join(ckpt_dir, "config.json")) as f:
            meta = json.load(f)
        saved = meta["config"]
        net_cfg = NetConfig(**saved["net"])
        # encode with the horizon the checkpoint trained at, else the
        # urgency layer (horizon - t < 40) is shifted at eval/demo time
        enc_horizon = int(saved.get("horizon", 400))
        cfg = PPOConfig(
            num_envs=2, net=net_cfg
        )  # only the net matters for inference

        if meta.get("use_lstm"):
            # recurrent checkpoint: a STATEFUL agent whose carry is the
            # per-sample (c, h) hidden state (reference loads use_lstm
            # rllib checkpoints the same way, rllib.py:788-854 +
            # ppo_rllib.py RNN state)
            from overcooked_ai_tpu.training.networks import LSTMPPONet
            from overcooked_ai_tpu.training.ppo_lstm import make_ppo_lstm

            init_fn, _ = make_ppo_lstm(spec, cfg)
            ts, _ = restore_checkpoint(
                ckpt_dir, init_fn(jax.random.PRNGKey(0))
            )
            lnet = LSTMPPONet(net_cfg)

            def lstm_policy(key, layout, state, idx, carry):
                obs = lossless_encode(layout, state, horizon=enc_horizon)
                x = jnp.transpose(obs[idx], (1, 2, 0))[None, None]
                c, h = carry  # per-sample (cell,)
                logits_seq, _, (c2, h2) = lnet.apply(
                    ts.params, x, (c[None], h[None])
                )
                a = jax.random.categorical(key, logits_seq[0, 0])
                return a.astype(jnp.int32), (c2[0], h2[0])

            return AgentFn(
                policy=lstm_policy,
                init_carry=lambda batch: lnet.initial_carry(batch),
                stateful=True,
            )

        init_fn, _ = make_ppo(spec, cfg)
        ts, _ = restore_checkpoint(ckpt_dir, init_fn(jax.random.PRNGKey(0)))
        net = PPONet(net_cfg)

        def policy(key, layout, state, idx):
            obs = lossless_encode(layout, state, horizon=enc_horizon)
            x = jnp.transpose(obs[idx], (1, 2, 0))[None]
            logits, _ = net.apply(ts.params, x)
            return jax.random.categorical(key, logits[0]).astype(jnp.int32)

        return stateless(policy)
    raise ValueError(f"unknown agent kind {kind}")
