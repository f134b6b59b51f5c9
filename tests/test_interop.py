"""Single-env driver, gym adapter, renderer, layout generator tests."""

import numpy as np
import pytest

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.core.layout_generator import (
    LayoutGenerator,
    stack_layouts,
)
from overcooked_ai_tpu.interop.single_env import OvercookedEnv
from overcooked_ai_tpu.visualization.renderer import render_state_rgb


def test_single_env_episode():
    env = OvercookedEnv.from_layout_name("cramped_room", horizon=10)
    total = 0
    for t in range(10):
        _, r, done, info = env.step([4, 4])
        total += r
        assert done == (t == 9)
    assert "episode" in info
    assert info["episode"]["ep_length"] == 10
    env.reset()
    assert int(env.state.t) == 0


def test_gym_adapter():
    gymnasium = pytest.importorskip("gymnasium")
    from overcooked_ai_tpu.interop.gym_env import Overcooked

    env = Overcooked(
        OvercookedEnv.from_layout_name("cramped_room", horizon=8), seed=0
    )
    obs = env.reset()
    assert set(obs.keys()) == {
        "both_agent_obs",
        "overcooked_state",
        "other_agent_env_idx",
    }
    assert obs["both_agent_obs"][0].shape == (5, 4, 26)
    for _ in range(8):
        obs, reward, done, info = env.step((0, 1))
    assert done
    assert "policy_agent_idx" in info


def test_renderer():
    spec = from_layout_name("cramped_room")
    env = OvercookedEnv(spec, horizon=5)
    env.step([5, 5])
    img = render_state_rgb(spec, env.state_dict(), hud="score: 0")
    assert img.dtype == np.uint8 and img.shape[2] == 3
    assert img.shape[0] > 4 * 40 and img.shape[1] == 5 * 48


def test_layout_generator():
    gen = LayoutGenerator(
        outer_shape=(7, 6), prop_empty=0.8, rng=np.random.RandomState(0)
    )
    specs = [gen.generate_spec(name=f"gen_{i}") for i in range(4)]
    for s in specs:
        assert s.num_players == 2
        chars = "".join(s.terrain_chars)
        for c in "PODS":
            assert c in chars
    pool = stack_layouts(specs)
    assert pool.terrain.shape == (6, 7, 4)

    # generated layouts actually step
    env = OvercookedEnv(specs[0], horizon=5)
    env.step([0, 2])


def test_generated_layout_pool_vmapped_step():
    import jax
    import jax.numpy as jnp

    from overcooked_ai_tpu.core.step import step

    gen = LayoutGenerator(
        outer_shape=(7, 6), prop_empty=0.8, rng=np.random.RandomState(1)
    )
    specs = [gen.generate_spec(name=f"pool_{i}") for i in range(8)]
    pool = stack_layouts(specs)
    states = jax.tree.map(lambda x: jnp.asarray(x), pool.start_state)
    actions = jnp.zeros((2, 8), jnp.int32) + 5
    vstep = jax.vmap(step, in_axes=(-1, -1, -1), out_axes=-1)
    # layout leaves include the nested start_state; strip it for the vmap
    next_states, info = vstep(pool, states, actions)
    assert next_states.t.shape == (8,)
    assert (np.asarray(next_states.t) == 1).all()


def test_variable_mdp_evaluator():
    """from_mdp_params_{finite,infinite} + from_mdp_lst semantics
    (reference AgentEvaluator, benchmarking.py:65-201; agent_test.py
    exercises every constructor the same way)."""
    from overcooked_ai_tpu.agents.agents import random_agent
    from overcooked_ai_tpu.agents.evaluation import (
        VariableMDPEvaluator,
        stateless,
    )

    factory = lambda spec: [stateless(random_agent)] * 2  # noqa: E731

    ev = VariableMDPEvaluator.from_mdp_params_finite(
        num_mdp=3, outer_shape=(5, 4), seed=0
    )
    res = ev.evaluate(factory, num_games=4, horizon=20, seed=0)
    assert len(res) == 4
    names = {r["spec"].name for r in res}
    assert len(names) <= 3  # sampled from the finite pool

    ev_inf = VariableMDPEvaluator.from_mdp_params_infinite(
        outer_shape=(5, 4), seed=1
    )
    res_inf = ev_inf.evaluate(factory, num_games=3, horizon=20, seed=0)
    assert len({r["spec"].name for r in res_inf}) == 3  # fresh every game

    # schedule fn drives generation params (curriculum hook,
    # reference MDPParamsGenerator, layout_generator.py:65-88)
    seen = []

    def sched(outside):
        seen.append(outside)
        return {"prop_empty": 0.9}

    ev_s = VariableMDPEvaluator.from_mdp_params_infinite(
        outer_shape=(5, 4), mdp_params_schedule_fn=sched, seed=2
    )
    ev_s.evaluate(factory, num_games=2, horizon=10, seed=0)
    assert len(seen) >= 2
