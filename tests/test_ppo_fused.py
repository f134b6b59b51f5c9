"""Fused-rollout PPO training path == XLA scan path.

The fused rollout (PPOConfig.fused) replaces the env side of every
training step with the single pallas kernel of ops/fused_train.py. The
RNG-split structure is identical to the XLA rollout and the kernel is
bit-exact vs core/step.py + core/encoding.py, so one `train_iteration`
under either path must produce identical trajectories -- checked here via
the reward metrics (exact: integer sums) and loss metrics (allclose: the
two compiled programs may fuse float reductions differently).

Interpret mode on CPU; the real-TPU compiled-Mosaic run of the same
equivalence is in the opt-in OVERCOOKED_TPU_TESTS suite.
"""

import os

import numpy as np
import pytest

import jax

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo

B = 8
T = 30


def _cfg(**kw):
    base = dict(
        num_envs=B,
        horizon=T,
        sgd_minibatch_size=B * T // 2,
        num_sgd_iter=2,
        lr=1e-3,
        fused_block_b=B,
    )
    base.update(kw)
    return PPOConfig(**base)


def _one_iteration(spec, cfg, potential_fn=None, bc_policy=None):
    init_fn, train_it = make_ppo(
        spec, cfg, potential_fn=potential_fn, bc_policy=bc_policy
    )
    ts = init_fn(jax.random.PRNGKey(7))
    ts, m = train_it(ts)
    return ts, m


@pytest.mark.parametrize("use_phi", [False, True])
def test_fused_equals_xla_iteration(use_phi):
    spec = from_layout_name("cramped_room")
    potential_fn = None
    if use_phi:
        from overcooked_ai_tpu.core.potential import make_potential_fn
        from overcooked_ai_tpu.planning.tables import build_motion_tables

        tables = build_motion_tables(spec.layout.terrain)
        potential_fn = make_potential_fn(spec, tables.feature_cost)

    ts_x, m_x = _one_iteration(
        spec, _cfg(fused=False, use_phi=use_phi), potential_fn
    )
    ts_f, m_f = _one_iteration(
        spec, _cfg(fused=True, use_phi=use_phi), potential_fn
    )

    # identical trajectories -> identical (integer-sum) reward metrics
    assert float(m_x.episode_sparse_reward) == float(m_f.episode_sparse_reward)
    assert float(m_x.episode_shaped_reward) == float(m_f.episode_shaped_reward)
    np.testing.assert_allclose(
        float(m_x.episode_total_reward),
        float(m_f.episode_total_reward),
        rtol=1e-5,
    )
    # same data -> same SGD up to float reassociation across programs
    for name in ("policy_loss", "vf_loss", "kl", "entropy"):
        np.testing.assert_allclose(
            float(getattr(m_x, name)),
            float(getattr(m_f, name)),
            rtol=2e-3,
            atol=1e-5,
            err_msg=name,
        )
    for a, b in zip(jax.tree.leaves(ts_x.params), jax.tree.leaves(ts_f.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        )


def test_fused_bc_partner_iteration():
    """PPO+BC rides the fused path too: the kernel steps the env while the
    BC partner's actions are injected per-seat from the unpacked state."""
    spec = from_layout_name("cramped_room")

    def bc_policy(key, layout, state):
        # batched uniform-random stand-in for a BC net; reads the unpacked
        # state shape to prove tiles->state works mid-scan
        B_ = state.t.shape[-1]
        return jax.random.randint(key, (spec.num_players, B_), 0, 6)

    cfg = _cfg(
        fused=True,
        bc_schedule=((0, 0.5), (float("inf"), 0.5)),
    )
    ts, m = _one_iteration(spec, cfg, bc_policy=bc_policy)
    assert np.isfinite(float(m.kl))
    assert 0.0 < float(m.bc_sample_fraction) < 0.5  # one seat, p=0.5


def test_fused_auto_mode_selection():
    """auto (fused=None) enables the kernel only for 128-lane batches, and
    forcing it in an unsupported mode raises a clear error."""
    spec = from_layout_name("cramped_room")
    # B=8: auto must fall back to XLA silently
    init_fn, _ = make_ppo(spec, _cfg(fused=None))
    init_fn(jax.random.PRNGKey(0))
    # pool mode with uniform recipe tables HAS a kernel path now
    # (ops/fused_pool.py): forcing fused must build
    init_fn_p, _ = make_ppo([spec, spec], _cfg(fused=True))
    init_fn_p(jax.random.PRNGKey(0))
    # ... but a mixed-recipe pool must still raise a clear error
    spec_rich = from_layout_name("cramped_room", delivery_reward=37)
    with pytest.raises(ValueError, match="uniform"):
        make_ppo([spec, spec_rich], _cfg(fused=True))


def test_pool_fused_equals_xla_iteration():
    """Pool mode: the dynamic-terrain kernel path == the XLA pool path
    (identical per-lane layout gather RNG + bit-exact kernel => identical
    trajectories)."""
    from overcooked_ai_tpu.core.layout_generator import LayoutGenerator

    gen = LayoutGenerator(
        outer_shape=(5, 4), rng=np.random.RandomState(2)
    )
    specs = [gen.generate_spec(name=f"g{i}") for i in range(4)]

    ts_x, m_x = _one_iteration(specs, _cfg(fused=False))
    ts_f, m_f = _one_iteration(specs, _cfg(fused=True))

    assert float(m_x.episode_sparse_reward) == float(m_f.episode_sparse_reward)
    assert float(m_x.episode_shaped_reward) == float(m_f.episode_shaped_reward)
    for name in ("policy_loss", "vf_loss", "kl", "entropy"):
        np.testing.assert_allclose(
            float(getattr(m_x, name)),
            float(getattr(m_f, name)),
            rtol=2e-3,
            atol=1e-5,
            err_msg=name,
        )
    for a, b in zip(
        jax.tree.leaves(ts_x.params), jax.tree.leaves(ts_f.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        )


def test_pool_fused_regen_iteration():
    """num_mdp=inf (fresh pool per iteration) rides the fused pool path:
    a regenerated same-shape pool passed to train_iteration reuses the
    compiled program and trains on the new layouts."""
    from overcooked_ai_tpu.core.layout_generator import (
        LayoutGenerator,
        stack_layouts,
    )

    gen = LayoutGenerator(
        outer_shape=(5, 4), rng=np.random.RandomState(4)
    )
    specs = [gen.generate_spec(name=f"g{i}") for i in range(4)]
    init_fn, train_it = make_ppo(specs, _cfg(fused=True))
    ts = init_fn(jax.random.PRNGKey(3))

    def fresh(tag):
        return stack_layouts(
            [gen.generate_spec(name=f"{tag}{i}") for i in range(4)]
        )

    for tag in ("h", "j"):
        ts, m = train_it(ts, pool=fresh(tag))
        assert np.isfinite(float(m.kl))
    assert train_it._cache_size() == 1, "fresh pool must not recompile"


@pytest.mark.parametrize(
    "pool",
    [
        False,
        pytest.param(
            True,
            marks=pytest.mark.skipif(
                os.environ.get("OVERCOOKED_SLOW_TESTS") != "1",
                reason="8-vdev pool-kernel interpret run ~5 min; set "
                "OVERCOOKED_SLOW_TESTS=1",
            ),
        ),
    ],
)
def test_fused_mesh_equals_single_device(pool):
    """Fused rollout under a dp mesh (shard_map pallas per shard) produces
    the same trajectories as the meshless fused path — including pool
    mode, where the per-lane layout operands are sharded alongside the
    state tiles."""
    from overcooked_ai_tpu.parallel.mesh import make_mesh, replicated

    if pool:
        from overcooked_ai_tpu.core.layout_generator import LayoutGenerator

        gen = LayoutGenerator(
            outer_shape=(5, 4), rng=np.random.RandomState(6)
        )
        spec = [gen.generate_spec(name=f"m{i}") for i in range(4)]
    else:
        spec = from_layout_name("cramped_room")
    cfg = _cfg(fused=True, num_envs=16, fused_block_b=2,
               sgd_minibatch_size=16 * T // 2)

    init_fn, train_it = make_ppo(spec, cfg)
    ts = init_fn(jax.random.PRNGKey(5))
    _, m_single = train_it(ts)

    mesh = make_mesh(8)
    init_fn_m, train_it_m = make_ppo(spec, cfg, mesh=mesh)
    ts_m = init_fn_m(jax.random.PRNGKey(5))
    ts_m = replicated(mesh, ts_m)
    with mesh:
        _, m_mesh = train_it_m(ts_m)

    assert float(m_single.episode_sparse_reward) == float(
        m_mesh.episode_sparse_reward
    )
    assert float(m_single.episode_shaped_reward) == float(
        m_mesh.episode_shaped_reward
    )


@pytest.mark.parametrize("use_phi", [False, True])
def test_lstm_fused_equals_xla(use_phi):
    """The recurrent learner's fused rollout == its XLA rollout (same RNG
    structure, bit-exact kernel => identical trajectories), with and
    without phi shaping (reference use_lstm x use_phi are orthogonal)."""
    from overcooked_ai_tpu.training.ppo_lstm import make_ppo_lstm

    spec = from_layout_name("cramped_room")
    potential_fn = None
    if use_phi:
        from overcooked_ai_tpu.core.potential import make_potential_fn
        from overcooked_ai_tpu.planning.tables import build_motion_tables

        tables = build_motion_tables(spec.layout.terrain)
        potential_fn = make_potential_fn(spec, tables.feature_cost)

    def one(fused):
        cfg = _cfg(fused=fused, horizon=40, use_phi=use_phi,
                   sgd_minibatch_size=B * 40 // 2)
        init_fn, train_it = make_ppo_lstm(
            spec, cfg, potential_fn=potential_fn
        )
        ts = init_fn(jax.random.PRNGKey(11))
        ts, m = train_it(ts)
        return m

    m_x = one(False)
    m_f = one(True)
    assert float(m_x.episode_sparse_reward) == float(m_f.episode_sparse_reward)
    assert float(m_x.episode_shaped_reward) == float(m_f.episode_shaped_reward)
    np.testing.assert_allclose(
        float(m_x.episode_total_reward),
        float(m_f.episode_total_reward),
        rtol=1e-5,
    )
    for name in ("policy_loss", "vf_loss", "kl", "entropy"):
        np.testing.assert_allclose(
            float(getattr(m_x, name)), float(getattr(m_f, name)),
            rtol=2e-3, atol=1e-5, err_msg=name,
        )


@pytest.mark.skipif(
    os.environ.get("OVERCOOKED_SLOW_TESTS") != "1",
    reason="two recurrent pool builds ~2.5 min; set OVERCOOKED_SLOW_TESTS=1",
)
def test_lstm_pool_fused_equals_xla():
    """The recurrent learner's pool-mode fused rollout == its XLA pool
    rollout (per-lane layout gather + dynamic-terrain kernel)."""
    from overcooked_ai_tpu.core.layout_generator import LayoutGenerator
    from overcooked_ai_tpu.training.ppo_lstm import make_ppo_lstm

    gen = LayoutGenerator(
        outer_shape=(5, 4), rng=np.random.RandomState(8)
    )
    specs = [gen.generate_spec(name=f"l{i}") for i in range(4)]

    def one(fused):
        cfg = _cfg(fused=fused, horizon=40,
                   sgd_minibatch_size=B * 40 // 2)
        init_fn, train_it = make_ppo_lstm(specs, cfg)
        ts = init_fn(jax.random.PRNGKey(13))
        ts, m = train_it(ts)
        return m

    m_x = one(False)
    m_f = one(True)
    assert float(m_x.episode_sparse_reward) == float(m_f.episode_sparse_reward)
    assert float(m_x.episode_shaped_reward) == float(m_f.episode_shaped_reward)
    for name in ("policy_loss", "vf_loss", "kl", "entropy"):
        np.testing.assert_allclose(
            float(getattr(m_x, name)), float(getattr(m_f, name)),
            rtol=2e-3, atol=1e-5, err_msg=name,
        )
