"""Multi-device sharded training + checkpoint/resume tests (8 virtual CPU
devices via conftest)."""

import tempfile

import numpy as np

import jax

from overcooked_ai_tpu.core.layout import from_layout_name
from overcooked_ai_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    shard_batch_minor,
)
from overcooked_ai_tpu.training.checkpoint import (
    MetricsLogger,
    restore_checkpoint,
    save_checkpoint,
)
from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo


def test_sharded_ppo_train_iteration_matches_single_device():
    """The dp-sharded train iteration must produce the same params as the
    unsharded one (identical seeds; XLA collectives are exact for f32 sums
    of identical layouts here)."""
    assert len(jax.devices()) >= 8
    spec = from_layout_name("cramped_room")
    cfg = PPOConfig(
        num_envs=16, horizon=8, sgd_minibatch_size=64, num_sgd_iter=2
    )
    init_fn, train_single = make_ppo(spec, cfg)
    ts0 = init_fn(jax.random.PRNGKey(0))
    ts1, m1 = train_single(ts0)

    mesh = make_mesh(8)
    init_fn2, train_sharded = make_ppo(spec, cfg, mesh=mesh)
    ts0r = replicated(mesh, init_fn2(jax.random.PRNGKey(0)))
    with mesh:
        ts2, m2 = train_sharded(ts0r)
    for a, b in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(ts2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )


def test_checkpoint_resume_continues_training():
    spec = from_layout_name("cramped_room")
    cfg = PPOConfig(num_envs=2, horizon=8, sgd_minibatch_size=8, num_sgd_iter=1)
    init_fn, train_it = make_ppo(spec, cfg)
    ts = init_fn(jax.random.PRNGKey(0))
    ts, m = train_it(ts)
    d = tempfile.mkdtemp()
    save_checkpoint(d, ts, cfg, step=1)
    ts2, step = restore_checkpoint(d, init_fn(jax.random.PRNGKey(9)))
    assert step == 1
    assert float(ts2.env_steps) == float(ts.env_steps)
    # training continues from the restored state without error
    ts3, _ = train_it(ts2)
    assert float(ts3.env_steps) > float(ts2.env_steps)
    log = MetricsLogger(d + "/metrics.jsonl")
    log.log(1, m)
    log.close()
    with open(d + "/metrics.jsonl") as f:
        assert "episode_sparse_reward" in f.read()
