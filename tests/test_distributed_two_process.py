"""Two-process jax.distributed verification of the multi-host path.

Opt-in (OVERCOOKED_SLOW_TESTS=1): spawns TWO separate Python processes,
each owning 4 virtual CPU devices, joined into one jax.distributed
runtime (8 global devices) via `parallel.mesh.init_distributed` -- the
actual multi-host mechanics (coordinator handshake, hybrid DCN mesh from
`make_multihost_mesh`, cross-process gradient all-reduce), which the
in-process 8-device mesh tests cannot exercise. One PPO iteration's
parameters must match the single-process 8-device result.

This is the maximum multi-host verification a one-box environment
allows; real multi-chip scaling runs on a pod (parallel/mesh.py:46-50).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

SLOW = os.environ.get("OVERCOOKED_SLOW_TESTS") == "1"

pytestmark = pytest.mark.skipif(
    not SLOW, reason="set OVERCOOKED_SLOW_TESTS=1 (spawns 2 processes)"
)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_ppo_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_distributed_worker.py")
    port = _free_port()
    out = str(tmp_path / "params0.npz")

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), out],
            cwd=repo,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"
    assert os.path.exists(out)

    dist = np.load(out)
    n_leaves = len(dist.files) - 1  # minus the "entropy" scalar
    dist_leaves = [dist[f"arr_{i}"] for i in range(n_leaves)]
    assert float(dist["entropy"]) > 0

    # single-process 8-device reference (this test process, CPU conftest)
    import jax

    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.parallel.mesh import (
        make_multihost_mesh,
        replicated,
    )
    from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo

    assert jax.device_count() == 8  # conftest virtual CPU devices
    mesh = make_multihost_mesh()
    spec = from_layout_name("cramped_room")
    cfg = PPOConfig(
        num_envs=16,
        horizon=8,
        sgd_minibatch_size=64,
        num_sgd_iter=2,
        fused=False,
    )
    init_fn, train_it = make_ppo(spec, cfg, mesh=mesh)
    ts = replicated(mesh, init_fn(jax.random.PRNGKey(0)))
    with mesh:
        ts2, _ = train_it(ts)
    ref_leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        jax.device_get(ts2.params)
    )]

    assert len(ref_leaves) == len(dist_leaves)
    for i, (a, b) in enumerate(zip(ref_leaves, dist_leaves)):
        # the 4+4 hybrid mesh may order its psum reductions differently
        # from the flat 8-device mesh -> float32 tolerance, not bitwise
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                   err_msg=f"leaf {i}")
