"""Worker process for the two-process jax.distributed test.

Usage: python tests/_distributed_worker.py <process_id> <port> <out_npz>

Each of the two processes owns 4 virtual CPU devices and joins one
distributed runtime (8 global devices); both run ONE identical PPO
training iteration over the hybrid multi-host "dp" mesh. Process 0 dumps
the SGD'd parameters so the parent test can compare them against the
single-process 8-device result -- verifying the actual DCN code path
mechanics (init_distributed + make_multihost_mesh + cross-process
gradient all-reduce), the closest a one-box environment gets to real
multi-host execution.
"""

import os
import sys


def main():
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from overcooked_ai_tpu.utils.platform import force_platform

    force_platform("cpu")  # the site TPU plugin can override the env pin

    import jax
    import numpy as np

    from overcooked_ai_tpu.core.layout import from_layout_name
    from overcooked_ai_tpu.parallel.mesh import (
        init_distributed,
        make_multihost_mesh,
        replicated,
    )
    from overcooked_ai_tpu.training.ppo import PPOConfig, make_ppo

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

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
        ts2, metrics = train_it(ts)
        jax.block_until_ready(ts2.params)

    if pid == 0:
        leaves = jax.tree_util.tree_leaves(ts2.params)
        # params are replicated, so each process can read its local copy
        np.savez(
            out,
            *[np.asarray(x.addressable_data(0)) for x in leaves],
            entropy=float(np.asarray(metrics.entropy.addressable_data(0))),
        )
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
