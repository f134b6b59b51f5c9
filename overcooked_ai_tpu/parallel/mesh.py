"""Device-mesh utilities: sharded env batches + data-parallel training.

The reference's only parallelism is a Ray worker pool (reference
ppo_rllib_client.py:97); here scaling is a `jax.sharding.Mesh`: the env
batch (minor axis of every state leaf) shards across devices, network
params stay replicated, and XLA inserts the gradient all-reduce over
ICI/DCN (the NCCL-equivalent is the compiler).

Usage:
    mesh = make_mesh()                      # all local devices, axis "dp"
    init_fn, train_it = make_ppo(spec, cfg) # training/ppo.py
    train_it = shard_train_iteration(train_it, mesh)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def init_distributed(
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    local_device_ids=None,
):
    """Multi-host entry point: initialize the JAX distributed runtime.

    Call once per host process BEFORE any jax device use. On TPU pods the
    arguments are auto-detected from the environment; on other setups pass
    coordinator_address="host0:port", num_processes, process_id explicitly
    (the reference has no equivalent -- its distribution is a Ray worker
    pool, ppo_rllib_client.py:97; here hosts join one XLA collective
    domain, and gradient all-reduces ride ICI within a slice and DCN
    across slices).

    A 4-host launch (BASELINE >=80% scaling target) is:
        # on every host h in 0..3:
        init_distributed("host0:1234", num_processes=4, process_id=h)
        mesh = make_multihost_mesh()
        init_fn, train_it = make_ppo(spec, cfg, mesh=mesh)

    Safe to call when already initialized (returns False then).
    """
    # ONLY inspect the distributed client handle -- jax.process_count()
    # would initialize the XLA backend, after which
    # jax.distributed.initialize() refuses to run (it must precede any
    # backend use), making this function a no-op-that-breaks in every
    # fresh worker process
    if getattr(jax._src.distributed.global_state, "client", None):
        return False  # already initialized
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def make_multihost_mesh(axis_name="dp") -> Mesh:
    """One flat data-parallel mesh over every device of every host.

    Device order is hierarchical -- all chips of host 0, then host 1, ... --
    so a gradient all-reduce over the "dp" axis decomposes into a fast
    intra-host reduce over ICI plus one inter-host stage over DCN (XLA
    performs this decomposition when the mesh is DCN-hybrid; see
    jax.experimental.mesh_utils.create_hybrid_device_mesh).
    """
    from jax.experimental import mesh_utils

    n_procs = jax.process_count()
    per_host = jax.local_device_count()
    if n_procs > 1:
        try:
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(per_host,),
                dcn_mesh_shape=(n_procs,),
                devices=jax.devices(),
            )
        except ValueError:
            # non-TPU multi-process (e.g. the 2-process CPU test): devices
            # carry no slice_index for the hybrid helper to group by, so
            # build the hierarchical host-major order directly
            devices = np.array(
                sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
            )
    else:
        devices = mesh_utils.create_device_mesh(
            (len(jax.devices()),), devices=jax.devices()
        )
    return Mesh(devices, axis_names=(axis_name,))


def batch_minor_sharding(mesh: Mesh, x, axis_name="dp"):
    """NamedSharding placing the minor (last) axis of `x` on the mesh."""
    ndim = jnp.asarray(x).ndim
    if ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(*([None] * (ndim - 1) + [axis_name])))


def shard_batch_minor(mesh: Mesh, tree, axis_name="dp"):
    """device_put every leaf with its minor axis sharded over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(
            jnp.asarray(x), batch_minor_sharding(mesh, x, axis_name)
        ),
        tree,
    )


def replicated(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())),
        tree,
    )


def constrain_batch_minor(mesh: Mesh, tree, axis_name="dp"):
    """In-jit sharding constraint: minor axis over the mesh. Apply to the
    env state inside a jitted step to steer XLA's propagation."""
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, batch_minor_sharding(mesh, x, axis_name)
        ),
        tree,
    )
