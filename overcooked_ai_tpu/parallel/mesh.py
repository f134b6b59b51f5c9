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
