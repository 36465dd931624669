"""Device-mesh sharding for env-batch data parallelism.

The reference has no multi-device story (single-GPU env batching, SURVEY.md
§2.8); here envs are partitioned along a ``data`` mesh axis and parameters are
replicated — XLA inserts the psum gradient reductions over ICI automatically
when the jitted train iteration consumes sharded rollouts and produces
replicated parameter updates.

Per-env PRNG keys live in the state, so trajectories are bitwise identical
regardless of how many devices the batch is split across.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding_tree(tree, num_envs: int, mesh: Mesh, axis: str = "data"):
    """Sharding pytree: leaves with a leading env axis are split over the mesh,
    everything else (scalars, global RNG, params) is replicated."""
    rep = NamedSharding(mesh, P())
    split = NamedSharding(mesh, P(axis))

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
            return split
        return rep

    return jax.tree.map(spec, tree)


def shard_batch(tree, num_envs: int, mesh: Mesh, axis: str = "data"):
    """Place a pytree on the mesh with env-batch partitioning."""
    return jax.device_put(tree, batch_sharding_tree(tree, num_envs, mesh, axis))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
