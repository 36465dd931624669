"""Multi-process (multi-host) data parallelism.

The reference has no distributed story at all (single GPU, SURVEY.md §2.8);
this module supplies the TPU-native design the survey specifies: one JAX
process per host, envs sharded over the global ``data`` mesh axis (each host
owns only its addressable shard — "host-local env state"), parameters
replicated, and XLA inserting the gradient all-reduces — over ICI within a
host, DCN across hosts — from the sharding annotations alone. There is no
hand-written NCCL/MPI anywhere; the collective layout falls out of
``jax.jit`` + ``NamedSharding``.

Terrain stays host-local by construction: every process builds the identical
terrain tiles from the config seed (pure numpy, ``terrain/tunnel.py``), so
the heightfield constants are replicated without any cross-host transfer.

On a real TPU pod ``jax.distributed.initialize()`` autodetects the topology.
For CI and single-machine validation the ``LTPU_*`` variables drive an
explicit N-process CPU harness (tests/dist_worker.py): each process forces
``--xla_force_host_platform_device_count=K`` CPU devices and rendezvous over
a local coordinator, giving a genuine multi-process runtime (cross-process
Gloo collectives) without TPU hardware.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize the JAX multi-process runtime.

    Argument resolution order: explicit args, then ``LTPU_COORDINATOR`` /
    ``LTPU_NUM_PROCESSES`` / ``LTPU_PROCESS_ID`` env vars, then (if none are
    set) ``jax.distributed.initialize()`` with full autodetection (TPU pod
    metadata). Returns ``(process_index, process_count)``.
    """
    coordinator_address = coordinator_address or os.environ.get("LTPU_COORDINATOR")
    if num_processes is None and "LTPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["LTPU_NUM_PROCESSES"])
    if process_id is None and "LTPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["LTPU_PROCESS_ID"])
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def global_mesh(axis: str = "data") -> Mesh:
    """One data axis over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def replicate_global(tree, mesh: Mesh):
    """Replicate host/process-local values onto a (possibly multi-process)
    mesh via ``make_array_from_callback`` — the documented path for building
    global arrays from identical per-process values. Typed PRNG keys are
    rebuilt from their key data (callback arrays must be raw)."""
    rep = NamedSharding(mesh, P())

    def put(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            raw = jax.make_array_from_callback(data.shape, rep, lambda idx: data[idx])
            return jax.random.wrap_key_data(raw)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

    return jax.tree.map(put, tree)
