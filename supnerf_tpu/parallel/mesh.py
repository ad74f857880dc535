"""Device mesh + sharding helpers (the framework's distributed layer).

The reference's only parallelism is single-process torch DataParallel over <=4
GPUs (reference README.md:276, trainer_unified_nuscenes.py:227-229). The
TPU-native equivalent is a 1-D data-parallel mesh: batch (training) or object
(test-time optimization) axes are sharded across devices over ICI, parameters
and code tables are replicated, and XLA inserts the gradient all-reduce.
Multi-host (DCN) is not required at reference scale but the same mesh spec
extends to it via jax.distributed.

All entry points take an optional mesh so single-device use needs no setup.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def maybe_init_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize multi-host (DCN) JAX when requested via args or the standard
    env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Single-host runs skip this entirely. Returns True if initialized."""
    import os

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # None passes through so jax auto-detects the cluster topology from the
    # launch environment; defaulting to (1, 0) would make every host claim
    # process 0 of a single-process cluster
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / object) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_pytree_batch(tree, mesh: Mesh):
    """Place every leaf with its leading axis sharded across the mesh."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def group_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 1 (the batch axis of a (K, B, ...) step-group) across the
    data axis; axis 0 is the sequential step axis of a grouped train
    dispatch (training.make_train_multi_step) and stays unsharded."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_pytree_group(tree, mesh: Mesh):
    s = group_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate_pytree(tree, mesh: Mesh):
    s = replicate_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
