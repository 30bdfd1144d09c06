"""Distributed/mesh plumbing: multi-host init + env/learner placement.

The reference's only scaling mechanism is SubprocVecEnv worker processes on
one machine (/root/reference/scripts/train_sac.py:294-310).  The TPU-native
counterpart: a `jax.sharding.Mesh` with a single "env" axis spanning all
chips (ICI within a slice, DCN across hosts via `jax.distributed`).  The env
batch is sharded along "env"; learner parameters are replicated; the XLA
SPMD partitioner inserts the gradient psums — no hand-written collectives.
"""

from __future__ import annotations

import os

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Initialize jax.distributed for multi-host meshes.

    No-op for single-process runs.  Arguments default from the standard env
    vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID) so
    launchers only have to export those; on TPU pods jax.distributed can
    also autodetect everything.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    if coordinator is None and num_processes is None:
        return False  # single process
    kw = {}
    if coordinator:
        kw["coordinator_address"] = coordinator
    if num_processes:
        kw["num_processes"] = int(num_processes)
    pid = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kw["process_id"] = int(pid)
    jax.distributed.initialize(**kw)
    return True


def env_mesh(n_devices=None) -> Mesh:
    """A 1-D mesh over all (global) devices with a single "env" axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, ("env",))


def shard_env(tree, mesh: Mesh):
    """Place a batched pytree with leading env axis on the mesh."""

    def put(x):
        spec = P("env", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (learner params/opt state) across the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
