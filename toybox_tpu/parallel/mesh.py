"""Mesh / sharding utilities — the TPU-native replacement for the
reference's MPI layer (SURVEY.md §2.4):

- ``MpiAdamOptimizer``'s grad Allreduce   -> batch-axis sharding + XLA
  all-reduce under jit (nothing to call; see shard_batch/replicate)
- ``mpi_util.sync_from_root`` broadcast    -> replicate()
- ``mpi_moments`` / running statistics    -> mesh_moments()
- ``mpi_fork`` rank spawning              -> jax.distributed.initialize
  (multi-host process discovery) + one program over the global mesh
- per-rank seed offsets (cmd_util.py:32)  -> per-process env seed ranges
  via process_seed_offset()
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("env",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """A device mesh; default = all devices on one 'env' (dp) axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def env_sharding(mesh: Mesh, axis: str = "env") -> NamedSharding:
    """Leading-axis (per-env) sharding for batched env state pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "env"):
    """Place a stacked env/batch pytree with its leading axis sharded."""
    return jax.device_put(tree, env_sharding(mesh, axis))


def replicate(tree, mesh: Mesh):
    """Broadcast params/opt state to every device (the sync_from_root
    equivalent — with SPMD there is no root to drift from afterwards)."""
    return jax.device_put(tree, replicated(mesh))


def process_seed_offset(base_seed: int, envs_per_process: int) -> int:
    """Disjoint per-process seed ranges (replaces the reference's
    seed + 10000*mpi_rank + rank scheme, cmd_util.py:28-33)."""
    return base_seed + jax.process_index() * envs_per_process


def mesh_moments(x, axis_name: str):
    """Mean/std/count across a mesh axis from inside shard_map/pjit —
    the mpi_moments equivalent (common/mpi_moments.py)."""
    n = jax.lax.psum(jnp.asarray(float(jnp.asarray(x).size)), axis_name)
    s = jax.lax.psum(jnp.sum(x), axis_name)
    mean = s / n
    var = jax.lax.psum(jnp.sum((x - mean) ** 2), axis_name) / n
    return mean, jnp.sqrt(var), n


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (replaces mpi_fork/MPI.COMM_WORLD discovery).
    No-op when running single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
