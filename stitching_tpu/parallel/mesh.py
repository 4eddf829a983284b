"""Device mesh + multi-host initialization for distributed stitching.

The reference has NO distributed layer (SURVEY.md §2c); this package
*introduces* distribution the TPU-native way: `jax.distributed.initialize`
for the multi-host runtime, a 1-D `jax.sharding.Mesh` over all devices
(global across hosts) with named axes, `shard_map`/pjit partitioning of the
image / match-pair / bundle-edge / tile axes, and XLA collectives (psum,
pmax) over ICI within a slice and DCN across hosts. No NCCL/MPI analog
exists or is needed.

Multi-host usage (one process per host, e.g. under a pod launcher):

    from stitching_tpu.parallel import mesh as pmesh
    pmesh.init_distributed()          # env-driven (coordinator, rank, size)
    m = pmesh.make_mesh()             # global mesh over all hosts' devices
    pano = Stitcher(mesh=m).stitch(images)

Every host must call `stitch` with the same inputs (SPMD); image loading is
cheap relative to compute, and the batched engine shards all heavy axes.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

_DISTRIBUTED_INITIALIZED = False


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Initialize the JAX multi-host runtime (idempotent).

    Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or the
    values a TPU pod runtime provides automatically. Single-process runs
    (num_processes in (None-with-no-env, 1)) are a no-op so the same code
    path works on one chip.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return False
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if not coordinator_address and num_processes in (None, 1):
        return False  # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _DISTRIBUTED_INITIALIZED = True
    return True


def make_mesh(n_devices=None, axis_name="i"):
    """1-D mesh over the first n (global) devices — across all hosts when
    `init_distributed` ran."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_leading(x, mesh, axis_name="i"):
    """Place an array sharded along its leading axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))


def replicate(x, mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
