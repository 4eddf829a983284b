"""Device mesh helpers for multi-chip stitching.

The reference has NO distributed layer (SURVEY.md §2c); this package
*introduces* distribution the TPU-native way: a 1-D `jax.sharding.Mesh`
over all devices with named axes, `shard_map`/pjit partitioning of the
image / match-pair / canvas-row axes, and XLA collectives (psum etc.) over
ICI. No NCCL/MPI analog exists or is needed.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(n_devices=None, axis_name="i"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_leading(x, mesh, axis_name="i"):
    """Place an array sharded along its leading axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))


def replicate(x, mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
