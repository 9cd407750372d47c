"""Device-mesh construction and sharding helpers.

The reference's distributed story is a broken, vestigial NCCL/DDP path
(SURVEY.md §2.7); here scaling is native: a 1-D `jax.sharding.Mesh` over the
method's natural axis — image INSTANCES — plus replication for the frozen
backbone.  XLA inserts all collectives; there is no hand-written comm layer.
Multi-host: initialize the global runtime first (parallel/distributed.py —
`initialize_from_env()`, wired into main.py); `jax.devices()` then returns
the global device list and `make_mesh()` spans hosts unchanged (ICI
intra-slice, DCN across slices).  Exercised by tests/test_distributed.py's
2-process smoke test.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="instances", devices=None):
    """1-D mesh over (up to) all local devices."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def instance_sharding(mesh, axis_name="instances"):
    """Sharding for arrays with a leading per-instance axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_instance_tree(tree, mesh, axis_name="instances"):
    """Place a pytree whose leaves have a leading instance axis onto the
    mesh, sharded along that axis."""
    sh = instance_sharding(mesh, axis_name)
    return jax.device_put(tree, sh)


def replicate_tree(tree, mesh):
    return jax.device_put(tree, replicated(mesh))
