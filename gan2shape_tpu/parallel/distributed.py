"""Multi-host (multi-process) runtime initialization.

The reference's only multi-node surface is a vestigial NCCL/DDP init that
crashes upstream (reference stylegan2 train.py:436-450, trainer.py:213).
The TPU-native replacement: `jax.distributed.initialize` builds one global
runtime across processes; after it, `jax.devices()` returns the GLOBAL
device list, `parallel.mesh.make_mesh()` spans hosts unchanged, and XLA
routes collectives over ICI within a slice and DCN across slices.

Wiring (either works):
  * env vars — G2S_COORDINATOR, G2S_NUM_PROCESSES, G2S_PROCESS_ID
    (or the standard JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    JAX_PROCESS_ID, which jax.distributed reads natively), then call
    `initialize_from_env()` — main.py does this before building trainers;
  * explicit — `initialize(coordinator, num_processes, process_id)`.

On TPU pods with standard provisioning, `jax.distributed.initialize()` with
no arguments autodetects everything; `initialize_from_env` falls through to
that when G2S_MULTIHOST=1 is set without explicit coordinates.
"""

import logging
import os

log = logging.getLogger(__name__)
_initialized = False


def is_initialized():
    return _initialized


def initialize(coordinator_address, num_processes, process_id,
               local_device_ids=None):
    """Join the global runtime. Call once per process, before any
    backend-initializing JAX call."""
    global _initialized
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True
    log.info("distributed: process %d/%d, %d global / %d local devices",
             jax.process_index(), jax.process_count(),
             jax.device_count(), jax.local_device_count())
    return True


def initialize_from_env():
    """Initialize multi-host if the environment asks for it; return whether
    distributed mode is active.  Single-process runs are untouched."""
    coord = os.environ.get("G2S_COORDINATOR") \
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = os.environ.get("G2S_NUM_PROCESSES") \
        or os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("G2S_PROCESS_ID") \
        or os.environ.get("JAX_PROCESS_ID")

    if coord or n or pid:
        # any of the three set = the operator intends multi-host; a partial
        # spec must FAIL LOUDLY — silently proceeding single-process makes
        # every host train independently (colliding checkpoints), and a
        # defaulted process_id=0 hangs the coordinator waiting for ranks
        if not (coord and n and pid is not None):
            raise RuntimeError(
                "partial multi-host environment: need ALL of "
                "G2S_COORDINATOR, G2S_NUM_PROCESSES, G2S_PROCESS_ID (or the "
                f"JAX_* equivalents); got coordinator={coord!r}, "
                f"num_processes={n!r}, process_id={pid!r}")
        if int(n) <= 1:
            log.info("distributed: num_processes=%s, staying single-process",
                     n)
            return False
        return initialize(coord, int(n), int(pid))
    if os.environ.get("G2S_MULTIHOST") == "1":
        # TPU-pod autodetection path
        global _initialized
        import jax
        jax.distributed.initialize()
        _initialized = True
        return True
    return False


def put_batch(x, mesh, axis_name=None):
    """Shard a leading-batch-axis array over `mesh`.  Multi-host safe:
    single-process uses device_put; multi-process routes through
    process_local_batch (device_put cannot address other hosts' devices)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() > 1:
        return process_local_batch(x, mesh, axis_name)
    axis_name = axis_name or mesh.axis_names[0]
    return jax.device_put(x, NamedSharding(mesh, P(axis_name)))


def put_replicated(tree, mesh):
    """Replicate host data (a pytree) across a possibly multi-host mesh."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)

    def one(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(sh, a, a.shape)

    return jax.tree.map(one, tree)


def process_local_batch(global_array, mesh, axis_name=None):
    """Build a globally-sharded jax.Array from per-process host data: each
    process passes the full logical array; the runtime keeps only the shards
    this process's devices own.  This is the multi-host analogue of
    device_put-with-NamedSharding (which only addresses local devices)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis_name = axis_name or mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis_name))
    local = global_array[_local_slice(global_array, mesh, sharding)]
    return jax.make_array_from_process_local_data(
        sharding, local, global_array.shape)


def _local_slice(global_array, mesh, sharding):
    """Index slice of the global batch owned by this process's devices."""
    import jax

    n = global_array.shape[0]
    idx = sharding.addressable_devices_indices_map((n,)
                                                   + global_array.shape[1:])
    starts = sorted(s[0].start or 0 for s in idx.values())
    stops = sorted(s[0].stop if s[0].stop is not None else n
                   for s in idx.values())
    return slice(starts[0], stops[-1])
