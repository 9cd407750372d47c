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

    if coord and n and int(n) > 1:
        return initialize(coord, int(n), int(pid or 0))
    if os.environ.get("G2S_MULTIHOST") == "1":
        # TPU-pod autodetection path
        global _initialized
        import jax
        jax.distributed.initialize()
        _initialized = True
        return True
    return False


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
