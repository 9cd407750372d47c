"""Worker for tests/test_distributed.py's 2-process smoke test.

Each worker gets 2 virtual CPU devices, joins the global runtime via
gan2shape_tpu.parallel.distributed, builds a mesh spanning all 4 global
devices, feeds a globally-sharded batch with process_local_batch, and runs a
jitted global reduction (XLA inserts the cross-process collective — Gloo on
CPU, ICI/DCN on TPU pods).  Replaces the reference's vestigial NCCL init
(reference stylegan2 train.py:436-450).
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from gan2shape_tpu.parallel import distributed  # noqa: E402
from gan2shape_tpu.parallel.mesh import make_mesh  # noqa: E402


def main(process_id, port):
    # exercise the env-var path main.py uses
    os.environ["G2S_COORDINATOR"] = f"localhost:{port}"
    os.environ["G2S_NUM_PROCESSES"] = "2"
    os.environ["G2S_PROCESS_ID"] = str(process_id)
    assert distributed.initialize_from_env()
    assert distributed.is_initialized()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    mesh = make_mesh(axis_name="instances")
    assert mesh.devices.size == 4

    glob = np.arange(8, dtype=np.float32).reshape(4, 2)
    arr = distributed.process_local_batch(glob, mesh)
    out = jax.jit(lambda x: jnp.sum(x),
                  out_shardings=NamedSharding(mesh, P()))(arr)
    total = float(jax.device_get(out))
    assert total == float(glob.sum()), total

    # the trainer-facing helpers (GeneralizingTrainer._shard_batch routes
    # through these): put_batch must produce the same globally-sharded
    # array, put_replicated a fully-replicated pytree
    arr2 = distributed.put_batch(glob, mesh)
    assert arr2.sharding.spec == P("instances"), arr2.sharding
    out2 = jax.jit(lambda x: jnp.sum(x),
                   out_shardings=NamedSharding(mesh, P()))(arr2)
    assert float(jax.device_get(out2)) == float(glob.sum())
    rep = distributed.put_replicated({"w": np.ones((3,), np.float32)}, mesh)
    assert rep["w"].sharding.is_fully_replicated
    assert float(jax.device_get(jnp.sum(rep["w"]))) == 3.0

    print(f"DIST_OK process={process_id} total={total}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
