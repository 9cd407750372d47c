from gan2shape_tpu.parallel.mesh import make_mesh, instance_sharding
from gan2shape_tpu.parallel.sharding import InstanceParallelTrainer
from gan2shape_tpu.parallel import distributed

__all__ = ["make_mesh", "instance_sharding", "InstanceParallelTrainer",
           "distributed"]
