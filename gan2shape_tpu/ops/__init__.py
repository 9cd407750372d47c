from gan2shape_tpu.ops.upfirdn2d import upfirdn2d, setup_filter
from gan2shape_tpu.ops.fused_act import fused_leaky_relu, inverse_fused_leaky_relu
from gan2shape_tpu.ops.grid_sample import grid_sample
from gan2shape_tpu.ops.resize import resize, crop
from gan2shape_tpu.ops.rasterize import rasterize_depth

__all__ = [
    "upfirdn2d", "setup_filter",
    "fused_leaky_relu", "inverse_fused_leaky_relu",
    "grid_sample", "resize", "crop", "rasterize_depth",
]
