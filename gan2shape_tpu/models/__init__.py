from gan2shape_tpu.models.stylegan2 import Generator, Discriminator
from gan2shape_tpu.models.networks import (
    ViewpointNet, LightingNet, DepthNet, AlbedoNet, OffsetEncoder,
)
from gan2shape_tpu.models.lpips import LPIPS
from gan2shape_tpu.models.segmentation import PSPNet, BiSeNet

__all__ = [
    "Generator", "Discriminator",
    "ViewpointNet", "LightingNet", "DepthNet", "AlbedoNet", "OffsetEncoder",
    "LPIPS", "PSPNet", "BiSeNet",
]
