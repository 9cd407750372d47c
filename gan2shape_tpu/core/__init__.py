from gan2shape_tpu.core.losses import (
    photometric_loss, smooth_loss, discriminator_feature_loss,
)
from gan2shape_tpu.core.model import GAN2Shape, ViewLightSampler

__all__ = [
    "photometric_loss", "smooth_loss", "discriminator_feature_loss",
    "GAN2Shape", "ViewLightSampler",
]
