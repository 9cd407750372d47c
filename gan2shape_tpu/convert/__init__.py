from gan2shape_tpu.convert.torch2jax import (
    convert_generator, convert_discriminator, convert_gan_checkpoint,
    convert_encoder_net, convert_encoder_decoder_net, convert_offset_encoder,
    convert_vgg16, convert_lpips_heads, convert_mvn, build_frozen,
)

__all__ = [
    "convert_generator", "convert_discriminator", "convert_gan_checkpoint",
    "convert_encoder_net", "convert_encoder_decoder_net",
    "convert_offset_encoder", "convert_vgg16", "convert_lpips_heads",
    "convert_mvn", "build_frozen",
]
