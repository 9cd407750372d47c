"""The five trainable GAN2Shape sub-networks (V, L, D, A, E).

Behavioral parity target: /root/reference/GAN2Shape/networks.py:23-244
(Tables 5-8 of arXiv:2011.00844).  Implemented as flax modules over NCHW,
with torch-default initialization (see layers.py).  The reference's `--debug`
gradient-flow alerter wrappers (networks.py:59-63 etc.) are replaced by the
framework-level gradient tracer in core/diagnostics.py — a host callback has
no place inside a jitted TPU step.

Deviations from the reference (deliberate):
  * OffsetEncoder's 64-px branch passed a float channel count to Conv2d and
    crashed (networks.py:231); here it produces the full `cout` channels.
"""

import math
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from gan2shape_tpu.models.layers import (
    Conv2d, ConvTranspose2d, GroupNorm, avg_pool2d, upsample_nearest,
)


def relu(x):
    return jnp.maximum(x, 0)


def lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, x * slope)


class Encoder(nn.Module):
    """Conv encoder for ViewpointNet/LightingNet (reference networks.py:23-50,
    Table 5): stride-2 conv4 + ReLU stages down to 4x4, valid conv4,
    1x1 conv, tanh.  At the reference's working size (128) this is exactly
    its 5-stage stack; smaller sizes drop trailing stages (the reference
    hardcodes 5 and cannot run below 128 — a generalization, used by the
    cheap multi-chip dryruns)."""
    cin: int
    cout: int
    size: int

    @nn.compact
    def __call__(self, x):
        nf = max(4096 // self.size, 16)
        n_down = max(int(math.log2(self.size)) - 2, 1)
        widths = [min(nf * 2 ** i, nf * 16) for i in range(n_down)]
        c_in = self.cin
        for i, c_out in enumerate(widths):
            x = Conv2d(c_in, c_out, 4, stride=2, padding=1, use_bias=False,
                       name=f"conv{i}")(x)
            x = relu(x)
            c_in = c_out
        x = Conv2d(c_in, nf * 16, 4, stride=1, padding=0, use_bias=False,
                   name="conv5")(x)
        x = relu(x)
        x = Conv2d(nf * 16, self.cout, 1, stride=1, padding=0, use_bias=False,
                   name="conv6")(x)
        x = jnp.tanh(x)
        return x.reshape(x.shape[0], -1)


class ViewpointNet(nn.Module):
    """V: 6-dof viewpoint (rot xyz, trans xy, trans z)
    (reference networks.py:53-63)."""
    image_size: int = 128

    @nn.compact
    def __call__(self, x):
        return Encoder(3, 6, self.image_size, name="encoder")(x)


class LightingNet(nn.Module):
    """L: 4-dof lighting (ambient, diffuse, direction xy)
    (reference networks.py:66-76)."""
    image_size: int = 128

    @nn.compact
    def __call__(self, x):
        return Encoder(3, 4, self.image_size, name="encoder")(x)


class EncoderDecoder(nn.Module):
    """Conv encoder-decoder for DepthNet/AlbedoNet (reference
    networks.py:79-141, Table 6)."""
    cin: int
    cout: int
    size: int
    activation: Optional[str] = None
    zdim: int = 256

    @nn.compact
    def __call__(self, x):
        nf = max(4096 // self.size, 16)
        gn = 8 if self.size >= 128 else 16

        # -------- downsampling --------
        x = Conv2d(self.cin, nf, 4, 2, 1, use_bias=False, name="down0")(x)
        x = lrelu(GroupNorm(gn, nf, name="down0_gn")(x))
        x = Conv2d(nf, nf * 2, 4, 2, 1, use_bias=False, name="down1")(x)
        x = lrelu(GroupNorm(gn * 2, nf * 2, name="down1_gn")(x))
        x = Conv2d(nf * 2, nf * 4, 4, 2, 1, use_bias=False, name="down2")(x)
        x = lrelu(GroupNorm(gn * 4, nf * 4, name="down2_gn")(x))
        x = Conv2d(nf * 4, nf * 8, 4, 2, 1, use_bias=False, name="down3")(x)
        x = lrelu(x)
        x = Conv2d(nf * 8, self.zdim, 4, 1, 0, use_bias=False,
                   name="bottleneck")(x)
        x = relu(x)

        # -------- upsampling --------
        x = ConvTranspose2d(self.zdim, nf * 8, 4, 1, 0, use_bias=False,
                            name="up0")(x)
        x = relu(x)
        x = Conv2d(nf * 8, nf * 8, 3, 1, 1, use_bias=False, name="up0b")(x)
        x = relu(x)
        x = ConvTranspose2d(nf * 8, nf * 4, 4, 2, 1, use_bias=False,
                            name="up1")(x)
        x = relu(GroupNorm(gn * 4, nf * 4, name="up1_gn")(x))
        x = Conv2d(nf * 4, nf * 4, 3, 1, 1, use_bias=False, name="up1b")(x)
        x = relu(GroupNorm(gn * 4, nf * 4, name="up1b_gn")(x))
        x = ConvTranspose2d(nf * 4, nf * 2, 4, 2, 1, use_bias=False,
                            name="up2")(x)
        x = relu(GroupNorm(gn * 2, nf * 2, name="up2_gn")(x))
        x = Conv2d(nf * 2, nf * 2, 3, 1, 1, use_bias=False, name="up2b")(x)
        x = relu(GroupNorm(gn * 2, nf * 2, name="up2b_gn")(x))
        x = ConvTranspose2d(nf * 2, nf, 4, 2, 1, use_bias=False,
                            name="up3")(x)
        x = relu(GroupNorm(gn, nf, name="up3_gn")(x))
        x = Conv2d(nf, nf, 3, 1, 1, use_bias=False, name="up3b")(x)
        x = relu(GroupNorm(gn, nf, name="up3b_gn")(x))
        x = upsample_nearest(x, 2)
        x = Conv2d(nf, nf, 3, 1, 1, use_bias=False, name="up4")(x)
        x = relu(GroupNorm(gn, nf, name="up4_gn")(x))
        x = Conv2d(nf, nf, 5, 1, 2, use_bias=False, name="up5")(x)
        x = relu(GroupNorm(gn, nf, name="up5_gn")(x))
        x = Conv2d(nf, self.cout, 5, 1, 2, use_bias=False, name="head")(x)
        if self.activation == "tanh":
            x = jnp.tanh(x)
        return x


class DepthNet(nn.Module):
    """D: depth map, no activation — tanh applied after mean-centering at the
    model level (reference networks.py:144-154, model.py:337-345)."""
    image_size: int = 128

    @nn.compact
    def __call__(self, x):
        return EncoderDecoder(3, 1, self.image_size, activation=None,
                              name="net")(x)


class AlbedoNet(nn.Module):
    """A: albedo in [-1, 1] (reference networks.py:157-167)."""
    image_size: int = 128

    @nn.compact
    def __call__(self, x):
        return EncoderDecoder(3, 3, self.image_size, activation="tanh",
                              name="net")(x)


class ResBlock(nn.Module):
    """Offset-encoder residual block (reference networks.py:170-194,
    Table 8)."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self, x):
        res = relu(x)
        res = Conv2d(self.cin, self.cout, 3, 2, 1, name="res0")(res)
        res = relu(res)
        res = Conv2d(self.cout, self.cout, 3, 1, 1, name="res1")(res)
        idn = avg_pool2d(x, 2, 2)
        idn = Conv2d(self.cin, self.cout, 1, 1, 0, name="idn")(idn)
        return idn + res


class OffsetEncoder(nn.Module):
    """E: pseudo-image -> 512-d w-space offset (reference
    networks.py:197-244, Table 7)."""
    image_size: int = 128
    cin: int = 3
    cout: int = 512

    @nn.compact
    def __call__(self, x):
        assert self.image_size in (64, 128)
        nf = 16
        x = Conv2d(self.cin, 2 * nf, 4, 2, 1, name="stem")(x)
        x = relu(x)
        x = ResBlock(2 * nf, 4 * nf, name="block0")(x)
        x = ResBlock(4 * nf, 8 * nf, name="block1")(x)
        x = ResBlock(8 * nf, 16 * nf, name="block2")(x)
        if self.image_size == 128:
            x = ResBlock(16 * nf, 32 * nf, name="block3")(x)
            x = Conv2d(32 * nf, 64 * nf, 4, 1, 0, name="penult")(x)
            x = relu(x)
            x = Conv2d(64 * nf, self.cout, 1, 1, 0, name="head")(x)
        else:
            x = Conv2d(16 * nf, 32 * nf, 4, 1, 0, name="penult")(x)
            x = relu(x)
            x = Conv2d(32 * nf, self.cout, 1, 1, 0, name="head")(x)
        return x.reshape(x.shape[0], -1)
