"""Frozen segmentation networks used for masks and shape priors:
PSPNet-50 (VOC, non-face categories) and BiSeNet (face parsing).

Behavioral parity targets: /root/reference/GAN2Shape/networks.py:247-586 and
resnet.py (hszhao/semseg + zllrunning/face-parsing architectures).  These run
inference-only (reference model.py:492-493), so BatchNorm folds its converted
running statistics (layers.BatchNorm2d) and dropout vanishes.  Module names
mirror the torch state-dict paths to keep convert/torch2jax.py mechanical.
"""

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from gan2shape_tpu.models.layers import (
    Conv2d, BatchNorm2d, max_pool2d, avg_pool2d, adaptive_avg_pool2d,
)
from gan2shape_tpu.ops.resize import resize_bilinear_align_corners


def relu(x):
    return jnp.maximum(x, 0)


class DilatedConv2d(nn.Module):
    """Conv2d with dilation (PSPNet's dilated layer3/4 — reference
    networks.py:298-307)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        from jax import lax
        k = self.kernel_size
        w = self.param("weight", nn.initializers.he_normal(),
                       (self.out_channels, self.in_channels, k, k))
        return lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=__import__('gan2shape_tpu.utils.precision', fromlist=['matmul_precision']).matmul_precision())


# ---------------- ResNet backbones (reference resnet.py) ----------------

class BasicBlock(nn.Module):
    inplanes: int
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = Conv2d(self.inplanes, self.planes, 3, self.stride, 1,
                     use_bias=False, name="conv1")(x)
        out = relu(BatchNorm2d(self.planes, name="bn1")(out))
        out = Conv2d(self.planes, self.planes, 3, 1, 1, use_bias=False,
                     name="conv2")(out)
        out = BatchNorm2d(self.planes, name="bn2")(out)
        res = x
        if self.has_downsample:
            res = Conv2d(self.inplanes, self.planes, 1, self.stride, 0,
                         use_bias=False, name="downsample_0")(x)
            res = BatchNorm2d(self.planes, name="downsample_1")(res)
        return relu(out + res)


class Bottleneck(nn.Module):
    inplanes: int
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    downsample_stride: int = 1

    @nn.compact
    def __call__(self, x):
        out = Conv2d(self.inplanes, self.planes, 1, 1, 0, use_bias=False,
                     name="conv1")(x)
        out = relu(BatchNorm2d(self.planes, name="bn1")(out))
        # PSPNet dilates conv2 and forces stride 1 in layers 3/4
        out = DilatedConv2d(self.planes, self.planes, 3, self.stride,
                            self.dilation, self.dilation, name="conv2")(out)
        out = relu(BatchNorm2d(self.planes, name="bn2")(out))
        out = Conv2d(self.planes, self.planes * 4, 1, 1, 0, use_bias=False,
                     name="conv3")(out)
        out = BatchNorm2d(self.planes * 4, name="bn3")(out)
        res = x
        if self.has_downsample:
            res = Conv2d(self.inplanes, self.planes * 4, 1,
                         self.downsample_stride, 0, use_bias=False,
                         name="downsample_0")(x)
            res = BatchNorm2d(self.planes * 4, name="downsample_1")(res)
        return relu(out + res)


class ResNet18Trunk(nn.Module):
    """simple_resnet=True variant (conv7 stem) returning feat8/16/32
    (reference resnet.py:107-110,153-166, used by BiSeNet's ContextPath)."""

    @nn.compact
    def __call__(self, x):
        x = Conv2d(3, 64, 7, 2, 3, use_bias=False, name="conv1")(x)
        x = relu(BatchNorm2d(64, name="bn1")(x))
        x = max_pool2d(x, 3, 2, padding=1)

        def layer(x, name, inplanes, planes, blocks, stride):
            x = BasicBlock(inplanes, planes, stride,
                           has_downsample=(stride != 1 or inplanes != planes),
                           name=f"{name}_0")(x)
            for i in range(1, blocks):
                x = BasicBlock(planes, planes, 1, name=f"{name}_{i}")(x)
            return x

        x = layer(x, "layer1", 64, 64, 2, 1)
        feat8 = layer(x, "layer2", 64, 128, 2, 2)
        feat16 = layer(feat8, "layer3", 128, 256, 2, 2)
        feat32 = layer(feat16, "layer4", 256, 512, 2, 2)
        return feat8, feat16, feat32


class ResNet50DeepTrunk(nn.Module):
    """deep_base ResNet-50 with PSPNet's dilated layers 3/4
    (reference resnet.py:111-124 + networks.py:295-307)."""

    @nn.compact
    def __call__(self, x):
        # layer0: 3-conv deep stem
        x = Conv2d(3, 64, 3, 2, 1, use_bias=False, name="conv1")(x)
        x = relu(BatchNorm2d(64, name="bn1")(x))
        x = Conv2d(64, 64, 3, 1, 1, use_bias=False, name="conv2")(x)
        x = relu(BatchNorm2d(64, name="bn2")(x))
        x = Conv2d(64, 128, 3, 1, 1, use_bias=False, name="conv3")(x)
        x = relu(BatchNorm2d(128, name="bn3")(x))
        x = max_pool2d(x, 3, 2, padding=1)

        def layer(x, name, inplanes, planes, blocks, stride, dilation):
            x = Bottleneck(inplanes, planes, stride, dilation,
                           has_downsample=True, downsample_stride=stride,
                           name=f"{name}_0")(x)
            for i in range(1, blocks):
                x = Bottleneck(planes * 4, planes, 1, dilation,
                               name=f"{name}_{i}")(x)
            return x

        x = layer(x, "layer1", 128, 64, 3, 1, 1)
        x = layer(x, "layer2", 256, 128, 4, 2, 1)
        x = layer(x, "layer3", 512, 256, 6, 1, 2)   # dilated, stride 1
        x = layer(x, "layer4", 1024, 512, 3, 1, 4)  # dilated, stride 1
        return x


# ---------------- PSPNet (reference networks.py:247-354) ----------------

class PSPNet(nn.Module):
    classes: int = 21
    bins: Sequence[int] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-2:]
        assert (h - 1) % 8 == 0 and (w - 1) % 8 == 0
        feat = ResNet50DeepTrunk(name="backbone")(x)

        # pyramid pooling
        outs = [feat]
        fh, fw = feat.shape[-2:]
        for i, b in enumerate(self.bins):
            p = adaptive_avg_pool2d(feat, b)
            p = Conv2d(2048, 512, 1, 1, 0, use_bias=False,
                       name=f"ppm_{i}_conv")(p)
            p = relu(BatchNorm2d(512, name=f"ppm_{i}_bn")(p))
            outs.append(resize_bilinear_align_corners(p, (fh, fw)))
        feat = jnp.concatenate(outs, 1)

        feat = Conv2d(4096, 512, 3, 1, 1, use_bias=False, name="cls_conv")(feat)
        feat = relu(BatchNorm2d(512, name="cls_bn")(feat))
        logits = Conv2d(512, self.classes, 1, 1, 0, name="cls_head")(feat)
        return resize_bilinear_align_corners(logits, (h, w))


# ---------------- BiSeNet (reference networks.py:357-586) ----------------

class ConvBNReLU(nn.Module):
    in_chan: int
    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.in_chan, self.out_chan, self.ks, self.stride,
                   self.padding, use_bias=False, name="conv")(x)
        return relu(BatchNorm2d(self.out_chan, name="bn")(x))


class AttentionRefinementModule(nn.Module):
    in_chan: int
    out_chan: int

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.in_chan, self.out_chan, name="conv")(x)
        atten = jnp.mean(feat, axis=(2, 3), keepdims=True)
        atten = Conv2d(self.out_chan, self.out_chan, 1, 1, 0, use_bias=False,
                       name="conv_atten")(atten)
        atten = BatchNorm2d(self.out_chan, name="bn_atten")(atten)
        return feat * jax_nn_sigmoid(atten)


def jax_nn_sigmoid(x):
    import jax
    return jax.nn.sigmoid(x)


def _up_nearest(x, size):
    b, c, h, w = x.shape
    oh, ow = size
    assert oh % h == 0 and ow % w == 0
    fy, fx = oh // h, ow // w
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (b, c, h, fy, w, fx))
    return x.reshape(b, c, oh, ow)


class FeatureFusionModule(nn.Module):
    in_chan: int
    out_chan: int

    @nn.compact
    def __call__(self, fsp, fcp):
        fcat = jnp.concatenate([fsp, fcp], 1)
        feat = ConvBNReLU(self.in_chan, self.out_chan, ks=1, padding=0,
                          name="convblk")(fcat)
        atten = jnp.mean(feat, axis=(2, 3), keepdims=True)
        atten = Conv2d(self.out_chan, self.out_chan // 4, 1, 1, 0,
                       use_bias=False, name="conv1")(atten)
        atten = relu(atten)
        atten = Conv2d(self.out_chan // 4, self.out_chan, 1, 1, 0,
                       use_bias=False, name="conv2")(atten)
        atten = jax_nn_sigmoid(atten)
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    in_chan: int
    mid_chan: int
    n_classes: int

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.in_chan, self.mid_chan, name="conv")(x)
        return Conv2d(self.mid_chan, self.n_classes, 1, 1, 0, use_bias=False,
                      name="conv_out")(x)


class BiSeNet(nn.Module):
    """Face parser (19 classes).  Returns full-resolution logits."""
    n_classes: int = 19

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-2:]
        feat8, feat16, feat32 = ResNet18Trunk(name="cp_resnet")(x)

        # context path
        avg = jnp.mean(feat32, axis=(2, 3), keepdims=True)
        avg = ConvBNReLU(512, 128, ks=1, padding=0, name="cp_conv_avg")(avg)
        avg_up = jnp.broadcast_to(
            avg, (avg.shape[0], 128) + feat32.shape[-2:])

        feat32_arm = AttentionRefinementModule(512, 128, name="cp_arm32")(
            feat32)
        feat32_sum = feat32_arm + avg_up
        feat32_up = _up_nearest(feat32_sum, feat16.shape[-2:])
        feat32_up = ConvBNReLU(128, 128, name="cp_conv_head32")(feat32_up)

        feat16_arm = AttentionRefinementModule(256, 128, name="cp_arm16")(
            feat16)
        feat16_sum = feat16_arm + feat32_up
        feat16_up = _up_nearest(feat16_sum, feat8.shape[-2:])
        feat16_up = ConvBNReLU(128, 128, name="cp_conv_head16")(feat16_up)

        feat_fuse = FeatureFusionModule(256, 256, name="ffm")(feat8,
                                                              feat16_up)
        out = BiSeNetOutput(256, 256, self.n_classes, name="conv_out")(
            feat_fuse)
        return resize_bilinear_align_corners(out, (h, w))
