"""StyleGAN2 generator + discriminator in flax — the frozen GAN backbone.

Behavioral parity target: the vendored rosinality implementation the reference
uses (/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch/model.py).  The
architecture (equalized LR, modulated/demodulated convs, FIR resampling,
skip-RGB pyramid, minibatch-stddev discriminator with `ftr_num` feature taps,
partial mapping execution `style_forward`, analytic `style_invert`) is kept;
the implementation is TPU-first:

  * ModulatedConv2d avoids the reference's grouped-conv batch trick
    (model.py:260-291, which reshapes batch into conv groups — hostile to the
    MXU).  Because a conv is linear in per-input-channel scaling, modulation
    moves onto the activations and demodulation onto the outputs, leaving ONE
    shared-weight batched conv that XLA tiles directly onto the MXU:
        y = demod(style) * conv(x * style, scale * W)
  * FIR up/down-sampling is `ops.upfirdn2d` (dilated conv), with the separable
    two-pass fast path;
  * transposed convs are expressed as lhs-dilated convolutions;
  * all randomness is explicit (PRNG keys / noise arrays passed in), so the
    whole synthesis is a pure jittable function.

Weights are loaded from PyTorch checkpoints via convert/torch2jax.py; random
init matches torch's N(0,1) conventions so shape/golden tests run without
checkpoint assets.
"""

import math
import os
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from gan2shape_tpu.ops.upfirdn2d import setup_filter, upfirdn2d
from gan2shape_tpu.ops.fused_act import (
    fused_leaky_relu, inverse_fused_leaky_relu,
)
from gan2shape_tpu.utils.precision import (
    matmul_precision as _PREC_lookup, act_dtype,
)


def channel_map(channel_multiplier: int) -> dict:
    """Per-resolution channel widths (reference model.py:426-436)."""
    return {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


def pixel_norm(x, eps=1e-8):
    return x * lax.rsqrt(jnp.mean(x ** 2, axis=1, keepdims=True) + eps)


# ---- internal activation layout ------------------------------------------
#
# G2S_CONV_LAYOUT=nhwc runs the frozen generator/discriminator INTERNALS
# channel-last.  Rationale (step-2 trace, PERF_NOTES.md item 7): under NCHW
# XLA's layout assignment ping-pongs between the convs' HW-minor physical
# layouts and the FIR-blur matmuls' channel-in-lanes preference — ~15 ms/iter
# of pure relayout copies at b=16.  NHWC is the TPU conv's native layout
# (channels in lanes), matching the blur dots.  Public interfaces (images,
# noise, feature taps, weights) stay NCHW/OIHW — boundary transposes are
# 3-channel or 4x4-resolution arrays, and tap transposes fuse into the
# downstream loss reductions.  Default 'auto' = nhwc on TPU (A/B: step2
# 59.7 -> 50.7 ms/iter alone, 44.4 combined with bf16 activations; fidelity
# gated by tools/check_precision.py -> PRECISION_CHECK.json), nchw elsewhere
# (CPU goldens run both layouts via the env override + the committed
# cross-layout parity test).


def _nhwc():
    mode = os.environ.get("G2S_CONV_LAYOUT", "auto")
    if mode == "auto":
        import jax
        return jax.default_backend() == "tpu"
    return mode == "nhwc"


def _ch_axis():
    return 3 if _nhwc() else 1


def _cvec(v, ndim=4):
    """Reshape a per-channel vector for broadcasting over the active layout."""
    shape = [1] * ndim
    shape[_ch_axis()] = -1
    return v.reshape(shape)


def _to_internal(x_nchw):
    return jnp.transpose(x_nchw, (0, 2, 3, 1)) if _nhwc() else x_nchw


def _from_internal(x):
    return jnp.transpose(x, (0, 3, 1, 2)) if _nhwc() else x


def _dimnums():
    return (("NHWC", "OIHW", "NHWC") if _nhwc()
            else ("NCHW", "OIHW", "NCHW"))


def _conv2d(x, w, stride=1, padding=0, groups=1):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        feature_group_count=groups,
        dimension_numbers=_dimnums(), precision=_PREC_lookup())


def _conv_transpose2d(x, w_oihw, stride=2):
    """torch F.conv_transpose2d(stride, padding=0) as a lhs-dilated conv.
    `w_oihw` is already in output-major OIHW layout (flip applied here)."""
    k = w_oihw.shape[-1]
    return lax.conv_general_dilated(
        x, jnp.flip(w_oihw, (2, 3)),
        window_strides=(1, 1),
        padding=((k - 1, k - 1), (k - 1, k - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_dimnums(), precision=_PREC_lookup())


def _blur(x, kern, kern1d, up=1, down=1, pad=(0, 0)):
    return upfirdn2d(x, kern, up=up, down=down, pad=pad, kernel_1d=kern1d,
                     channel_last=_nhwc())


class EqualLinear(nn.Module):
    """Runtime weight-scaled linear (reference model.py:138-175)."""
    in_dim: int
    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None

    def setup(self):
        self.weight = self.param(
            "weight", lambda k: jax.random.normal(
                k, (self.out_dim, self.in_dim)) / self.lr_mul)
        if self.use_bias:
            self.bias = self.param(
                "bias", lambda k: jnp.full((self.out_dim,), self.bias_init,
                                           jnp.float32))

    @property
    def scale(self):
        return (1.0 / math.sqrt(self.in_dim)) * self.lr_mul

    def __call__(self, x):
        w = (self.weight * self.scale).astype(x.dtype)
        out = jnp.matmul(x, w.T, precision=_PREC_lookup())
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(out, self.bias * self.lr_mul)
        if self.use_bias:
            out = out + (self.bias * self.lr_mul).astype(out.dtype)
        return out

    def invert(self, x):
        """Analytic inverse (reference model.py:169-175)."""
        if self.activation == "fused_lrelu":
            out = inverse_fused_leaky_relu(
                x.reshape(x.shape + (1, 1)),
                self.bias * self.lr_mul).reshape(x.shape)
        else:
            out = x - self.bias * self.lr_mul
        w_inv = jnp.linalg.inv(self.weight * self.scale)
        return jnp.matmul(out, w_inv.T, precision=_PREC_lookup())


class EqualConv2d(nn.Module):
    """Equalized-LR conv (reference model.py:94-123)."""
    in_channel: int
    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.out_channel, self.in_channel,
                        self.kernel_size, self.kernel_size))
        scale = 1.0 / math.sqrt(self.in_channel * self.kernel_size ** 2)
        out = _conv2d(x, (w * scale).astype(x.dtype),
                      stride=self.stride, padding=self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,))
            out = out + _cvec(b).astype(out.dtype)
        return out


class ModulatedConv2d(nn.Module):
    """Style-modulated, demodulated conv (reference model.py:195-291),
    reformulated as activation modulation + output demodulation."""
    in_channel: int
    out_channel: int
    kernel_size: int
    style_dim: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    def setup(self):
        self.weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (1, self.out_channel, self.in_channel,
             self.kernel_size, self.kernel_size))
        self.modulation = EqualLinear(
            self.style_dim, self.in_channel, bias_init=1.0,
            name="modulation")
        factor = 2
        k = len(self.blur_kernel)
        if self.upsample:
            p = (k - factor) - (self.kernel_size - 1)
            self._blur_pad = ((p + 1) // 2 + factor - 1, p // 2 + 1)
            self._blur_gain = factor ** 2
        elif self.downsample:
            p = (k - factor) + (self.kernel_size - 1)
            self._blur_pad = ((p + 1) // 2, p // 2)
            self._blur_gain = 1
        kern, kern1d = setup_filter(np.asarray(self.blur_kernel, np.float32),
                                    gain=getattr(self, "_blur_gain", 1))
        self._kern = kern
        self._kern1d = kern1d

    def __call__(self, x, style):
        scale = 1.0 / math.sqrt(self.in_channel * self.kernel_size ** 2)
        style = self.modulation(style)  # (B, in_c)

        if self.demodulate:
            # demod[b,o] = rsqrt(sum_{i,kh,kw} (scale*W[o,i]*style[b,i])^2+eps)
            # — contract the kernel axes once, then one (B,in)x(in,out) matmul
            # instead of materializing a per-sample weight tensor
            wsq = jnp.sum((self.weight[0] * scale) ** 2, axis=(2, 3))  # (o,i)
            # demod is a normalization constant: compute it in f32 even under
            # the bf16 activation policy (squares + 4.6k-term reduction)
            demod = lax.rsqrt(
                jnp.matmul(style.astype(jnp.float32) ** 2, wsq.T,
                           precision=_PREC_lookup()) + 1e-8)

        cb = (slice(None), None, None, slice(None)) if _nhwc() \
            else (slice(None), slice(None), None, None)
        x = x * style[cb].astype(x.dtype)
        wgt = (self.weight[0] * scale).astype(x.dtype)

        if self.upsample:
            out = _conv_transpose2d(x, wgt, stride=2)
            out = _blur(out, self._kern, self._kern1d, pad=self._blur_pad)
        elif self.downsample:
            x = _blur(x, self._kern, self._kern1d, pad=self._blur_pad)
            out = _conv2d(x, wgt, stride=2, padding=0)
        else:
            out = _conv2d(x, wgt, stride=1, padding=self.kernel_size // 2)

        if self.demodulate:
            out = out * demod[cb].astype(out.dtype)
        return out


class NoiseInjection(nn.Module):
    """(reference model.py:294-305)"""
    @nn.compact
    def __call__(self, x, noise):
        w = self.param("weight", nn.initializers.zeros, (1,))
        return x + (w * noise).astype(x.dtype)


class StyledConv(nn.Module):
    """modconv + noise + fused bias/LeakyReLU (reference model.py:321-355)."""
    in_channel: int
    out_channel: int
    kernel_size: int
    style_dim: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True

    def setup(self):
        self.conv = ModulatedConv2d(
            self.in_channel, self.out_channel, self.kernel_size,
            self.style_dim, demodulate=self.demodulate,
            upsample=self.upsample, blur_kernel=self.blur_kernel, name="conv")
        self.act_bias = self.param("act_bias", nn.initializers.zeros,
                                   (self.out_channel,))
        self.noise = NoiseInjection(name="noise")

    def __call__(self, x, style, noise):
        out = self.conv(x, style)
        out = self.noise(out, noise)
        return fused_leaky_relu(out, self.act_bias, channel_axis=_ch_axis())


class ToRGB(nn.Module):
    """1x1 modconv to RGB with skip upsample-accumulate
    (reference model.py:358-377)."""
    in_channel: int
    style_dim: int
    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    def setup(self):
        self.conv = ModulatedConv2d(self.in_channel, 3, 1, self.style_dim,
                                    demodulate=False, name="conv")
        self.bias = self.param("bias", nn.initializers.zeros, (1, 3, 1, 1))
        if self.upsample:
            k, k1 = setup_filter(np.asarray(self.blur_kernel, np.float32),
                                 gain=4)
            self._up_kern, self._up_kern1d = k, k1
            p = k.shape[0] - 2
            self._up_pad = ((p + 1) // 2 + 1, p // 2)

    def __call__(self, x, style, skip=None):
        out = self.conv(x, style)
        # stored (1, 3, 1, 1); _cvec's reshape is order-preserving
        out = out + _cvec(self.bias).astype(out.dtype)
        if skip is not None:
            skip = _blur(skip, self._up_kern, self._up_kern1d, up=2, down=1,
                         pad=self._up_pad)
            out = out + skip
        return out


class Generator(nn.Module):
    """StyleGAN2 synthesis + 8-layer mapping MLP (reference model.py:398-627).

    Pure-function usage:
        gen = Generator(size=128, style_dim=512, n_mlp=8)
        params = gen.init(key, w, noise)        # or converted torch weights
        img, _ = gen.apply(params, [w], noise=noise, input_is_w=True)
        w = gen.apply(params, z, method='style_forward')
    """
    size: int
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01

    @property
    def log_size(self):
        return int(math.log2(self.size))

    @property
    def n_latent(self):
        return self.log_size * 2 - 2

    @property
    def num_layers(self):
        return (self.log_size - 2) * 2 + 1

    def setup(self):
        chans = channel_map(self.channel_multiplier)

        self.style = [
            EqualLinear(self.style_dim, self.style_dim, lr_mul=self.lr_mlp,
                        activation="fused_lrelu", name=f"style_{i}")
            for i in range(self.n_mlp)]

        self.const_input = self.param(
            "input", nn.initializers.normal(1.0), (1, chans[4], 4, 4))
        self.conv1 = StyledConv(chans[4], chans[4], 3, self.style_dim,
                                blur_kernel=self.blur_kernel, name="conv1")
        self.to_rgb1 = ToRGB(chans[4], self.style_dim, upsample=False,
                             name="to_rgb1")

        convs = []
        to_rgbs = []
        in_ch = chans[4]
        for i in range(3, self.log_size + 1):
            out_ch = chans[2 ** i]
            convs.append(StyledConv(in_ch, out_ch, 3, self.style_dim,
                                    upsample=True,
                                    blur_kernel=self.blur_kernel,
                                    name=f"convs_{len(convs)}"))
            convs.append(StyledConv(out_ch, out_ch, 3, self.style_dim,
                                    blur_kernel=self.blur_kernel,
                                    name=f"convs_{len(convs)}"))
            to_rgbs.append(ToRGB(out_ch, self.style_dim,
                                 name=f"to_rgbs_{len(to_rgbs)}"))
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

    # ---------------- mapping ----------------

    def style_forward(self, x, skip=0, depth=100):
        """Partial mapping-MLP execution (reference model.py:508-515):
        run layers [skip, min(depth, n_mlp)); layer 0 is PixelNorm."""
        out = x
        for i in range(self.n_mlp + 1):
            if i >= depth:
                break
            if i < skip:
                continue
            out = pixel_norm(out) if i == 0 else self.style[i - 1](out)
        return out

    def style_invert(self, x, skip=0, depth=100):
        """Inverse mapping through all layers but PixelNorm
        (reference model.py:536-543)."""
        out = x
        n = self.n_mlp + 1
        for i in range(n):
            if i == n - 1 or i >= depth:
                break
            if i < skip:
                continue
            out = self.style[self.n_mlp - 1 - i].invert(out)
        return out

    def mean_latent(self, key, n_latent):
        z = jax.random.normal(key, (n_latent, self.style_dim))
        return jnp.mean(self.style_forward(z), axis=0, keepdims=True)

    def make_noise(self, key):
        keys = jax.random.split(key, self.num_layers)
        noises = []
        for i in range(self.num_layers):
            res = 2 ** ((i + 5) // 2)
            noises.append(jax.random.normal(keys[i], (1, 1, res, res)))
        return noises

    # ---------------- synthesis ----------------

    def __call__(self, styles, noise, return_latents=False,
                 inject_index=None, truncation=1.0, truncation_latent=None,
                 input_is_w=False, return_features=False):
        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        if not input_is_w:
            styles = [self.style_forward(s) for s in styles]

        if truncation < 1:
            styles = [truncation_latent + truncation * (s - truncation_latent)
                      for s in styles]

        if len(styles) == 1:
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None], self.n_latent, axis=1)
            else:
                latent = styles[0]
        elif len(styles) == 2:
            if inject_index is None:
                raise ValueError(
                    "style mixing requires an explicit inject_index "
                    "(randomness is caller-provided in this framework)")
            l1 = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            l2 = jnp.repeat(styles[1][:, None],
                            self.n_latent - inject_index, axis=1)
            latent = jnp.concatenate([l1, l2], 1)
        else:
            assert len(styles) == self.n_latent
            latent = jnp.stack(styles, 1)

        # synthesis runs at the activation-policy dtype (bf16 on TPU): the
        # conv/blur stack is HBM-bandwidth-bound and the weights are frozen,
        # so only the activation-grad chain sees the truncation (gated by
        # tools/check_precision.py).  Mapping/truncation math above stays f32.
        latent_f32 = latent
        adt = act_dtype()
        latent = latent.astype(adt)
        # noise arrives NCHW (1, 1, res, res); internal layout may be NHWC —
        # the transposes are 1-channel arrays, negligible
        noise = [_to_internal(n.astype(adt)) for n in noise]

        batch = latent.shape[0]
        const = _to_internal(self.const_input)  # (1, 4, 4, C) under nhwc
        tile = (batch, 1, 1, 1)
        out = jnp.tile(const, tile).astype(latent.dtype)
        out = self.conv1(out, latent[:, 0], noise[0])
        skip = self.to_rgb1(out, latent[:, 1])

        i = 1
        features = []
        for idx in range(len(self.to_rgbs)):
            conv_a = self.convs[2 * idx]
            conv_b = self.convs[2 * idx + 1]
            out = conv_a(out, latent[:, i], noise[1 + 2 * idx])
            out = conv_b(out, latent[:, i + 1], noise[2 + 2 * idx])
            skip = self.to_rgbs[idx](out, latent[:, i + 2], skip)
            features.append(out)
            i += 2

        # boundary back to the public NCHW contract: the image transpose is
        # 3-channel; feature-tap transposes fuse into the consumers' loss
        # reductions
        image = _from_internal(skip).astype(jnp.float32)
        if return_features:
            return image, [_from_internal(f).astype(jnp.float32)
                           for f in features]
        if return_latents:
            return image, latent_f32
        return image, None

    def invert(self, latent_projection, truncation=1.0, mean_latent=None,
               noise=None):
        """Re-synthesize from a projected latent (reference
        model.py:517-534; the broken batchify path is intentionally dropped).
        `latent_projection` = (offset, latent)."""
        offset, latent = latent_projection
        img, _ = self(
            [latent], noise=noise, input_is_w=True, truncation=truncation,
            truncation_latent=mean_latent)
        return jnp.clip(img, -1.0, 1.0), offset


class ConvLayer(nn.Module):
    """Discriminator conv block (reference model.py:630-676)."""
    in_channel: int
    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    def setup(self):
        if self.downsample:
            k, k1 = setup_filter(np.asarray(self.blur_kernel, np.float32))
            self._kern, self._kern1d = k, k1
            p = (len(self.blur_kernel) - 2) + (self.kernel_size - 1)
            self._pad = ((p + 1) // 2, p // 2)
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        self.conv = EqualConv2d(
            self.in_channel, self.out_channel, self.kernel_size,
            stride=stride, padding=padding,
            use_bias=self.use_bias and not self.activate, name="conv")
        if self.activate and self.use_bias:
            self.act_bias = self.param("act_bias", nn.initializers.zeros,
                                       (self.out_channel,))

    def __call__(self, x):
        if self.downsample:
            x = _blur(x, self._kern, self._kern1d, pad=self._pad)
        out = self.conv(x)
        if self.activate:
            if self.use_bias:
                out = fused_leaky_relu(out, self.act_bias,
                                       channel_axis=_ch_axis())
            else:
                out = fused_leaky_relu(out, None)
        return out


class DResBlock(nn.Module):
    """(reference model.py:679-697)"""
    in_channel: int
    out_channel: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    def setup(self):
        self.conv1 = ConvLayer(self.in_channel, self.in_channel, 3,
                               name="conv1")
        self.conv2 = ConvLayer(self.in_channel, self.out_channel, 3,
                               downsample=True, name="conv2")
        self.skip = ConvLayer(self.in_channel, self.out_channel, 1,
                              downsample=True, activate=False, use_bias=False,
                              name="skip")

    def __call__(self, x):
        out = self.conv2(self.conv1(x))
        return (out + self.skip(x)) / math.sqrt(2)


class Discriminator(nn.Module):
    """StyleGAN2 discriminator with `ftr_num` early-exit feature taps for the
    feature-matching loss (reference model.py:700-769)."""
    size: int
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    def setup(self):
        chans = channel_map(self.channel_multiplier)
        log_size = int(math.log2(self.size))
        blocks = [ConvLayer(3, chans[self.size], 1, name="convs_0")]
        in_ch = chans[self.size]
        for i in range(log_size, 2, -1):
            out_ch = chans[2 ** (i - 1)]
            blocks.append(DResBlock(in_ch, out_ch, self.blur_kernel,
                                    name=f"convs_{len(blocks)}"))
            in_ch = out_ch
        self.blocks = blocks
        self.stddev_group = 4
        self.stddev_feat = 1
        self.final_conv = ConvLayer(in_ch + 1, chans[4], 3, name="final_conv")
        self.final_linear_0 = EqualLinear(chans[4] * 16, chans[4],
                                          activation="fused_lrelu",
                                          name="final_linear_0")
        self.final_linear_1 = EqualLinear(chans[4], 1, name="final_linear_1")

    def __call__(self, x, ftr_num=100):
        # frozen stack: run at the activation-policy dtype (see Generator);
        # feature taps are cast back so the feature-matching loss stays f32.
        # Input/taps keep the public NCHW contract; internals may be NHWC —
        # tap transposes fuse into the feature-loss reductions downstream.
        out = _to_internal(x.astype(act_dtype()))
        features = []
        for i, block in enumerate(self.blocks):
            out = block(out)
            if i > 0:
                features.append(_from_internal(out).astype(jnp.float32))
            if len(features) >= ftr_num:
                return jnp.zeros(()), features

        # minibatch stddev + the final 4x4 head run in NCHW regardless (the
        # arrays are 4x4 — negligible; the reshape before final_linear_0
        # must match torch's C-major flatten)
        out = _from_internal(out)
        batch, channel, height, width = out.shape
        group = min(batch, self.stddev_group)
        stddev = out.reshape(group, -1, self.stddev_feat,
                             channel // self.stddev_feat, height, width)
        stddev = jnp.sqrt(jnp.var(stddev, axis=0) + 1e-8)
        stddev = jnp.mean(stddev, axis=(2, 3, 4), keepdims=True)[:, :, 0]
        stddev = jnp.tile(stddev, (group, 1, height, width))
        out = jnp.concatenate([out, stddev], 1)

        out = _from_internal(self.final_conv(_to_internal(out)))
        features.append(out.astype(jnp.float32))
        out = out.reshape(batch, -1)
        out = self.final_linear_1(self.final_linear_0(out))
        return out.astype(jnp.float32), features
