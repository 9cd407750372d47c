"""Basic conv layers with torch-compatible shape/init semantics.

The trainable GAN2Shape nets (networks.py in the reference) are plain torch
Conv2d / ConvTranspose2d / GroupNorm stacks; training-dynamics parity requires
matching torch's default kaiming-uniform initialization (bound = 1/sqrt(fan_in)
for both weight and bias), which differs from flax defaults.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from gan2shape_tpu.utils.precision import matmul_precision as _PREC_lookup


def _torch_conv_init(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv2d(nn.Module):
    """NCHW conv with torch Conv2d defaults (kaiming-uniform init)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        w = self.param("weight", _torch_conv_init(fan_in),
                       (self.out_channels, self.in_channels, k, k))
        out = lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=_PREC_lookup())
        if self.use_bias:
            b = self.param("bias", _torch_conv_init(fan_in),
                           (self.out_channels,))
            out = out + b.reshape(1, -1, 1, 1).astype(out.dtype)
        return out


class ConvTranspose2d(nn.Module):
    """NCHW transposed conv with torch semantics:
    out = (in-1)*stride - 2*padding + kernel, weight stored (in, out, k, k),
    expressed as an lhs-dilated convolution (TPU-friendly)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        # torch ConvTranspose2d fan_in = out_channels * k * k (weight shape
        # (in, out, k, k), fan_in counted over dim-1 * receptive field)
        fan_in = self.out_channels * k * k
        w = self.param("weight", _torch_conv_init(fan_in),
                       (self.in_channels, self.out_channels, k, k))
        # correlate the dilated input with the flipped, (out,in)-transposed
        # kernel; torch `padding` crops k-1-p zeros instead
        rhs = jnp.flip(jnp.swapaxes(w, 0, 1), (2, 3)).astype(x.dtype)
        p = k - 1 - self.padding
        out = lax.conv_general_dilated(
            x, rhs, window_strides=(1, 1),
            padding=((p, p), (p, p)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=_PREC_lookup())
        if self.use_bias:
            b = self.param("bias", _torch_conv_init(fan_in),
                           (self.out_channels,))
            out = out + b.reshape(1, -1, 1, 1)
        return out


class GroupNorm(nn.Module):
    """GroupNorm over NCHW channels (torch GroupNorm semantics, eps 1e-5)."""
    num_groups: int
    num_channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        b, c, h, w = x.shape
        g = self.num_groups
        xg = x.reshape(b, g, c // g, h, w)
        mean = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
        var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)
        xg = (xg - mean) * lax.rsqrt(var + self.eps)
        x = xg.reshape(b, c, h, w)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)


class BatchNorm2d(nn.Module):
    """Inference-mode BatchNorm (running stats are converted constants); the
    segmentation backbones are only ever used frozen (reference
    model.py:492-493)."""
    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = self.param("running_mean", nn.initializers.zeros,
                          (self.num_features,))
        var = self.param("running_var", nn.initializers.ones,
                         (self.num_features,))
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        inv = lax.rsqrt(var + self.eps) * scale
        return x * inv.reshape(1, -1, 1, 1) + (
            bias - mean * inv).reshape(1, -1, 1, 1)


def avg_pool2d(x, kernel, stride=None):
    stride = stride or kernel
    out = lax.reduce_window(
        x, 0.0, lax.add, (1, 1, kernel, kernel), (1, 1, stride, stride),
        "VALID")
    return out / (kernel * kernel)


def max_pool2d(x, kernel, stride=None, padding=0, ceil_mode=False):
    stride = stride or kernel

    def extra(n):
        # torch ceil_mode: extend with -inf so the last partial window counts
        if not ceil_mode:
            return 0
        span = n + 2 * padding - kernel
        return (-span) % stride

    h, w = x.shape[-2:]
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, kernel, kernel), (1, 1, stride, stride),
        ((0, 0), (0, 0), (padding, padding + extra(h)),
         (padding, padding + extra(w))))


def adaptive_avg_pool2d(x, out_size):
    """torch adaptive_avg_pool2d: output bin i averages input
    [floor(i*n/o), ceil((i+1)*n/o))."""
    import numpy as np

    def mat(n, o):
        m = np.zeros((o, n), dtype=np.float32)
        for i in range(o):
            s = int(np.floor(i * n / o))
            e = int(np.ceil((i + 1) * n / o))
            m[i, s:e] = 1.0 / (e - s)
        return m

    h, w = x.shape[-2:]
    oh, ow = (out_size, out_size) if isinstance(out_size, int) else out_size
    mh = jnp.asarray(mat(h, oh), x.dtype)
    mw = jnp.asarray(mat(w, ow), x.dtype)
    out = jnp.einsum("oh,bchw->bcow", mh, x, precision=_PREC_lookup())
    return jnp.einsum("pw,bchw->bchp", mw, out, precision=_PREC_lookup())


def upsample_nearest(x, factor=2):
    b, c, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None],
                         (b, c, h, factor, w, factor))
    return x.reshape(b, c, h * factor, w * factor)
