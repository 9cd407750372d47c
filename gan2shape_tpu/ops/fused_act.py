"""Fused bias + scaled LeakyReLU (the reference's fused_bias_act CUDA kernel,
/root/reference/.../op/fused_bias_act_kernel.cu and op/fused_act.py:86-92).

On TPU this is a pure VPU expression; XLA fuses it into the surrounding
matmul/conv epilogue on its own, so no Pallas kernel is needed — the CUDA
kernel existed only because PyTorch eager could not fuse.
"""

import jax.numpy as jnp


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5,
                     channel_axis=1):
    """scale * leaky_relu(x + bias).  `bias` broadcasts over `channel_axis`
    for >=2-D inputs (axis 1 = NCHW default; pass -1 under the NHWC internal
    layout) and the last axis for 1/2-D inputs (linear layers), matching the
    reference (op/fused_act.py:86-92)."""
    if bias is not None:
        if x.ndim > 2:
            ax = channel_axis % x.ndim
            shape = [1] * x.ndim
            shape[ax] = -1
            b = bias.reshape(shape)
        else:
            b = bias.reshape((1, -1)) if x.ndim == 2 else bias
        # cast instead of promoting: under the bf16 activation policy the
        # stack must stay in x.dtype (f32 bias would silently upcast)
        x = x + b.astype(x.dtype)
    return jnp.asarray(scale, x.dtype) * jnp.where(
        x >= 0, x, x * jnp.asarray(negative_slope, x.dtype))


def inverse_fused_leaky_relu(x, bias, negative_slope=0.2, scale=2 ** 0.5):
    """Analytic inverse, used by the generator's `style_invert`
    (reference stylegan2 model.py:132-135)."""
    y = x / scale
    y = jnp.where(y >= 0, y, y / negative_slope)
    b = bias.reshape((1, -1) + (1,) * (x.ndim - 2))
    return y - b
