"""upfirdn2d — fused upsample / FIR filter / downsample, TPU-native.

Behavioral spec (matches the reference CUDA kernel + its pure-PyTorch fallback,
/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch/op/upfirdn2d.py:157-198):

  1. zero-stuff the input by `up` along H and W (up-1 zeros after every sample,
     including the last),
  2. zero-pad by (pad0, pad1) on each spatial axis (negative pad = crop),
  3. convolve with the 2-D FIR `kernel` (true convolution, i.e. correlation
     with the flipped kernel),
  4. keep every `down`-th sample.

Output size per axis: (in * up + pad0 + pad1 - k) // down + 1.

TPU design: instead of a hand-scheduled shared-memory CUDA kernel, the whole
pipeline is ONE `lax.conv_general_dilated` call — `lhs_dilation` implements the
zero-stuffing, conv padding implements step 2, `window_strides` implements
step 4 — which XLA tiles and fuses on its own.  When the FIR kernel is a rank-1
outer product (every blur kernel StyleGAN2 uses is), we run two 1-D passes
instead, halving the multiply count.  Gradients come from XLA's conv transpose,
which is itself an upfirdn2d with swapped up/down — the same identity the
reference implements by hand (op/upfirdn2d.py:18-141).
"""

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def setup_filter(k, gain=1.0, separable=None):
    """Build a FIR kernel the way StyleGAN2's `make_kernel` does.

    `k` is a 1-D or 2-D array-like.  A 1-D input is outer-producted with
    itself.  The kernel is normalized to sum 1 and multiplied by `gain`
    (reference: stylegan2-pytorch/model.py:22-30, with gain = factor**2 for
    upsampling paths).

    Returns (kernel_2d, kernel_1d_or_None) as NUMPY arrays — host-side
    constants, never tracers, so the separable path can build its FIR
    matrices at trace time.  The 1-D factor is returned when the kernel is
    exactly separable as an outer product, enabling the 2-pass fast path.
    """
    k = np.asarray(k, dtype=np.float32)
    k1d = None
    if k.ndim == 1:
        k = k / k.sum()
        k1d = (k * np.sqrt(gain)).astype(np.float32)
        k = np.outer(k, k) * gain
    else:
        k = k / k.sum() * gain
        if separable is None or separable:
            # detect rank-1 kernels so callers passing 2-D kernels still get
            # the separable fast path
            u, s, vt = np.linalg.svd(k)
            if s[1:].max(initial=0.0) < 1e-12 * max(s[0], 1e-30) and np.allclose(
                np.outer(u[:, 0], vt[0]) * s[0], k, atol=1e-12
            ):
                a = u[:, 0] * np.sqrt(s[0])
                b = vt[0] * np.sqrt(s[0])
                if np.allclose(a, b, atol=1e-9):
                    k1d = a.astype(np.float32)
    return k.astype(np.float32), k1d


def _upfirdn2d_conv(x, kernel, up, down, pad):
    """Generic path: one dilated conv over (N*C, 1, H, W)."""
    b, c, h, w = x.shape
    up_y, up_x = up
    down_y, down_x = down
    pad_y0, pad_y1, pad_x0, pad_x1 = pad
    kh, kw = kernel.shape

    x = x.reshape(b * c, 1, h, w)
    # Reference zero-stuffing appends up-1 trailing zeros; lhs_dilation does
    # not, so fold the difference into the high padding (zeros convolved with
    # zeros are zeros — numerically identical).
    rhs = jnp.flip(kernel, (0, 1)).reshape(1, 1, kh, kw).astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )
    out_h = (h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
    return out.reshape(b, c, out_h, out_w)


@lru_cache(maxsize=None)
def _fir_matrix(in_size, k_tuple, up, down, pad0, pad1):
    """(out, in) matrix implementing a 1-D zero-stuff/pad/FIR/downsample.

    out[o] = sum_j xdp[o*down + j] * k_flip[j], where xdp is the zero-stuffed
    (factor `up`) input padded by (pad0, pad1) — identical to the dilated-conv
    formulation but expressed as a small banded matrix so the FIR runs as an
    MXU matmul batched over (N, C, other-axis).  A per-channel 1-ch conv (the
    previous formulation) has contraction depth 1 and runs at ~0.5% MXU
    utilization — this was the dominant cost of the whole discriminator."""
    k = np.asarray(k_tuple, np.float32)
    kn = len(k)
    out_size = (in_size * up + pad0 + pad1 - kn) // down + 1
    m = np.zeros((out_size, in_size), np.float32)
    kf = k[::-1]
    for i in range(in_size):
        y = pad0 + i * up
        for o in range(out_size):
            j = y - o * down
            if 0 <= j < kn:
                m[o, i] += kf[j]
    return m


def _upfirdn2d_separable(x, k1d, up, down, pad, channel_last=False):
    """Separable fast path: two 1-D FIR passes (H then W) as matmuls.
    `channel_last` treats x as (N, H, W, C) — the NHWC internal layout of
    the frozen conv stacks (G2S_CONV_LAYOUT=nhwc)."""
    from gan2shape_tpu.utils.precision import matmul_precision

    if channel_last:
        b, h, w, c = x.shape
    else:
        b, c, h, w = x.shape
    up_y, up_x = up
    down_y, down_x = down
    pad_y0, pad_y1, pad_x0, pad_x1 = pad
    k_tuple = tuple(np.asarray(k1d).tolist())

    mh = jnp.asarray(_fir_matrix(h, k_tuple, up_y, down_y, pad_y0, pad_y1),
                     x.dtype)
    mw = jnp.asarray(_fir_matrix(w, k_tuple, up_x, down_x, pad_x0, pad_x1),
                     x.dtype)
    prec = matmul_precision()
    if channel_last:
        out = jnp.einsum("oh,bhwc->bowc", mh, x, precision=prec)
        out = jnp.einsum("pw,bhwc->bhpc", mw, out, precision=prec)
        return out
    out = jnp.einsum("oh,bchw->bcow", mh, x, precision=prec)
    out = jnp.einsum("pw,bchw->bchp", mw, out, precision=prec)
    return out


@partial(jax.jit, static_argnames=("up", "down", "pad"))
def _upfirdn2d_jit(x, kernel, up, down, pad):
    return _upfirdn2d_conv(x, kernel, up, down, pad)


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0), kernel_1d=None,
              channel_last=False):
    """Apply upfirdn2d to `x` (N, C, H, W) — or (N, H, W, C) with
    `channel_last=True` (the NHWC internal layout of the frozen stacks).

    `up`/`down` are ints or (y, x) pairs; `pad` is (pad0, pad1) applied to both
    axes or a 4-tuple (y0, y1, x0, x1) — matching the reference entry point
    (op/upfirdn2d.py:144-154).  Pass `kernel_1d` (from `setup_filter`) to take
    the separable 2-pass path.
    """
    up = (up, up) if isinstance(up, int) else tuple(up)
    down = (down, down) if isinstance(down, int) else tuple(down)
    if len(pad) == 2:
        pad = (pad[0], pad[1], pad[0], pad[1])
    else:
        pad = tuple(pad)
    if kernel_1d is not None:
        return _upfirdn2d_separable(x, kernel_1d, up, down, pad,
                                    channel_last=channel_last)
    if channel_last:
        # non-separable kernels never occur in the NHWC hot path (every
        # StyleGAN2 blur is rank-1); correctness fallback via transposes
        out = _upfirdn2d_conv(x.transpose(0, 3, 1, 2), kernel, up, down, pad)
        return out.transpose(0, 2, 3, 1)
    return _upfirdn2d_conv(x, kernel, up, down, pad)


def upsample2d(x, kernel, kernel_1d=None, factor=2):
    """FIR upsample (reference Upsample module, stylegan2 model.py:33-51).
    Note the caller must bake gain=factor**2 into the kernel via setup_filter.
    """
    k = kernel.shape[0]
    p = k - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=factor, down=1, pad=(pad0, pad1),
                     kernel_1d=kernel_1d)


def downsample2d(x, kernel, kernel_1d=None, factor=2):
    """FIR downsample (reference Downsample module, stylegan2 model.py:54-72)."""
    k = kernel.shape[0]
    p = k - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1),
                     kernel_1d=kernel_1d)


def blur2d(x, kernel, pad, kernel_1d=None):
    """Plain FIR blur with explicit padding (reference Blur module)."""
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad, kernel_1d=kernel_1d)
