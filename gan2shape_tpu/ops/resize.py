"""Image resize as separable matrix products — TPU-native formulation.

The reference resizes with `F.interpolate` (bilinear when upscaling, area when
downscaling — GAN2Shape/utils.py:12-23).  Both modes are separable linear maps,
so on TPU we build the (out, in) interpolation matrix once (a trace-time numpy
constant) and apply it as two matmuls, which run on the MXU instead of the
gather/scatter paths a port would use.

  bilinear (align_corners=False): src = (dst + 0.5) * in/out - 0.5, edge-clamped
  area: adaptive average pooling — output i averages inputs
        [floor(i*in/out), ceil((i+1)*in/out))
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _bilinear_matrix(in_size: int, out_size: int):
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    x0 = np.floor(src)
    frac = src - x0
    i0 = np.clip(x0, 0, in_size - 1).astype(np.int64)
    i1 = np.clip(x0 + 1, 0, in_size - 1).astype(np.int64)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), (1.0 - frac).astype(np.float32))
    np.add.at(m, (rows, i1), frac.astype(np.float32))
    return m


@lru_cache(maxsize=None)
def _bilinear_ac_matrix(in_size: int, out_size: int):
    """align_corners=True: src = dst * (in-1)/(out-1)."""
    if out_size == 1:
        m = np.zeros((1, in_size), np.float32)
        m[0, 0] = 1.0
        return m
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    x0 = np.floor(src)
    frac = src - x0
    i0 = np.clip(x0, 0, in_size - 1).astype(np.int64)
    i1 = np.clip(x0 + 1, 0, in_size - 1).astype(np.int64)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), (1.0 - frac).astype(np.float32))
    np.add.at(m, (rows, i1), frac.astype(np.float32))
    return m


def resize_bilinear_align_corners(image, size):
    """Bilinear resize with align_corners=True (the segmentation nets'
    convention — reference networks.py:269,344,565)."""
    h, w = image.shape[-2], image.shape[-1]
    nh, nw = int(size[0]), int(size[1])
    if nh == h and nw == w:
        return image
    return _apply_separable(image, _bilinear_ac_matrix(h, nh),
                            _bilinear_ac_matrix(w, nw))


@lru_cache(maxsize=None)
def _area_matrix(in_size: int, out_size: int):
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = int(np.floor(i * in_size / out_size))
        end = int(np.ceil((i + 1) * in_size / out_size))
        m[i, start:end] = 1.0 / (end - start)
    return m


def _apply_separable(x, mh, mw):
    # x: (..., H, W); out = mh @ x @ mw^T
    mh = jnp.asarray(mh, x.dtype)
    mw = jnp.asarray(mw, x.dtype)
    out = jnp.einsum("oh,...hw->...ow", mh, x, precision="highest")
    out = jnp.einsum("pw,...hw->...hp", mw, out, precision="highest")
    return out


def resize(image, size):
    """Resize (..., H, W) to `size` = (new_h, new_w).

    Mode selection follows the reference (utils.py:12-23): bilinear when
    growing, area when shrinking, identity when equal (per the H axis).
    """
    h, w = image.shape[-2], image.shape[-1]
    nh, nw = int(size[0]), int(size[1])
    if nh == h and nw == w:
        return image
    if nh > h:
        mh, mw = _bilinear_matrix(h, nh), _bilinear_matrix(w, nw)
    else:
        mh, mw = _area_matrix(h, nh), _area_matrix(w, nw)
    return _apply_separable(image, mh, mw)


def crop(tensor, crop_size):
    """Center crop on the last two axes (reference utils.py:26-30)."""
    size = tensor.shape[-2]
    margin = (size - crop_size) // 2
    return tensor[..., margin:margin + crop_size, margin:margin + crop_size]
