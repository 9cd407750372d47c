"""Small tensor helpers (parity: /root/reference/GAN2Shape/renderer/utils.py
and GAN2Shape/utils.py) with explicit-PRNG replacements for the torch global
RNG calls."""

import jax
import jax.numpy as jnp


def mm_normalize(x, min=0.0, max=1.0):
    """Min-max normalize (reference renderer/utils.py:4-10)."""
    x_min = jnp.min(x)
    x_max = jnp.max(x)
    x_z = (x - x_min) / jnp.maximum(x_max - x_min, 1e-12)
    return x_z * (max - min) + min


def rand_range(key, size, min, max):
    """(reference renderer/utils.py:13-14, explicit key)"""
    return jax.random.uniform(key, size) * (max - min) + min


def rand_posneg_range(key, size, min, max):
    """Uniform magnitude in [min, max] with random sign
    (reference renderer/utils.py:17-19)."""
    k1, k2 = jax.random.split(key)
    sign = (jax.random.uniform(k1, size) > 0.5).astype(jnp.float32) * 2 - 1
    return sign * rand_range(k2, size, min, max)


def get_grid(b, h, w, normalize=True):
    """(x, y) pixel grid, y down (reference renderer/utils.py:22-30)."""
    if normalize:
        h_range = jnp.linspace(-1, 1, h)
        w_range = jnp.linspace(-1, 1, w)
    else:
        h_range = jnp.arange(0, h, dtype=jnp.float32)
        w_range = jnp.arange(0, w, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(h_range, w_range, indexing="ij")
    grid = jnp.stack([xx, yy], -1)
    return jnp.broadcast_to(grid[None], (b, h, w, 2))


def get_mask_range(mask):
    """Bounding box (max_y, min_y, max_x, min_x) of a boolean mask
    (reference GAN2Shape/utils.py:33-41)."""
    ys = jnp.any(mask, axis=1)
    xs = jnp.any(mask, axis=0)
    idx_y = jnp.arange(mask.shape[0])
    idx_x = jnp.arange(mask.shape[1])
    max_y = jnp.max(jnp.where(ys, idx_y, -1))
    min_y = jnp.min(jnp.where(ys, idx_y, mask.shape[0]))
    max_x = jnp.max(jnp.where(xs, idx_x, -1))
    min_x = jnp.min(jnp.where(xs, idx_x, mask.shape[1]))
    return max_y, min_y, max_x, min_x
