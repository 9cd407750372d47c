"""Differentiable bilinear / nearest grid sampling (torch-1.2 `F.grid_sample`
semantics: align_corners=True, zero padding — the convention the reference's
warp grids are built for, renderer.py:87 normalizes by (W-1, H-1)).

TPU design: the sample is 4 batched gathers + VPU blends.  XLA lowers
`take_along_axis` to a dynamic-gather and its VJP to a scatter-add, which is
exactly the image-gradient splat the CUDA implementation hand-writes.
"""

import jax.numpy as jnp


def _gather_2d(xf, idx):
    # xf: (B, C, H*W), idx: (B, P) -> (B, C, P)
    return jnp.take_along_axis(xf, idx[:, None, :], axis=2)


def grid_sample(x, grid, mode="bilinear"):
    """Sample `x` (B, C, H, W) at `grid` (B, Hg, Wg, 2) locations.

    grid[..., 0] is x (width axis), grid[..., 1] is y, both in [-1, 1] with
    align_corners=True mapping: -1 -> 0, +1 -> size-1.  Out-of-bounds samples
    read as zero.  Returns (B, C, Hg, Wg).
    """
    b, c, h, w = x.shape
    _, hg, wg, _ = grid.shape

    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    gx = gx.reshape(b, hg * wg)
    gy = gy.reshape(b, hg * wg)

    xf = x.reshape(b, c, h * w)

    if mode == "nearest":
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        out = _gather_2d(xf, idx) * valid[:, None, :].astype(x.dtype)
        return out.reshape(b, c, hg, wg)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode: {mode}")

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = gx - x0
    wx0 = 1.0 - wx1
    wy1 = gy - y0
    wy0 = 1.0 - wy1

    out = jnp.zeros((b, c, hg * wg), x.dtype)
    for yi, wy in ((y0, wy0), (y1, wy1)):
        for xi, wx in ((x0, wx0), (x1, wx1)):
            ii = yi.astype(jnp.int32)
            jj = xi.astype(jnp.int32)
            valid = (jj >= 0) & (jj <= w - 1) & (ii >= 0) & (ii <= h - 1)
            idx = jnp.clip(ii, 0, h - 1) * w + jnp.clip(jj, 0, w - 1)
            wgt = (wy * wx) * valid.astype(x.dtype)
            out = out + _gather_2d(xf, idx) * wgt[:, None, :]
    return out.reshape(b, c, hg, wg)
