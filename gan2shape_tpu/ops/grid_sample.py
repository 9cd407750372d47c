"""Differentiable bilinear / nearest grid sampling (torch-1.2 `F.grid_sample`
semantics: align_corners=True, zero padding — the convention the reference's
warp grids are built for, renderer.py:87 normalizes by (W-1, H-1)).

TPU design: XLA gathers cost ~10-17 ns per INDEX (nearly independent of the
slice size), so the bilinear sample fetches each pixel's 2x2 neighborhood as
ONE windowed gather of the channel-packed image (slice_sizes (2,2,C)) instead
of four per-tap gathers — measured 4x fewer gather-microseconds in the step-2
pseudo-sample path.  The per-tap values are then selected from the window with
elementwise ops, preserving the exact zero-padding edge semantics (window
starts clamp into bounds; out-of-bounds taps are masked to zero).  The VJP is
a single windowed scatter-add (XLA transpose of the gather) — the image-
gradient splat the CUDA implementation hand-writes.
"""

import os

import jax
import jax.numpy as jnp


def _gather_2d(xf, idx):
    # xf: (B, C, H*W), idx: (B, P) -> (B, C, P)
    return jnp.take_along_axis(xf, idx[:, None, :], axis=2)


def _nearest_planes(x, gy, gx, iyr, ixr, valid):
    """Pixel-aligned nearest sampling through the windowed planes fetch:
    round(g) is always one of the 2x2 window corners at floor(g), so the
    nearest tap is a select over the fetched planes.  Routes the 262k
    per-pixel single-element gathers (~2.8 ms/iter at b=16 in step 2)
    through the displacement-decomposed Pallas fetch / block-gather instead.
    Enabled together with the block route (G2S_FETCH_XL=block) — the
    planes fetch's own per-pixel fallback is SLOWER than a single-element
    gather, so this only pays when the fast routes are on."""
    from gan2shape_tpu.ops.gather_window import gather_window2x2_planes

    b, c, h, w = x.shape
    iy0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, h - 2)
    ix0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, w - 2)
    planes = gather_window2x2_planes(
        x, iy0.reshape(b, h, w), ix0.reshape(b, h, w))
    a = jnp.clip(jnp.clip(iyr, 0, h - 1) - iy0, 0, 1).reshape(b, 1, h, w)
    s = jnp.clip(jnp.clip(ixr, 0, w - 1) - ix0, 0, 1).reshape(b, 1, h, w)
    p0 = jnp.where(s == 1, planes[:, 0, 1], planes[:, 0, 0])
    p1 = jnp.where(s == 1, planes[:, 1, 1], planes[:, 1, 0])
    out = jnp.where(a == 1, p1, p0)
    return out * valid.reshape(b, 1, h, w).astype(x.dtype)


def grid_sample_im_mask(x, mask, grid):
    """Fused bilinear image + nearest mask sampling at the SAME grid
    (the pseudo-sample hot path, renderer.render_given_view: reference
    renderer.py:261-263 samples image bilinear and mask nearest from one
    warp grid).  XLA gathers cost ~17 ns per INDEX with slice size nearly
    free, so fetching the channel-concatenated (im | mask) 2x2 windows in
    ONE planes fetch makes the mask's nearest sample a free tap-select
    over the already-fetched window (round(g) is always a corner of the
    window at floor(g)) — deletes the 262k single-element nearest gather
    (~2.8 ms/iter at b=16 in step 2, trace-verified).

    x: (B, C, H, W); mask: (B, Cm, H, W); grid: (B, H, W, 2) pixel-aligned.
    Returns (warped_im (B, C, H, W), warped_mask (B, Cm, H, W)), bit-equal
    to grid_sample(x, grid, 'bilinear') / grid_sample(mask, grid,
    'nearest').  Falls back to the two separate calls when the grid is not
    pixel-aligned or dtypes differ.

    Note on Pallas routing: the fused fetch concatenates image+mask into a
    C+Cm-channel planes fetch, and gather_window2x2_planes' fast Pallas
    small-displacement routes are gated on c==3 (_pixel_grid_ok) — so fused
    calls always take the block-gather / fallback routes.  Inert for the
    live pseudo-view path (its displacement bbox area exceeds
    G2S_FETCH_AREA_LIMIT anyway, PERF_NOTES #9), but a future caller with
    near-identity warps should either split the calls or generalize
    _pixel_grid_ok to arbitrary channel counts."""
    b, c, h, w = x.shape
    _, hg, wg, _ = grid.shape
    if (hg, wg) != (h, w) or mask.dtype != x.dtype:
        return (grid_sample(x, grid, mode="bilinear"),
                grid_sample(mask, grid, mode="nearest"))

    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    gx = gx.reshape(b, h * w)
    gy = gy.reshape(b, h * w)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    wx1 = gx - x0
    wx0 = 1.0 - wx1
    wy1 = gy - y0
    wy0 = 1.0 - wy1
    x0c = jnp.clip(ix0, 0, w - 2)
    y0c = jnp.clip(iy0, 0, h - 2)
    dx = ix0 - x0c
    dy = iy0 - y0c

    from gan2shape_tpu.ops.gather_window import gather_window2x2_planes

    planes = gather_window2x2_planes(
        jnp.concatenate([x, mask], 1),
        y0c.reshape(b, h, w), x0c.reshape(b, h, w))  # (B, 2, 2, C+Cm, H, W)
    imp = planes[:, :, :, :c]
    mkp = planes[:, :, :, c:]

    # bilinear image taps (identical math to grid_sample's pixel-aligned
    # branch)
    dyg = dy.reshape(b, 1, h, w)
    dxg = dx.reshape(b, 1, h, w)

    def tap_p(p, a, bb):
        ra = jnp.clip(dyg + a, 0, 1) == 1
        rb = jnp.clip(dxg + bb, 0, 1) == 1
        p0 = jnp.where(rb, p[:, 0, 1], p[:, 0, 0])
        p1 = jnp.where(rb, p[:, 1, 1], p[:, 1, 0])
        return jnp.where(ra, p1, p0)

    out = jnp.zeros((b, c, h, w), x.dtype)
    for a, wy in ((0, wy0), (1, wy1)):
        for bb, wx in ((0, wx0), (1, wx1)):
            jj = ix0 + bb
            ii = iy0 + a
            valid = ((jj >= 0) & (jj <= w - 1)
                     & (ii >= 0) & (ii <= h - 1))
            wgt = ((wy * wx) * valid.astype(x.dtype)).reshape(b, 1, h, w)
            out = out + tap_p(imp, a, bb) * wgt

    # nearest mask tap: round(g) corner of the floor window (the
    # _nearest_planes select, with the same validity semantics)
    ixr = jnp.round(gx).astype(jnp.int32)
    iyr = jnp.round(gy).astype(jnp.int32)
    mvalid = ((ixr >= 0) & (ixr <= w - 1) & (iyr >= 0) & (iyr <= h - 1))
    a = jnp.clip(jnp.clip(iyr, 0, h - 1) - y0c, 0, 1).reshape(b, 1, h, w)
    s = jnp.clip(jnp.clip(ixr, 0, w - 1) - x0c, 0, 1).reshape(b, 1, h, w)
    m0 = jnp.where(s == 1, mkp[:, 0, 1], mkp[:, 0, 0])
    m1 = jnp.where(s == 1, mkp[:, 1, 1], mkp[:, 1, 0])
    mout = jnp.where(a == 1, m1, m0)
    mout = mout * mvalid.reshape(b, 1, h, w).astype(x.dtype)
    return out, mout


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

    if mode == "nearest":
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)

        def gather_path(x, gy, gx, iy, ix, valid):
            xf = x.reshape(b, c, h * w)
            idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
            out = _gather_2d(xf, idx) * valid[:, None, :].astype(x.dtype)
            return out.reshape(b, c, hg, wg)

        if (hg == h and wg == w
                and os.environ.get("G2S_FETCH_XL", "gather") == "block"):
            # the planes fetch only pays when one of its fast routes (Pallas
            # small-displacement roll or block gather) is live; on
            # spread-violating steep warps its per-pixel fallback is ~2x a
            # single-element gather (measured: step2 59.7 -> 63.5 ms/iter
            # when forced) — route by the SAME runtime spread predicate the
            # block cond uses, so steep warps keep the plain gather
            from gan2shape_tpu.ops.gather_window import (
                _block_cfg, _block_spread_ok)
            bs, k = _block_cfg()
            if bs > 1 and h % bs == 0 and w % bs == 0 and k <= min(h, w):
                iy0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, h - 2)
                ix0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, w - 2)
                from gan2shape_tpu.ops.gather_window import _disp, _area
                from gan2shape_tpu.ops.gather_window import _area_limit
                iy0g = iy0.reshape(b, h, w)
                ix0g = ix0.reshape(b, h, w)
                dyv, dxv = _disp(iy0g, ix0g, h, w)
                fast = (_block_spread_ok(iy0g, ix0g, bs, k)
                        | (_area(dyv, dxv) <= _area_limit()))
                return jax.lax.cond(fast, _nearest_planes, gather_path,
                                    x, gy, gx, iy, ix, valid)
            return _nearest_planes(x, gy, gx, iy, ix, valid)
        return gather_path(x, gy, gx, iy, ix, valid)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode: {mode}")

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    wx1 = gx - x0
    wx0 = 1.0 - wx1
    wy1 = gy - y0
    wy0 = 1.0 - wy1

    x0c = jnp.clip(ix0, 0, w - 2)
    y0c = jnp.clip(iy0, 0, h - 2)
    dx = ix0 - x0c  # 0 normally; +-1 at the edges (taps re-selected below)
    dy = iy0 - y0c

    if hg == h and wg == w:
        # pixel-aligned sampling (the hot path: warping same-size images):
        # fetch the 2x2 neighborhoods in PLANE layout — displacement-
        # decomposed Pallas fetch/splat on TPU, no gather/scatter and no
        # (B, P, 2, 2, C) relayout; the output is already (B, C, H, W)
        from gan2shape_tpu.ops.gather_window import gather_window2x2_planes

        planes = gather_window2x2_planes(
            x, y0c.reshape(b, h, w), x0c.reshape(b, h, w))
        dyg = dy.reshape(b, 1, h, w)
        dxg = dx.reshape(b, 1, h, w)

        def tap_p(a, bb):
            ra = jnp.clip(dyg + a, 0, 1) == 1
            rb = jnp.clip(dxg + bb, 0, 1) == 1
            p0 = jnp.where(rb, planes[:, 0, 1], planes[:, 0, 0])
            p1 = jnp.where(rb, planes[:, 1, 1], planes[:, 1, 0])
            return jnp.where(ra, p1, p0)  # (B, C, H, W)

        out = jnp.zeros((b, c, h, w), x.dtype)
        for a, wy in ((0, wy0), (1, wy1)):
            for bb, wx in ((0, wx0), (1, wx1)):
                jj = ix0 + bb
                ii = iy0 + a
                valid = ((jj >= 0) & (jj <= w - 1)
                         & (ii >= 0) & (ii <= h - 1))
                wgt = ((wy * wx) * valid.astype(x.dtype)
                       ).reshape(b, 1, h, w)
                out = out + tap_p(a, bb) * wgt
        return out

    # general sizes: one windowed gather of the 2x2 neighborhood per sample
    from gan2shape_tpu.ops.gather_window import gather_window2x2

    starts = jnp.stack([y0c, x0c], -1)  # (B, P, 2)
    xhwc = x.transpose(0, 2, 3, 1)  # (B, H, W, C)
    patch = gather_window2x2(xhwc, starts)  # (B, P, 2, 2, C)

    def tap(a, bb):
        """Value at absolute position (iy0+a, ix0+bb), selected from the
        clamped window (row y0c+clip(dy+a,0,1), col x0c+clip(dx+bb,0,1) —
        exact where the tap is in bounds; invalid taps are masked out)."""
        ra = (jnp.clip(dy + a, 0, 1) == 1)[..., None]
        rb = (jnp.clip(dx + bb, 0, 1) == 1)[..., None]
        p0 = jnp.where(rb, patch[:, :, 0, 1], patch[:, :, 0, 0])
        p1 = jnp.where(rb, patch[:, :, 1, 1], patch[:, :, 1, 0])
        return jnp.where(ra, p1, p0)  # (B, P, C)

    out = jnp.zeros((b, hg * wg, c), x.dtype)
    for a, wy in ((0, wy0), (1, wy1)):
        for bb, wx in ((0, wx0), (1, wx1)):
            jj = ix0 + bb
            ii = iy0 + a
            valid = (jj >= 0) & (jj <= w - 1) & (ii >= 0) & (ii <= h - 1)
            wgt = (wy * wx) * valid.astype(x.dtype)
            out = out + tap(a, bb) * wgt[..., None]
    return out.transpose(0, 2, 1).reshape(b, c, hg, wg)
