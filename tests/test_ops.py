"""Unit tests for the numerics kernels against independent oracles
(numpy loops and torch CPU — the same role the reference's pure-PyTorch
fallbacks play for its CUDA kernels, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF
import pytest

from gan2shape_tpu.ops import (
    upfirdn2d, setup_filter, fused_leaky_relu, inverse_fused_leaky_relu,
    grid_sample, resize, crop,
)
from gan2shape_tpu.ops.upfirdn2d import upsample2d, downsample2d


def upfirdn2d_numpy(x, k, up, down, pad):
    """Independent loop oracle for upfirdn2d semantics."""
    b, c, h, w = x.shape
    uy, ux = up
    dy, dx = down
    p_y0, p_y1, p_x0, p_x1 = pad
    kh, kw = k.shape
    # zero-stuff
    z = np.zeros((b, c, h * uy, w * ux), x.dtype)
    z[:, :, ::uy, ::ux] = x
    # pad (negative = crop)
    H, W = h * uy + p_y0 + p_y1, w * ux + p_x0 + p_x1
    out = np.zeros((b, c, H, W), x.dtype)
    ys = slice(max(p_y0, 0), max(p_y0, 0) + z.shape[2] - max(-p_y0, 0) - max(-p_y1, 0))
    xs = slice(max(p_x0, 0), max(p_x0, 0) + z.shape[3] - max(-p_x0, 0) - max(-p_x1, 0))
    out[:, :, ys, xs] = z[:, :, max(-p_y0, 0):z.shape[2] - max(-p_y1, 0),
                          max(-p_x0, 0):z.shape[3] - max(-p_x1, 0)]
    # true convolution with kernel
    oh, ow = H - kh + 1, W - kw + 1
    res = np.zeros((b, c, oh, ow), np.float64)
    kf = k[::-1, ::-1]
    for i in range(kh):
        for j in range(kw):
            res += out[:, :, i:i + oh, j:j + ow] * kf[i, j]
    return res[:, :, ::dy, ::dx].astype(x.dtype)


@pytest.mark.parametrize("up,down,pad", [
    ((1, 1), (1, 1), (1, 1, 1, 1)),
    ((2, 2), (1, 1), (2, 1, 2, 1)),
    ((1, 1), (2, 2), (1, 1, 1, 1)),
    ((1, 1), (1, 1), (-1, 2, 0, -1)),
    ((2, 2), (2, 2), (2, 2, 2, 2)),
])
def test_upfirdn2d_matches_oracle(rng, up, down, pad):
    x = rng.standard_normal((2, 3, 11, 13)).astype(np.float32)
    k2d, k1d = setup_filter([1, 3, 3, 1])
    k = np.asarray(k2d)
    want = upfirdn2d_numpy(x, k, up, down, pad)
    got = np.asarray(upfirdn2d(jnp.asarray(x), k2d, up=up, down=down, pad=pad))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # separable fast path must agree
    got_sep = np.asarray(upfirdn2d(jnp.asarray(x), k2d, up=up, down=down,
                                   pad=pad, kernel_1d=k1d))
    np.testing.assert_allclose(got_sep, want, atol=1e-5)


def test_upfirdn2d_asymmetric_kernel(rng):
    x = rng.standard_normal((1, 2, 9, 9)).astype(np.float32)
    k = rng.standard_normal((3, 4)).astype(np.float32)
    want = upfirdn2d_numpy(x, k, (2, 2), (1, 1), (1, 1, 1, 1))
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=2, down=1,
                               pad=(1, 1)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_up_down_sample_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16)).astype(np.float32))
    k_up, k_up1 = setup_filter([1, 3, 3, 1], gain=4)
    k_dn, k_dn1 = setup_filter([1, 3, 3, 1])
    assert upsample2d(x, k_up, k_up1).shape == (1, 4, 32, 32)
    assert downsample2d(x, k_dn, k_dn1).shape == (1, 4, 8, 8)


def test_upfirdn2d_grad_flows(rng):
    x = jnp.asarray(rng.standard_normal((1, 1, 8, 8)).astype(np.float32))
    k2d, k1d = setup_filter([1, 3, 3, 1], gain=4)

    def f(x):
        return jnp.sum(upsample2d(x, k2d, k1d) ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_fused_leaky_relu_matches_torch(rng):
    x = rng.standard_normal((2, 5, 4, 4)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    want = (2 ** 0.5) * tF.leaky_relu(
        torch.from_numpy(x) + torch.from_numpy(b).view(1, -1, 1, 1), 0.2)
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-6)
    # 2-D (linear layer) input
    x2 = rng.standard_normal((3, 5)).astype(np.float32)
    want2 = (2 ** 0.5) * tF.leaky_relu(
        torch.from_numpy(x2) + torch.from_numpy(b).view(1, -1), 0.2)
    got2 = np.asarray(fused_leaky_relu(jnp.asarray(x2), jnp.asarray(b)))
    np.testing.assert_allclose(got2, want2.numpy(), atol=1e-6)


def test_inverse_fused_leaky_relu_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(5).astype(np.float32))
    y = fused_leaky_relu(x, b)
    x_rec = inverse_fused_leaky_relu(y, b)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(rng, mode):
    x = rng.standard_normal((2, 3, 9, 7)).astype(np.float32)
    grid = (rng.random((2, 5, 6, 2)).astype(np.float32) * 2.4 - 1.2)
    want = tF.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                          mode=mode, padding_mode="zeros", align_corners=True)
    got = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid), mode=mode))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)


def test_grid_sample_grads_match_torch(rng):
    x = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    grid = (rng.random((1, 4, 4, 2)).astype(np.float32) * 1.8 - 0.9)

    tx = torch.from_numpy(x).requires_grad_(True)
    tg = torch.from_numpy(grid).requires_grad_(True)
    tF.grid_sample(tx, tg, mode="bilinear", padding_mode="zeros",
                   align_corners=True).sum().backward()

    gx, gg = jax.grad(
        lambda x_, g_: jnp.sum(grid_sample(x_, g_)), argnums=(0, 1)
    )(jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg), tg.grad.numpy(), atol=1e-4)


@pytest.mark.parametrize("in_size,out_size", [(8, 16), (128, 473), (16, 8),
                                              (473, 128), (12, 12)])
def test_resize_matches_torch(rng, in_size, out_size):
    x = rng.standard_normal((2, 3, in_size, in_size)).astype(np.float32)
    if out_size > in_size:
        want = tF.interpolate(torch.from_numpy(x), (out_size, out_size),
                              mode="bilinear", align_corners=False)
    elif out_size < in_size:
        want = tF.interpolate(torch.from_numpy(x), (out_size, out_size),
                              mode="area")
    else:
        want = torch.from_numpy(x)
    got = np.asarray(resize(jnp.asarray(x), (out_size, out_size)))
    np.testing.assert_allclose(got, want.numpy(), atol=2e-4)


def test_resize_3d_input(rng):
    x = rng.standard_normal((2, 8, 8)).astype(np.float32)
    assert resize(jnp.asarray(x), (16, 16)).shape == (2, 16, 16)


def test_crop():
    x = jnp.arange(36, dtype=jnp.float32).reshape(1, 1, 6, 6)
    out = crop(x, 4)
    assert out.shape == (1, 1, 4, 4)
    assert out[0, 0, 0, 0] == 7.0


# ---- gather_window2x2 / splat_window (the windowed gather + its transpose)


def test_gather_window_vjp_is_exact_transpose(rng):
    """The hand-written VJP (ops/splat_window._splat_flat4 on CPU) must equal
    XLA's automatic transpose of the same windowed gather."""
    from gan2shape_tpu.ops.gather_window import (
        gather_window2x2, _gather_fwd_impl)

    b, h, w, c, p = 2, 16, 24, 3, 50
    op = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    starts = jnp.asarray(np.stack([
        np.stack([rng.integers(0, h - 1, p),
                  rng.integers(0, w - 1, p)], -1)
        for _ in range(b)]).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((b, p, 2, 2, c)).astype(np.float32))

    out, vjp = jax.vjp(lambda o: gather_window2x2(o, starts), op)
    out_ref, vjp_ref = jax.vjp(lambda o: _gather_fwd_impl(o, starts), op)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))
    np.testing.assert_allclose(np.asarray(vjp(g)[0]),
                               np.asarray(vjp_ref(g)[0]), rtol=0, atol=1e-5)


def test_splat_flat4_matches_dense_oracle(rng):
    """_splat_flat4 (the XLA scatter fallback and the Pallas kernel's oracle
    in tools/check_splat_tpu.py) vs a numpy loop."""
    from gan2shape_tpu.ops.splat_window import splat_window2x2_add

    b, h, w, c, p = 2, 8, 8, 2, 40
    shape = (b, h, w, c)
    starts = np.stack([np.stack([rng.integers(0, h - 1, p),
                                 rng.integers(0, w - 1, p)], -1)
                       for _ in range(b)]).astype(np.int32)
    g = rng.standard_normal((b, p, 2, 2, c)).astype(np.float32)

    want = np.zeros(shape, np.float32)
    for bi in range(b):
        for pi in range(p):
            y, x = starts[bi, pi]
            for a in (0, 1):
                for s in (0, 1):
                    want[bi, y + a, x + s] += g[bi, pi, a, s]

    got = np.asarray(splat_window2x2_add(
        jnp.asarray(g), jnp.asarray(starts), shape))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_gather_window_planes_matches_patch_layout(rng):
    """gather_window2x2_planes must equal the (B,P,2,2,C) gather re-laid
    into planes, and its VJP must equal the flat-scatter transpose."""
    from gan2shape_tpu.ops.gather_window import (
        gather_window2x2, gather_window2x2_planes)

    b, c, h, w = 2, 3, 16, 24
    src = jnp.asarray(rng.standard_normal((b, c, h, w)).astype(np.float32))
    iy = jnp.asarray(rng.integers(0, h - 1, (b, h, w)).astype(np.int32))
    ix = jnp.asarray(rng.integers(0, w - 1, (b, h, w)).astype(np.int32))
    starts = jnp.stack([iy.reshape(b, -1), ix.reshape(b, -1)], -1)

    def via_patch(src):
        patch = gather_window2x2(src.transpose(0, 2, 3, 1), starts)
        return (patch.reshape(b, h, w, 2, 2, c)
                .transpose(0, 3, 4, 5, 1, 2))

    def via_planes(src):
        return gather_window2x2_planes(src, iy, ix)

    out_a, vjp_a = jax.vjp(via_patch, src)
    out_b, vjp_b = jax.vjp(via_planes, src)
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_a))
    g = jnp.asarray(
        rng.standard_normal((b, 2, 2, c, h, w)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(vjp_b(g)[0]),
                               np.asarray(vjp_a(g)[0]), rtol=0, atol=1e-5)


def _pixel_planes_oracle(src, iy, ix):
    """Loop oracle: out[b, a, s, c, y, x] = src[b, c, iy+a, ix+s]."""
    b, c, h, w = src.shape
    out = np.zeros((b, 2, 2, c, h, w), src.dtype)
    for bb in range(b):
        for y in range(h):
            for x in range(w):
                yy = min(max(int(iy[bb, y, x]), 0), h - 2)
                xx = min(max(int(ix[bb, y, x]), 0), w - 2)
                for a in (0, 1):
                    for s in (0, 1):
                        out[bb, a, s, :, y, x] = src[bb, :, yy + a, xx + s]
    return out


def test_block_fetch_matches_oracle_smooth_warp(rng):
    """The block-gather route (one (K,K,C) gather per bs x bs destination
    block + one-hot tap selection) must be bit-exact vs the per-pixel
    windowed gather on a smooth large-offset warp — the pseudo-view regime
    it exists for (ops/gather_window.py:_block_fetch_impl)."""
    from gan2shape_tpu.ops.gather_window import (
        _block_fetch_impl, _block_spread_ok)

    b, c, h, w = 2, 3, 16, 24
    bs, k = 4, 8
    src = rng.standard_normal((b, c, h, w)).astype(np.float32)
    # smooth warp with a LARGE global offset range (rules out the
    # roll-decomposed path) but small local spread: a shifted ramp
    py, px = np.mgrid[0:h, 0:w].astype(np.float32)
    iy = np.clip(py + 5.0 * np.sin(px / 7.0) - 3.0, 0, h - 2)
    ix = np.clip(px + 6.0 * np.cos(py / 5.0) + 2.0, 0, w - 2)
    iy = np.broadcast_to(iy.astype(np.int32), (b, h, w)).copy()
    ix = np.broadcast_to(ix.astype(np.int32), (b, h, w)).copy()

    assert bool(_block_spread_ok(jnp.asarray(iy), jnp.asarray(ix), bs, k))
    out = _block_fetch_impl(jnp.asarray(src), jnp.asarray(iy),
                            jnp.asarray(ix), bs, k)
    np.testing.assert_array_equal(
        np.asarray(out), _pixel_planes_oracle(src, iy, ix))


def test_block_fetch_route_falls_back_on_steep_warp(rng, monkeypatch):
    """With G2S_FETCH_XL=block the planes fetch must stay exact in BOTH
    cond arms: block-eligible smooth warps and spread-violating random
    warps (fallback to the per-pixel gather)."""
    from gan2shape_tpu.ops import gather_window as gw

    monkeypatch.setenv("G2S_FETCH_XL", "block")
    monkeypatch.setenv("G2S_FETCH_BLOCK", "4")
    monkeypatch.setenv("G2S_FETCH_BLOCK_WIN", "8")
    b, c, h, w = 2, 3, 16, 24
    src = rng.standard_normal((b, c, h, w)).astype(np.float32)

    # random warp: spread inside a 4x4 block almost surely exceeds k-2
    iy_r = rng.integers(0, h - 1, (b, h, w)).astype(np.int32)
    ix_r = rng.integers(0, w - 1, (b, h, w)).astype(np.int32)
    assert not bool(gw._block_spread_ok(
        jnp.asarray(iy_r), jnp.asarray(ix_r), 4, 8))
    # constant large offset: block-eligible
    iy_s = np.full((b, h, w), h - 5, np.int32)
    ix_s = np.full((b, h, w), 3, np.int32)

    for iy, ix in ((iy_r, ix_r), (iy_s, ix_s)):
        out = jax.jit(gw.gather_window2x2_planes)(
            jnp.asarray(src), jnp.asarray(iy), jnp.asarray(ix))
        np.testing.assert_array_equal(
            np.asarray(out), _pixel_planes_oracle(src, iy, ix))


def test_block_fetch_edge_clipping(rng):
    """Window starts at the clip boundary (h-2, w-2) and 0 must select the
    same taps as the per-pixel gather (base clipped to h-K keeps every
    window in bounds)."""
    from gan2shape_tpu.ops.gather_window import _block_fetch_impl

    b, c, h, w = 1, 3, 8, 16
    bs, k = 4, 8
    src = rng.standard_normal((b, c, h, w)).astype(np.float32)
    iy = np.where(np.arange(h)[None, :, None] < 4, 0, h - 2).astype(np.int32)
    iy = np.broadcast_to(iy, (b, h, w)).copy()
    ix = np.where(np.arange(w)[None, None, :] < 8, 0, w - 2).astype(np.int32)
    ix = np.broadcast_to(ix, (b, h, w)).copy()
    out = _block_fetch_impl(jnp.asarray(src), jnp.asarray(iy),
                            jnp.asarray(ix), bs, k)
    np.testing.assert_array_equal(
        np.asarray(out), _pixel_planes_oracle(src, iy, ix))


def test_nearest_planes_route_matches_default(rng, monkeypatch):
    """Pixel-aligned nearest grid_sample through the planes/block route
    (G2S_FETCH_XL=block) must match the take_along_axis path bit-exactly —
    values AND input-gradient — including out-of-bounds samples."""
    b, c, h, w = 2, 3, 16, 24
    x = jnp.asarray(rng.standard_normal((b, c, h, w)).astype(np.float32))
    # grid spanning in-bounds, sub-pixel, and out-of-bounds samples
    g = rng.uniform(-1.3, 1.3, (b, h, w, 2)).astype(np.float32)
    grid = jnp.asarray(g)
    cot = jnp.asarray(rng.standard_normal((b, c, h, w)).astype(np.float32))

    monkeypatch.delenv("G2S_FETCH_XL", raising=False)
    want, vjp_d = jax.vjp(lambda xx: grid_sample(xx, grid, "nearest"), x)
    gw_d = vjp_d(cot)[0]

    monkeypatch.setenv("G2S_FETCH_XL", "block")
    got, vjp_b = jax.vjp(lambda xx: grid_sample(xx, grid, "nearest"), x)
    gw_b = vjp_b(cot)[0]

    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_d),
                               rtol=0, atol=1e-5)


def test_gather_window_planes_bf16_primal_vjp_dtype(rng):
    """The planes VJP must return the cotangent in the PRIMAL dtype — a
    bf16 primal previously produced an f32 dsrc (dtype-mismatch error in
    custom_vjp once bf16 activations feed warped images)."""
    from gan2shape_tpu.ops.gather_window import gather_window2x2_planes

    b, c, h, w = 2, 3, 8, 16
    src = jnp.asarray(rng.standard_normal((b, c, h, w))).astype(jnp.bfloat16)
    iy = jnp.asarray(rng.integers(0, h - 1, (b, h, w)).astype(np.int32))
    ix = jnp.asarray(rng.integers(0, w - 1, (b, h, w)).astype(np.int32))

    out, vjp = jax.vjp(lambda s: gather_window2x2_planes(s, iy, ix), src)
    assert out.dtype == jnp.bfloat16
    (dsrc,) = vjp(jnp.ones_like(out))
    assert dsrc.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(dsrc.astype(jnp.float32)).all())


def test_grid_sample_im_mask_matches_separate_calls(rng):
    """The fused im+mask sampler (one channel-concatenated planes fetch,
    renderer.render_given_view's hot path) must be bit-equal to the two
    separate grid_sample calls — values, including out-of-bounds samples,
    and the image gradient."""
    from gan2shape_tpu.ops.grid_sample import grid_sample_im_mask

    b, c, h, w = 2, 3, 16, 24
    x = jnp.asarray(rng.standard_normal((b, c, h, w)).astype(np.float32))
    mask = jnp.asarray(
        (rng.random((b, 2, h, w)) > 0.4).astype(np.float32))
    g = rng.uniform(-1.3, 1.3, (b, h, w, 2)).astype(np.float32)
    grid = jnp.asarray(g)
    cot = jnp.asarray(rng.standard_normal((b, c, h, w)).astype(np.float32))

    cot_mk = jnp.asarray(rng.standard_normal((b, 2, h, w)).astype(np.float32))

    want_im, vjp_wi = jax.vjp(
        lambda xx, gg: grid_sample(xx, gg, "bilinear"), x, grid)
    want_mk, vjp_wm = jax.vjp(
        lambda mm, gg: grid_sample(mm, gg, "nearest"), mask, grid)
    gw_x, gw_g_im = vjp_wi(cot)
    gw_m, gw_g_mk = vjp_wm(cot_mk)

    (got_im, got_mk), vjp_f = jax.vjp(
        lambda xx, mm, gg: grid_sample_im_mask(xx, mm, gg), x, mask, grid)
    # nonzero cotangents on BOTH outputs: exercises the mask-gradient path
    # (mask cotangent flowing through the fused planes-fetch VJP into the
    # mask input) and the grid gradient, not just d/d(image)
    gf_x, gf_m, gf_g = vjp_f((cot, cot_mk))

    np.testing.assert_array_equal(np.asarray(got_im), np.asarray(want_im))
    np.testing.assert_array_equal(np.asarray(got_mk), np.asarray(want_mk))
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gw_x),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf_m), np.asarray(gw_m),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf_g),
                               np.asarray(gw_g_im + gw_g_mk),
                               rtol=0, atol=1e-5)


def test_grid_sample_im_mask_non_pixel_aligned_fallback(rng):
    from gan2shape_tpu.ops.grid_sample import grid_sample_im_mask

    x = jnp.asarray(rng.standard_normal((2, 3, 9, 7)).astype(np.float32))
    mask = jnp.asarray((rng.random((2, 1, 9, 7)) > 0.5).astype(np.float32))
    grid = jnp.asarray(
        (rng.random((2, 5, 6, 2)).astype(np.float32) * 2.4 - 1.2))
    got_im, got_mk = grid_sample_im_mask(x, mask, grid)
    np.testing.assert_array_equal(
        np.asarray(got_im), np.asarray(grid_sample(x, grid, "bilinear")))
    np.testing.assert_array_equal(
        np.asarray(got_mk), np.asarray(grid_sample(mask, grid, "nearest")))
