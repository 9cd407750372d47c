"""Rendering-layer tests: geometry math against scipy oracles, rasterizer
round-trips, occlusion ordering, and gradient flow."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from gan2shape_tpu.rendering import (
    Renderer, get_rotation_matrix, get_transform_matrices,
)
from gan2shape_tpu.ops.rasterize import grid_faces, rasterize_depth

CFG = {"rot_center_depth": 1.0, "fov": 10, "tex_cube_size": 2}


def make_renderer(size=32):
    return Renderer(CFG, size, 0.9, 1.1)


def test_rotation_matrix_matches_scipy(rng):
    angles = rng.uniform(-1.0, 1.0, (4, 3)).astype(np.float32)
    got = np.asarray(get_rotation_matrix(
        jnp.asarray(angles[:, 0]), jnp.asarray(angles[:, 1]),
        jnp.asarray(angles[:, 2])))
    for i in range(4):
        want = ScipyRot.from_euler("xyz", angles[i]).as_matrix()
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_transform_matrices_view_dims(rng):
    for d in (3, 5, 6):
        v = jnp.asarray(rng.standard_normal((2, d)).astype(np.float32))
        rot, trans = get_transform_matrices(v)
        assert rot.shape == (2, 3, 3) and trans.shape == (2, 1, 3)
    with pytest.raises(ValueError):
        get_transform_matrices(jnp.zeros((1, 4)))


def test_depth_grid_roundtrip():
    r = make_renderer()
    depth = jnp.full((1, 32, 32), 1.0, jnp.float32)
    grid_3d = r.depth_to_3d_grid(depth)
    grid_2d = r.grid_3d_to_2d(grid_3d)
    # projecting the unprojection of a constant depth is the identity grid
    xs = np.linspace(-1, 1, 32, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(grid_2d[0, 0, :, 0]), xs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grid_2d[0, :, 0, 1]), xs, atol=1e-5)


def test_normals_flat_depth():
    r = make_renderer()
    depth = jnp.full((1, 32, 32), 1.0, jnp.float32)
    n = np.asarray(r.get_normal_from_depth(depth))
    # flat fronto-parallel plane -> +z normals everywhere (borders by def.);
    # tolerance accounts for the reference's additive EPS in the normalizer
    # (renderer.py:138) relative to the tiny cross-product magnitudes
    np.testing.assert_allclose(n[..., 2], 1.0, atol=2e-3)
    np.testing.assert_allclose(n[..., :2], 0.0, atol=1e-5)


def test_rasterize_identity_recovers_depth():
    r = make_renderer()
    depth = jnp.full((1, 32, 32), 1.0, jnp.float32)
    view = jnp.zeros((1, 6), jnp.float32)
    rot, trans = get_transform_matrices(view)
    out = np.asarray(r.warp_canon_depth(depth, rot, trans))
    np.testing.assert_allclose(out, 1.0, atol=1e-3)


def test_rasterize_varying_depth_identity():
    r = make_renderer()
    yy = np.linspace(0.95, 1.05, 32, dtype=np.float32)
    depth = jnp.asarray(np.tile(yy[:, None], (1, 32))[None])
    view = jnp.zeros((1, 6), jnp.float32)
    rot, trans = get_transform_matrices(view)
    out = np.asarray(r.warp_canon_depth(depth, rot, trans))
    # identity warp of a smooth depth map re-renders (approximately) itself;
    # perspective shifts pixels slightly so allow a loose interior tolerance
    np.testing.assert_allclose(out[0, 2:-2, 2:-2],
                               np.asarray(depth)[0, 2:-2, 2:-2], atol=2e-3)


def test_rasterize_occlusion_front_wins():
    # two fronto-parallel quads at different depths projected onto the same
    # pixels: the rasterizer must keep the nearer one
    h = w = 8
    faces = jnp.asarray(grid_faces(h, w))
    xs_grid, ys_grid = np.meshgrid(np.arange(w, dtype=np.float32),
                                   np.arange(h, dtype=np.float32))
    xs = np.concatenate([xs_grid.reshape(-1)] * 1)[None]
    ys = ys_grid.reshape(-1)[None]
    z_far = np.full((1, h * w), 1.2, np.float32)
    z_near = np.full((1, h * w), 0.8, np.float32)

    # window=3: the occlusion property is window-independent and the
    # default-5 grid graph costs 2.7x the XLA:CPU compile (8*window^2)
    d_far = np.asarray(rasterize_depth(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(z_far), faces, h, w,
        window=3, near=0.5, far=1.5))
    d_min = np.asarray(rasterize_depth(
        jnp.asarray(np.concatenate([xs, xs], 1)),
        jnp.asarray(np.concatenate([ys, ys], 1)),
        jnp.asarray(np.concatenate([z_far, z_near], 1)),
        jnp.asarray(np.concatenate([grid_faces(h, w),
                                    grid_faces(h, w) + h * w], 0)),
        h, w, window=3, near=0.5, far=1.5))
    assert np.allclose(d_far[0, :-1, :-1], 1.2, atol=1e-3)
    assert np.allclose(d_min[0, :-1, :-1], 0.8, atol=1e-3)


def test_rasterize_uncovered_gets_far():
    h = w = 8
    faces = jnp.asarray(grid_faces(h, w))
    xs_grid, ys_grid = np.meshgrid(np.arange(w, dtype=np.float32),
                                   np.arange(h, dtype=np.float32))
    # shift the whole mesh out of the viewport
    xs = jnp.asarray(xs_grid.reshape(-1)[None] + 100.0)
    ys = jnp.asarray(ys_grid.reshape(-1)[None])
    zs = jnp.full((1, h * w), 1.0)
    d = np.asarray(rasterize_depth(xs, ys, zs, faces, h, w,
                                   window=3, near=0.5, far=1.5))
    np.testing.assert_allclose(d, 1.5)


@pytest.mark.slow
def test_warp_canon_depth_grad_flows():
    r = make_renderer(16)
    view = jnp.asarray([[0.05, -0.08, 0.02, 0.01, -0.01, 0.02]], jnp.float32)
    rot, trans = get_transform_matrices(view)

    def f(depth):
        return jnp.sum(r.warp_canon_depth(depth, rot, trans))

    depth = jnp.full((1, 16, 16), 1.0, jnp.float32)
    g = np.asarray(jax.grad(f)(depth))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_render_given_view_identity_roundtrip(rng):
    r = make_renderer()
    im = jnp.asarray(rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32))
    depth = jnp.full((1, 32, 32), 1.0, jnp.float32)
    view = jnp.zeros((1, 6), jnp.float32)
    mask = jnp.ones((1, 3, 32, 32), jnp.float32)
    out, m = r.render_given_view(im, depth, view, mask=mask,
                                 grid_sample_mode=True)
    # constant-depth identity view reproduces the image on the interior
    np.testing.assert_allclose(np.asarray(out)[0, :, 2:-2, 2:-2],
                               np.asarray(im)[0, :, 2:-2, 2:-2], atol=1e-2)
    assert np.asarray(m)[0, :, 2:-2, 2:-2].min() > 0.5


def test_render_given_view_mesh_path(rng):
    r = make_renderer()
    im = jnp.asarray(rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32))
    depth = jnp.full((1, 32, 32), 1.0, jnp.float32)
    view = jnp.asarray([[0.0, 0.1, 0.0, 0.0, 0.0, 0.0]], jnp.float32)
    mask = jnp.ones((1, 1, 32, 32), jnp.float32)
    out, m = r.render_given_view(im, depth, view, mask=mask,
                                 grid_sample_mode=False)
    assert out.shape == (1, 3, 32, 32)
    assert m.shape == (1, 1, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_render_yaw_shapes(rng):
    r = make_renderer(16)
    im = jnp.asarray(rng.uniform(-1, 1, (1, 3, 16, 16)).astype(np.float32))
    depth = jnp.full((1, 16, 16), 1.0, jnp.float32)
    out = r.render_yaw(im, depth, maxr=45, nsample=3)
    assert out.shape == (1, 3, 3, 16, 16)
    out_gs = r.render_yaw(im, depth, maxr=45, nsample=3,
                          grid_sample_mode=True)
    assert out_gs.shape == (1, 3, 3, 16, 16)


def test_render_view_shapes(rng):
    r = make_renderer(16)
    im = jnp.asarray(rng.uniform(-1, 1, (1, 3, 16, 16)).astype(np.float32))
    depth = jnp.full((1, 16, 16), 1.0, jnp.float32)
    out = r.render_view(im, depth, maxr=(20, 45), nsample=(2, 3))
    assert out.shape == (1, 5, 3, 16, 16)
