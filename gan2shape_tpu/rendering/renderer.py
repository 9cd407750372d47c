"""Differentiable renderer: camera intrinsics, rigid warps, depth->normals,
and depth-map re-rendering under novel views.

Behavioral parity target: /root/reference/GAN2Shape/renderer/renderer.py and
renderer/utils.py.  Re-designed for TPU:

  * no mutable state — the reference's `set_transform_matrices` side effect
    (renderer.py:61) becomes explicit (rot, trans) arguments so every method is
    a pure, jittable function of its inputs;
  * the external CUDA `neural_renderer` (renderer.py:47-54) is replaced by
    `ops.rasterize` (XLA winner pass + differentiable interpolation);
  * everything is batched and static-shaped; novel-view sweeps stack the view
    axis into the batch instead of Python-looping per angle.

Conventions (identical to the reference): pixel grid (x right, y down) with
centers at integers; intrinsics from fov with c = (s-1)/2 (renderer.py:35-42);
view vector = (rx, ry, rz, tx, ty, tz); rotation about the point
(0, 0, rot_center_depth) (renderer.py:64-69); screen-grid normalization to
[-1, 1] by (W-1, H-1) i.e. align_corners=True (renderer.py:82-88).
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _mm(a, b):
    # geometry matmuls must not drop to bf16 on the TPU MXU
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)

from gan2shape_tpu.ops.rasterize import (
    grid_faces, rasterize_depth, rasterize_attributes,
)
from gan2shape_tpu.ops.grid_sample import grid_sample, grid_sample_im_mask

EPS = 1e-7


def get_rotation_matrix(tx, ty, tz):
    """XYZ-Euler rotation, R = Rz @ Ry @ Rx (reference renderer/utils.py:33-49).
    tx/ty/tz: (B,) radians.  Returns (B, 3, 3)."""
    zeros = jnp.zeros_like(tx)
    ones = jnp.ones_like(tx)
    cx, sx = jnp.cos(tx), jnp.sin(tx)
    cy, sy = jnp.cos(ty), jnp.sin(ty)
    cz, sz = jnp.cos(tz), jnp.sin(tz)
    m_x = jnp.stack([
        ones, zeros, zeros,
        zeros, cx, -sx,
        zeros, sx, cx], -1).reshape(-1, 3, 3)
    m_y = jnp.stack([
        cy, zeros, sy,
        zeros, ones, zeros,
        -sy, zeros, cy], -1).reshape(-1, 3, 3)
    m_z = jnp.stack([
        cz, -sz, zeros,
        sz, cz, zeros,
        zeros, zeros, ones], -1).reshape(-1, 3, 3)
    return _mm(m_z, _mm(m_y, m_x))


def get_transform_matrices(view):
    """6/5/3-dof view vector -> (R (B,3,3), t (B,1,3))
    (reference renderer/utils.py:52-73)."""
    b, d = view.shape
    rx, ry, rz = view[:, 0], view[:, 1], view[:, 2]
    if d == 6:
        trans = view[:, 3:].reshape(b, 1, 3)
    elif d == 5:
        trans = jnp.concatenate(
            [view[:, 3:].reshape(b, 1, 2), jnp.zeros((b, 1, 1), view.dtype)], 2)
    elif d == 3:
        trans = jnp.zeros((b, 1, 3), view.dtype)
    else:
        raise ValueError("view dim must be 3, 5 or 6")
    return get_rotation_matrix(rx, ry, rz), trans


class Renderer:
    """Static camera/mesh config + pure rendering methods.

    All array state (K, faces, pixel grid) is a numpy constant closed over by
    jitted callers — nothing here is traced except the method arguments.
    """

    def __init__(self, config, image_size, min_depth, max_depth):
        self.image_size = image_size
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.rot_center_depth = config.get(
            "rot_center_depth", (min_depth + max_depth) / 2)
        self.fov = config.get("fov", 10)
        self.renderer_min_depth = config.get("renderer_min_depth", 0.1)
        self.renderer_max_depth = config.get("renderer_max_depth", 10.0)
        # grid-mode candidate window: 3 is the shipping default (faces are
        # ~1 px in the training regime — measured p50 extent 1.0-1.3 px,
        # p99 1.5-4.7 under MVN poses; the 8*window^2 Phase-C unroll makes
        # window 5 cost -2.9% whole-bench for coverage only the extent
        # tail uses).  Set raster_window: 5 to match the exact scatter
        # z-buffer's candidate reach pixel-for-pixel (both settings are
        # pinned on TPU in RASTER_CHECK.json; winner RANKING is exact
        # per-pixel 1/z at any window — window only bounds coverage).
        self.raster_window = config.get("raster_window", 3)
        # 'grid' (dense payload-scatter, TPU hot path); sweeps with large
        # rotations force 'scatter' internally
        self.raster_mode = config.get("raster_mode", "grid")
        self.raster_search = config.get("raster_search", 2)

        s = image_size
        f = (s - 1) / 2 / math.tan(self.fov / 2 * math.pi / 180)
        c = (s - 1) / 2
        self.K = np.array([[f, 0.0, c], [0.0, f, c], [0.0, 0.0, 1.0]],
                          dtype=np.float32)
        self.inv_K = np.linalg.inv(self.K).astype(np.float32)
        self.faces = jnp.asarray(grid_faces(s, s))
        # pixel grid in (x, y) order, y down (reference utils.py:22-30)
        xs, ys = np.meshgrid(np.arange(s, dtype=np.float32),
                             np.arange(s, dtype=np.float32), indexing="xy")
        self._grid_xy1 = np.stack([xs, ys, np.ones_like(xs)], -1)  # (H, W, 3)
        # depth margin used by the clamped rasterization (renderer.py:122-124)
        self.margin = (max_depth - min_depth) / 2

    # ---------------- geometry ----------------

    def depth_to_3d_grid(self, depth):
        """(B, H, W) depth -> (B, H, W, 3) camera-space points
        (reference renderer.py:74-80)."""
        grid = jnp.asarray(self._grid_xy1, depth.dtype)
        pts = _mm(grid, jnp.asarray(self.inv_K.T, depth.dtype))
        return pts[None] * depth[..., None]

    def grid_3d_to_2d(self, grid_3d):
        """(B, H, W, 3) points -> normalized [-1,1] screen grid
        (reference renderer.py:82-88)."""
        b, h, w, _ = grid_3d.shape
        g = grid_3d / grid_3d[..., 2:]
        g = _mm(g, jnp.asarray(self.K.T, grid_3d.dtype))
        wh = jnp.asarray([w - 1, h - 1], grid_3d.dtype)
        return g[..., :2] / wh * 2.0 - 1.0

    def rotate_pts(self, pts, rot_mat):
        centroid = jnp.asarray(
            [0.0, 0.0, self.rot_center_depth], pts.dtype).reshape(1, 1, 3)
        return _mm(pts - centroid, rot_mat.transpose(0, 2, 1)) + centroid

    def translate_pts(self, pts, trans_xyz):
        return pts + trans_xyz

    def get_warped_3d_grid(self, depth, rot_mat, trans_xyz):
        b, h, w = depth.shape
        pts = self.depth_to_3d_grid(depth).reshape(b, -1, 3)
        pts = self.rotate_pts(pts, rot_mat)
        pts = self.translate_pts(pts, trans_xyz)
        return pts.reshape(b, h, w, 3)

    def get_inv_warped_3d_grid(self, depth, rot_mat, trans_xyz):
        b, h, w = depth.shape
        pts = self.depth_to_3d_grid(depth).reshape(b, -1, 3)
        pts = self.translate_pts(pts, -trans_xyz)
        pts = self.rotate_pts(pts, rot_mat.transpose(0, 2, 1))
        return pts.reshape(b, h, w, 3)

    def get_warped_2d_grid(self, depth, rot_mat, trans_xyz):
        return self.grid_3d_to_2d(self.get_warped_3d_grid(depth, rot_mat,
                                                          trans_xyz))

    def get_inv_warped_2d_grid(self, depth, rot_mat, trans_xyz):
        return self.grid_3d_to_2d(self.get_inv_warped_3d_grid(depth, rot_mat,
                                                              trans_xyz))

    # ---------------- rasterization ----------------

    def _project_screen(self, pts):
        """Camera-space points (B, N, 3) -> pixel screen coords + depth."""
        proj = _mm(pts, jnp.asarray(self.K.T, pts.dtype))
        z = jnp.maximum(proj[..., 2], 1e-6)
        return proj[..., 0] / z, proj[..., 1] / z, pts[..., 2]

    def warp_canon_depth(self, canon_depth, rot_mat, trans_xyz,
                         raster_mode=None):
        """Re-render the canonical depth under a view (reference
        renderer.py:116-125: nr.render_depth + clamp-with-margin)."""
        b, h, w = canon_depth.shape
        pts = self.get_warped_3d_grid(canon_depth, rot_mat,
                                      trans_xyz).reshape(b, -1, 3)
        xs, ys, zs = self._project_screen(pts)
        mode = raster_mode or self.raster_mode
        # raster_window is the GRID-mode cost/coverage knob; the 'scatter'
        # z-buffer is the exactness oracle and keeps its full candidate
        # reach regardless (window only bounds its bbox-offset sweep)
        window = self.raster_window if mode == "grid" \
            else max(self.raster_window, 5)
        depth = rasterize_depth(
            xs, ys, zs, self.faces, h, w, window=window,
            near=self.min_depth - self.margin,
            far=self.max_depth + self.margin,
            mode=mode, search=self.raster_search)
        return jnp.clip(depth, self.min_depth - self.margin,
                        self.max_depth + self.margin)

    def render_mesh_rgb(self, im, pts, mask=None, background=1.0):
        """Rasterize an image as vertex colors of the warped grid mesh —
        replaces nr.render_rgb + the tx_size texture-cube machinery
        (reference renderer.py:196,230,272 + utils.py:83-109)."""
        b, c, h, w = im.shape
        xs, ys, zs = self._project_screen(pts.reshape(b, -1, 3))
        attrs = im.transpose(0, 2, 3, 1).reshape(b, -1, c)
        # mesh-RGB renders go through the scatter winner pass (large
        # visualization sweeps): keep the full candidate reach
        window = max(self.raster_window, 5)
        img, cov = rasterize_attributes(
            xs, ys, zs, attrs, self.faces, h, w, window=window,
            near=self.renderer_min_depth, far=self.renderer_max_depth,
            background=background)
        img = jnp.clip(img, -1.0, 1.0)
        if mask is not None:
            mattrs = mask.transpose(0, 2, 3, 1).reshape(b, -1, mask.shape[1])
            m, _ = rasterize_attributes(
                xs, ys, zs, mattrs, self.faces, h, w,
                window=window, near=self.renderer_min_depth,
                far=self.renderer_max_depth, background=0.0)
            return img, jnp.clip(m, -1.0, 1.0)
        return img, cov

    # ---------------- normals ----------------

    def get_normal_from_depth(self, depth):
        """Central-difference surface normals; border rows/cols get z-hat
        (reference renderer.py:127-139)."""
        b, h, w = depth.shape
        grid_3d = self.depth_to_3d_grid(depth)
        tu = grid_3d[:, 1:-1, 2:] - grid_3d[:, 1:-1, :-2]
        tv = grid_3d[:, 2:, 1:-1] - grid_3d[:, :-2, 1:-1]
        normal = jnp.cross(tu, tv)
        zhat = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], depth.dtype), (b, h - 2, 1, 3))
        normal = jnp.concatenate([zhat, normal, zhat], 2)
        zrow = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], depth.dtype), (b, 1, w, 3))
        normal = jnp.concatenate([zrow, normal, zrow], 1)
        return normal / (jnp.linalg.norm(normal, axis=3, keepdims=True) + EPS)

    # ---------------- view synthesis ----------------

    def render_given_view(self, im, depth, view, mask=None,
                          grid_sample_mode=True, raster_mode=None):
        """Render image(+mask) under `view` (reference renderer.py:252-277).
        grid_sample_mode=True: warp depth, inverse-warp a sampling grid and
        grid-sample (the hot path used by pseudo-sample generation);
        False: full mesh-texture rasterization."""
        b, c, h, w = im.shape
        rot_mat, trans_xyz = get_transform_matrices(view)
        if grid_sample_mode:
            recon_depth = self.warp_canon_depth(depth, rot_mat, trans_xyz,
                                                raster_mode=raster_mode)
            grid = self.get_inv_warped_2d_grid(recon_depth, rot_mat, trans_xyz)
            if mask is not None:
                # one channel-concatenated planes fetch serves both the
                # bilinear image warp and the nearest mask warp (reference
                # renderer.py:261-263); bit-equal to the separate calls
                return grid_sample_im_mask(im, mask, grid)
            return grid_sample(im, grid, mode="bilinear")
        pts = self.get_warped_3d_grid(depth, rot_mat, trans_xyz)
        img, m = self.render_mesh_rgb(im, pts, mask=mask)
        if mask is not None:
            return img, m
        return img

    def render_yaw(self, im, depth, v_before=None, v_after=None,
                   rotations=None, maxr=90, nsample=9, grid_sample_mode=False,
                   crop_mesh=None):
        """Yaw sweep for visualization (reference renderer.py:141-198).
        Returns (B, T, C, H, W)."""
        b, c, h, w = im.shape
        if rotations is None:
            rotations = np.linspace(-math.pi / 180 * maxr,
                                    math.pi / 180 * maxr, nsample)
        rotations = np.asarray(rotations)

        grid_3d = self.depth_to_3d_grid(depth)
        if crop_mesh is not None:
            grid_3d = _apply_crop_mesh(grid_3d, crop_mesh)
        grid_3d = grid_3d.reshape(b, -1, 3)

        if v_before is not None:
            rot_mat, trans_xyz = get_transform_matrices(v_before)
            grid_3d = self.translate_pts(grid_3d, -trans_xyz)
            grid_3d = self.rotate_pts(grid_3d, rot_mat.transpose(0, 2, 1))

        frames = []
        for ri in rotations:
            if grid_sample_mode:
                view = jnp.asarray([0, ri, 0, 0, 0, 0],
                                   im.dtype).reshape(1, 6)
                if v_before is not None:
                    view = view - v_before
                frames.append(self.render_given_view(
                    im, depth, view, grid_sample_mode=True,
                    raster_mode="scatter"))
            else:
                rvec = jnp.asarray([0.0, ri, 0.0], im.dtype).reshape(1, 3)
                rot_i, _ = get_transform_matrices(rvec)
                pts = self.rotate_pts(grid_3d, jnp.broadcast_to(rot_i,
                                                                (b, 3, 3)))
                if v_after is not None:
                    rot_a, trans_a = get_transform_matrices(v_after)
                    pts = self.rotate_pts(pts, rot_a)
                    pts = self.translate_pts(pts, trans_a)
                img, _ = self.render_mesh_rgb(im, pts)
                frames.append(img)
        return jnp.stack(frames, 1)

    def render_view(self, im, depth, v_before=None, maxr=(20, 90),
                    nsample=(5, 9), grid_sample_mode=False):
        """Yaw then pitch sweeps (reference renderer.py:200-250)."""
        yaw = self.render_yaw(im, depth, v_before=v_before, maxr=maxr[1],
                              nsample=nsample[1],
                              grid_sample_mode=grid_sample_mode)
        b, c, h, w = im.shape
        rot_p = np.linspace(-math.pi / 180 * maxr[0], math.pi / 180 * maxr[0],
                            nsample[0])
        grid_3d = self.depth_to_3d_grid(depth).reshape(b, -1, 3)
        if v_before is not None:
            rot_mat, trans_xyz = get_transform_matrices(v_before)
            grid_3d = self.translate_pts(grid_3d, -trans_xyz)
            grid_3d = self.rotate_pts(grid_3d, rot_mat.transpose(0, 2, 1))
        frames = []
        for ri in rot_p:
            if grid_sample_mode:
                view = jnp.asarray([ri, 0, 0, 0, 0, 0], im.dtype).reshape(1, 6)
                if v_before is not None:
                    view = view - v_before
                frames.append(self.render_given_view(
                    im, depth, view, grid_sample_mode=True,
                    raster_mode="scatter"))
            else:
                rvec = jnp.asarray([ri, 0.0, 0.0], im.dtype).reshape(1, 3)
                rot_i, _ = get_transform_matrices(rvec)
                pts = self.rotate_pts(grid_3d, jnp.broadcast_to(rot_i,
                                                                (b, 3, 3)))
                img, _ = self.render_mesh_rgb(im, pts)
                frames.append(img)
        pitch = jnp.stack(frames, 1)
        return jnp.concatenate([yaw, pitch], 1)


def _apply_crop_mesh(grid_3d, crop_mesh):
    """Flatten border geometry before a sweep (reference renderer.py:145-158)."""
    top, bottom, left, right = crop_mesh
    g = grid_3d
    if top > 0:
        row = g[:, top:top + 1]
        g = g.at[:, :top, :, 1:].set(
            jnp.broadcast_to(row[..., 1:], g[:, :top, :, 1:].shape))
    if bottom > 0:
        row = g[:, -bottom - 1:-bottom]
        g = g.at[:, -bottom:, :, 1:].set(
            jnp.broadcast_to(row[..., 1:], g[:, -bottom:, :, 1:].shape))
    if left > 0:
        col = g[:, :, left:left + 1]
        g = g.at[:, :, :left, ::2].set(
            jnp.broadcast_to(col[..., ::2], g[:, :, :left, ::2].shape))
    if right > 0:
        col = g[:, :, -right - 1:-right]
        g = g.at[:, :, -right:, ::2].set(
            jnp.broadcast_to(col[..., ::2], g[:, :, -right:, ::2].shape))
    return g
