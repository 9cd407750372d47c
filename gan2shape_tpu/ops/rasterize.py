"""Differentiable depth rasterization of a warped grid mesh — TPU-native
replacement for the reference's external CUDA `neural_renderer`
(consumed at /root/reference/GAN2Shape/renderer/renderer.py:47-54,120).

The reference rasterizes a general triangle mesh with a hand-written CUDA
z-buffer.  Here the mesh is always the fixed regular-grid triangulation of a
depth map (renderer/utils.py:76-80): 2*(h-1)*(w-1) tiny triangles whose screen
footprints are a few pixels, which permits a two-pass, fully-vectorized design
that XLA maps well:

  pass 1 (non-differentiable winner search): every face tests a static
      WINDOW x WINDOW pixel neighborhood of its screen bbox corner; candidate
      (pixel, face) pairs are reduced with one `segment_min` over packed
      int32 keys (quantized depth in the high bits, face id in the low bits)
      — the z-buffer becomes a single XLA scatter-min instead of serialized
      atomics;

  pass 2 (differentiable interpolation): each covered pixel re-computes
      barycentric weights against its winning face and interpolates depth
      perspective-correctly (1/z linear in screen space).  Plain autodiff then
      yields exact vertex gradients — the same "rasterize ids, differentiate
      the interpolation" factorization nvdiffrast uses, with no custom VJP.

Faces wider than WINDOW pixels (extreme warps only) lose coverage and leave
background; downstream masks-out such pixels exactly like the reference masks
its clamped border (model.py:149).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

DEPTH_BITS = 14
FACE_BITS = 17  # 2*(h-1)*(w-1) faces: supports up to 256x256 grids (130050)
_SENTINEL = np.int32(2 ** 31 - 1)


def grid_faces(h: int, w: int) -> np.ndarray:
    """Regular-grid triangulation, same vertex order as the reference
    (renderer/utils.py:76-80): for each cell, faces (tl, bl, tr) and
    (tr, bl, br) over row-major vertex ids."""
    idx = np.arange(h * w, dtype=np.int32).reshape(h, w)
    f1 = np.stack([idx[:-1, :-1], idx[1:, :-1], idx[:-1, 1:]], -1).reshape(-1, 3)
    f2 = np.stack([idx[:-1, 1:], idx[1:, :-1], idx[1:, 1:]], -1).reshape(-1, 3)
    return np.concatenate([f1, f2], 0)


def _barycentric(px, py, x0, y0, x1, y1, x2, y2):
    denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    l0 = ((y1 - y2) * (px - x2) + (x2 - x1) * (py - y2)) / safe
    l1 = ((y2 - y0) * (px - x2) + (x0 - x2) * (py - y2)) / safe
    l2 = 1.0 - l0 - l1
    degenerate = jnp.abs(denom) <= 1e-12
    return l0, l1, l2, degenerate


@partial(jax.jit, static_argnames=("h", "w", "window", "near", "far"))
def _winner_pass(xs, ys, zs, faces, h, w, window, near, far):
    """Returns winner face id per pixel, -1 where uncovered.  xs/ys/zs are
    (B, N) screen coords + camera depth; faces (F, 3)."""
    b, _ = xs.shape
    f = faces.shape[0]
    assert f < 2 ** FACE_BITS, "face id overflow; raise FACE_BITS"

    fx = xs[:, faces]  # (B, F, 3)
    fy = ys[:, faces]
    fz = zs[:, faces]

    x0, x1, x2 = fx[..., 0], fx[..., 1], fx[..., 2]
    y0, y1, y2 = fy[..., 0], fy[..., 1], fy[..., 2]

    bx = jnp.floor(jnp.minimum(jnp.minimum(x0, x1), x2)).astype(jnp.int32)
    by = jnp.floor(jnp.minimum(jnp.minimum(y0, y1), y2)).astype(jnp.int32)

    face_ids = jnp.broadcast_to(
        jnp.arange(f, dtype=jnp.int32)[None, :], (b, f))
    batch_off = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]

    depth_scale = (2 ** DEPTH_BITS - 1) / (far - near)

    # vectorize the WINDOW x WINDOW candidate offsets as a leading axis
    # (one fused computation instead of window**2 unrolled subgraphs)
    offs = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                indexing="ij"), -1).reshape(-1, 2)
    dy = jnp.asarray(offs[:, 0], jnp.int32)[:, None, None]  # (K, 1, 1)
    dx = jnp.asarray(offs[:, 1], jnp.int32)[:, None, None]

    px_i = bx[None] + dx  # (K, B, F)
    py_i = by[None] + dy
    px = px_i.astype(xs.dtype)
    py = py_i.astype(xs.dtype)
    l0, l1, l2, degen = _barycentric(
        px, py, x0[None], y0[None], x1[None], y1[None], x2[None], y2[None])
    inv_z = (l0 / fz[None, ..., 0] + l1 / fz[None, ..., 1]
             + l2 / fz[None, ..., 2])
    z = 1.0 / jnp.maximum(inv_z, 1e-12)
    eps = -1e-5
    inside = (l0 >= eps) & (l1 >= eps) & (l2 >= eps) & ~degen
    inbounds = (px_i >= 0) & (px_i < w) & (py_i >= 0) & (py_i < h)
    ok = inside & inbounds & (z > 0)

    zq = jnp.clip((z - near) * depth_scale, 0, 2 ** DEPTH_BITS - 1)
    packed = (zq.astype(jnp.int32) << FACE_BITS) | face_ids[None]
    packed = jnp.where(ok, packed, _SENTINEL)

    pix = jnp.clip(py_i, 0, h - 1) * w + jnp.clip(px_i, 0, w - 1)
    seg = (batch_off[None] + pix).reshape(-1)
    val = packed.reshape(-1)
    buf = jax.ops.segment_min(val, seg, num_segments=b * h * w)
    winner = jnp.where(buf == _SENTINEL, -1, buf & (2 ** FACE_BITS - 1))
    return winner.reshape(b, h, w)


def rasterize_depth(xs, ys, zs, faces, h, w, window=5, near=0.3, far=1.3):
    """Render a depth map from projected grid-mesh vertices.

    xs, ys: (B, N) screen-space pixel coordinates (x right, y down, pixel
    centers at integers); zs: (B, N) camera depth; faces: (F, 3) int32.
    Uncovered pixels get `far`.  Gradients flow to xs/ys/zs through the
    barycentric interpolation of each pixel's winning face.
    """
    b = xs.shape[0]
    winner = jax.lax.stop_gradient(
        _winner_pass(jax.lax.stop_gradient(xs), jax.lax.stop_gradient(ys),
                     jax.lax.stop_gradient(zs), faces, h, w, window,
                     float(near), float(far)))

    covered = winner >= 0
    wf = jnp.where(covered, winner, 0).reshape(b, h * w)  # (B, P)
    tri = faces[wf]  # (B, P, 3) vertex ids

    def gather(v):  # v: (B, N) -> (B, P, 3)
        return jnp.take_along_axis(v[:, :, None], tri, axis=1)

    tx, ty, tz = gather(xs), gather(ys), gather(zs)

    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=xs.dtype),
                          jnp.arange(w, dtype=xs.dtype), indexing="ij")
    px = jnp.broadcast_to(gx.reshape(1, -1), (b, h * w))
    py = jnp.broadcast_to(gy.reshape(1, -1), (b, h * w))

    l0, l1, l2, _ = _barycentric(
        px, py, tx[..., 0], ty[..., 0], tx[..., 1], ty[..., 1],
        tx[..., 2], ty[..., 2])
    inv_z = l0 / tz[..., 0] + l1 / tz[..., 1] + l2 / tz[..., 2]
    z = 1.0 / jnp.maximum(inv_z, 1e-12)

    depth = jnp.where(covered, z.reshape(b, h, w), jnp.asarray(far, xs.dtype))
    return depth


def rasterize_attributes(xs, ys, zs, attrs, faces, h, w, window=5,
                         near=0.3, far=1.3, background=1.0):
    """Render per-vertex attributes (e.g. RGB) with the same winner pass —
    the TPU-native equivalent of the reference's `nr.render_rgb` mesh-texture
    path (renderer.py:196,230,248,272).  `attrs`: (B, N, C) vertex colors
    (the reference's tx_size=1/2 face texture cubes reduce to vertex-color
    interpolation on this fixed grid mesh).  Returns (B, C, H, W) image and
    (B, 1, H, W) coverage mask."""
    b = xs.shape[0]
    c = attrs.shape[-1]
    winner = jax.lax.stop_gradient(
        _winner_pass(jax.lax.stop_gradient(xs), jax.lax.stop_gradient(ys),
                     jax.lax.stop_gradient(zs), faces, h, w, window,
                     float(near), float(far)))
    covered = winner >= 0
    wf = jnp.where(covered, winner, 0).reshape(b, h * w)
    tri = faces[wf]

    def gather(v):
        return jnp.take_along_axis(v[:, :, None], tri, axis=1)

    tx, ty, tz = gather(xs), gather(ys), gather(zs)
    ta = jnp.take_along_axis(attrs[:, :, None, :],
                             tri[..., None].repeat(c, -1), axis=1)  # (B,P,3,C)

    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=xs.dtype),
                          jnp.arange(w, dtype=xs.dtype), indexing="ij")
    px = jnp.broadcast_to(gx.reshape(1, -1), (b, h * w))
    py = jnp.broadcast_to(gy.reshape(1, -1), (b, h * w))
    l0, l1, l2, _ = _barycentric(
        px, py, tx[..., 0], ty[..., 0], tx[..., 1], ty[..., 1],
        tx[..., 2], ty[..., 2])
    # perspective-correct attribute interpolation
    w0 = l0 / tz[..., 0]
    w1 = l1 / tz[..., 1]
    w2 = l2 / tz[..., 2]
    wsum = jnp.maximum(w0 + w1 + w2, 1e-12)
    attr = (ta[..., 0, :] * w0[..., None] + ta[..., 1, :] * w1[..., None]
            + ta[..., 2, :] * w2[..., None]) / wsum[..., None]

    img = jnp.where(covered.reshape(b, 1, h, w),
                    attr.reshape(b, h, w, c).transpose(0, 3, 1, 2),
                    jnp.asarray(background, xs.dtype))
    mask = covered.reshape(b, 1, h, w).astype(xs.dtype)
    return img, mask
