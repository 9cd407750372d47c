"""Differentiable depth rasterization of a warped grid mesh — TPU-native
replacement for the reference's external CUDA `neural_renderer`
(consumed at /root/reference/GAN2Shape/renderer/renderer.py:47-54,120).

The reference rasterizes a general triangle mesh with a hand-written CUDA
z-buffer.  Here the mesh is always the fixed regular-grid triangulation of a
depth map (renderer/utils.py:76-80): 2*(h-1)*(w-1) tiny triangles whose
screen footprints are a few pixels.  Three implementations, selected by
`mode`:

  * 'grid' (default, the TPU hot path — rasterize_depth_grid): compact int16
    payloads scattered once to half-pixel bbox-start slots, a Pallas winner
    kernel that DMAs each row band's slab into VMEM and runs every candidate
    test fused, then a differentiable gather + barycentric/perspective-
    correct re-interpolation of each pixel's winning face (nvdiffrast's
    "rasterize ids, differentiate the interpolation" factorization).
    Measured TPU costs that shaped it: XLA gathers ~2 ns/element (fine),
    XLA scatters ~600 ns/update and segment_min ~90 ns/element (fatal),
    XLA 8*window^2-way shifted-slice graphs unfusable (minutes of compile).

  * 'scatter' (_winner_pass): window-offset candidates reduced by one
    segment_min over packed (depth | face-id) int32 keys.  Exact for
    arbitrary meshes and unbounded warps; used by the large-rotation
    visualization sweeps.  Slow on TPU.

  * 'invwarp' (_winner_pass_invwarp): fixed-point inversion of the vertex
    displacement field + local exact tests.  Gather-only; kept as a design
    alternative and CPU path.

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
    (B, N) screen coords + camera depth; faces (F, 3).

    Ranking is EXACT-f32 nearest-face with lowest-face-id ties — the
    semantics of nr's z-buffer, which compares raw float depth
    (/root/reference/GAN2Shape/renderer/renderer.py:120).  IEEE-754 bits
    of positive floats are order-isomorphic to their int32 bit patterns,
    so two segment-min passes (min depth bits per pixel, then min face id
    among that depth's candidates) implement the full lexicographic
    (depth, id) order without int64 (x64 stays off).  A quantized
    single-pass key (the r1-r4 design) left a ~1e-7/bin-size band of
    cross-framework boundary flips that dominated the depth-MAD parity
    envelope (PARITY.md)."""
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

    zbits = jax.lax.bitcast_convert_type(z.astype(jnp.float32), jnp.int32)
    zbits = jnp.where(ok, zbits, _SENTINEL)  # z > 0 => bits in [0, 2^31)

    pix = jnp.clip(py_i, 0, h - 1) * w + jnp.clip(px_i, 0, w - 1)
    seg = (batch_off[None] + pix).reshape(-1)
    buf_z = jax.ops.segment_min(zbits.reshape(-1), seg,
                                num_segments=b * h * w)
    won_z = zbits.reshape(-1) == buf_z[seg]
    fid = jnp.where(won_z & ok.reshape(-1),
                    jnp.broadcast_to(face_ids[None], zbits.shape
                                     ).reshape(-1), _SENTINEL)
    buf_f = jax.ops.segment_min(fid, seg, num_segments=b * h * w)
    winner = jnp.where(buf_z == _SENTINEL, -1, buf_f)
    return winner.reshape(b, h, w)


@partial(jax.jit, static_argnames=("h", "w", "search", "fp_iters"))
def _winner_pass_invwarp(xs, ys, zs, h, w, search=1, fp_iters=8):
    """Gather-based winner search for GRID meshes (TPU fast path).

    TPU scatters serialize (the scatter-min pass costs ~10ms/image); this
    formulation has none: the screen->canonical correspondence is found by
    fixed-point inversion of the vertex displacement field (c <- p - D(c),
    bilinear gathers only), then the pixel is tested EXACTLY against the
    2*(2*search+1)^2 triangles around the estimated source cell, taking the
    nearest hit.  Exact wherever the warp's folds are locally bounded (the
    two depth sheets' source cells fall inside the search neighborhood) —
    true for this method's rigid warps of smooth, range-clamped depth maps.
    The scatter path remains available for unbounded warps (visualization
    sweeps) via Renderer(raster_mode='scatter').

    Returns winner face ids (B, H, W), -1 where uncovered; face id encodes
    (cell, upper/lower) in the same order as grid_faces.
    """
    b = xs.shape[0]
    fx = xs.reshape(b, h, w)
    fy = ys.reshape(b, h, w)
    fz = zs.reshape(b, h, w)

    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=xs.dtype),
                          jnp.arange(w, dtype=xs.dtype), indexing="ij")
    # displacement field on the canonical grid
    dx_f = fx - gx[None]
    dy_f = fy - gy[None]

    px = jnp.broadcast_to(gx[None], (b, h, w))
    py = jnp.broadcast_to(gy[None], (b, h, w))

    def bilerp(field, cy, cx):
        x0 = jnp.clip(jnp.floor(cx), 0, w - 2)
        y0 = jnp.clip(jnp.floor(cy), 0, h - 2)
        tx = jnp.clip(cx - x0, 0.0, 1.0)
        ty = jnp.clip(cy - y0, 0.0, 1.0)
        ix = x0.astype(jnp.int32)
        iy = y0.astype(jnp.int32)
        idx = iy * w + ix
        f = field.reshape(b, h * w)

        def take(off):
            return jnp.take_along_axis(f, (idx + off).reshape(b, -1),
                                       axis=1).reshape(b, h, w)
        v00 = take(0)
        v01 = take(1)
        v10 = take(w)
        v11 = take(w + 1)
        return ((1 - ty) * ((1 - tx) * v00 + tx * v01)
                + ty * ((1 - tx) * v10 + tx * v11))

    # robust initialization: nearest SCREEN vertex on a stride-4 subgrid
    # (brute force as one big distance reduction — MXU/VPU work, no scatter).
    # Picard iteration alone diverges where |f * dz/dx * sin(theta)| > 1
    # (steep slopes under rotation); the coarse init keeps the subsequent
    # damped refinement inside the right basin.
    stride = 4
    sub_y = fy[:, ::stride, ::stride].reshape(b, -1)   # (B, M)
    sub_x = fx[:, ::stride, ::stride].reshape(b, -1)
    gy_s = gy[::stride, ::stride].reshape(-1)          # canonical coords
    gx_s = gx[::stride, ::stride].reshape(-1)
    # argmin_m (sub_x - px)^2 + (sub_y - py)^2 per pixel, chunked over the
    # candidate axis to bound transient memory at (B, P, CH)
    pxf = px.reshape(b, h * w, 1)
    pyf = py.reshape(b, h * w, 1)
    m_cands = sub_x.shape[1]
    ch = min(64, m_cands)
    n_chunks = (m_cands + ch - 1) // ch
    pad = n_chunks * ch - m_cands
    sub_x_p = jnp.pad(sub_x, ((0, 0), (0, pad)), constant_values=1e9)
    sub_y_p = jnp.pad(sub_y, ((0, 0), (0, pad)), constant_values=1e9)

    def nn_body(k, carry):
        best_d2, best_idx = carry
        sx = jax.lax.dynamic_slice_in_dim(sub_x_p, k * ch, ch, 1)
        sy = jax.lax.dynamic_slice_in_dim(sub_y_p, k * ch, ch, 1)
        d2 = ((sx[:, None, :] - pxf) ** 2 + (sy[:, None, :] - pyf) ** 2)
        m = jnp.min(d2, 2)
        mi = jnp.argmin(d2, 2).astype(jnp.int32) + k * ch
        upd = m < best_d2
        return (jnp.where(upd, m, best_d2), jnp.where(upd, mi, best_idx))

    best_d2 = jnp.full((b, h * w), jnp.inf, xs.dtype)
    best_nn = jnp.zeros((b, h * w), jnp.int32)
    best_d2, nearest = jax.lax.fori_loop(0, n_chunks, nn_body,
                                         (best_d2, best_nn))
    cy = gy_s[nearest].reshape(b, h, w)
    cx = gx_s[nearest].reshape(b, h, w)

    def fp_body(_, c):
        cy, cx = c
        alpha = 0.7  # damping for near-unit-contraction regions
        ny = py - bilerp(dy_f, cy, cx)
        nx = px - bilerp(dx_f, cy, cx)
        cy = cy + alpha * (ny - cy)
        cx = cx + alpha * (nx - cx)
        return (jnp.clip(cy, 0, h - 1), jnp.clip(cx, 0, w - 1))

    cy, cx = jax.lax.fori_loop(0, fp_iters, fp_body, (cy, cx))

    # exact triangle tests in a neighborhood of the estimated source cell;
    # taking the nearest hit resolves local occlusions like a z-buffer
    i0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, h - 2)
    j0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, w - 2)

    fxf = fx.reshape(b, h * w)
    fyf = fy.reshape(b, h * w)
    fzf = fz.reshape(b, h * w)

    def corner(ii, jj):
        idx = (ii * w + jj).reshape(b, -1)
        return (jnp.take_along_axis(fxf, idx, 1).reshape(b, h, w),
                jnp.take_along_axis(fyf, idx, 1).reshape(b, h, w),
                jnp.take_along_axis(fzf, idx, 1).reshape(b, h, w))

    best_z = jnp.full((b, h, w), jnp.inf, xs.dtype)
    best_id = jnp.full((b, h, w), -1, jnp.int32)
    n_cells_w = w - 1
    eps = -1e-5

    def test_cell(ci, cj, best_z, best_id):
        # cell corners: tl, tr, bl, br
        x_tl, y_tl, z_tl = corner(ci, cj)
        x_tr, y_tr, z_tr = corner(ci, cj + 1)
        x_bl, y_bl, z_bl = corner(ci + 1, cj)
        x_br, y_br, z_br = corner(ci + 1, cj + 1)
        cell = ci * n_cells_w + cj
        for vx, vy, vz, fid in (
            ((x_tl, x_bl, x_tr), (y_tl, y_bl, y_tr),
             (z_tl, z_bl, z_tr), cell),
            ((x_tr, x_bl, x_br), (y_tr, y_bl, y_br),
             (z_tr, z_bl, z_br), cell + (h - 1) * n_cells_w),
        ):
            l0, l1, l2, degen = _barycentric(
                px, py, vx[0], vy[0], vx[1], vy[1], vx[2], vy[2])
            inv_z = l0 / vz[0] + l1 / vz[1] + l2 / vz[2]
            z = 1.0 / jnp.maximum(inv_z, 1e-12)
            inside = ((l0 >= eps) & (l1 >= eps) & (l2 >= eps)
                      & ~degen & (z > 0))
            better = inside & (z < best_z)
            best_z = jnp.where(better, z, best_z)
            best_id = jnp.where(better, fid, best_id)
        return best_z, best_id

    for di in range(-search, search + 1):
        for dj in range(-search, search + 1):
            ci = jnp.clip(i0 + di, 0, h - 2)
            cj = jnp.clip(j0 + dj, 0, w - 2)
            best_z, best_id = test_cell(ci, cj, best_z, best_id)
    return best_id


def _inv_z_quant(near, far):
    """Fixed-point parameters for per-vertex 1/z payloads: 1/z is LINEAR
    over a screen-space triangle, so quantizing r = 1/z per vertex lets the
    winner pass recover the per-pixel depth with one interpolation and one
    reciprocal — no per-vertex divides.  15-bit over [1/far, 1/near]
    (z error ~1e-5, under half the 14-bit winner-key step)."""
    r_lo = 1.0 / max(far, 1e-6)
    # guard degenerate near==far / near->0 ranges (mirrors the old zscale
    # clamp): r_step=0 would divide-by-zero every rq16 quantization
    r_step = max(1.0 / max(near, 1e-6) - r_lo, 1e-9) / 32767.0
    return r_lo, r_step


def _cand_key_int(dx0, dy0, dx1, dy1, dx2, dy2, r0q, r1q, r2q, cell,
                  ox, oy, parity, n_faces, near, far):
    """Candidate test shared by every grid winner implementation: exact
    barycentric inside test in the slot-relative 1/256-px fixed point, then
    the SAME packed ranking key as the exact 'scatter' z-buffer
    (`_winner_pass`): (quantized per-pixel depth << FACE_BITS) | face id,
    min-reduced — so the nearest face wins and equal quantized depths break
    ties on the LOWEST face id in both modes (nr z-buffer semantics,
    /root/reference/GAN2Shape/renderer/renderer.py:120).  Inputs are f32
    planes; returns an int32 key plane, _SENTINEL where not covered."""
    px2 = 256.0 * ox - dx2
    py2 = 256.0 * oy - dy2
    denom = (dy1 - dy2) * (dx0 - dx2) + (dx2 - dx1) * (dy0 - dy2)
    safe = jnp.where(jnp.abs(denom) > 0.5, denom, 1.0)
    l0 = ((dy1 - dy2) * px2 + (dx2 - dx1) * py2) / safe
    l1 = ((dy2 - dy0) * px2 + (dx0 - dx2) * py2) / safe
    l2 = 1.0 - l0 - l1
    eps = -1e-5
    inside = ((l0 >= eps) & (l1 >= eps) & (l2 >= eps)
              & (jnp.abs(denom) > 0.5) & (cell >= 0))
    r_lo, r_step = _inv_z_quant(near, far)
    inv_z = (l0 * (r_lo + r0q * r_step) + l1 * (r_lo + r1q * r_step)
             + l2 * (r_lo + r2q * r_step))
    z = 1.0 / jnp.maximum(inv_z, 1e-12)
    depth_scale = (2 ** DEPTH_BITS - 1) / (far - near)
    zq = jnp.clip((z - near) * depth_scale, 0, 2 ** DEPTH_BITS - 1)
    key = ((zq.astype(jnp.int32) << FACE_BITS)
           | (cell.astype(jnp.int32) + parity * n_faces))
    return jnp.where(inside, key, _SENTINEL)


def _decode_key(key, n_faces):
    """Winner key -> (cell f32, parity f32, covered bool) planes."""
    covered = key != _SENTINEL
    fid = key & (2 ** FACE_BITS - 1)
    par = (fid >= n_faces) & covered
    cell = jnp.where(covered, fid - jnp.where(par, n_faces, 0), -1)
    return (cell.astype(jnp.float32), par.astype(jnp.float32), covered)


def _build_winner_buffers(vx, vy, vz, h, w, window, near, far):
    """Scatter each face's compact payload to its half-pixel-resolution
    screen bbox-start slot.

    Payload = 10 int16 channels: 6 vertex coordinates in 1/256-px fixed
    point RELATIVE to the slot's integer pixel (range +-127 px), the three
    vertices' quantized 1/z (winner ranking reconstructs the per-pixel depth
    from these — the exact depth is still re-interpolated differentiably
    afterwards), and the face's cell id (-1 marks empty).  Relative
    coordinates make every barycentric term translation-invariant, and
    int16 keeps the buffer (the dominant HBM traffic of the rasterizer)
    compact vs raw f32 payloads.

    Half-pixel slots: integer-resolution starts collide from f32 jitter at
    integer boundaries and mild compression; at half resolution a same-parity
    collision requires compression below 0.5 px/cell — a true depth fold
    (kept arbitrarily, equivalent to a z-fight).  Upper/lower triangles get
    separate buffers.  Out-of-viewport faces go to UNIQUE dump slots —
    clamping them onto shared edge slots creates massive duplicate scatter
    indices, which hits a serialized XLA scatter path (0.1 ms -> 100+ ms).

    Returns two (B, 2, 2, 10, HP, WP_pad) int16 buffers (y-phase, x-phase,
    channel, padded row/col; WP_pad is a 128 multiple for Mosaic DMA)."""
    b = vx.shape[0]
    pad = window + 1
    hp, wp = h + 2 * pad, w + 2 * pad
    wp_s = -(-wp // 128) * 128
    dtype = vx.dtype

    def corners(v):
        return (v[:, :-1, :-1], v[:, 1:, :-1], v[:, :-1, 1:], v[:, 1:, 1:])

    xtl, xbl, xtr, xbr = corners(vx)
    ytl, ybl, ytr, ybr = corners(vy)
    ztl, zbl, ztr, zbr = corners(vz)
    n_faces = (h - 1) * (w - 1)
    cell_id = jnp.broadcast_to(
        jnp.arange(n_faces, dtype=jnp.int32).reshape(1, h - 1, w - 1),
        (b, h - 1, w - 1))

    bufs = []
    for tri in (((xtl, ytl, ztl), (xbl, ybl, zbl), (xtr, ytr, ztr)),
                ((xtr, ytr, ztr), (xbl, ybl, zbl), (xbr, ybr, zbr))):
        (x0, y0, z0), (x1, y1, z1), (x2, y2, z2) = tri
        bx2 = jnp.floor(2.0 * jnp.minimum(jnp.minimum(x0, x1), x2))
        by2 = jnp.floor(2.0 * jnp.minimum(jnp.minimum(y0, y1), y2))
        bx2 = bx2.astype(jnp.int32)
        by2 = by2.astype(jnp.int32)
        inb = ((bx2 >= -2 * pad) & (bx2 < 2 * (wp - pad))
               & (by2 >= -2 * pad) & (by2 < 2 * (hp - pad)))
        s_x = jnp.clip(bx2 + 2 * pad, 0, 2 * wp - 1)
        s_y = jnp.clip(by2 + 2 * pad, 0, 2 * hp - 1)
        qy, sy = s_y // 2, s_y % 2
        qx, sx = s_x // 2, s_x % 2
        # the slot's integer-pixel anchor (output pixel px tests the slot at
        # qx = px + pad - ox, so anchor_x = qx - pad = px - ox)
        ax = (qx - pad).astype(dtype)
        ay = (qy - pad).astype(dtype)

        def fx16(v, anchor):
            q = jnp.clip(jnp.round((v - anchor) * 256.0), -32767, 32767)
            return q.astype(jnp.int16)

        r_lo, r_step = _inv_z_quant(float(near), float(far))

        def rq16(z):
            q = jnp.round((1.0 / jnp.maximum(z, 1e-6) - r_lo) / r_step)
            return jnp.clip(q, 0, 32767).astype(jnp.int16)

        channels = (fx16(x0, ax), fx16(y0, ay), fx16(x1, ax), fx16(y1, ay),
                    fx16(x2, ax), fx16(y2, ay), rq16(z0), rq16(z1), rq16(z2),
                    jnp.where(inb, cell_id, -1).astype(jnp.int16))
        n_ch = len(channels)

        plane = hp * wp_s
        start = (((sy * 2 + sx) * n_ch) * plane
                 + qy * wp_s + qx).reshape(b, -1)
        base = 4 * n_ch * plane
        dump = base + jnp.arange(n_faces, dtype=jnp.int32)[None]
        start = jnp.where(inb.reshape(b, -1), start, dump)

        # nearest-wins collision resolution (sub-half-pixel folds): a
        # scatter-min of packed (32767 - r0q | cell) per slot — same merge
        # rule as the mega kernels' Stage-1/2 — then only the winning
        # face's payload enters the full scatter (an arbitrary-survivor
        # .set() picks the WRONG sheet on ~1% of fold pixels, the dominant
        # covered-depth mismatch vs the exact z-buffer)
        zkey = (((32767 - channels[6].astype(jnp.int32)) << 16)
                | cell_id).reshape(b, -1)
        kbuf = jnp.full((b, base + n_faces), _SENTINEL, jnp.int32)
        kbuf = kbuf.at[jnp.arange(b)[:, None], start].min(zkey)
        won = jnp.take_along_axis(kbuf, start, axis=1) == zkey
        start = jnp.where(won, start, dump)

        # one fused scatter of all channels (separate scatters each copy
        # the whole buffer)
        ch_off = (jnp.arange(n_ch, dtype=jnp.int32) * plane)[None, None, :]
        idx = (start[:, :, None] + ch_off).reshape(b, -1)
        vals = jnp.stack([c.reshape(b, -1) for c in channels],
                         -1).reshape(b, -1)
        buf = jnp.full((b, base + n_faces), -1, jnp.int16)
        buf = buf.at[jnp.arange(b)[:, None], idx].set(vals)
        bufs.append(buf[:, :base].reshape(b, 2, 2, n_ch, hp, wp_s))
    return bufs[0], bufs[1]


def _winner_tests(buf_at, window, best_key, parity, n_faces, near, far):
    """Run all window^2 x 4-phase candidate tests for one parity buffer.
    `buf_at(sy, sx, ch, oy, ox)` -> (..., h, w) int16 channel slice;
    min-merges `_cand_key_int` packed keys into `best_key` (int32)."""
    for oy in range(window):
        for sy in range(2):
            for ox in range(window):
                for sx in range(2):
                    c = [buf_at(sy, sx, ch, oy, ox).astype(jnp.float32)
                         for ch in range(10)]
                    key = _cand_key_int(*c, ox, oy, parity, n_faces,
                                        near, far)
                    best_key = jnp.minimum(best_key, key)
    return best_key


@partial(jax.jit, static_argnames=("h", "w", "window", "near", "far"))
def _dense_winner_xla(buf0, buf1, h, w, window, near, far):
    """XLA fallback winner pass over the payload buffers (CPU path).
    Returns (cell f32, parity f32, covered bool) per pixel."""
    b = buf0.shape[0]
    pad = window + 1
    n_faces = (h - 1) * (w - 1)

    best_key = jnp.full((b, h, w), _SENTINEL, jnp.int32)
    for parity, buf in enumerate((buf0, buf1)):
        def buf_at(sy, sx, ch, oy, ox, buf=buf):
            return buf[:, sy, sx, ch, pad - oy:pad - oy + h,
                       pad - ox:pad - ox + w]
        best_key = _winner_tests(buf_at, window, best_key, parity,
                                 n_faces, float(near), float(far))
    return _decode_key(best_key, n_faces)


def _dense_winner_pallas(buf0, buf1, h, w, window, near, far, band=32):
    """Pallas winner kernel: the payload slab for a row band is DMA'd into
    VMEM scratch (manual copy — bands need halo overlap that BlockSpec
    tiling cannot express) and every candidate test runs from there — one
    manually-fused kernel instead of an unfusable 8*window^2-slice XLA graph
    or a device loop's per-iteration overhead."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = buf0.shape[0]
    pad = window + 1
    hp, wp = buf0.shape[-2], buf0.shape[-1]
    n_faces = (h - 1) * (w - 1)
    band = min(band, h)
    assert h % band == 0 and band % 16 == 0
    n_bands = h // band
    # int16 DMA slices must be 16-row aligned: start at the (aligned) band
    # row and over-fetch one 16-row tile to cover the +pad halo
    rows = band + 16
    assert pad <= 16

    def kernel(b0_hbm, b1_hbm, key_ref, s0, s1, sems):
        bi = pl.program_id(0)
        bandi = pl.program_id(1)
        row0 = bandi * band
        c0 = pltpu.make_async_copy(
            b0_hbm.at[bi, :, :, :, pl.ds(row0, rows), :], s0, sems.at[0])
        c1 = pltpu.make_async_copy(
            b1_hbm.at[bi, :, :, :, pl.ds(row0, rows), :], s1, sems.at[1])
        c0.start()
        c1.start()
        c0.wait()
        c1.wait()

        best_key = jnp.full((band, w), _SENTINEL, jnp.int32)
        for parity, ref in enumerate((s0, s1)):
            def buf_at(sy, sx, ch, oy, ox, ref=ref):
                # buffer row (y + pad - oy) sits at local row
                # y_local + pad - oy (DMA started at the band row itself)
                return ref[sy, sx, ch, pad - oy:pad - oy + band,
                           pad - ox:pad - ox + w]
            best_key = _winner_tests(buf_at, window, best_key, parity,
                                     n_faces, float(near), float(far))
        key_ref[0] = best_key

    spec_in = pl.BlockSpec(memory_space=pltpu.ANY)
    spec_out = pl.BlockSpec((1, band, w), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    key = pl.pallas_call(
        kernel,
        grid=(b, n_bands),
        in_specs=[spec_in, spec_in],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 10, rows, wp), jnp.int16),
            pltpu.VMEM((2, 2, 10, rows, wp), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(buf0, buf1)
    return _decode_key(key, n_faces)


def _lo16f(v):
    """Low int16 half of a packed int32 plane, sign-extended, as f32."""
    return jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(v, 16), 16).astype(jnp.float32)


def _hi16f(v):
    """High int16 half of a packed int32 plane as f32."""
    return jax.lax.shift_right_arithmetic(v, 16).astype(jnp.float32)


def _mega_phase_c(sl, window, n_faces, near, far, h, w):
    """Candidate tests over a packed 5-plane slot buffer (shared by both
    mega kernels).  `sl(par, sy, sx, p, oy, ox)` -> (h, w) int32 plane
    slice (`oy` may be a traced scalar — callers slice rows with pl.ds).
    Plane layout: p0..p2 = packed (dy|dx) fixed-point relative vertex
    coords, p3 = (32767 - r0q | cell), p4 = (r2q | r1q).  Yields
    (row0, band winner-key plane) pairs covering the output rows.

    Output rows are processed in BANDS, like the buffer-slab winner
    kernel: a full 8*window^2-test unroll over (h, w) planes at window=5
    holds ~26 MB of live temporaries (Mosaic scoped-VMEM OOM at 16 MB);
    banding divides the temporary footprint by h/band while keeping every
    slice static (Mosaic cannot prove alignment of dynamic sublane
    offsets, so a fori_loop over the row offset is not an option)."""
    band = 32
    for r0 in range(0, h, band):
        bh = min(band, h - r0)
        best_key = jnp.full((bh, w), _SENTINEL, jnp.int32)
        for par in range(2):
            for oy in range(window):
                for sy in range(2):
                    for ox in range(window):
                        for sx in range(2):
                            p0 = sl(par, sy, sx, 0, oy, ox, r0, bh)
                            p1 = sl(par, sy, sx, 1, oy, ox, r0, bh)
                            p2 = sl(par, sy, sx, 2, oy, ox, r0, bh)
                            p3 = sl(par, sy, sx, 3, oy, ox, r0, bh)
                            p4 = sl(par, sy, sx, 4, oy, ox, r0, bh)
                            key = _cand_key_int(
                                _lo16f(p0), _hi16f(p0),
                                _lo16f(p1), _hi16f(p1),
                                _lo16f(p2), _hi16f(p2),
                                32767.0 - _hi16f(p3), _lo16f(p4),
                                _hi16f(p4), _lo16f(p3),
                                ox, oy, par, n_faces, near, far)
                            best_key = jnp.minimum(best_key, key)
        yield r0, best_key


def _raster_mega_pallas(vx, vy, vz, h, w, window, near, far):
    """Fully-fused Pallas rasterizer winner pass: payload computation,
    placement AND candidate tests in one kernel per batch item.

    Why: XLA's scatter costs ~600 ns/update (the placement of 2x16k face
    payloads dominated the whole training step at ~150-300 ms for b=16).
    On-chip, placement is a serial scalar-store loop at ~30 cycles/face
    (~1 ms/item) while everything else stays vectorized:

      Phase A (vector): per-face slot + packed payload from the (H, W)
          vertex fields — corners via shifted slices, fixed-point relative
          coords packed as 4 int32 pairs + one packed slot word;
      Phase B (scalar loop): place each face's 4 pair words into the
          phase-split slot buffer in VMEM — the TPU-native z-buffer scatter;
      Phase C (vector): all 8*window^2 candidate tests from VMEM, tracking
          min-depth winner cell/parity.

    Returns (cell f32, parity f32, covered bool), matching
    _dense_winner_xla semantics.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = vx.shape[0]
    pad = window + 1
    hp, wp = h + 2 * pad, w + 2 * pad
    wp_s = -(-wp // 128) * 128
    n_fr = h - 1
    n_faces = (h - 1) * (w - 1)
    r_lo, r_step = _inv_z_quant(float(near), float(far))

    SENT = 0x7FFFFFFF  # python int: must not be captured as a traced const

    def kernel(vx_ref, vy_ref, vz_ref, key_ref, slotbuf, paya,
               smem_row, sem):
        fx = vx_ref[0]
        fy = vy_ref[0]
        fz = vz_ref[0]

        # invalidate the slot buffer: p3 = SENT — decodes to cell -1 in
        # Phase C (lo16 sign-extends to -1) AND loses every min-merge
        # comparison, so Phase B's nearest-face collision rule (below)
        # needs no empty-slot special case
        for par in range(2):
            for sy in range(2):
                for sx in range(2):
                    slotbuf[par, sy, sx, 3] = jnp.full((hp, wp_s), SENT,
                                                       jnp.int32)

        lane_j = jax.lax.broadcasted_iota(jnp.int32, (n_fr, w), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (n_fr, w), 0)
        valid_col = lane_j < (w - 1)

        def shifted(v):  # v[:, j+1] with the last lane garbage (masked)
            return pltpu.roll(v, w - 1, 1)  # circular left-by-1

        for par in range(2):
            # corners for this triangle parity (tl,bl,tr) / (tr,bl,br)
            top = (fx[:-1, :], fy[:-1, :], fz[:-1, :])
            bot = (fx[1:, :], fy[1:, :], fz[1:, :])
            tl = top
            bl = bot
            tr = tuple(shifted(v) for v in top)
            br = tuple(shifted(v) for v in bot)
            if par == 0:
                v0, v1, v2 = tl, bl, tr
            else:
                v0, v1, v2 = tr, bl, br
            x0, y0, z0 = v0
            x1, y1, z1 = v1
            x2, y2, z2 = v2

            min_x = jnp.minimum(jnp.minimum(x0, x1), x2)
            min_y = jnp.minimum(jnp.minimum(y0, y1), y2)
            bx2 = jnp.floor(2.0 * min_x).astype(jnp.int32)
            by2 = jnp.floor(2.0 * min_y).astype(jnp.int32)
            inb = ((bx2 >= -2 * pad) & (bx2 < 2 * (wp - pad))
                   & (by2 >= -2 * pad) & (by2 < 2 * (hp - pad)) & valid_col)
            s_x = jnp.clip(bx2 + 2 * pad, 0, 2 * wp - 1)
            s_y = jnp.clip(by2 + 2 * pad, 0, 2 * hp - 1)
            qy, sy = s_y >> 1, s_y & 1
            qx, sx = s_x >> 1, s_x & 1
            ax = (qx - pad).astype(jnp.float32)
            ay = (qy - pad).astype(jnp.float32)

            def fx16(v, anchor):
                q = jnp.clip(jnp.round((v - anchor) * 256.0), -32767.0,
                             32767.0)
                return q.astype(jnp.int32)

            def rq16(z):
                q = jnp.round((1.0 / jnp.maximum(z, 1e-6) - r_lo) / r_step)
                return jnp.clip(q, 0.0, 32767.0).astype(jnp.int32)

            def pack(hi, lo):
                return (hi << 16) | (lo & 0xFFFF)

            cell = row_i * (w - 1) + lane_j
            paya[0] = pack(fx16(y0, ay), fx16(x0, ax))
            paya[1] = pack(fx16(y1, ay), fx16(x1, ax))
            paya[2] = pack(fx16(y2, ay), fx16(x2, ax))
            # p3 high half 32767 - r0q: ascending in z0 so min-merges keep
            # the nearest face; Phase C recovers r0q by re-inverting
            paya[3] = pack(32767 - rq16(z0), cell)
            paya[4] = pack(rq16(z2), rq16(z1))
            slot = qy | (qx << 9) | (sy << 18) | (sx << 19)
            paya[5] = jnp.where(inb, slot, -1)

            # ---- Phase B: serial placement ----
            # Mosaic has no scalar VMEM access: stage each face row in SMEM
            # (DMA) for scalar reads, and write each payload word as a
            # masked full-row read-modify-write at a dynamic sublane offset.
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, wp_s), 1)

            def row_body(i, _):
                cp = pltpu.make_async_copy(paya.at[:, pl.ds(i, 1), :],
                                           smem_row, sem)
                cp.start()
                cp.wait()

                def col_body(j, _):
                    s = smem_row[5, 0, j]

                    @pl.when(s >= 0)
                    def _():
                        qy_s = s & 0x1FF
                        qx_s = (s >> 9) & 0x1FF
                        sy_s = (s >> 18) & 1
                        sx_s = (s >> 19) & 1
                        # nearest-face collision rule: overwrite only if
                        # this face's packed (32767 - r0q | cell) key beats
                        # the slot's current one — the same min-merge as
                        # the v2 kernel's Stage 1/2 and the XLA builder's
                        # scatter-min (empty slots hold SENT and always
                        # lose), so all three placement paths agree on
                        # fold pixels
                        cur3 = slotbuf[par, sy_s, sx_s, 3,
                                       pl.ds(qy_s, 1), :]
                        new3 = jnp.full((1, wp_s), smem_row[3, 0, j],
                                        jnp.int32)
                        win = (lane_ids == qx_s) & (new3 < cur3)
                        for p in range(5):
                            cur = slotbuf[par, sy_s, sx_s, p,
                                          pl.ds(qy_s, 1), :]
                            val = jnp.full((1, wp_s), smem_row[p, 0, j],
                                           jnp.int32)
                            slotbuf[par, sy_s, sx_s, p,
                                    pl.ds(qy_s, 1), :] = jnp.where(
                                win, val, cur)
                    return 0

                jax.lax.fori_loop(0, w - 1, col_body, 0)
                return 0

            jax.lax.fori_loop(0, n_fr, row_body, 0)

        # ---- Phase C: candidate tests ----
        def sl(par, sy, sx, p, oy, ox, r0, bh):
            return slotbuf[par, sy, sx, p,
                           pad - oy + r0:pad - oy + r0 + bh,
                           pad - ox:pad - ox + w]
        for r0, bk in _mega_phase_c(sl, window, n_faces, float(near),
                                    float(far), h, w):
            key_ref[0, r0:r0 + bk.shape[0], :] = bk

    spec_v = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    key = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec_v, spec_v, spec_v],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 2, 5, hp, wp_s), jnp.int32),
            pltpu.VMEM((6, n_fr, w), jnp.int32),
            pltpu.SMEM((6, 1, w), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(jax.lax.stop_gradient(vx), jax.lax.stop_gradient(vy),
      jax.lax.stop_gradient(vz))
    return _decode_key(key, n_faces)


def _raster_mega_pallas_v2(vx, vy, vz, h, w, window, near, far):
    """Fully-vectorized Pallas rasterizer winner pass (no serial Phase B).

    Same contract as `_raster_mega_pallas` (cell f32, parity f32, covered),
    but placement is a banded two-stage permutation instead of a serial
    per-face loop:

      Phase A (vector): per-face payloads as (n_fr, w) planes — relative
          fixed-point vertex coords (4 packed words), plus an aux word
          packing (qy | sy | dqx | sx) of the face's half-pixel slot.
      Stage 1 (vector, data-bounded loop over row shifts dy): faces move
          from source row i to slot row qy = i + dy.  Each pass is one
          dynamic-sublane-offset slice of the padded source planes, masked
          by (qy - i == dy) & (sy == phase), merged by MIN packed
          (zq | cell) — so slot collisions keep the NEAREST face (the
          serial kernel kept an arbitrary one).
      Stage 2 (vector, data-bounded loop over column shifts dx): entries
          move from source column j to slot column qx = j + dx via
          `pltpu.roll` (dynamic lane shift), masked by (dqx == dx) & no
          wrap & (sx == phase), min-merged into the Phase C slot buffer.
      Phase C: identical candidate tests to `_raster_mega_pallas`.

    Cost is O((dy_range + dx_range) * plane_ops) — a few hundred vector
    passes worst-case vs 2*(h-1)*(w-1) serial ~100-cycle placements; the
    shift ranges are computed from the data (min/max displacement), so
    smooth training warps pay only for the shifts they actually use.
    Faces displaced more than DY_CAP rows are dropped (beyond any
    training-scale warp; consistent with the window-overflow contract).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = vx.shape[0]
    pad = window + 1
    hp, wp = h + 2 * pad, w + 2 * pad
    wp_s = -(-wp // 128) * 128
    n_fr = h - 1
    n_faces = (h - 1) * (w - 1)
    r_lo, r_step = _inv_z_quant(float(near), float(far))
    SENT = 0x7FFFFFFF  # python int: must not be captured as a traced const
    # |dy| row-displacement cap (static): faces moving further are dropped
    # (translation range 0.1 units ~ 73 px at 128^2 stays well inside)
    DY_CAP = 96
    # padded source rows: slice start = DY_CAP - dy in [0, 2*DY_CAP], each
    # slice reads hp rows
    src_rows = 2 * DY_CAP + hp

    def kernel(vx_ref, vy_ref, vz_ref, key_ref, slotbuf, src,
               acc1):
        fx = vx_ref[0]
        fy = vy_ref[0]
        fz = vz_ref[0]

        # invalidate the slot buffer: p3 = SENT (zq max, cell -1)
        for par in range(2):
            for sy in range(2):
                for sx in range(2):
                    slotbuf[par, sy, sx, 3] = jnp.full((hp, wp_s),
                                                       SENT, jnp.int32)

        lane_j = jax.lax.broadcasted_iota(jnp.int32, (n_fr, w), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (n_fr, w), 0)
        valid_col = lane_j < (w - 1)

        def shifted(v):  # v[:, j+1] with the last lane garbage (masked)
            return pltpu.roll(v, w - 1, 1)  # circular left-by-1

        tgt_row = jax.lax.broadcasted_iota(jnp.int32, (hp, w), 0)
        lane_256 = jax.lax.broadcasted_iota(jnp.int32, (hp, wp_s), 1)

        for par in range(2):
            # ---- Phase A: payload planes ----
            top = (fx[:-1, :], fy[:-1, :], fz[:-1, :])
            bot = (fx[1:, :], fy[1:, :], fz[1:, :])
            tl = top
            bl = bot
            tr = tuple(shifted(v) for v in top)
            br = tuple(shifted(v) for v in bot)
            if par == 0:
                v0, v1, v2 = tl, bl, tr
            else:
                v0, v1, v2 = tr, bl, br
            x0, y0, z0 = v0
            x1, y1, z1 = v1
            x2, y2, z2 = v2

            min_x = jnp.minimum(jnp.minimum(x0, x1), x2)
            min_y = jnp.minimum(jnp.minimum(y0, y1), y2)
            bx2 = jnp.floor(2.0 * min_x).astype(jnp.int32)
            by2 = jnp.floor(2.0 * min_y).astype(jnp.int32)
            inb = ((bx2 >= -2 * pad) & (bx2 < 2 * (wp - pad))
                   & (by2 >= -2 * pad) & (by2 < 2 * (hp - pad)) & valid_col)
            s_x = jnp.clip(bx2 + 2 * pad, 0, 2 * wp - 1)
            s_y = jnp.clip(by2 + 2 * pad, 0, 2 * hp - 1)
            qy, sy = s_y >> 1, s_y & 1
            qx, sx = s_x >> 1, s_x & 1
            ax = (qx - pad).astype(jnp.float32)
            ay = (qy - pad).astype(jnp.float32)

            def fx16(v, anchor):
                q = jnp.clip(jnp.round((v - anchor) * 256.0), -32767.0,
                             32767.0)
                return q.astype(jnp.int32)

            def rq16(z):
                q = jnp.round((1.0 / jnp.maximum(z, 1e-6) - r_lo) / r_step)
                return jnp.clip(q, 0.0, 32767.0).astype(jnp.int32)

            def pack(hi, lo):
                return (hi << 16) | (lo & 0xFFFF)

            cell = row_i * (w - 1) + lane_j
            dy_f = jnp.clip(qy - row_i, -DY_CAP, DY_CAP)
            dqx = qx - lane_j  # in [-(w-1), wp)
            # aux: qy (9b) | sy (1b) | dqx+256 (10b) | sx (1b)
            aux = qy | (sy << 9) | ((dqx + 256) << 10) | (sx << 20)

            planes = (pack(fx16(y0, ay), fx16(x0, ax)),
                      pack(fx16(y1, ay), fx16(x1, ax)),
                      pack(fx16(y2, ay), fx16(x2, ax)),
                      # merge key: (32767 - r0q) ascends with z0, so the
                      # min-merge collision rule keeps the nearest face
                      jnp.where(inb, pack(32767 - rq16(z0), cell), SENT),
                      pack(rq16(z2), rq16(z1)),
                      jnp.where(inb, aux, -1))
            for p, plane in enumerate(planes):
                src[p, DY_CAP:DY_CAP + n_fr, :] = plane
                if p in (3, 5):  # only the key/mask planes need padding
                    fill = SENT if p == 3 else -1
                    src[p, 0:DY_CAP, :] = jnp.full((DY_CAP, w), fill,
                                                   jnp.int32)
                    src[p, DY_CAP + n_fr:src_rows, :] = jnp.full(
                        (src_rows - DY_CAP - n_fr, w), fill, jnp.int32)

            dy_valid = jnp.where(inb, dy_f, 0)
            dy_lo = jnp.min(dy_valid)
            dy_hi = jnp.max(dy_valid)
            dqx_valid = jnp.where(inb, dqx, 0)
            dx_lo = jnp.min(dqx_valid)
            dx_hi = jnp.max(dqx_valid)

            # ---- Stage 1: row placement (source row -> slot row) ----
            for syp in range(2):
                acc1[syp, 3] = jnp.full((hp, wp_s), SENT, jnp.int32)
                acc1[syp, 5] = jnp.full((hp, wp_s), -1, jnp.int32)

            def dy_body(dy, _):
                start = DY_CAP - dy
                sl = [src[p, pl.ds(start, hp), :] for p in range(6)]
                auxs = sl[5]
                qy_s = auxs & 0x1FF
                sy_s = (auxs >> 9) & 1
                m_row = (auxs >= 0) & (qy_s == tgt_row)
                for syp in range(2):
                    m = m_row & (sy_s == syp)
                    # min-merge on packed (zkey | cell): better => m holds
                    cand3 = jnp.where(m, sl[3], SENT)
                    better = cand3 < acc1[syp, 3, :, 0:w]
                    for p in range(6):
                        acc1[syp, p, :, 0:w] = jnp.where(
                            better, sl[p], acc1[syp, p, :, 0:w])
                return 0

            jax.lax.fori_loop(dy_lo, dy_hi + 1, dy_body, 0)

            # ---- Stage 2: column placement (source col -> slot col) ----
            def dx_body(dx, _):
                shift = jnp.remainder(dx, wp_s)
                src_j = lane_256 - dx
                no_wrap = (src_j >= 0) & (src_j < w)
                for syp in range(2):
                    rolled = [pltpu.roll(acc1[syp, p], shift, 1)
                              for p in range(6)]
                    auxr = rolled[5]
                    dqx_r = ((auxr >> 10) & 0x3FF) - 256
                    sx_r = (auxr >> 20) & 1
                    m_col = (auxr >= 0) & (dqx_r == dx) & no_wrap
                    for sxp in range(2):
                        m = m_col & (sx_r == sxp)
                        cand3 = jnp.where(m, rolled[3], SENT)
                        better = cand3 < slotbuf[par, syp, sxp, 3]
                        for p in range(5):
                            slotbuf[par, syp, sxp, p] = jnp.where(
                                better, rolled[p],
                                slotbuf[par, syp, sxp, p])
                return 0

            jax.lax.fori_loop(dx_lo, dx_hi + 1, dx_body, 0)

        # ---- Phase C: candidate tests (identical to the serial kernel) ----
        def sl(par, sy, sx, p, oy, ox, r0, bh):
            return slotbuf[par, sy, sx, p,
                           pad - oy + r0:pad - oy + r0 + bh,
                           pad - ox:pad - ox + w]
        for r0, bk in _mega_phase_c(sl, window, n_faces, float(near),
                                    float(far), h, w):
            key_ref[0, r0:r0 + bk.shape[0], :] = bk

    spec_v = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    key = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec_v, spec_v, spec_v],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 2, 5, hp, wp_s), jnp.int32),
            pltpu.VMEM((6, src_rows, w), jnp.int32),
            pltpu.VMEM((2, 6, hp, wp_s), jnp.int32),
        ],
    )(jax.lax.stop_gradient(vx), jax.lax.stop_gradient(vy),
      jax.lax.stop_gradient(vz))
    return _decode_key(key, n_faces)


def _mega_pallas_ok(h, w, window):
    import jax
    if jax.devices()[0].platform != "tpu":
        return False
    if w % 128 != 0:
        # the Phase-B SMEM staging DMA slices the payload scratch along
        # lanes; Mosaic requires that slice 128-aligned (the 64-px path
        # falls back to the buffer-slab winner kernel)
        return False
    pad = window + 1
    hp = h + 2 * pad
    wp_s = -(-(w + 2 * pad) // 128) * 128
    vmem = (2 * 2 * 2 * 5 * hp * wp_s * 4      # slot buffer
            + 6 * (2 * 96 + hp) * w * 4        # v2 padded source planes
            + 2 * 6 * hp * wp_s * 4)           # v2 stage-1 accumulator
    return vmem < 12 * 2 ** 20  # leave headroom of the ~16MB VMEM


def _winner_pallas_ok(h, w, window):
    import jax
    if jax.devices()[0].platform != "tpu":
        return False
    rows = min(32, h) + 16
    wp_s = -(-(w + 2 * (window + 1)) // 128) * 128
    vmem_bytes = 2 * (2 * 2 * 10 * rows * wp_s) * 2  # two payload slabs
    return vmem_bytes < 10 * 2 ** 20  # leave headroom of the ~16MB VMEM


@partial(jax.jit, static_argnames=("h", "w", "window", "near", "far"))
def rasterize_depth_grid(vx, vy, vz, h, w, window=3, near=0.3, far=1.3):
    """Grid-mesh depth rasterizer — the TPU hot path.

    Three stages (TPU profiling: scatters and gathers are both fast; what
    kills naive ports is materialized candidate-tensor HBM traffic and XLA's
    inability to fuse ~8*window^2 shifted-slice tests):

      1. [stop-grad] scatter each face's payload to its half-pixel bbox-start
         slot (one row-scatter per triangle parity) — `_build_winner_buffers`;
      2. [stop-grad] dense winner pass over the buffers: a Pallas kernel
         holds both buffers in VMEM and runs every candidate test in one
         fused pass (XLA shifted-slice fallback off-TPU);
      3. [differentiable] per-pixel gather of the winning face's 3 vertices
         from the live vertex fields, exact barycentric + perspective-correct
         1/z interpolation — plain autodiff yields the vertex gradients
         (nvdiffrast's factorization).

    vx, vy: (B, H, W) screen coords of the warped grid; vz: (B, H, W) camera
    depth.  Uncovered pixels get `far`.
    """
    b = vx.shape[0]
    dtype = vx.dtype
    sg = jax.lax.stop_gradient
    if _mega_pallas_ok(h, w, window):
        # v2: vectorized two-stage placement (z-min collision merge);
        # agreement vs the XLA oracle 0.999 on training-regime warps
        # (RASTER_CHECK.json), ~3x faster than the serial-placement kernel
        cell, par, covered = _raster_mega_pallas_v2(
            sg(vx), sg(vy), sg(vz), h, w, window, float(near), float(far))
    else:
        buf0, buf1 = _build_winner_buffers(sg(vx), sg(vy), sg(vz), h, w,
                                           window, near, far)
        if _winner_pallas_ok(h, w, window):
            cell, par, covered = _dense_winner_pallas(
                buf0, buf1, h, w, window, float(near), float(far))
        else:
            cell, par, covered = _dense_winner_xla(
                buf0, buf1, h, w, window, float(near), float(far))
    cell = sg(cell)
    par = sg(par)
    covered = sg(covered)

    # winner cell -> its 2x2 corner block, fetched in PLANE layout: the
    # displacement-decomposed Pallas fetch (no gather — XLA windowed gathers
    # cost ~17 ns/index, 5.5 ms/iter at b=16) keeps all tap/coord planes on
    # the pixel grid, so the barycentric math below runs on (B, H, W)
    # arrays with no (B, P, 2, 2, C) relayout at either end.
    ci = jnp.clip(cell.astype(jnp.int32) // (w - 1), 0, h - 2)
    cj = jnp.clip(cell.astype(jnp.int32) - ci * (w - 1), 0, w - 2)
    # uncovered pixels (cell == -1) receive zero cotangent through the
    # `covered` select below; anchor their gather window at the pixel itself
    # so the fetch/splat data-driven displacement bounds stay warp-sized
    # instead of jumping to the clip corner (ops/splat_window.py)
    py = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 1)
    px = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 2)
    ci = jnp.where(covered, ci, jnp.minimum(py, h - 2))
    cj = jnp.where(covered, cj, jnp.minimum(px, w - 2))
    ci = jnp.broadcast_to(ci, (b, h, w))
    cj = jnp.broadcast_to(cj, (b, h, w))

    from gan2shape_tpu.ops.gather_window import gather_window2x2_planes

    allv = jnp.stack([vx, vy, vz], 1)  # (B, 3, H, W)
    planes = gather_window2x2_planes(allv, ci, cj)  # (B, 2, 2, 3, H, W)
    p_tl = planes[:, 0, 0]
    p_bl = planes[:, 1, 0]
    p_tr = planes[:, 0, 1]
    p_br = planes[:, 1, 1]  # each (B, 3coords, H, W)
    # upper tri = (tl, bl, tr), lower = (tr, bl, br) (grid_faces order)
    is_up = (par < 0.5)[:, None]  # (B, 1, H, W)
    pv0 = jnp.where(is_up, p_tl, p_tr)
    pv1 = p_bl
    pv2 = jnp.where(is_up, p_tr, p_br)
    gx = jax.lax.broadcasted_iota(dtype, (1, h, w), 2)
    gy = jax.lax.broadcasted_iota(dtype, (1, h, w), 1)
    l0, l1, l2, _ = _barycentric(
        gx, gy, pv0[:, 0], pv0[:, 1], pv1[:, 0], pv1[:, 1],
        pv2[:, 0], pv2[:, 1])
    inv_z = l0 / pv0[:, 2] + l1 / pv1[:, 2] + l2 / pv2[:, 2]
    z = 1.0 / jnp.maximum(inv_z, 1e-12)
    return jnp.where(covered, z, jnp.asarray(far, dtype))


def rasterize_depth(xs, ys, zs, faces, h, w, window=5, near=0.3, far=1.3,
                    mode="grid", search=1):
    """Render a depth map from projected grid-mesh vertices.

    xs, ys: (B, N) screen-space pixel coordinates (x right, y down, pixel
    centers at integers); zs: (B, N) camera depth; faces: (F, 3) int32.
    Uncovered pixels get `far`.  Gradients flow to xs/ys/zs through the
    barycentric interpolation of each pixel's winning face.

    mode: 'grid' (dense payload-scatter rasterizer, the TPU hot path —
    requires xs/ys/zs to be the row-major regular-grid vertex fields),
    'invwarp' (gather-based winner search) or 'scatter' (segment-min
    z-buffer — exact for arbitrary meshes/warps, gather-bound on TPU).
    """
    b = xs.shape[0]
    if mode == "grid" and xs.shape[1] == h * w:
        # window 5 matches the scatter z-buffer's candidate reach exactly
        # (faces stretched wider — rim cells with steep slope under large
        # rotations — lose the same pixels in both modes); the static
        # candidate-test unroll grows as 8*window^2
        return rasterize_depth_grid(
            xs.reshape(b, h, w), ys.reshape(b, h, w), zs.reshape(b, h, w),
            h, w, window=min(window, 5), near=float(near), far=float(far))
    if mode == "invwarp":
        winner = jax.lax.stop_gradient(
            _winner_pass_invwarp(
                jax.lax.stop_gradient(xs), jax.lax.stop_gradient(ys),
                jax.lax.stop_gradient(zs), h, w, search=search))
    else:
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
