"""2x2-window gather with a hand-written transpose.

Forward: ONE `lax.gather` with slice_sizes (2, 2, C) per index — XLA TPU
gathers cost ~10-17 ns per INDEX nearly independent of slice size, so
fetching a pixel's whole 2x2 neighborhood in one gather is ~4x cheaper than
four per-tap gathers (measured on the step-2 pseudo-sample path).

Backward: XLA's automatic transpose of a windowed gather is a windowed
scatter that runs catastrophically slowly (and faulted the device on the
step-3 graph); the hand-written VJP below is four flat-index `.at[].add`
scatter-adds — the exact transpose XLA produced for the old per-tap
formulation, which was fast.
"""

import os

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gather_window2x2(op, starts):
    """op: (B, H, W, C); starts: (B, P, 2) int32 in [0, H-2] x [0, W-2].
    Returns (B, P, 2, 2, C) with out[b, p, a, s] = op[b, y+a, x+s]."""
    return _gather_fwd_impl(op, starts)


def _gather_fwd_impl(op, starts):
    c = op.shape[-1]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def one(o, idx):
        return jax.lax.gather(o, idx, dnums, slice_sizes=(2, 2, c),
                              mode=jax.lax.GatherScatterMode.CLIP)

    return jax.vmap(one)(op, starts)


def _gather_fwd(op, starts):
    return _gather_fwd_impl(op, starts), (starts, op.shape)


def _gather_bwd(res, g):
    # Pixel-grid splats on TPU route to the displacement-decomposed Pallas
    # kernel (ops/splat_window.py) — no scatter at all; anything else falls
    # back to four flat per-tap scatter-adds.  A single concatenated scatter
    # was measured EQUAL-or-worse (XLA scatter cost is per-update, not
    # per-op), and a hand-written WINDOWED scatter-add (one index per pixel,
    # update_window_dims=(2,2,C)) took step 1 from 4.7 to 92.7 ms/iter —
    # windowed TPU scatters are pathological per se, not just via XLA's
    # auto-transpose legalization; do not revisit.
    starts, shape = res
    if os.environ.get("G2S_SPLAT", "pallas") == "pallas":
        from gan2shape_tpu.ops.splat_window import splat_window2x2_add
        return splat_window2x2_add(g, starts, shape), None
    from gan2shape_tpu.ops.splat_window import _splat_flat4
    return _splat_flat4(g, starts, shape), None


gather_window2x2.defvjp(_gather_fwd, _gather_bwd)


# ---- pixel-grid plane-layout variant -------------------------------------
#
# When the P axis IS the pixel grid (P == H*W, one window per output pixel —
# the rasterizer's re-interpolation and pixel-aligned grid_sample), the
# (B, P, 2, 2, C) patch layout forces XLA relayout copies on both sides
# (~1 ms/iter each at b=16) and the windowed gather itself costs ~17 ns per
# index (5.5 ms/iter).  This variant keeps everything in (tap, channel)
# PLANES over the pixel grid: the forward is the displacement-decomposed
# Pallas fetch and the backward the matching Pallas splat — no gather, no
# scatter, no layout change end to end.


def _pixel_grid_ok(b, h, w, c, dtype):
    if c != 3 or dtype != jnp.float32:
        return False
    if h % 8 != 0 or w % 128 != 0 or h < 16:
        return False
    return jax.devices()[0].platform == "tpu"


def _disp(iy, ix, h, w):
    py = jax.lax.broadcasted_iota(jnp.int32, iy.shape, 1)
    px = jax.lax.broadcasted_iota(jnp.int32, ix.shape, 2)
    return iy.astype(jnp.int32) - py, ix.astype(jnp.int32) - px


@jax.custom_vjp
def gather_window2x2_planes(src, iy, ix):
    """src: (B, C, H, W); iy/ix: (B, H, W) int32 window starts, clipped to
    [0, H-2] x [0, W-2].  Returns planes (B, 2, 2, C, H, W) with
    out[b, a, s, c, y, x] = src[b, c, iy[y, x]+a, ix[y, x]+s]."""
    return _planes_fwd_impl(src, iy, ix)


def _area(dyv, dxv):
    """Displacement bounding-box area: the number of (dy, dx) passes the
    displacement-decomposed kernels pay.  Small for smooth near-identity
    warps (the rasterizer re-interpolation, converged-training views);
    large for the pseudo-sample pool's randomly sampled views."""
    return ((jnp.max(dyv) - jnp.min(dyv) + 1)
            * (jnp.max(dxv) - jnp.min(dxv) + 1))


def _area_limit():
    # breakeven between area x (12 masked rolls over (h, w)) and the XLA
    # windowed gather (~17 ns/index + relayout copies); measured on the
    # step mix — see PERF_NOTES.md
    return jnp.int32(int(os.environ.get("G2S_FETCH_AREA_LIMIT", "64")))


# ---- block-gather route for LARGE displacements ---------------------------
#
# When the displacement bbox is too large for the roll-decomposed Pallas
# fetch (the pseudo-pool's randomly sampled views), the per-pixel windowed
# gather pays ~17 ns for every one of B*H*W indexes (~4.5 ms/iter at b=16).
# But the warp is still SPATIALLY SMOOTH — neighbouring pixels fetch
# overlapping windows — so gather one (K, K, C) window per (bs x bs)
# destination block instead (bs^2 x fewer indexes; slice size is nearly
# free) and select each pixel's 2x2 taps from the shared window with exact
# one-hot einsum contractions (multiplies by 0.0/1.0 + sums of zeros —
# bit-exact).  Validity (every pixel's window inside its block's K-window)
# is data-dependent: a `lax.cond` on the worst within-block start spread
# falls back to the per-pixel gather when the local warp is too steep.


def _block_cfg():
    bs = int(os.environ.get("G2S_FETCH_BLOCK", "4"))
    k = int(os.environ.get("G2S_FETCH_BLOCK_WIN", "12"))
    return bs, k


def _block_fetch_impl(src, iy, ix, bs, k):
    """src (B, C, H, W); iy/ix (B, H, W) clipped window starts.  Requires
    h % bs == w % bs == 0, k <= min(h, w), and within-block start spread
    <= k-2 (caller guarantees via the `ok` predicate).  Returns planes
    (B, 2, 2, C, H, W) bit-identical to the per-pixel windowed gather."""
    b, c, h, w = src.shape
    hb, wb = h // bs, w // bs
    iyb = iy.reshape(b, hb, bs, wb, bs)
    ixb = ix.reshape(b, hb, bs, wb, bs)
    base_y = jnp.minimum(iyb.min((2, 4)), h - k)  # (B, hb, wb)
    base_x = jnp.minimum(ixb.min((2, 4)), w - k)
    oy = iyb - base_y[:, :, None, :, None]  # (B, hb, bs, wb, bs) in [0, k-2]
    ox = ixb - base_x[:, :, None, :, None]

    starts = jnp.stack(
        [base_y.reshape(b, hb * wb), base_x.reshape(b, hb * wb)], -1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def one(o, idx):
        return jax.lax.gather(o, idx, dnums, slice_sizes=(k, k, c),
                              mode=jax.lax.GatherScatterMode.CLIP)

    patch = jax.vmap(one)(src.transpose(0, 2, 3, 1), starts)
    # broadcastable over the within-block pixel positions (i, j)
    patch = patch.reshape(b, hb, 1, wb, 1, k, k, c)

    # exact one-of-K selection: K-deep `where` chains (pure selects — a
    # one-hot MXU contraction would truncate the selected values to bf16
    # under the 'default' matmul-precision policy, and this path carries
    # rasterizer vertex COORDS, which must stay bit-exact).  XLA fuses the
    # chain into one elementwise pass; ~K compares per output element.
    taps = []
    for a in (0, 1):
        sely = oy + a  # (B, hb, bs, wb, bs) in [0, k-1]
        rows = jnp.zeros((b, hb, bs, wb, bs, k, c), src.dtype)
        for u in range(k):
            rows = jnp.where((sely == u)[..., None, None],
                             patch[:, :, :, :, :, u], rows)
        for s in (0, 1):
            selx = ox + s
            out_t = jnp.zeros((b, hb, bs, wb, bs, c), src.dtype)
            for v in range(k):
                out_t = jnp.where((selx == v)[..., None],
                                  rows[..., v, :], out_t)
            taps.append(out_t)
    out = jnp.stack(taps, 1)  # (B, 4, hb, bs, wb, bs, C), tap order a*2+s
    return (out.transpose(0, 1, 6, 2, 3, 4, 5)
            .reshape(b, 2, 2, c, h, w))


def _block_spread_ok(iy, ix, bs, k):
    b, h, w = iy.shape
    hb, wb = h // bs, w // bs
    iyb = iy.reshape(b, hb, bs, wb, bs)
    ixb = ix.reshape(b, hb, bs, wb, bs)

    def spread(v):
        return jnp.max(v.max((2, 4)) - v.min((2, 4)))

    return (spread(iyb) <= k - 2) & (spread(ixb) <= k - 2)


def _planes_fwd_impl(src, iy, ix):
    b, c, h, w = src.shape
    iy = jnp.clip(iy.astype(jnp.int32), 0, h - 2)
    ix = jnp.clip(ix.astype(jnp.int32), 0, w - 2)

    def pixel_path(src, iy, ix):
        starts = jnp.stack([iy.reshape(b, h * w), ix.reshape(b, h * w)], -1)
        patch = _gather_fwd_impl(src.transpose(0, 2, 3, 1), starts)
        return (patch.transpose(0, 2, 3, 4, 1)  # (B, 2, 2, C, P)
                .reshape(b, 2, 2, c, h, w))

    bs, k = _block_cfg()
    if (os.environ.get("G2S_FETCH_XL", "gather") == "block"
            and bs > 1 and h % bs == 0 and w % bs == 0 and k <= min(h, w)):
        def xla_path(src, iy, ix):
            return jax.lax.cond(_block_spread_ok(iy, ix, bs, k),
                                lambda s, y, x: _block_fetch_impl(
                                    s, y, x, bs, k),
                                pixel_path, src, iy, ix)
    else:
        xla_path = pixel_path

    if (_pixel_grid_ok(b, h, w, c, src.dtype)
            and os.environ.get("G2S_FETCH", "pallas") == "pallas"):
        from gan2shape_tpu.ops.splat_window import _fetch_pallas
        dyv, dxv = _disp(iy, ix, h, w)

        def pallas_path(src, iy, ix):
            out = _fetch_pallas(src, dyv, dxv, h, w, c)  # (B, 4C, h, w)
            return out.reshape(b, 2, 2, c, h, w)

        return jax.lax.cond(_area(dyv, dxv) <= _area_limit(),
                            pallas_path, xla_path, src, iy, ix)
    return xla_path(src, iy, ix)


def _planes_fwd(src, iy, ix):
    # the zero-size prototype carries the PRIMAL dtype to the backward
    # (a raw np.dtype is not a valid custom_vjp residual leaf)
    proto = jnp.zeros((0,), src.dtype)
    return _planes_fwd_impl(src, iy, ix), (iy, ix, src.shape, proto)


def _planes_bwd(res, g):
    iy, ix, shape, proto = res
    src_dtype = proto.dtype
    b, c, h, w = shape
    iy = jnp.clip(iy.astype(jnp.int32), 0, h - 2)
    ix = jnp.clip(ix.astype(jnp.int32), 0, w - 2)
    g = g.astype(jnp.float32)

    def flat_path(g, iy, ix):
        from gan2shape_tpu.ops.splat_window import _splat_flat4
        starts = jnp.stack([iy.reshape(b, h * w), ix.reshape(b, h * w)], -1)
        gp = (g.reshape(b, 2, 2, c, h * w)
              .transpose(0, 4, 1, 2, 3))  # (B, P, 2, 2, C)
        dsrc = _splat_flat4(gp, starts, (b, h, w, c))  # (B, H, W, C)
        return dsrc.transpose(0, 3, 1, 2)

    # gate on the PRIMAL dtype (matching the forward's _pixel_grid_ok
    # gate) and return the cotangent in the primal dtype — the splat
    # accumulates in f32 either way
    if (_pixel_grid_ok(b, h, w, c, src_dtype)
            and os.environ.get("G2S_SPLAT", "pallas") == "pallas"):
        from gan2shape_tpu.ops.splat_window import _splat_pallas
        dyv, dxv = _disp(iy, ix, h, w)

        def pallas_path(g, iy, ix):
            return _splat_pallas(g.reshape(b, 4 * c, h, w), dyv, dxv, h, w)

        dsrc = jax.lax.cond(_area(dyv, dxv) <= _area_limit(),
                            pallas_path, flat_path, g, iy, ix)
        return dsrc.astype(src_dtype), None, None
    return flat_path(g, iy, ix).astype(src_dtype), None, None


gather_window2x2_planes.defvjp(_planes_fwd, _planes_bwd)
