"""Displacement-decomposed 2x2-window scatter-add (the gather_window2x2
transpose) as a Pallas TPU kernel.

The backward of the rasterizer's vertex interpolation and of grid_sample is
`dv[b, iy+a, ix+s, c] += g[b, p, a, s, c]` with (iy, ix) = starts[b, p] —
four flat scatter-adds in XLA at ~13 ns/update = ~27 ms/iter at b=16 in
step 3 (trace-verified; a windowed XLA scatter is 20x worse, see
gather_window.py).  But in this method `starts` is not arbitrary: p indexes
the OUTPUT pixel grid (P == h*w) and starts[p] = p + d(p) where d is the
screen-space warp displacement — smooth and small (measured {-1, 0} on the
bench regime; bounded by the view/translation ranges in training).

So decompose the scatter BY DISPLACEMENT VALUE: for each (dy, dx) actually
present, `acc += shift(g * [d == (dy, dx)])` — a masked vector shift, no
scatter at all.  Same-displacement sources map to distinct destinations
(a shift is injective), so plain adds are the exact adjoint.  Row shifts are
dynamic-sublane slices of a padded VMEM buffer, column shifts are
`pltpu.roll` lane rotations with a no-wrap mask, and the (dy, dx) loops are
`fori_loop`s with DATA-DRIVEN bounds (min/max of d) — smooth warps pay only
for the displacement they use; the worst possible case (~h*w passes) costs
about what the XLA scatters did.  The 2x2 taps accumulate into 4 per-tap
plane sets at the BASE target (iy, ix) and are combined at the end with two
static +1 shifts, so the displacement loops run once, not four times.

Same design family as ops/rasterize.py's `_raster_mega_pallas_v2` placement
(banded two-stage permutation), reused here for an additive merge.
"""

import jax
import jax.numpy as jnp


def _splat_pallas(g12, dyv, dxv, h, w):
    """g12: (B, 12, h, w) f32 — tap/channel planes in (a, s, c) order;
    dyv/dxv: (B, h, w) int32 base-target displacement (iy - y, ix - x).
    Returns (B, 3, h, w) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = g12.shape[0]
    cap = h - 1  # |dy| can never exceed h-1 (starts are clipped to [0, h-2])
    src_rows = 2 * cap + h
    wp = -(-w // 128) * 128
    BIGD = 1 << 20  # pad sentinel: never equals a real dy

    def kernel(g_ref, dy_ref, dx_ref, out_ref, srcf, srci, acc):
        dyp = dy_ref[0]
        dxp = dx_ref[0]
        dy_lo = jnp.min(dyp)
        dy_hi = jnp.max(dyp)
        dx_lo = jnp.min(dxp)
        dx_hi = jnp.max(dxp)

        srci[0, 0:cap, :] = jnp.full((cap, w), BIGD, jnp.int32)
        srci[0, cap:cap + h, :] = dyp
        srci[0, cap + h:src_rows, :] = jnp.full((cap, w), BIGD, jnp.int32)
        srci[1, cap:cap + h, :] = dxp
        for p in range(12):
            srcf[p, cap:cap + h, :] = g_ref[0, p]
        for p in range(12):
            acc[p] = jnp.zeros((h, wp), jnp.float32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 1)

        def dy_body(dy, _):
            start = cap - dy
            d_sl = srci[0, pl.ds(start, h), :]
            x_sl = srci[1, pl.ds(start, h), :]
            g_sl = [srcf[p, pl.ds(start, h), :] for p in range(12)]
            m_row = d_sl == dy

            def dx_body(dx, _):
                shift = jnp.remainder(dx, wp)
                m = (m_row & (x_sl == dx)).astype(jnp.int32)
                m_r = pltpu.roll(m, shift, 1)
                src_j = lane[:, 0:w] - dx
                ok = (m_r > 0) & (src_j >= 0) & (src_j < w)
                for p in range(12):
                    rolled = pltpu.roll(g_sl[p], shift, 1)
                    acc[p, :, 0:w] = acc[p, :, 0:w] + jnp.where(
                        ok, rolled, 0.0)
                return 0

            jax.lax.fori_loop(dx_lo, dx_hi + 1, dx_body, 0)
            return 0

        jax.lax.fori_loop(dy_lo, dy_hi + 1, dy_body, 0)

        # tap combine: dv[y, x] = acc00[y, x] + acc10[y-1, x]
        #                        + acc01[y, x-1] + acc11[y-1, x-1]
        row0 = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 0) == 0
        col0 = lane == 0
        for c in range(3):
            a00 = acc[0 + c]
            a01 = acc[3 + c]
            a10 = acc[6 + c]
            a11 = acc[9 + c]
            dn10 = jnp.where(row0, 0.0, pltpu.roll(a10, 1, 0))
            dn11 = jnp.where(row0, 0.0, pltpu.roll(a11, 1, 0))
            rt01 = jnp.where(col0, 0.0, pltpu.roll(a01, 1, 1))
            rt11 = jnp.where(col0, 0.0, pltpu.roll(dn11, 1, 1))
            out_ref[0, c] = (a00 + dn10 + rt01 + rt11)[:, 0:w]

        return

    spec_g = pl.BlockSpec((1, 12, h, w), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec_g, spec_d, spec_d],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((12, src_rows, w), jnp.float32),
            pltpu.VMEM((2, src_rows, w), jnp.int32),
            pltpu.VMEM((12, h, wp), jnp.float32),
        ],
    )(g12, dyv, dxv)


def _fetch_pallas(src, dyv, dxv, h, w, c):
    """Forward mirror of `_splat_pallas`: displacement-decomposed 2x2-window
    FETCH.  src: (B, C, h, w) f32 channel planes; dyv/dxv: (B, h, w) int32
    displacement of each destination pixel's window base (iy - y, ix - x),
    with iy in [0, h-2] and ix in [0, w-2].  Returns (B, 4*C, h, w) where
    plane (a*2+s)*C + ch holds src[ch][y+dy+a, x+dx+s].

    Same trick as the splat: XLA's windowed gather costs ~17 ns per index
    (5.5 ms/iter at b=16 in steps 2 and 3, trace-verified), but on the
    pixel-grid paths the index field is pixel + small smooth displacement,
    so the gather decomposes into O(displacement-range) masked vector
    shifts — dynamic sublane slices for rows, `pltpu.roll` for lanes, and
    a destination-side select (no no-wrap masks needed here: clipped
    starts guarantee every selected source is in bounds)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = src.shape[0]
    cap = h - 1
    src_rows = 2 * cap + h  # row slices [cap+dy+a, +h) stay in range
    nplanes = 4 * c

    def kernel(s_ref, dy_ref, dx_ref, out_ref, srcf):
        dyp = dy_ref[0]
        dxp = dx_ref[0]
        dy_lo = jnp.min(dyp)
        dy_hi = jnp.max(dyp)
        dx_lo = jnp.min(dxp)
        dx_hi = jnp.max(dxp)

        for ch in range(c):
            srcf[ch, cap:cap + h, :] = s_ref[0, ch]
        for p in range(nplanes):
            out_ref[0, p] = jnp.zeros((h, w), jnp.float32)

        def dy_body(dy, _):
            # rows [cap+dy+a, +h): uninitialized rows are only ever read at
            # destinations whose mask is false (iy = y+dy >= 0 wherever the
            # select takes the rolled value)
            sl = [[srcf[ch, pl.ds(cap + dy + a, h), :] for ch in range(c)]
                  for a in (0, 1)]
            m_row = dyp == dy

            def dx_body(dx, _):
                m = m_row & (dxp == dx)
                for a in (0, 1):
                    for s in (0, 1):
                        shift = jnp.remainder(-(dx + s), w)
                        for ch in range(c):
                            rolled = pltpu.roll(sl[a][ch], shift, 1)
                            plane = (a * 2 + s) * c + ch
                            out_ref[0, plane] = jnp.where(
                                m, rolled, out_ref[0, plane])
                return 0

            jax.lax.fori_loop(dx_lo, dx_hi + 1, dx_body, 0)
            return 0

        jax.lax.fori_loop(dy_lo, dy_hi + 1, dy_body, 0)
        return

    spec_s = pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, nplanes, h, w), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec_s, spec_d, spec_d],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((b, nplanes, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, src_rows, w), jnp.float32)],
    )(src, dyv, dxv)


def _splat_ok(shape, g):
    """Pallas path applies when: TPU, P == h*w (pixel-grid calls), C == 3,
    f32, and lane-aligned width."""
    b, h, w, c = shape
    if g.shape[1] != h * w or c != 3 or g.dtype != jnp.float32:
        return False
    if h % 8 != 0 or w % 128 != 0 or h < 16:
        return False
    import jax as _jax
    return _jax.devices()[0].platform == "tpu"


def splat_window2x2_add(g, starts, shape):
    """Exact transpose of gather_window2x2: scatter-add g (B, P, 2, 2, C)
    at starts (B, P, 2) into zeros(shape=(B, H, W, C)).  Displacement-
    decomposed Pallas kernel when the call is a pixel-grid splat on TPU,
    XLA flat per-tap scatter-adds otherwise."""
    b, h, w, c = shape
    if not _splat_ok(shape, g):
        return _splat_flat4(g, starts, shape)
    iy = starts[..., 0].reshape(b, h, w).astype(jnp.int32)
    ix = starts[..., 1].reshape(b, h, w).astype(jnp.int32)
    ry = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 1)
    rx = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 2)
    dyv = iy - ry
    dxv = ix - rx
    # (B, P, 2, 2, C) -> (B, a, s, c, h, w) -> (B, 12, h, w); plane order
    # (a*2 + s)*3 + c must match the kernel's tap-combine indexing:
    # planes [0:3]=a0s0, [3:6]=a0s1, [6:9]=a1s0, [9:12]=a1s1
    g12 = g.reshape(b, h, w, 2, 2, c).transpose(0, 3, 4, 5, 1, 2) \
        .reshape(b, 12, h, w)
    out = _splat_pallas(g12, dyv, dxv, h, w)  # (B, 3, h, w)
    return out.transpose(0, 2, 3, 1)


def _splat_flat4(g, starts, shape):
    b, h, w, c = shape
    iy = starts[..., 0]
    ix = starts[..., 1]
    dflat = jnp.zeros((b, h * w, c), g.dtype)
    batch = jnp.arange(b)[:, None]
    for a in (0, 1):
        for s in (0, 1):
            idx = (iy + a) * w + (ix + s)
            dflat = dflat.at[batch, idx].add(g[:, :, a, s])
    return dflat.reshape(b, h, w, c)
