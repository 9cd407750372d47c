"""Measure the warp-displacement statistics at the three step-2 fetch sites.

The displacement-decomposed Pallas fetch (ops/splat_window.py:_fetch_pallas)
pays `(dy_range x dx_range)` full-array roll passes, so it only routes when
the displacement bounding-box area is under G2S_FETCH_AREA_LIMIT (=64).  This
tool reports, for realistic bench-regime step-2 pseudo-view warps:

  * the global displacement bbox per site (what the current area cond sees);
  * per-8-row-block bbox areas (what a block-bounded kernel variant would
    pay): total pass work in full-array-pass equivalents.

Sites: (1) rasterize_depth_grid's winner-cell vertex fetch
(ops/rasterize.py:1038), (2) grid_sample's bilinear planes fetch
(ops/grid_sample.py:128), (3) the nearest mask fetch (same grid as 2).

    python tools/measure_disp.py [--n-proj 16] [--size 128]
"""

import argparse
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def block_stats(dy, dx, blk=8):
    """dy/dx: (B, H, W) int arrays. Returns (global_area, blocked_work)
    where blocked_work = sum over row blocks of block_area / n_blocks —
    the cost of a per-row-block-bounded kernel in units of one global
    full-array roll pass."""
    b, h, w = dy.shape
    nb = h // blk
    dyb = dy.reshape(b, nb, blk, w)
    dxb = dx.reshape(b, nb, blk, w)
    g_area = int(((dy.max() - dy.min() + 1)) * ((dx.max() - dx.min() + 1)))
    areas = ((dyb.max((2, 3)) - dyb.min((2, 3)) + 1)
             * (dxb.max((2, 3)) - dxb.min((2, 3)) + 1))  # (B, nb)
    # worst batch element dominates (the kernel grid is per-batch, bounds
    # are per (batch, block))
    work = float(areas.sum(1).max()) / nb
    return g_area, work, int(areas.max()), float(areas.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-proj", type=int, default=16)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--prior-iters", type=int, default=100)
    ap.add_argument("--step1-iters", type=int, default=25)
    ap.add_argument("--blk", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gan2shape_tpu.core.trainer import Trainer
    from gan2shape_tpu.rendering.renderer import get_transform_matrices

    s = args.size
    config = {
        "image_size": s, "gan_size": s, "z_dim": 512,
        "channel_multiplier": 1, "category": "face",
        "n_proj_samples": args.n_proj, "n_epochs_prior": args.prior_iters,
        "learning_rate": 1e-4, "prior_name": "box",
        "rot_center_depth": 1.0, "fov": 10,
    }
    trainer = Trainer(config)
    model = trainer.model
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 3, s, s)).astype(np.float32))
    prior = jnp.asarray(np.full((s, s), 1.0, np.float32))

    # bench-regime state: short prior pretrain + step-1 block
    p, st, _ = trainer._run_prior(
        trainer.params["depth"], trainer.optimizers[1].init(
            trainer.params["depth"]), img, prior, n_iters=args.prior_iters)
    trainer.params["depth"] = p
    params, _, coll, _ = trainer._run_step1(
        trainer.params, trainer.opt_states[1], trainer.frozen, img,
        n_iters=args.step1_iters)

    normal, light_a, light_b, albedo, depth = [
        np.asarray(x) for x in jax.lax.stop_gradient(coll)]
    n = args.n_proj
    h = w = s

    key = jax.random.PRNGKey(7)
    views = model.view_light_sampler.sample(key, n, "view")
    views_trans = model.get_view_transformation(views)
    rot_mat, trans_xyz = get_transform_matrices(views_trans)
    depth_n = jnp.broadcast_to(jnp.asarray(depth)[0][None], (n, h, w))

    r = model.renderer
    # ---- site 1: rasterizer winner-cell fetch --------------------------
    pts = r.get_warped_3d_grid(depth_n, rot_mat, trans_xyz).reshape(n, -1, 3)
    xs, ys, zs = r._project_screen(pts)
    from gan2shape_tpu.ops import rasterize as rz
    vx = np.asarray(xs).reshape(n, h, w)
    vy = np.asarray(ys).reshape(n, h, w)
    vz = np.asarray(zs).reshape(n, h, w)
    cell, par, covered = rz._raster_mega_pallas_v2(
        jnp.asarray(vx), jnp.asarray(vy), jnp.asarray(vz), h, w, 3,
        float(r.min_depth - r.margin), float(r.max_depth + r.margin))
    cell = np.asarray(cell).astype(np.int64)
    covered = np.asarray(covered)
    ci = np.clip(cell // (w - 1), 0, h - 2)
    cj = np.clip(cell - ci * (w - 1), 0, w - 2)
    py = np.arange(h)[None, :, None]
    px = np.arange(w)[None, None, :]
    ci = np.where(covered, ci, np.minimum(py, h - 2) + 0 * cj)
    cj = np.where(covered, cj, np.minimum(px, w - 2) + 0 * ci)
    dy1 = ci - py
    dx1 = cj - px

    # ---- sites 2+3: grid_sample bilinear/nearest on the inverse grid ---
    recon_depth = r.warp_canon_depth(depth_n, rot_mat, trans_xyz)
    grid = np.asarray(r.get_inv_warped_2d_grid(recon_depth, rot_mat,
                                               trans_xyz))
    gx = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    iy0 = np.clip(np.floor(gy).astype(np.int64), 0, h - 2)
    ix0 = np.clip(np.floor(gx).astype(np.int64), 0, w - 2)
    dy2 = iy0 - py
    dx2 = ix0 - px

    # how often does floor(inv grid) == winner cell on covered pixels?
    agree = float(((iy0 == ci) & (ix0 == cj))[covered].mean())

    for name, dy, dx in [("raster winner-cell", dy1, dx1),
                         ("grid_sample floor", dy2, dx2)]:
        g_area, work, bmax, bmean = block_stats(dy, dx, args.blk)
        print(f"{name:20s} dy [{dy.min():4d},{dy.max():4d}] "
              f"dx [{dx.min():4d},{dx.max():4d}] global_area={g_area:6d} "
              f"blk{args.blk}_work={work:8.1f} blk_area max={bmax} "
              f"mean={bmean:.1f}")
    print(f"floor(inv_grid) == winner cell on covered pixels: {agree:.4f}")
    print(f"covered fraction: {float(covered.mean()):.4f}")


if __name__ == "__main__":
    main()
