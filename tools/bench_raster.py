"""Microbenchmark of the rasterizer winner passes on the current backend.

Times each available implementation on pseudo-sample-scale inputs (b views of
one depth map, 128²) with inputs re-randomized between reps (this
environment's runtime dedupes identical-input executions).

    python tools/bench_raster.py [--size 128] [--batch 16] [--reps 5]
"""

import argparse
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gan2shape_tpu.ops import rasterize as R
    from gan2shape_tpu.rendering.renderer import (
        Renderer, get_transform_matrices)

    s, b = args.size, args.batch
    r = Renderer({"rot_center_depth": 1.0, "fov": 10}, s, 0.9, 1.1)
    window = 3
    near = r.min_depth - r.margin
    far = r.max_depth + r.margin
    rng = np.random.default_rng(0)

    def make_inputs():
        from scipy.ndimage import gaussian_filter
        base = gaussian_filter(
            rng.standard_normal((s, s)).astype(np.float32), 6.0)
        depth0 = 1.0 + 0.08 * np.tanh(4 * base)
        depth = jnp.asarray(np.broadcast_to(depth0, (b, s, s))
                            .astype(np.float32))
        views = rng.uniform(-0.25, 0.25, (b, 6)).astype(np.float32)
        views[:, 3:] *= 0.2
        rot, trans = get_transform_matrices(jnp.asarray(views))
        pts = r.get_warped_3d_grid(depth, rot, trans).reshape(b, -1, 3)
        xs, ys, zs = r._project_screen(pts)
        return (xs.reshape(b, s, s), ys.reshape(b, s, s),
                zs.reshape(b, s, s))

    def timed(name, fn):
        ins = make_inputs()
        jax.block_until_ready(fn(*ins))  # compile
        ts = []
        for _ in range(args.reps):
            ins = make_inputs()
            jax.block_until_ready(ins)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*ins))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1000
        print(f"{name:28s} {ms:8.2f} ms  ({ms / b:6.3f} ms/item)")
        return ms

    print(f"device={jax.devices()[0]} size={s} batch={b} window={window}")

    if R._mega_pallas_ok(s, s, window):
        timed("mega_pallas", jax.jit(
            lambda vx, vy, vz: R._raster_mega_pallas(
                vx, vy, vz, s, s, window, near, far)))
        timed("mega_pallas_v2", jax.jit(
            lambda vx, vy, vz: R._raster_mega_pallas_v2(
                vx, vy, vz, s, s, window, near, far)))
        # v2 agreement vs the XLA oracle on identical buffers
        ins = make_inputs()
        b0, b1 = R._build_winner_buffers(*ins, s, s, window, near, far)
        cx, px, _ = (np.asarray(v) for v in R._dense_winner_xla(
            b0, b1, s, s, window, near, far))
        cv, pv, _ = (np.asarray(v) for v in R._raster_mega_pallas_v2(
            *ins, s, s, window, near, far))
        print(f"v2 winner agreement vs XLA: "
              f"{((cv == cx) & (pv == px)).mean():.5f}")

    def buffers_plus_winner(vx, vy, vz):
        b0, b1 = R._build_winner_buffers(vx, vy, vz, s, s, window, near, far)
        if R._winner_pallas_ok(s, s, window):
            return R._dense_winner_pallas(b0, b1, s, s, window, near, far)
        return R._dense_winner_xla(b0, b1, s, s, window, near, far)

    timed("scatterbuf+winner", jax.jit(buffers_plus_winner))

    timed("grid_e2e (rasterize_depth)", jax.jit(
        lambda vx, vy, vz: R.rasterize_depth(
            vx.reshape(b, -1), vy.reshape(b, -1), vz.reshape(b, -1),
            r.faces, s, s, window=window, near=near, far=far, mode="grid")))

    timed("invwarp winner", jax.jit(
        lambda vx, vy, vz: R._winner_pass_invwarp(
            vx.reshape(b, -1), vy.reshape(b, -1), vz.reshape(b, -1),
            s, s, search=1)))

    timed("scatter (segment_min)", jax.jit(
        lambda vx, vy, vz: R._winner_pass(
            vx.reshape(b, -1), vy.reshape(b, -1), vz.reshape(b, -1),
            r.faces, s, s, 5, near, far)))


if __name__ == "__main__":
    main()
