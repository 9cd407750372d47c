"""Dedup-proof timing of the rasterizer winner kernels: a jitted scan chains
N dependent calls (each call's input is perturbed by the previous output), so
the runtime cannot dedupe or overlap them.  Reports ms/call.

    python tools/chain_raster.py [--impl mega|mega_v2|bufwinner] [--n 20]
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
    ap.add_argument("--impl", default="mega",
                    choices=["mega", "mega_v2", "bufwinner"])
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from scipy.ndimage import gaussian_filter
    from gan2shape_tpu.ops import rasterize as R
    from gan2shape_tpu.rendering.renderer import (
        Renderer, get_transform_matrices)

    s, b, n = args.size, args.batch, args.n
    r = Renderer({"rot_center_depth": 1.0, "fov": 10}, s, 0.9, 1.1)
    window, near, far = 3, r.min_depth - r.margin, r.max_depth + r.margin
    rng = np.random.default_rng(0)
    base = gaussian_filter(rng.standard_normal((s, s)).astype(np.float32),
                           6.0)
    depth0 = 1.0 + 0.08 * np.tanh(4 * base)
    depth = jnp.asarray(np.broadcast_to(depth0, (b, s, s))
                        .astype(np.float32))
    views = rng.uniform(-0.25, 0.25, (b, 6)).astype(np.float32)
    views[:, 3:] *= 0.2
    rot, trans = get_transform_matrices(jnp.asarray(views))
    pts = r.get_warped_3d_grid(depth, rot, trans).reshape(b, -1, 3)
    xs, ys, zs = r._project_screen(pts)
    vx = xs.reshape(b, s, s)
    vy = ys.reshape(b, s, s)
    vz = zs.reshape(b, s, s)

    def call(vx, vy, vz):
        if args.impl == "mega":
            return R._raster_mega_pallas(vx, vy, vz, s, s, window, near, far)
        if args.impl == "mega_v2":
            return R._raster_mega_pallas_v2(vx, vy, vz, s, s, window, near,
                                            far)
        b0, b1 = R._build_winner_buffers(vx, vy, vz, s, s, window, near, far)
        return R._dense_winner_pallas(b0, b1, s, s, window, near, far)

    @partial(jax.jit, static_argnames=("length",))
    def chain(vx, vy, vz, length):
        def body(carry, _):
            vx, vy, vz = carry
            cell, par, cov = call(vx, vy, vz)
            vx = vx + 1e-6 * cell.astype(jnp.float32)
            return (vx, vy, vz), cell[0, 0]
        (vx, vy, vz), cs = jax.lax.scan(body, (vx, vy, vz), None,
                                        length=length)
        return cs

    # two chain lengths with DIFFERENT outer inputs each timing (the runtime
    # memoizes identical-argument executions); per-call cost = slope
    n_small, n_big = max(2, n // 10), n
    for length in (n_small, n_big):  # compile both variants
        jax.block_until_ready(chain(vx, vy, vz, length=length))

    def run(length, eps):
        v = vx + eps
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        jax.block_until_ready(chain(v, vy, vz, length=length))
        return time.perf_counter() - t0

    t_small = min(run(n_small, 1e-5), run(n_small, 2e-5))
    t_big = min(run(n_big, 3e-5), run(n_big, 4e-5))
    per_call = (t_big - t_small) / (n_big - n_small)
    print(f"{args.impl}: {per_call * 1000:.3f} ms/call "
          f"({per_call / b * 1000:.4f} ms/item, batch {b}, size {s}; "
          f"t[{n_small}]={t_small * 1000:.2f}ms t[{n_big}]="
          f"{t_big * 1000:.2f}ms)")


if __name__ == "__main__":
    main()
