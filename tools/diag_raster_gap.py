"""Diagnose the grid-vs-scatter disagreement: decompose into coverage
mismatch (each direction) vs covered-depth mismatch, per size, and
attribute covered mismatches to winner-face differences."""
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from tools.check_raster_tpu import _training_depth, _training_views


def main():
    import jax.numpy as jnp
    from gan2shape_tpu.rendering.renderer import (
        Renderer, get_transform_matrices)

    rng = np.random.default_rng(0)
    batch = 4
    for s in (64, 128):
        r = Renderer({"rot_center_depth": 1.0, "fov": 10}, s, 0.9, 1.1)
        depth0 = _training_depth(rng, s)
        depth = jnp.asarray(np.broadcast_to(depth0, (batch, s, s))
                            .astype(np.float32))
        views = _training_views(rng, batch)
        rot, trans = get_transform_matrices(jnp.asarray(views))
        far = r.max_depth + r.margin

        d_grid = np.asarray(r.warp_canon_depth(depth, rot, trans,
                                               raster_mode="grid"))
        # the scatter oracle is deterministic in (seed, s): cache it, the
        # TPU segment-min compile costs minutes per size
        cache = f"/tmp/diag_raster_scatter_s{s}.npz"
        if os.path.exists(cache):
            d_exact = np.load(cache)["d"]
        else:
            d_exact = np.asarray(r.warp_canon_depth(depth, rot, trans,
                                                    raster_mode="scatter"))
            np.savez(cache, d=d_exact)
        close = np.isclose(d_grid, d_exact, atol=2e-3)
        cov_g = ~np.isclose(d_grid, far)
        cov_s = ~np.isclose(d_exact, far)
        n = close.size
        both = cov_g & cov_s
        print(f"s={s}: agree={close.mean():.4f}")
        print(f"  grid-only coverage: {(cov_g & ~cov_s).sum()/n:.4f}")
        print(f"  scatter-only coverage: {(~cov_g & cov_s).sum()/n:.4f}")
        print(f"  both covered, depth mismatch: "
              f"{(both & ~close).sum()/n:.4f}"
              f"  (of covered: {(both & ~close).sum()/max(both.sum(),1):.4f})")
        if (both & ~close).any():
            diff = np.abs(d_grid - d_exact)[both & ~close]
            print(f"  mismatch |dz|: med={np.median(diff):.4f} "
                  f"p90={np.percentile(diff, 90):.4f} max={diff.max():.4f}")
        # per-batch-item breakdown (is it the rotation tail?)
        ang = np.degrees(np.abs(views[:, :3]).max(1))
        for bi in range(batch):
            print(f"    item {bi}: maxrot={ang[bi]:5.1f}deg "
                  f"agree={close[bi].mean():.4f} "
                  f"gridonly={(cov_g[bi] & ~cov_s[bi]).mean():.4f} "
                  f"scatonly={(~cov_g[bi] & cov_s[bi]).mean():.4f} "
                  f"covmis={(both[bi] & ~close[bi]).mean():.4f}")


if __name__ == "__main__":
    main()
