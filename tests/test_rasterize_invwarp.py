"""The gather-based (invwarp) winner pass must agree with the exact
scatter-min z-buffer on training-scale warps."""

import numpy as np
import jax
import jax.numpy as jnp

from gan2shape_tpu.ops.rasterize import rasterize_depth
from gan2shape_tpu.rendering.renderer import Renderer, get_transform_matrices

CFG = {"rot_center_depth": 1.0, "fov": 10}


def _smooth_depth(rng, s):
    base = rng.standard_normal((s // 8, s // 8)).astype(np.float32)
    up = np.kron(base, np.ones((8, 8), np.float32))
    # smooth + squash into the method's depth range
    from scipy.ndimage import gaussian_filter
    up = gaussian_filter(up, 4.0)
    return 1.0 + 0.08 * np.tanh(up)


def test_invwarp_matches_scatter_on_training_warps(rng):
    s = 64
    r = Renderer(CFG, s, 0.9, 1.1)
    depth = jnp.asarray(_smooth_depth(rng, s)[None])

    # training-scale views (MVN face poses after range scaling)
    for view_np, min_agree in [
        ([0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 1.0),
        ([0.12, -0.2, 0.05, 0.02, -0.02, 0.03], 0.995),
        ([-0.25, 0.3, -0.1, -0.05, 0.04, -0.06], 0.985),
    ]:
        view = jnp.asarray([view_np], jnp.float32)
        rot, trans = get_transform_matrices(view)
        d_scatter = np.asarray(
            r.warp_canon_depth(depth, rot, trans, raster_mode="scatter"))
        d_inv = np.asarray(
            r.warp_canon_depth(depth, rot, trans, raster_mode="invwarp"))
        # covered pixels must agree almost everywhere; allow a tiny fraction
        # of disagreement at coverage edges
        close = np.isclose(d_scatter, d_inv, atol=2e-3)
        frac = close.mean()
        assert frac >= min_agree, f"view {view_np}: only {frac:.4f} agree"


def test_invwarp_grad_flows(rng):
    s = 32
    r = Renderer(CFG, s, 0.9, 1.1)
    depth = jnp.asarray(_smooth_depth(rng, s)[:s, :s][None])
    view = jnp.asarray([[0.1, -0.1, 0.02, 0.01, 0.0, 0.02]], jnp.float32)
    rot, trans = get_transform_matrices(view)

    g = jax.grad(lambda d: jnp.sum(
        r.warp_canon_depth(d, rot, trans, raster_mode="invwarp")))(depth)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0
