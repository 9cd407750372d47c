"""TPU exactness check for the large-displacement fetch routes
(PERF ledger #6): the BLOCK-GATHER planes fetch and the pixel-aligned
NEAREST planes select must be bit-exact vs the per-pixel windowed gather
on real pseudo-view warps.

The pseudo-view gathers (render_given_view's grid_sample over inverse-warp
grids from MVN-sampled training poses — reference model.py:318-326,
renderer.py:252-264) are the exact regime the block route exists for:
globally large displacement, locally smooth.  CPU tests
(tests/test_ops.py::test_block_fetch_*) pin both cond arms against a numpy
oracle on synthetic warps; this script closes the chain on the real TPU
with renderer-produced warps, both forward values and the custom-VJP
cotangent, and records whether the block arm was actually taken (spread
check) so a vacuous pass cannot slip through.

Writes FETCH_CHECK.json at the repo root; exits nonzero on failure.

    python tools/check_fetch_tpu.py
"""

import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from tools.check_raster_tpu import _training_depth, _training_views  # noqa: E402


def _pseudo_view_grids(rng, s, b):
    """Inverse-warp sampling grids as render_given_view builds them."""
    import jax.numpy as jnp
    from gan2shape_tpu.rendering.renderer import (
        Renderer, get_transform_matrices)

    r = Renderer({"rot_center_depth": 1.0, "fov": 10}, s, 0.9, 1.1)
    depth0 = _training_depth(rng, s)
    depth = jnp.asarray(np.broadcast_to(depth0, (b, s, s)).astype(np.float32))
    views = _training_views(rng, b)
    rot, trans = get_transform_matrices(jnp.asarray(views))
    recon_depth = r.warp_canon_depth(depth, rot, trans)
    grid = r.get_inv_warped_2d_grid(recon_depth, rot, trans)
    return grid  # (B, s, s, 2) in [-1, 1]


def run_checks(s=128, b=8, c=3, seed=0):
    import jax
    import jax.numpy as jnp
    from gan2shape_tpu.ops import gather_window as gw
    from gan2shape_tpu.ops.grid_sample import grid_sample

    if jax.devices()[0].platform != "tpu":
        return {"ok": True, "skipped": True,
                "reason": f"platform={jax.devices()[0].platform}"}

    rng = np.random.default_rng(seed)
    results = {"ok": True, "skipped": False, "checks": []}

    grid = _pseudo_view_grids(rng, s, b)
    src = jnp.asarray(rng.uniform(-1, 1, (b, c, s, s)).astype(np.float32))

    gx = np.asarray((grid[..., 0] + 1.0) * 0.5 * (s - 1))
    gy = np.asarray((grid[..., 1] + 1.0) * 0.5 * (s - 1))
    iy = jnp.asarray(np.clip(np.floor(gy), 0, s - 2).astype(np.int32))
    ix = jnp.asarray(np.clip(np.floor(gx), 0, s - 2).astype(np.int32))

    # the block arm must actually trigger on this warp, else the check is
    # vacuous (record it either way)
    bs, k = gw._block_cfg()
    block_arm_taken = bool(gw._block_spread_ok(iy, ix, bs, k))
    results["block_arm_taken"] = block_arm_taken
    results["block_cfg"] = [int(bs), int(k)]

    def with_env(val, fn):
        old = os.environ.get("G2S_FETCH_XL")
        os.environ["G2S_FETCH_XL"] = val
        try:
            return fn()
        finally:
            if old is None:
                os.environ.pop("G2S_FETCH_XL", None)
            else:
                os.environ["G2S_FETCH_XL"] = old

    def record(name, a, bb, extra=None):
        d = float(np.max(np.abs(np.asarray(a) - np.asarray(bb))))
        entry = {"check": name, "max_abs_diff": d, "pass": d == 0.0}
        if extra:
            entry.update(extra)
        results["checks"].append(entry)
        results["ok"] &= entry["pass"]

    # 1. raw planes fetch, XLA routes isolated (pallas cond off): block
    #    arm vs per-pixel gather on the pseudo-view warp
    old_fetch = os.environ.get("G2S_FETCH")
    os.environ["G2S_FETCH"] = "xla"
    try:
        p_gather = with_env(
            "gather", lambda: gw.gather_window2x2_planes(src, iy, ix))
        p_block = with_env(
            "block", lambda: gw.gather_window2x2_planes(src, iy, ix))
        record("planes_block_vs_gather_xla", p_block, p_gather,
               {"block_arm_taken": block_arm_taken})
    finally:
        if old_fetch is None:
            os.environ.pop("G2S_FETCH", None)
        else:
            os.environ["G2S_FETCH"] = old_fetch

    # 1b. the block arm itself on TPU: a smooth LARGE-offset warp (the
    #     CPU-test regime, test_ops.py::test_block_fetch_*) that passes the
    #     spread predicate — real pseudo-view poses above fail it, so this
    #     is the only TPU exercise of _block_fetch_impl
    py, px = np.mgrid[0:s, 0:s].astype(np.float32)
    iy_sm = np.clip(py + 20.0 * np.sin(px / 40.0) - 9.0, 0, s - 2)
    ix_sm = np.clip(px + 24.0 * np.cos(py / 32.0) + 7.0, 0, s - 2)
    iy_sm = jnp.asarray(np.broadcast_to(iy_sm.astype(np.int32), (b, s, s)))
    ix_sm = jnp.asarray(np.broadcast_to(ix_sm.astype(np.int32), (b, s, s)))
    sm_taken = bool(gw._block_spread_ok(iy_sm, ix_sm, bs, k))
    results["block_arm_taken_smooth"] = sm_taken
    os.environ["G2S_FETCH"] = "xla"
    try:
        p_g = with_env(
            "gather", lambda: gw.gather_window2x2_planes(src, iy_sm, ix_sm))
        p_b = with_env(
            "block", lambda: gw.gather_window2x2_planes(src, iy_sm, ix_sm))
        record("planes_block_vs_gather_smooth_large", p_b, p_g,
               {"block_arm_taken": sm_taken})
        results["ok"] &= sm_taken  # must not be vacuous
    finally:
        if old_fetch is None:
            os.environ.pop("G2S_FETCH", None)
        else:
            os.environ["G2S_FETCH"] = old_fetch

    # 2. default routing (pallas area-cond live): end-to-end grid_sample,
    #    bilinear and nearest, block vs gather — the shipping composition
    for mode in ("bilinear", "nearest"):
        o_gather = with_env(
            "gather", lambda: grid_sample(src, grid, mode=mode))
        o_block = with_env(
            "block", lambda: grid_sample(src, grid, mode=mode))
        record(f"grid_sample_{mode}_block_vs_gather", o_block, o_gather)

    # 3. backward through the fetch: cotangent w.r.t. src must match
    #    (the custom VJP is shared, but route-dependent residuals would
    #    surface here)
    def loss_fn(x):
        out = grid_sample(x, grid, mode="bilinear")
        return jnp.sum(out * out)

    g_gather = with_env("gather", lambda: jax.grad(loss_fn)(src))
    g_block = with_env("block", lambda: jax.grad(loss_fn)(src))
    record("grad_src_block_vs_gather", g_block, g_gather)

    return results


def main():
    results = run_checks()
    path = os.path.join(_ROOT, "FETCH_CHECK.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1), file=sys.stderr)
    sys.exit(0 if results["ok"] else 1)


if __name__ == "__main__":
    main()
