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
