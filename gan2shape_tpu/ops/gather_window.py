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
    # four per-tap scatter-adds; a single concatenated scatter was measured
    # EQUAL-or-worse (XLA scatter cost is per-update, not per-op)
    starts, shape = res
    b, h, w, c = shape
    iy = starts[..., 0]
    ix = starts[..., 1]
    dflat = jnp.zeros((b, h * w, c), g.dtype)
    batch = jnp.arange(b)[:, None]
    for a in (0, 1):
        for s in (0, 1):
            idx = (iy + a) * w + (ix + s)
            dflat = dflat.at[batch, idx].add(g[:, :, a, s])
    return dflat.reshape(b, h, w, c), None


gather_window2x2.defvjp(_gather_fwd, _gather_bwd)
