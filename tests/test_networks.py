"""Trainable-net tests: layer semantics against torch oracles (same weights),
and end-to-end shapes/ranges of the V, L, D, A, E networks."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF
import pytest

from gan2shape_tpu.models.layers import (
    Conv2d, ConvTranspose2d, GroupNorm, avg_pool2d, adaptive_avg_pool2d,
    upsample_nearest, max_pool2d,
)
from gan2shape_tpu.models.networks import (
    ViewpointNet, LightingNet, DepthNet, AlbedoNet, OffsetEncoder,
)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 4, 9, 9)).astype(np.float32)
    conv = Conv2d(4, 6, 4, stride=2, padding=1)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(params["params"]["weight"])
    b = np.asarray(params["params"]["bias"])
    want = tF.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                     torch.from_numpy(b), stride=2, padding=1)
    got = conv.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


@pytest.mark.parametrize("stride,padding", [(1, 0), (2, 1)])
def test_conv_transpose2d_matches_torch(rng, stride, padding):
    x = rng.standard_normal((2, 4, 5, 5)).astype(np.float32)
    conv = ConvTranspose2d(4, 6, 4, stride=stride, padding=padding)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.asarray(params["params"]["weight"])  # (in, out, k, k)
    b = np.asarray(params["params"]["bias"])
    want = tF.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                               torch.from_numpy(b), stride=stride,
                               padding=padding)
    got = conv.apply(params, jnp.asarray(x))
    assert got.shape == tuple(want.shape)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 6, 6)).astype(np.float32)
    gn = GroupNorm(4, 8)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize affine to make the test non-trivial
    params = {"params": {
        "scale": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
        "bias": jnp.asarray(rng.standard_normal(8).astype(np.float32))}}
    want = tF.group_norm(torch.from_numpy(x), 4,
                         torch.from_numpy(np.asarray(params["params"]["scale"])),
                         torch.from_numpy(np.asarray(params["params"]["bias"])))
    got = gn.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_pooling_matches_torch(rng):
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(avg_pool2d(jnp.asarray(x), 2, 2)),
        tF.avg_pool2d(torch.from_numpy(x), 2, 2).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(max_pool2d(jnp.asarray(x), 2, 2)),
        tF.max_pool2d(torch.from_numpy(x), 2, 2).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(adaptive_avg_pool2d(jnp.asarray(x), 3)),
        tF.adaptive_avg_pool2d(torch.from_numpy(x), 3).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(upsample_nearest(jnp.asarray(x), 2)),
        tF.interpolate(torch.from_numpy(x), scale_factor=2,
                       mode="nearest").numpy(), atol=0)


def test_viewpoint_lighting_net_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 128, 128)).astype(np.float32))
    vnet = ViewpointNet(128)
    vp = vnet.init(jax.random.PRNGKey(0), x)
    v = vnet.apply(vp, x)
    assert v.shape == (2, 6)
    assert np.abs(np.asarray(v)).max() <= 1.0  # tanh head
    lnet = LightingNet(128)
    lp = lnet.init(jax.random.PRNGKey(1), x)
    l = lnet.apply(lp, x)
    assert l.shape == (2, 4)


def test_depth_albedo_net_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 3, 128, 128)).astype(np.float32))
    dnet = DepthNet(128)
    dp = dnet.init(jax.random.PRNGKey(0), x)
    d = dnet.apply(dp, x)
    assert d.shape == (1, 1, 128, 128)
    anet = AlbedoNet(128)
    ap = anet.init(jax.random.PRNGKey(1), x)
    a = anet.apply(ap, x)
    assert a.shape == (1, 3, 128, 128)
    assert np.abs(np.asarray(a)).max() <= 1.0  # tanh


def test_offset_encoder_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 128, 128)).astype(np.float32))
    enet = OffsetEncoder(128)
    ep = enet.init(jax.random.PRNGKey(0), x)
    e = enet.apply(ep, x)
    assert e.shape == (2, 512)
    # 64-px variant (reference's branch is broken; ours produces full cout)
    x64 = jnp.asarray(rng.standard_normal((2, 3, 64, 64)).astype(np.float32))
    enet64 = OffsetEncoder(64)
    ep64 = enet64.init(jax.random.PRNGKey(0), x64)
    assert enet64.apply(ep64, x64).shape == (2, 512)


def test_nets_are_trainable(rng):
    """Gradient flows through every parameter (replaces the reference's
    --debug alerter check, debug_grad_updates.py)."""
    x = jnp.asarray(rng.standard_normal((1, 3, 128, 128)).astype(np.float32))
    net = DepthNet(128)
    params = net.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(net.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert all(np.abs(np.asarray(l)).max() > 0 for l in leaves)
