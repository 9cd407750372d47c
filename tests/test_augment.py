"""ADA augmentation parity vs the reference non_leaking.py (torch CPU).

The reference module is broken in-repo (imports a missing `distributed`
module, non_leaking.py:8) — we stub that import and use the rest as the
numerical oracle, passing FIXED (G, C) transform matrices to both sides so
the comparison is deterministic (the reference supports this via
augment(img, p, transform_matrix), non_leaking.py:462-466)."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

sys.path.append("/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch")

# stub the reference's missing `distributed` helper so non_leaking imports
if "distributed" not in sys.modules:
    stub = types.ModuleType("distributed")
    stub.reduce_sum = lambda x: x
    sys.modules["distributed"] = stub

tnl = pytest.importorskip("non_leaking")

# The reference's own upfirdn2d entry cannot take the tuple up/down/4-pad
# arguments non_leaking passes (op/upfirdn2d.py:144-153 indexes pad[0:2] and
# wraps up as (up, up) — broken on BOTH its CPU and CUDA paths; non_leaking
# was written against the newer rosinality op where up=(x, y) and
# pad=(x0, x1, y0, y1)).  Shim those semantics over its upfirdn2d_native so
# the oracle actually runs.
from op.upfirdn2d import upfirdn2d_native  # noqa: E402


def _upfirdn_shim(input, kernel, up=1, down=1, pad=(0, 0)):
    up = (up, up) if isinstance(up, int) else tuple(up)
    down = (down, down) if isinstance(down, int) else tuple(down)
    if len(pad) == 2:
        pad = (pad[0], pad[1], pad[0], pad[1])
    return upfirdn2d_native(input, kernel, up[0], up[1], down[0], down[1],
                            pad[0], pad[1], pad[2], pad[3])


tnl.upfirdn2d = _upfirdn_shim

from gan2shape_tpu.models import augment as jaug


def _moderate_G(rng, b, h, w):
    """A geometric transform batch well inside the reference's dynamic-pad
    budget (small rotation + scale + translate), where static-max padding
    and the reference's dynamic padding provably agree."""
    Gs = []
    for i in range(b):
        th = float(rng.uniform(-0.3, 0.3))
        s = float(np.exp(rng.uniform(-0.15, 0.15)))
        tx = float(rng.uniform(-0.08, 0.08)) * w
        ty = float(rng.uniform(-0.08, 0.08)) * h
        c, sn = np.cos(th), np.sin(th)
        G = np.array([[s * c, -s * sn, tx],
                      [s * sn, s * c, ty],
                      [0, 0, 1]], np.float32)
        Gs.append(np.linalg.inv(G))  # reference passes the inverse
    return np.stack(Gs)


def test_apply_affine_matches_reference(rng):
    b, h, w = 2, 32, 32
    img = rng.standard_normal((b, 3, h, w)).astype(np.float32)
    G = _moderate_G(rng, b, h, w)

    want, _ = tnl.random_apply_affine(torch.from_numpy(img.copy()), 0.0,
                                      torch.from_numpy(G.copy()))
    got = jaug.apply_affine(jnp.asarray(img), jnp.asarray(G))

    assert got.shape == tuple(want.shape)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=2e-4)


def test_apply_color_matches_reference(rng):
    b, h, w = 3, 8, 8
    img = rng.standard_normal((b, 3, h, w)).astype(np.float32)
    # draw color matrices FROM the reference sampler (p=1: all applied)
    torch.manual_seed(3)
    C = tnl.sample_color(1.0, b)

    want, _ = tnl.random_apply_color(torch.from_numpy(img.copy()), 1.0,
                                     C.clone())
    got = jaug.apply_color(jnp.asarray(img), jnp.asarray(C.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_full_augment_matches_reference_with_fixed_transforms(rng):
    b, h, w = 2, 32, 32
    img = rng.standard_normal((b, 3, h, w)).astype(np.float32)
    G = _moderate_G(rng, b, h, w)
    torch.manual_seed(11)
    C = tnl.sample_color(1.0, b)

    want, _ = tnl.augment(torch.from_numpy(img.copy()), 0.0,
                          (torch.from_numpy(G.copy()), C.clone()))
    got, (gG, gC) = jaug.augment(jax.random.PRNGKey(0), jnp.asarray(img),
                                 0.0, transforms=(jnp.asarray(G),
                                                  jnp.asarray(C.numpy())))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=3e-4)


def test_identity_transform_roundtrip(rng):
    """G = I, C = I must reproduce the input up to the resampling sandwich's
    interpolation error (the SYM6 up/down pair is near-perfect-reconstruction
    away from borders)."""
    b, h, w = 1, 32, 32
    img = rng.standard_normal((b, 3, h, w)).astype(np.float32)
    G = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    out = np.asarray(jaug.apply_affine(jnp.asarray(img), jnp.asarray(G)))
    assert out.shape == img.shape
    interior = (slice(None), slice(None), slice(4, -4), slice(4, -4))
    err = np.abs(out[interior] - img[interior]).max()
    assert err < 0.02, err


def test_sampler_statistics():
    """sample_affine/sample_color distributions: p=0 -> identity batch;
    p=1 -> non-identity; matrices finite; traced-p jit works."""
    key = jax.random.PRNGKey(0)
    G0 = jaug.sample_affine(key, 0.0, 8, 32, 32)
    np.testing.assert_allclose(np.asarray(G0),
                               np.tile(np.eye(3), (8, 1, 1)), atol=0)
    G1 = jaug.sample_affine(key, 1.0, 8, 32, 32)
    assert np.abs(np.asarray(G1) - np.eye(3)).max() > 0.1
    C0 = jaug.sample_color(key, 0.0, 8)
    np.testing.assert_allclose(np.asarray(C0),
                               np.tile(np.eye(4), (8, 1, 1)), atol=0)

    # p as a traced scalar inside jit: one compile serves every p
    f = jax.jit(lambda k, p, x: jaug.augment(k, x, p)[0])
    x = jnp.ones((2, 3, 16, 16))
    a = f(key, jnp.float32(0.3), x)
    b = f(key, jnp.float32(0.9), x)
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(np.asarray(b)).all()


def test_adaptive_augment_controller():
    """p rises while D overfits (sign(D(real)) ~ +1) and falls back when it
    doesn't, clamped to [0, 1] (non_leaking.py:24-49)."""
    ada = jaug.AdaptiveAugment(ada_aug_target=0.6, ada_aug_len=100,
                               update_every=2)
    # overfit regime: all-positive real predictions
    p_hist = [ada.tune(real_pred_sign_sum=4.0, batch_size=4)
              for _ in range(10)]
    assert p_hist[-1] > 0
    assert ada.r_t_stat == 1.0
    # healthy regime: negative predictions drive p back to 0
    for _ in range(20):
        p = ada.tune(real_pred_sign_sum=-4.0, batch_size=4)
    assert p == 0.0
