"""End-to-end tests of the three GAN2Shape optimization steps: loss
finiteness, collected-state shapes, and the stop-gradient wiring that encodes
the reference's per-step torch.no_grad() regions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gan2shape_tpu.core.model import GAN2Shape, ViewLightSampler

# 64-px config: same code paths as the face-128 production config
# (OffsetEncoder's other supported size, reference networks.py:207) at a
# quarter of the XLA:CPU compile cost — the dominant cost of this module
# on a cold 1-core host (VERDICT r4: cold fast suite must stay <10 min)
S = 64
CFG = {
    "image_size": S, "gan_size": 32, "z_dim": 512,
    "channel_multiplier": 1, "category": "face",
    # gan_size-32 discriminator has exactly 3 conv features before the
    # mb-stddev/final path (which only accepts gan_size inputs); step 2
    # feeds image_size inputs, so the feature tap must early-exit at 3
    "disc_ftr_num": 3,
    "rot_center_depth": 1.0, "fov": 10,
}


@pytest.fixture(scope="module")
def setup():
    model = GAN2Shape(CFG)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    frozen = model.init_frozen(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(-1, 1, (1, 3, S, S))
                        .astype(np.float32))
    latent = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))
    return model, params, frozen, image, latent


def test_depth_net_forward(setup):
    model, params, frozen, image, _ = setup
    prior = jnp.full((S, S), 1.0, jnp.float32)
    loss, depth = model.depth_net_forward(params, image, prior)
    assert np.isfinite(float(loss))
    assert depth.shape == (1, S, S)
    # depth respects the [min_depth, max_depth] range
    assert float(depth.min()) >= model.min_depth - 1e-5
    assert float(depth.max()) <= model.max_depth + 1e-5


def test_step1_loss_and_collected(setup):
    model, params, frozen, image, _ = setup
    loss, collected = model.forward_step1(params, frozen, image)
    assert np.isfinite(float(loss))
    normal, la, lb, albedo, depth = collected
    assert normal.shape == (1, S, S, 3)
    assert la.shape == (1, 1) and lb.shape == (1, 1)
    assert albedo.shape == (1, 3, S, S)
    assert depth.shape == (1, S, S)


def test_step1_stop_gradients(setup):
    """In step 1 only the albedo net may receive gradients
    (reference: no_grad on D, V, L — model.py:103-131; optimizer over
    albedo only — trainer.py:40-41)."""
    model, params, frozen, image, _ = setup

    def loss_fn(p):
        return model.forward_step1(p, frozen, image)[0]

    g = jax.grad(loss_fn)(params)
    alb = np.concatenate([np.asarray(x).ravel()
                          for x in jax.tree_util.tree_leaves(g["albedo"])])
    assert np.abs(alb).max() > 0
    for net in ("depth", "viewpoint", "lighting", "offset_encoder"):
        leaves = jax.tree_util.tree_leaves(g[net])
        assert all(np.abs(np.asarray(l)).max() == 0 for l in leaves), net


def test_step2_loss_and_collected(setup):
    model, params, frozen, image, latent = setup
    _, collected = model.forward_step1(params, frozen, image)
    loss, coll2 = model.forward_step2(params, frozen, image, latent,
                                      collected, jax.random.PRNGKey(3),
                                      n_proj_samples=2)
    assert np.isfinite(float(loss))
    projected, mask = coll2
    assert projected.shape == (2, 3, S, S)
    assert mask.shape == (2, 1, S, S)
    assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}


@pytest.mark.slow
def test_step2_gradients_only_offset_encoder(setup):
    model, params, frozen, image, latent = setup
    _, collected = model.forward_step1(params, frozen, image)

    def loss_fn(p):
        return model.forward_step2(p, frozen, image, latent, collected,
                                   jax.random.PRNGKey(3),
                                   n_proj_samples=2)[0]

    g = jax.grad(loss_fn)(params)
    off = jax.tree_util.tree_leaves(g["offset_encoder"])
    assert any(np.abs(np.asarray(l)).max() > 0 for l in off)
    for net in ("depth", "viewpoint", "lighting", "albedo"):
        leaves = jax.tree_util.tree_leaves(g[net])
        assert all(np.abs(np.asarray(l)).max() == 0 for l in leaves), net


@pytest.mark.slow
def test_step3_loss_and_gradients(setup):
    model, params, frozen, image, latent = setup
    _, collected = model.forward_step1(params, frozen, image)
    _, coll2 = model.forward_step2(params, frozen, image, latent, collected,
                                   jax.random.PRNGKey(3), n_proj_samples=2)

    def loss_fn(p):
        return model.forward_step3(p, frozen, image, latent, coll2)[0]

    loss = loss_fn(params)
    assert np.isfinite(float(loss))
    g = jax.grad(loss_fn)(params)
    # step 3 trains lighting, viewpoint, depth and albedo
    # (reference trainer.py:44-48)
    for net in ("depth", "viewpoint", "lighting", "albedo"):
        leaves = jax.tree_util.tree_leaves(g[net])
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves), net


def test_evaluate_results(setup):
    model, params, frozen, image, _ = setup
    recon_im, recon_depth = model.evaluate_results(params, frozen, image)
    assert recon_im.shape == (1, 3, S, S)
    assert recon_depth.shape == (1, S, S)
    assert np.isfinite(np.asarray(recon_im)).all()


def test_view_light_sampler():
    s = ViewLightSampler(np.arange(6) * 0.1, np.eye(6) * 0.01,
                         np.arange(4) * 0.1, np.eye(4) * 0.01,
                         view_scale=2.0)
    v = s.sample(jax.random.PRNGKey(0), 4096, "view")
    l = s.sample(jax.random.PRNGKey(1), 4096, "light")
    assert v.shape == (4096, 6) and l.shape == (4096, 4)
    # view[:, 1] is scaled AFTER adding the mean (reference model.py:461-463)
    np.testing.assert_allclose(np.asarray(v.mean(0)),
                               np.arange(6) * 0.1 * np.array(
                                   [1, 2, 1, 1, 1, 1]), atol=0.02)
    np.testing.assert_allclose(np.asarray(l.mean(0)), np.arange(4) * 0.1,
                               atol=0.02)
