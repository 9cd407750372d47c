"""The hoisted step-1/step-2 invariant splits must be mathematically
identical to the monolithic forwards (they are pure compute reorderings)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gan2shape_tpu.core.model import GAN2Shape

CFG = {
    "image_size": 64, "gan_size": 32, "z_dim": 512,
    "channel_multiplier": 1, "category": "face", "disc_ftr_num": 3,
    "rot_center_depth": 1.0, "fov": 10, "raster_mode": "scatter",
}


@pytest.fixture(scope="module")
def setup():
    model = GAN2Shape(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    frozen = model.init_frozen(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32))
    latent = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))
    return model, params, frozen, image, latent


def test_step1_split_equals_forward(setup):
    model, params, frozen, image, _ = setup
    loss_full, coll_full = model.forward_step1(params, frozen, image)
    inv = model.step1_invariants(params, frozen, image)
    loss_split, albedo = model.step1_iter(params, frozen, image, inv)
    np.testing.assert_allclose(float(loss_split), float(loss_full),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(albedo), np.asarray(coll_full[3]),
                               atol=1e-6)
    for a, b in zip((inv["normal"], inv["light_a"], inv["light_b"]),
                    coll_full[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(inv["depth"]),
                               np.asarray(coll_full[4]), atol=1e-6)


@pytest.mark.slow
def test_step1_split_gradients_match(setup):
    model, params, frozen, image, _ = setup

    g_full = jax.grad(lambda a: model.forward_step1(
        {**params, "albedo": a}, frozen, image)[0])(params["albedo"])
    inv = model.step1_invariants(params, frozen, image)
    g_split = jax.grad(lambda a: model.step1_iter(
        {**params, "albedo": a}, frozen, image, inv)[0])(params["albedo"])
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_split)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-4)


@pytest.mark.slow
def test_step2_invariants_equal_inline(setup):
    model, params, frozen, image, latent = setup
    _, coll = model.forward_step1(params, frozen, image)
    key = jax.random.PRNGKey(3)
    loss_inline, _ = model.forward_step2(params, frozen, image, latent,
                                         coll, key, n_proj_samples=2)
    inv2 = model.step2_invariants(frozen, latent)
    loss_hoisted, _ = model.forward_step2(params, frozen, image, latent,
                                          coll, key, n_proj_samples=2,
                                          invariants=inv2)
    np.testing.assert_allclose(float(loss_hoisted), float(loss_inline),
                               rtol=1e-6)
