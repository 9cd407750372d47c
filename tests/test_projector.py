"""Latent projector tests: math parity vs the reference projector.py
helpers (torch CPU oracle) + an end-to-end inversion on the random-weights
tiny GAN (reference projector tool, stylegan2-pytorch/projector.py)."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from gan2shape_tpu.projector import (
    Projector, noise_regularize, noise_normalize, get_lr,
)
from gan2shape_tpu.models.stylegan2 import Generator

sys.path.append("/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch")


def _ref_noise_regularize(noises):
    """The reference pyramid penalty (projector.py:16-36), inlined to avoid
    importing the full projector script (it pulls in lpips + CUDA deps)."""
    loss = 0
    for noise in noises:
        size = noise.shape[2]
        while True:
            loss = (loss
                    + (noise * torch.roll(noise, shifts=1, dims=3))
                    .mean().pow(2)
                    + (noise * torch.roll(noise, shifts=1, dims=2))
                    .mean().pow(2))
            if size <= 8:
                break
            noise = noise.reshape([-1, 1, size // 2, 2, size // 2, 2])
            noise = noise.mean([3, 5])
            size //= 2
    return loss


def test_noise_regularize_matches_reference(rng):
    noises = [rng.standard_normal((2, 1, s, s)).astype(np.float32)
              for s in (4, 8, 16, 32)]
    want = float(_ref_noise_regularize([torch.from_numpy(n.copy())
                                        for n in noises]))
    got = float(noise_regularize([jnp.asarray(n) for n in noises]))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_noise_normalize_matches_reference(rng):
    n = rng.standard_normal((1, 1, 16, 16)).astype(np.float32) * 3 + 1
    t = torch.from_numpy(n.copy())
    t.data.add_(-t.mean()).div_(t.std())  # projector.py:39-44
    (got,) = noise_normalize([jnp.asarray(n)])
    np.testing.assert_allclose(np.asarray(got), t.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_get_lr_schedule():
    """Cosine ramp (projector.py:47-52): 0 at t=0, peak in the middle,
    ~0 at t=1."""
    assert get_lr(0.0, 0.1) == 0.0
    assert abs(get_lr(0.5, 0.1) - 0.1) < 1e-9
    assert get_lr(0.95, 0.1) < 0.02
    # reference formula check at an arbitrary point
    import math
    t, lr0 = 0.85, 0.1
    ramp = min(1, (1 - t) / 0.25)
    ramp = 0.5 - 0.5 * math.cos(ramp * math.pi)
    ramp *= min(1, t / 0.05)
    np.testing.assert_allclose(get_lr(t, lr0), lr0 * ramp)


@pytest.mark.slow
def test_projection_recovers_generated_image(rng):
    """Project a generator-produced image back into w space with the
    random-weights GAN: the reconstruction error must collapse (the
    projector's 'loss -> ~0' acceptance).  MSE objective only — LPIPS adds
    a large CPU compile without changing the optimization plumbing."""
    gen = Generator(size=16, style_dim=32, n_mlp=2, channel_multiplier=1)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 32))
    noise = gen.make_noise(jax.random.PRNGKey(1))
    params = gen.init(key, [z], noise, input_is_w=False)

    w_true = jnp.asarray(rng.standard_normal((1, 32)).astype(np.float32))
    w_true = gen.apply(params, w_true, method="style_forward")
    zero_noise = [jnp.zeros_like(n) for n in noise]
    target, _ = gen.apply(params, [w_true], zero_noise, input_is_w=True)

    proj = Projector(gen, params, lpips=None, lpips_params=None,
                     mse_weight=1.0, lr=0.1)
    result = proj.project(jax.random.PRNGKey(2), target, steps=60,
                          log_every=10)
    first = result["losses"][0]["mse"]
    last = result["losses"][-1]["mse"]
    assert last < 0.2 * first, (first, last)
    assert result["latent"].shape == (1, 32)
    assert np.isfinite(np.asarray(result["image"])).all()


@pytest.mark.slow
def test_projection_w_plus_mode(rng):
    """W+ mode optimizes a per-layer latent (projector.py:173-175)."""
    gen = Generator(size=16, style_dim=32, n_mlp=2, channel_multiplier=1)
    noise = gen.make_noise(jax.random.PRNGKey(1))
    params = gen.init(jax.random.PRNGKey(0), [jnp.zeros((1, 32))], noise,
                      input_is_w=False)
    target = jnp.asarray(
        rng.uniform(-1, 1, (1, 3, 16, 16)).astype(np.float32))
    proj = Projector(gen, params, mse_weight=1.0, w_plus=True)
    result = proj.project(jax.random.PRNGKey(2), target, steps=10,
                          log_every=5)
    assert result["latent"].shape == (1, gen.n_latent, 32)
    assert result["losses"][-1]["mse"] < result["losses"][0]["mse"]
