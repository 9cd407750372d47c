"""LPIPS-driven GAN inversion (latent projector) — TPU-native.

Behavioral parity target: the reference's projector tool
(/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch/projector.py:1-251):
optimize a w (or W+) latent plus all per-layer noise maps so the generator
reproduces target images, with

  * LPIPS perceptual + optional MSE objective (projector.py:205-209);
  * the noise-regularization pyramid penalizing spatial autocorrelation at
    every octave (projector.py:16-36, weight 1e5);
  * noise re-normalization to N(0,1) after every step (projector.py:39-44);
  * cosine lr ramp-up/ramp-down schedule (projector.py:47-52);
  * decaying latent perturbation noise_strength = latent_std * noise *
    max(0, 1 - t/noise_ramp)^2 (projector.py:190-191);
  * latent initialized at the mean w over n_mean_latent samples, with the
    latent std measured from the same population (projector.py:155-160).

The whole optimization step (forward + LPIPS + pyramid + Adam update +
noise renorm) is ONE jitted function with lr and noise_strength as traced
scalars, so the schedule never retraces; images larger than 256 are
mean-pooled before the perceptual loss exactly like projector.py:197-203.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax


def noise_regularize(noises):
    """Autocorrelation pyramid penalty (projector.py:16-36)."""
    loss = 0.0
    for noise in noises:
        size = noise.shape[2]
        while True:
            loss = (loss
                    + jnp.mean(noise * jnp.roll(noise, 1, axis=3)) ** 2
                    + jnp.mean(noise * jnp.roll(noise, 1, axis=2)) ** 2)
            if size <= 8:
                break
            noise = noise.reshape(
                noise.shape[0], 1, size // 2, 2, size // 2, 2)
            noise = jnp.mean(noise, axis=(3, 5))
            size //= 2
    return loss


def noise_normalize(noises):
    """Project each noise map back to zero-mean unit-std
    (projector.py:39-44; torch .std() is the Bessel-corrected estimate)."""
    out = []
    for noise in noises:
        mean = jnp.mean(noise)
        n = noise.size
        std = jnp.sqrt(jnp.sum((noise - mean) ** 2) / max(n - 1, 1))
        out.append((noise - mean) / std)
    return out


def get_lr(t, initial_lr, rampdown=0.25, rampup=0.05):
    """(projector.py:47-52)"""
    lr_ramp = min(1.0, (1.0 - t) / rampdown)
    lr_ramp = 0.5 - 0.5 * math.cos(lr_ramp * math.pi)
    lr_ramp = lr_ramp * min(1.0, t / rampup)
    return initial_lr * lr_ramp


class Projector:
    """Usage:
        proj = Projector(generator, g_params, lpips, lpips_params)
        result = proj.project(key, images)   # images (B, 3, size, size)
    Returns dict with 'latent' (B, 512) or (B, n_latent, 512) with w_plus,
    'noises', 'image' (final re-synthesis), 'losses' history."""

    def __init__(self, generator, g_params, lpips=None, lpips_params=None,
                 w_plus=False, lr=0.1, noise=0.05, noise_ramp=0.75,
                 noise_regularize_weight=1e5, mse_weight=0.0,
                 lr_rampup=0.05, lr_rampdown=0.25):
        self.gen = generator
        self.g_params = g_params
        self.lpips = lpips
        self.lpips_params = lpips_params
        self.w_plus = w_plus
        self.lr = lr
        self.noise = noise
        self.noise_ramp = noise_ramp
        self.noise_reg_w = noise_regularize_weight
        self.mse_weight = mse_weight
        self.lr_rampup = lr_rampup
        self.lr_rampdown = lr_rampdown
        # plain Adam; the custom lr schedule is applied as a traced scale
        self._adam = optax.scale_by_adam()

    # -------- initialization (projector.py:155-179) --------

    def latent_stats(self, key, n_mean_latent=10000):
        z = jax.random.normal(key, (n_mean_latent, self.gen.style_dim))
        w = self.gen.apply(self.g_params, z, method="style_forward")
        mean = jnp.mean(w, axis=0)
        std = jnp.sqrt(jnp.sum((w - mean) ** 2) / n_mean_latent)
        return mean, std

    def init_variables(self, key, batch):
        kstat, knoise = jax.random.split(key)
        mean, std = self.latent_stats(kstat)
        latent = jnp.tile(mean[None], (batch, 1))
        if self.w_plus:
            latent = jnp.tile(latent[:, None], (1, self.gen.n_latent, 1))
        # fresh N(0,1) noise maps, batched per image (projector.py:166-169)
        nkeys = jax.random.split(knoise, self.gen.num_layers)
        noises = [jax.random.normal(
            nkeys[i], (batch, 1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2)))
            for i in range(self.gen.num_layers)]
        return latent, noises, std

    # -------- one optimization step --------

    def _synth(self, latent, noises):
        styles = latent if latent.ndim == 3 else \
            jnp.tile(latent[:, None], (1, self.gen.n_latent, 1))
        img, _ = self.gen.apply(self.g_params, [styles], noises,
                                input_is_w=True)
        return img

    def _percept(self, img, target):
        if self.lpips is None:
            return jnp.zeros(())
        # >256px images are factor-mean-pooled first (projector.py:197-203)
        h = img.shape[2]
        if h > 256:
            f = h // 256
            b, c = img.shape[0], img.shape[1]
            img = img.reshape(b, c, h // f, f, h // f, f).mean(axis=(3, 5))
        return jnp.sum(self.lpips.apply(self.lpips_params, img, target))

    @partial(jax.jit, static_argnums=(0,))
    def _step(self, opt_state, latent, noises, target, key, lr,
              noise_strength):
        def loss_fn(variables):
            lat, nzs = variables
            lat_n = lat + jax.random.normal(key, lat.shape) * noise_strength
            img = self._synth(lat_n, nzs)
            p_loss = self._percept(img, target)
            n_loss = noise_regularize(nzs)
            mse = jnp.mean((img - target) ** 2)
            total = (p_loss + self.noise_reg_w * n_loss
                     + self.mse_weight * mse)
            return total, (p_loss, n_loss, mse)

        (_, (p_loss, n_loss, mse)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)((latent, noises))
        updates, opt_state = self._adam.update(grads, opt_state,
                                               (latent, noises))
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        latent, noises = optax.apply_updates((latent, noises), updates)
        noises = noise_normalize(noises)
        return opt_state, latent, noises, p_loss, n_loss, mse

    # -------- full run (projector.py:183-227) --------

    def project(self, key, images, steps=1000, log_every=50,
                progress=None):
        images = jnp.asarray(images)
        batch = images.shape[0]
        key, kinit = jax.random.split(key)
        latent, noises, latent_std = self.init_variables(kinit, batch)
        opt_state = self._adam.init((latent, noises))

        losses = []
        for i in range(steps):
            t = i / steps
            lr = get_lr(t, self.lr, self.lr_rampdown, self.lr_rampup)
            noise_strength = (latent_std * self.noise
                              * max(0.0, 1.0 - t / self.noise_ramp) ** 2)
            key, kstep = jax.random.split(key)
            opt_state, latent, noises, p, n, mse = self._step(
                opt_state, latent, noises, images, kstep,
                jnp.float32(lr), noise_strength)
            if i % log_every == 0 or i == steps - 1:
                rec = {"step": i, "perceptual": float(p),
                       "noise_regularize": float(n), "mse": float(mse),
                       "lr": lr}
                losses.append(rec)
                if progress is not None:
                    progress(rec)

        img = self._synth(latent, noises)
        return {"latent": latent, "noises": noises, "image": img,
                "losses": losses}
