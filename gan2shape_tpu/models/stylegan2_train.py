"""StyleGAN2 adversarial training — TPU-native.

The reference bundles a DDP/NCCL StyleGAN2 trainer that is BROKEN in-repo
(train.py imports a missing `distributed` module and missing
`op.conv2d_gradfix` — SURVEY.md §2.7); this is a working jittable
replacement: non-saturating logistic losses with lazy R1 regularization,
data-parallel across the mesh by sharding the batch axis (XLA inserts the
gradient all-reduces — no NCCL, no DDP wrapper).

Not needed for the GAN2Shape method itself (the GAN is frozen there); kept so
the framework covers the reference's full surface, and so users can fine-tune
backbones on TPU.
"""

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gan2shape_tpu.models.stylegan2 import Generator, Discriminator


def d_logistic_loss(real_pred, fake_pred):
    return jnp.mean(jax.nn.softplus(-real_pred)
                    + jax.nn.softplus(fake_pred))


def g_nonsaturating_loss(fake_pred):
    return jnp.mean(jax.nn.softplus(-fake_pred))


def r1_penalty(disc, d_params, real_img):
    def score(img):
        return jnp.sum(disc.apply(d_params, img)[0])
    grads = jax.grad(score)(real_img)
    return jnp.sum(grads ** 2) / real_img.shape[0]


class GANTrainState(NamedTuple):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    noise: Any


class StyleGAN2Trainer:
    """Usage:
        t = StyleGAN2Trainer(size=64, style_dim=512)
        state = t.init(key)
        state, metrics = t.train_step(state, real_batch, key)
    Shard `real_batch` over a mesh data axis for multi-chip training."""

    def __init__(self, size, style_dim=512, n_mlp=8, channel_multiplier=2,
                 g_lr=2e-3, d_lr=2e-3, r1_weight=10.0, r1_interval=16):
        self.generator = Generator(size=size, style_dim=style_dim,
                                   n_mlp=n_mlp,
                                   channel_multiplier=channel_multiplier)
        self.discriminator = Discriminator(
            size=size, channel_multiplier=channel_multiplier)
        self.style_dim = style_dim
        self.r1_weight = r1_weight
        self.r1_interval = r1_interval
        # Adam with the reference's (0, 0.99) betas scaled for lazy reg
        c = r1_interval / (r1_interval + 1)
        self.g_optim = optax.adam(g_lr, b1=0.0, b2=0.99)
        self.d_optim = optax.adam(d_lr * c, b1=0.0, b2=0.99 ** c)

    def init(self, key, batch_size=2):
        kg, kd, kn, kz = jax.random.split(key, 4)
        z = jnp.zeros((batch_size, self.style_dim))
        noise = self.generator.make_noise(kn)
        g_params = self.generator.init(kg, [z], noise, input_is_w=False)
        size = self.discriminator.size
        d_params = self.discriminator.init(
            kd, jnp.zeros((batch_size, 3, size, size)))
        return GANTrainState(
            g_params=g_params, d_params=d_params,
            g_opt=self.g_optim.init(g_params),
            d_opt=self.d_optim.init(d_params), noise=noise)

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(self, state, real, key):
        """One alternating D/G update (R1 applied every step, scaled to the
        lazy-regularization average — static control flow)."""
        kz1, kz2, kn = jax.random.split(key, 3)
        b = real.shape[0]

        def synth(g_params, z):
            img, _ = self.generator.apply(g_params, [z], state.noise,
                                          input_is_w=False)
            return img

        # ---- discriminator step ----
        z = jax.random.normal(kz1, (b, self.style_dim))
        fake = jax.lax.stop_gradient(synth(state.g_params, z))

        def d_loss_fn(d_params):
            real_pred, _ = self.discriminator.apply(d_params, real)
            fake_pred, _ = self.discriminator.apply(d_params, fake)
            loss = d_logistic_loss(real_pred, fake_pred)
            r1 = r1_penalty(self.discriminator, d_params, real)
            return loss + (self.r1_weight / 2) * r1 / self.r1_interval, \
                (loss, r1)

        (d_total, (d_loss, r1)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = self.d_optim.update(d_grads, state.d_opt,
                                               state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- generator step ----
        z2 = jax.random.normal(kz2, (b, self.style_dim))

        def g_loss_fn(g_params):
            fake = synth(g_params, z2)
            fake_pred, _ = self.discriminator.apply(d_params, fake)
            return g_nonsaturating_loss(fake_pred)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt = self.g_optim.update(g_grads, state.g_opt,
                                               state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = GANTrainState(g_params=g_params, d_params=d_params,
                                  g_opt=g_opt, d_opt=d_opt,
                                  noise=state.noise)
        return new_state, {"d_loss": d_loss, "g_loss": g_loss, "r1": r1}
