"""StyleGAN2 adversarial training — TPU-native.

The reference bundles a DDP/NCCL StyleGAN2 trainer that is BROKEN in-repo
(train.py imports a missing `distributed` module and missing
`op.conv2d_gradfix` — SURVEY.md §2.7); this is a working jittable replacement
covering the reference trainer's full feature set
(/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch/train.py):

  * non-saturating logistic losses (train.py:64-84);
  * LAZY R1 regularization every `d_reg_every` steps with the reference's
    interval scaling (train.py:201-218, weight r1/2 * d_reg_every);
  * LAZY path-length regularization every `g_reg_every` steps
    (train.py:240-259 + g_path_regularize train.py:87-100, decay 0.01,
    weight path_regularize * g_reg_every), carrying mean_path_length in the
    train state;
  * style-mixing noise with probability `mixing` (train.py:112-117, 254-260;
    default 0.9) — decided in-graph from the step key, so the step stays a
    single compiled function;
  * g_ema exponential moving average with the reference decay
    0.5 ** (32 / (10 * 1000)) (train.py:50-55, 152, 268);
  * adaptive non-leaking augmentation (train.py:156-157, 178-199): the
    augment probability is a TRACED scalar (no retrace when the ADA
    controller tunes it) and the in-graph sign-sum of D(real) feeds the
    host-side AdaptiveAugment controller;
  * full-state checkpoint/resume incl. both optimizers and ada_p
    (train.py:313-329, 473-490);
  * Adam with the reference's lazy-regularization-scaled hyperparameters
    lr * r/(r+1), betas (0, 0.99**(r/(r+1))) (train.py:459-471).

Data parallelism: shard the `real` batch (and the key, replicated) over a
`jax.sharding.Mesh` data axis — XLA inserts the gradient all-reduces, no
DDP wrapper / NCCL (the reference's broken distributed path,
train.py:435-506).  All randomness is explicit keys; fresh per-sample
per-layer noise is drawn inside each step (the reference's
randomize_noise=True default).
"""

import math
import os
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import serialization

from gan2shape_tpu.models.stylegan2 import Generator, Discriminator
from gan2shape_tpu.models.augment import augment


def d_logistic_loss(real_pred, fake_pred):
    return jnp.mean(jax.nn.softplus(-real_pred)
                    + jax.nn.softplus(fake_pred))


def g_nonsaturating_loss(fake_pred):
    return jnp.mean(jax.nn.softplus(-fake_pred))


class GANTrainState(NamedTuple):
    g_params: Any
    d_params: Any
    g_ema: Any
    g_opt: Any
    d_opt: Any
    mean_path_length: Any  # scalar, carried across g-reg steps


class StyleGAN2Trainer:
    """Usage:
        t = StyleGAN2Trainer(size=64, style_dim=512)
        state = t.init(key)
        for i in range(iters):
            state, metrics = t.train_step(state, real, key_i, ada_p)
            ada_p = ada.tune(metrics["real_sign_sum"], batch)   # if augment
            if i % t.d_reg_every == 0:
                state, r1 = t.d_reg_step(state, real, key_i2, ada_p)
            if i % t.g_reg_every == 0:
                state, path = t.g_reg_step(state, key_i3)
    Shard `real` over a mesh data axis for multi-chip training."""

    def __init__(self, size, style_dim=512, n_mlp=8, channel_multiplier=2,
                 lr=2e-3, r1_weight=10.0, d_reg_every=16, g_reg_every=4,
                 mixing=0.9, path_regularize=2.0, path_batch_shrink=2,
                 use_augment=False):
        self.generator = Generator(size=size, style_dim=style_dim,
                                   n_mlp=n_mlp,
                                   channel_multiplier=channel_multiplier)
        self.discriminator = Discriminator(
            size=size, channel_multiplier=channel_multiplier)
        self.style_dim = style_dim
        self.size = size
        self.r1_weight = r1_weight
        self.d_reg_every = d_reg_every
        self.g_reg_every = g_reg_every
        self.mixing = mixing
        self.path_regularize = path_regularize
        self.path_batch_shrink = path_batch_shrink
        self.use_augment = use_augment
        # EMA decay (train.py:152)
        self.ema_decay = 0.5 ** (32 / (10 * 1000))
        # lazy-regularization-scaled Adam (train.py:459-471)
        g_ratio = g_reg_every / (g_reg_every + 1)
        d_ratio = d_reg_every / (d_reg_every + 1)
        self.g_optim = optax.adam(lr * g_ratio, b1=0.0, b2=0.99 ** g_ratio)
        self.d_optim = optax.adam(lr * d_ratio, b1=0.0, b2=0.99 ** d_ratio)

    # ---------------- state ----------------

    def init(self, key, batch_size=2):
        kg, kd, kn = jax.random.split(key, 3)
        z = jnp.zeros((batch_size, self.style_dim))
        noise = self.generator.make_noise(kn)
        g_params = self.generator.init(kg, [z], noise, input_is_w=False)
        d_params = self.discriminator.init(
            kd, jnp.zeros((batch_size, 3, self.size, self.size)))
        return GANTrainState(
            g_params=g_params, d_params=d_params,
            g_ema=jax.tree_util.tree_map(jnp.copy, g_params),
            g_opt=self.g_optim.init(g_params),
            d_opt=self.d_optim.init(d_params),
            mean_path_length=jnp.zeros(()))

    # ---------------- pieces ----------------

    def _fresh_noise(self, key, batch):
        """Per-sample per-layer noise (the reference's randomize_noise)."""
        keys = jax.random.split(key, self.generator.num_layers)
        return [jax.random.normal(keys[i], (batch, 1, 2 ** ((i + 5) // 2),
                                            2 ** ((i + 5) // 2)))
                for i in range(self.generator.num_layers)]

    def _mixed_latent(self, g_params, key, batch):
        """Style-mixing latent (train.py:112-117 mixing_noise + the
        generator's two-style injection, model.py:588-601), decided
        in-graph: with prob `mixing` inject a second w after a random
        crossover index."""
        kz1, kz2, kmix, kidx = jax.random.split(key, 4)
        z1 = jax.random.normal(kz1, (batch, self.style_dim))
        z2 = jax.random.normal(kz2, (batch, self.style_dim))
        w1 = self.generator.apply(g_params, z1, method="style_forward")
        w2 = self.generator.apply(g_params, z2, method="style_forward")
        n_latent = self.generator.n_latent
        use_mix = jax.random.bernoulli(kmix, self.mixing)
        inject = jax.random.randint(kidx, (), 1, n_latent)
        layer = jnp.arange(n_latent)
        take2 = use_mix & (layer >= inject)  # (n_latent,)
        latent = jnp.where(take2[None, :, None], w2[:, None, :],
                           w1[:, None, :])
        return latent  # (batch, n_latent, style_dim)

    def _synth(self, g_params, latent, noise):
        img, _ = self.generator.apply(g_params, [latent], noise,
                                      input_is_w=True)
        return img

    def _maybe_augment(self, key, img, ada_p):
        if not self.use_augment:
            return img
        out, _ = augment(key, img, ada_p)
        return out

    # ---------------- main step (train.py:169-238) ----------------

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def train_step(self, state, real, key, ada_p=0.0):
        """One alternating D/G update + EMA accumulate.  Regularizers are
        applied by the separate lazy steps below, on the reference's
        intervals."""
        kd_lat, kd_noise, kaug_r, kaug_f, kg_lat, kg_noise, kaug_g = \
            jax.random.split(key, 7)
        b = real.shape[0]

        # ---- discriminator step ----
        latent = self._mixed_latent(state.g_params, kd_lat, b)
        noise = self._fresh_noise(kd_noise, b)
        fake = jax.lax.stop_gradient(
            self._synth(state.g_params, latent, noise))
        real_aug = self._maybe_augment(kaug_r, real, ada_p)
        fake_aug = self._maybe_augment(kaug_f, fake, ada_p)

        def d_loss_fn(d_params):
            real_pred, _ = self.discriminator.apply(d_params, real_aug)
            fake_pred, _ = self.discriminator.apply(d_params, fake_aug)
            loss = d_logistic_loss(real_pred, fake_pred)
            return loss, (jnp.mean(real_pred), jnp.mean(fake_pred),
                          jnp.sum(jnp.sign(real_pred)))

        (d_loss, (real_score, fake_score, sign_sum)), d_grads = \
            jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = self.d_optim.update(d_grads, state.d_opt,
                                               state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- generator step ----
        latent_g = self._mixed_latent(state.g_params, kg_lat, b)
        noise_g = self._fresh_noise(kg_noise, b)

        def g_loss_fn(g_params):
            fake = self._synth(g_params, latent_g, noise_g)
            fake = self._maybe_augment(kaug_g, fake, ada_p)
            fake_pred, _ = self.discriminator.apply(d_params, fake)
            return g_nonsaturating_loss(fake_pred)

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt = self.g_optim.update(g_grads, state.g_opt,
                                               state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # ---- EMA accumulate (train.py:268, decay train.py:152) ----
        g_ema = jax.tree_util.tree_map(
            lambda e, p: e * self.ema_decay + p * (1 - self.ema_decay),
            state.g_ema, g_params)

        new_state = GANTrainState(
            g_params=g_params, d_params=d_params, g_ema=g_ema,
            g_opt=g_opt, d_opt=d_opt,
            mean_path_length=state.mean_path_length)
        return new_state, {"d_loss": d_loss, "g_loss": g_loss,
                           "real_score": real_score,
                           "fake_score": fake_score,
                           "real_sign_sum": sign_sum}

    # ---------------- lazy R1 (train.py:201-218) ----------------

    @partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def d_reg_step(self, state, real, key, ada_p=0.0):
        """R1 gradient penalty on real images, weight
        r1/2 * r1 * d_reg_every (the reference's lazy-reg scaling,
        train.py:216).  Gradients flow through the (freshly sampled)
        augmentation to the clean image, as in train.py:204-213."""

        def d_r1_fn(d_params):
            def score(img):
                img_aug = self._maybe_augment(key, img, ada_p)
                pred, _ = self.discriminator.apply(d_params, img_aug)
                return jnp.sum(pred)

            grad_real = jax.grad(score)(real)
            r1 = jnp.sum(grad_real ** 2) / real.shape[0]
            return (self.r1_weight / 2) * r1 * self.d_reg_every, r1

        (_, r1), d_grads = jax.value_and_grad(
            d_r1_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = self.d_optim.update(d_grads, state.d_opt,
                                               state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        return state._replace(d_params=d_params, d_opt=d_opt), r1

    # ------------- lazy path-length reg (train.py:240-259) -------------

    @partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
    def g_reg_step(self, state, key, batch=None):
        """Path-length regularization on a `path_batch_shrink`-reduced batch
        (train.py:243), g_path_regularize math from train.py:87-100:
        perturb the image with white noise scaled 1/sqrt(hw), measure the
        latent-to-image Jacobian norm, and pull it toward its running mean
        (decay 0.01).  Weight path_regularize * g_reg_every."""
        batch = batch or max(1, 2 // self.path_batch_shrink)
        klat, knoise, kimg = jax.random.split(key, 3)
        noise = self._fresh_noise(knoise, batch)

        def path_fn(g_params):
            latent = self._mixed_latent(g_params, klat, batch)

            def out_fn(lat):
                return self._synth(g_params, lat, noise)

            img, f_vjp = jax.vjp(out_fn, latent)
            h, w = img.shape[2], img.shape[3]
            noise_img = jax.random.normal(kimg, img.shape) / math.sqrt(h * w)
            (grad,) = f_vjp(noise_img)
            path_lengths = jnp.sqrt(
                jnp.mean(jnp.sum(grad ** 2, axis=2), axis=1))
            path_mean = (state.mean_path_length
                         + 0.01 * (jnp.mean(path_lengths)
                                   - state.mean_path_length))
            penalty = jnp.mean(
                (path_lengths - jax.lax.stop_gradient(path_mean)) ** 2)
            loss = self.path_regularize * self.g_reg_every * penalty
            return loss, (penalty, jax.lax.stop_gradient(path_mean),
                          jnp.mean(path_lengths))

        (_, (penalty, path_mean, path_len)), g_grads = jax.value_and_grad(
            path_fn, has_aux=True)(state.g_params)
        g_updates, g_opt = self.g_optim.update(g_grads, state.g_opt,
                                               state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        new_state = state._replace(g_params=g_params, g_opt=g_opt,
                                   mean_path_length=path_mean)
        return new_state, {"path_loss": penalty,
                           "path_length": path_len,
                           "mean_path_length": path_mean}

    # ---------------- sampling / checkpointing ----------------

    def sample_ema(self, state, z, key=None, truncation=1.0,
                   truncation_latent=None):
        """Sample from the EMA generator (the reference's periodic sample
        grid, train.py:305-315).  Fixed per-layer noise (key=None) or fresh
        noise from `key`."""
        if key is None:
            noise = [jnp.zeros((1, 1, 2 ** ((i + 5) // 2),
                                2 ** ((i + 5) // 2)))
                     for i in range(self.generator.num_layers)]
        else:
            noise = self._fresh_noise(key, z.shape[0])
        img, _ = self.generator.apply(
            state.g_ema, [z], noise, input_is_w=False,
            truncation=truncation, truncation_latent=truncation_latent)
        return img

    def save_checkpoint(self, state, path, iteration, ada_p=0.0):
        """Full-state checkpoint: g/d/g_ema + both optimizer states +
        ada_p, iteration-stamped (train.py:317-329)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {"state": state._asdict(),
                   "iteration": jnp.asarray(iteration),
                   "ada_p": jnp.asarray(ada_p)}
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(payload))

    def load_checkpoint(self, path, key=None, batch_size=2):
        """Resume: returns (state, iteration, ada_p) (train.py:473-490)."""
        template = {"state": self.init(
            key if key is not None else jax.random.PRNGKey(0),
            batch_size)._asdict(),
            "iteration": jnp.zeros((), jnp.int32),
            "ada_p": jnp.zeros(())}
        with open(path, "rb") as f:
            payload = serialization.from_bytes(template, f.read())
        state = GANTrainState(**payload["state"])
        return state, int(payload["iteration"]), float(payload["ada_p"])
