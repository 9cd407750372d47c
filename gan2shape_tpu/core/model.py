"""The GAN2Shape method core: the three alternating optimization steps, the
depth-prior objective, pseudo-sample synthesis, and GAN inversion.

Behavioral parity target: /root/reference/GAN2Shape/model.py:18-470.
TPU-first redesign:

  * the model owns only STATIC things (module definitions, renderer config,
    hyperparameters).  All parameters — the 5 trainable nets and the frozen
    GAN/LPIPS weights — are explicit pytree arguments, so every forward_step
    is a pure function that jits, grads, vmaps and pjits cleanly;
  * `torch.no_grad()` regions become `stop_gradient` (the reference's step-2
    `t.detach()` no-op at model.py:182-183 is made real here);
  * randomness (uniform lights, MVN views) is explicit PRNG-key threading;
  * the step-2 -> step-3 carry stays on device (the reference round-trips it
    through host memory, model.py:222);
  * the step-3 pre-shuffle (model.py:231-233) is dropped — it is a no-op in
    the reference (indexing result discarded).

Known deviations (documented, all are reference bugs/quirks in batched mode):
  * per-image (not whole-batch) depth mean-centering (model.py:90,338);
  * step-1 photometric loss compares the full batch, not recon_im[:1]
    against a broadcast batch (model.py:95-96 hardcodes b=1).
"""

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gan2shape_tpu.models.stylegan2 import Generator, Discriminator
from gan2shape_tpu.models import networks
from gan2shape_tpu.models.lpips import LPIPS
from gan2shape_tpu.rendering.renderer import Renderer, get_transform_matrices
from gan2shape_tpu.ops.grid_sample import grid_sample
from gan2shape_tpu.ops.resize import resize
from gan2shape_tpu.core.losses import (
    photometric_loss, smooth_loss, discriminator_feature_loss,
)

Params = Dict[str, Any]


class ViewLightSampler:
    """Multivariate-normal view/light sampler (reference model.py:448-470).
    Stats come from converted .pth files (convert/torch2jax.py) or explicit
    arrays; sampling is reparameterized (mean + chol @ eps) with explicit
    keys."""

    def __init__(self, view_mean, view_cov, light_mean, light_cov,
                 view_scale=1.0):
        self.view_mean = jnp.asarray(view_mean, jnp.float32)
        self.light_mean = jnp.asarray(light_mean, jnp.float32)
        self._view_chol = jnp.asarray(
            np.linalg.cholesky(np.asarray(view_cov, np.float64)), jnp.float32)
        self._light_chol = jnp.asarray(
            np.linalg.cholesky(np.asarray(light_cov, np.float64)), jnp.float32)
        self.view_scale = view_scale

    @classmethod
    def default(cls, view_scale=1.0):
        """Neutral stats for running without the reference's MVN assets:
        zero-mean, small isotropic covariance."""
        return cls(np.zeros(6), np.eye(6) * 0.04, np.zeros(4),
                   np.eye(4) * 0.04, view_scale)

    def sample(self, key, n, kind="view"):
        if kind == "view":
            mean, chol = self.view_mean, self._view_chol
        else:
            mean, chol = self.light_mean, self._light_chol
        eps = jax.random.normal(key, (n, mean.shape[0]))
        s = mean[None] + jnp.matmul(eps, chol.T,
                                    precision=jax.lax.Precision.HIGHEST)
        if kind == "view":
            s = s.at[:, 1].multiply(self.view_scale)
        return s


class GAN2Shape:
    """Static method definition.  Usage:

        model = GAN2Shape(config)
        params = model.init_params(key)          # 5 trainable nets
        frozen = model.init_frozen(key)          # GAN + LPIPS (+ noise)
        loss, collected = model.forward_step1(params, frozen, images)
    """

    NETS = ("lighting", "viewpoint", "depth", "albedo", "offset_encoder")

    def __init__(self, config):
        self.config = dict(config)
        # matmul/conv precision policy ('highest' = exact f32; 'high' =
        # 3-pass bf16; 'default' = bf16) — geometry stays exact regardless
        if "matmul_precision" in config:
            from gan2shape_tpu.utils.precision import set_matmul_precision
            set_matmul_precision(config["matmul_precision"])
        if "act_dtype" in config:
            from gan2shape_tpu.utils.precision import set_act_dtype
            set_act_dtype(config["act_dtype"])
        self.z_dim = config.get("z_dim", 512)
        self.image_size = config.get("image_size", 128)
        self.gan_size = config.get("gan_size", self.image_size)
        self.channel_multiplier = config.get("channel_multiplier", 2)
        self.category = config.get("category", "face")

        # hyperparameters (reference model.py:49-66)
        self.max_depth = 1.1
        self.min_depth = 0.9
        self.border_depth = 0.7 * self.max_depth + 0.3 * self.min_depth
        self.lam_perc = config.get("lam_perc", 1.0)
        self.lam_smooth = config.get("lam_smooth", 0.01)
        self.lam_regular = config.get("lam_regular", 0.01)
        self.xyz_rotation_range = config.get("xyz_rotation_range", 60)
        self.xy_translation_range = config.get("xy_translation_range", 0.1)
        self.z_translation_range = config.get("z_translation_range", 0.1)
        self.use_mask = config.get("use_mask", True)
        self.relative_encoding = config.get("relative_encoding", False)
        self.rand_light = config.get(
            "rand_light", [-1, 1, -0.2, 0.8, -0.1, 0.6, -0.6])
        self.truncation = config.get("truncation", 1)
        self.F1_d = config.get("F1_d", 2)
        # discriminator feature-matching taps (reference losses.py:7 default 4)
        self.disc_ftr_num = config.get("disc_ftr_num", 4)

        # module definitions
        self.generator = Generator(size=self.gan_size, style_dim=self.z_dim,
                                   n_mlp=8,
                                   channel_multiplier=self.channel_multiplier)
        self.discriminator = Discriminator(
            size=self.gan_size, channel_multiplier=self.channel_multiplier)
        # perceptual backbone: 'vgg' is the reference's live path
        # (lpips/model.py:79-81); 'alex'/'squeeze' are the reference
        # PerceptualLoss's other net= options — alex is ~10x cheaper to
        # compile/run and is what the multichip dryrun uses
        self.lpips = LPIPS(backbone=config.get("lpips_net", "vgg"))
        self.lighting_net = networks.LightingNet(self.image_size)
        self.viewpoint_net = networks.ViewpointNet(self.image_size)
        self.depth_net = networks.DepthNet(self.image_size)
        self.albedo_net = networks.AlbedoNet(self.image_size)
        # cout follows z_dim: the offset feeds the mapping tail
        # (style_forward), whose input width is style_dim (= 512 in every
        # reference config; configurable here so tiny-shape dryruns shrink)
        self.offset_encoder_net = networks.OffsetEncoder(
            self.image_size, cout=self.z_dim)

        self.renderer = Renderer(config, self.image_size, self.min_depth,
                                 self.max_depth)
        self.view_light_sampler = ViewLightSampler.default(
            config.get("view_scale", 1))

    # ---------------- initialization ----------------

    def set_samplers(self, view_mvn, light_mvn, view_scale=None):
        """Install converted view/light MVN stats ({'mean','cov'} dicts)."""
        self.view_light_sampler = ViewLightSampler(
            view_mvn["mean"], view_mvn["cov"], light_mvn["mean"],
            light_mvn["cov"],
            self.config.get("view_scale", 1) if view_scale is None
            else view_scale)

    def init_params(self, key) -> Params:
        ks = jax.random.split(key, 5)
        x = jnp.zeros((1, 3, self.image_size, self.image_size))
        return {
            "lighting": self.lighting_net.init(ks[0], x),
            "viewpoint": self.viewpoint_net.init(ks[1], x),
            "depth": self.depth_net.init(ks[2], x),
            "albedo": self.albedo_net.init(ks[3], x),
            "offset_encoder": self.offset_encoder_net.init(ks[4], x),
        }

    def init_frozen(self, key) -> Params:
        """Random-initialized frozen assets (real runs replace these with
        converted reference checkpoints via convert/torch2jax.py)."""
        kg, kd, kl, kn, km = jax.random.split(key, 5)
        w = jnp.zeros((1, self.z_dim))
        noise = self.generator.make_noise(kn)
        gen_params = self.generator.init(kg, [w], noise, input_is_w=False)
        disc_params = self.discriminator.init(
            kd, jnp.zeros((1, 3, self.gan_size, self.gan_size)))
        lpips_params = self.lpips.init(
            kl, jnp.zeros((1, 3, self.image_size, self.image_size)),
            jnp.zeros((1, 3, self.image_size, self.image_size)))
        frozen = {"generator": gen_params, "discriminator": disc_params,
                  "lpips": lpips_params, "noise": noise}
        if self.truncation < 1:
            frozen["mean_latent"] = self.generator.apply(
                gen_params, km, 4096, method="mean_latent")
        return frozen

    # ---------------- shared math (reference model.py:330-360) ----------------

    def rescale_depth(self, depth):
        return ((1 + depth) / 2 * self.max_depth
                + (1 - depth) / 2 * self.min_depth)

    def get_clamped_depth(self, depth_raw, clamp_border=True):
        """(B, H, W) raw -> centered/tanh/rescaled depth with the reference's
        2-px left/right border blend (model.py:337-345; border weight is the
        literal 1.02 pad value, a reference quirk kept for parity)."""
        b, h, w = depth_raw.shape
        centered = depth_raw - jnp.mean(depth_raw, axis=(1, 2), keepdims=True)
        depth = self.rescale_depth(jnp.tanh(centered))
        if clamp_border:
            border = np.zeros((1, h, w), np.float32)
            border[:, :, :2] = 1.02
            border[:, :, -2:] = 1.02
            border = jnp.asarray(border)
            depth = depth * (1 - border) + border * self.border_depth
        return depth

    def get_view_transformation(self, view):
        return jnp.concatenate([
            view[:, :3] * math.pi / 180 * self.xyz_rotation_range,
            view[:, 3:5] * self.xy_translation_range,
            view[:, 5:] * self.z_translation_range], 1)

    def get_lighting_directions(self, lighting):
        lighting_a = lighting[:, :1] / 2 + 0.5
        lighting_b = lighting[:, 1:2] / 2 + 0.5
        dxy = lighting[:, 2:]
        d = jnp.concatenate(
            [dxy, jnp.ones((lighting.shape[0], 1), lighting.dtype)], 1)
        d = d / jnp.sqrt(jnp.sum(d ** 2, axis=1, keepdims=True))
        return lighting_a, lighting_b, d

    def get_shading(self, normal, lighting_a, lighting_b, lighting_d, albedo):
        diffuse = jnp.clip(
            jnp.sum(normal * lighting_d.reshape(-1, 1, 1, 3), axis=3),
            0, None)[:, None]
        shading = (lighting_a.reshape(-1, 1, 1, 1)
                   + lighting_b.reshape(-1, 1, 1, 1) * diffuse)
        texture = (albedo / 2 + 0.5) * shading * 2 - 1
        return diffuse, texture

    # ---------------- prior pretraining (reference model.py:88-93) ----------------

    def depth_net_forward(self, params, images, prior):
        depth_raw = self.depth_net.apply(params["depth"], images)[:, 0]
        centered = depth_raw - jnp.mean(depth_raw, axis=(1, 2), keepdims=True)
        depth = self.rescale_depth(jnp.tanh(centered))
        if prior.ndim == 2:
            prior = prior[None]
        loss = jnp.mean((depth - jax.lax.stop_gradient(prior)) ** 2)
        return loss, depth

    # ---------------- step 1 (reference model.py:95-173) ----------------

    def forward_step1(self, params, frozen, images, step1=True,
                      eval_mode=False):
        b = images.shape[0]

        depth_raw = self.depth_net.apply(params["depth"], images)
        if step1:
            depth_raw = jax.lax.stop_gradient(depth_raw)
        depth = self.get_clamped_depth(depth_raw[:, 0])

        view = self.viewpoint_net.apply(params["viewpoint"], images)
        if step1:
            view = jax.lax.stop_gradient(view)
        view = view + self.view_light_sampler.view_mean[None]
        rot, trans = get_transform_matrices(self.get_view_transformation(view))

        albedo = self.albedo_net.apply(params["albedo"], images)

        lighting = self.lighting_net.apply(params["lighting"], images)
        if step1:
            lighting = jax.lax.stop_gradient(lighting)
        lighting = lighting + self.view_light_sampler.light_mean[None]
        light_a, light_b, light_d = self.get_lighting_directions(lighting)

        normal = self.renderer.get_normal_from_depth(depth)
        diffuse, texture = self.get_shading(normal, light_a, light_b,
                                            light_d, albedo)

        recon_depth = self.renderer.warp_canon_depth(depth, rot, trans)
        grid = self.renderer.get_inv_warped_2d_grid(recon_depth, rot, trans)

        margin = (self.max_depth - self.min_depth) / 2
        recon_mask = jax.lax.stop_gradient(
            (recon_depth < self.max_depth + margin
             ).astype(images.dtype))[:, None]
        recon_im = jnp.clip(grid_sample(texture, grid), -1.0, 1.0)

        if eval_mode:
            return recon_im, recon_depth

        loss_l1 = photometric_loss(recon_im, images, mask=recon_mask)
        loss_perc = jnp.mean(self.lpips.apply(
            frozen["lpips"], recon_im * recon_mask, images * recon_mask))
        loss_smooth = smooth_loss(depth) + smooth_loss(diffuse)
        loss = loss_l1 + self.lam_perc * loss_perc + self.lam_smooth * loss_smooth

        collected = (normal, light_a, light_b, albedo, depth)
        return loss, collected

    # ------- step 1 split into loop-invariant + per-iteration parts -------
    # Within a step-1 block only the albedo net trains (reference
    # trainer.py:40-41), so the depth/view/lighting forwards, normals, the
    # rasterized warp, the sampling grid, the mask AND the smoothness loss
    # are constant across all its iterations.  The reference recomputes them
    # every iteration because its Python loop dispatches whole forwards;
    # here the trainer hoists them out of the scan.  Mathematically
    # identical to forward_step1(step1=True).

    def step1_invariants(self, params, frozen, images):
        depth_raw = jax.lax.stop_gradient(
            self.depth_net.apply(params["depth"], images))
        depth = self.get_clamped_depth(depth_raw[:, 0])

        view = jax.lax.stop_gradient(
            self.viewpoint_net.apply(params["viewpoint"], images))
        view = view + self.view_light_sampler.view_mean[None]
        rot, trans = get_transform_matrices(self.get_view_transformation(view))

        lighting = jax.lax.stop_gradient(
            self.lighting_net.apply(params["lighting"], images))
        lighting = lighting + self.view_light_sampler.light_mean[None]
        light_a, light_b, light_d = self.get_lighting_directions(lighting)

        normal = self.renderer.get_normal_from_depth(depth)
        diffuse = jnp.clip(
            jnp.sum(normal * light_d.reshape(-1, 1, 1, 3), axis=3),
            0, None)[:, None]
        shading = (light_a.reshape(-1, 1, 1, 1)
                   + light_b.reshape(-1, 1, 1, 1) * diffuse)

        recon_depth = self.renderer.warp_canon_depth(depth, rot, trans)
        grid = self.renderer.get_inv_warped_2d_grid(recon_depth, rot, trans)
        margin = (self.max_depth - self.min_depth) / 2
        recon_mask = (recon_depth < self.max_depth + margin
                      ).astype(images.dtype)[:, None]
        loss_smooth = smooth_loss(depth) + smooth_loss(diffuse)
        return {"depth": depth, "normal": normal, "light_a": light_a,
                "light_b": light_b, "shading": shading, "grid": grid,
                "recon_mask": recon_mask, "loss_smooth": loss_smooth}

    def step1_iter(self, params, frozen, images, inv):
        """Per-iteration part: albedo forward, texture, warp-sample, losses.
        Returns (loss, albedo)."""
        albedo = self.albedo_net.apply(params["albedo"], images)
        texture = (albedo / 2 + 0.5) * inv["shading"] * 2 - 1
        recon_im = jnp.clip(grid_sample(texture, inv["grid"]), -1.0, 1.0)
        mask = inv["recon_mask"]
        loss_l1 = photometric_loss(recon_im, images, mask=mask)
        loss_perc = jnp.mean(self.lpips.apply(
            frozen["lpips"], recon_im * mask, images * mask))
        loss = (loss_l1 + self.lam_perc * loss_perc
                + self.lam_smooth * inv["loss_smooth"])
        return loss, albedo

    # ---------------- pseudo samples (reference model.py:291-328) ----------------

    def sample_pseudo_imgs(self, key, n_images, normal, light_a, light_b,
                           albedo, depth):
        h = w = self.image_size
        x_min, x_max, y_min, y_max, d_min, d_max, alpha = self.rand_light
        k_xy, k_diff, k_view = jax.random.split(key, 3)

        dxy = jax.random.uniform(
            k_xy, (n_images, 2),
            minval=jnp.asarray([x_min, y_min]),
            maxval=jnp.asarray([x_max, y_max]))
        light_d = jnp.concatenate([dxy, jnp.ones((n_images, 1))], 1)
        light_d = light_d / jnp.sqrt(
            jnp.sum(light_d ** 2, axis=1, keepdims=True))

        rand_diffuse_shading = jnp.clip(
            jnp.sum(normal[0][None] * light_d.reshape(-1, 1, 1, 3), axis=3),
            0, None)[:, None]
        rand = jax.random.uniform(k_diff, (n_images, 1, 1, 1),
                                  minval=d_min, maxval=d_max)
        rand_diffuse = (light_b[0].reshape(1, 1, 1, 1) + rand) \
            * rand_diffuse_shading
        rand_shading = light_a[0].reshape(1, 1, 1, 1) + alpha * rand \
            + rand_diffuse
        rand_light_im = (albedo[0][None] / 2 + 0.5) * rand_shading * 2 - 1

        mask = jnp.ones((n_images, 3, h, w), rand_light_im.dtype)
        views = self.view_light_sampler.sample(k_view, n_images, "view")
        views_trans = self.get_view_transformation(views)
        depth_n = jnp.broadcast_to(depth[0][None], (n_images, h, w))
        pseudo, mask = self.renderer.render_given_view(
            rand_light_im, depth_n, views_trans, mask=mask,
            grid_sample_mode=True)
        return jnp.clip(pseudo, -1.0, 1.0), mask[:, :1]

    # ---------------- step 2 (reference model.py:175-223) ----------------

    def latent_projection(self, params, frozen, image, gan_im, latent,
                          center_w, center_h):
        """(reference model.py:282-289)"""
        offset = self.offset_encoder_net.apply(params["offset_encoder"],
                                               image)
        if self.relative_encoding:
            offset = offset - self.offset_encoder_net.apply(
                params["offset_encoder"], gan_im)
        hidden = offset + center_h
        skip = self.generator.n_mlp - self.F1_d
        offset = self.generator.apply(frozen["generator"], hidden, skip=skip,
                                      method="style_forward") - center_w
        return offset, latent + offset

    def step2_invariants(self, frozen, latent):
        """Constant across a step-2 block: the GAN re-synthesis of the
        dataset latent and the mapping-network anchors (reference
        model.py:193-203) — hoisted out of the iteration scan."""
        gen_p = frozen["generator"]
        mean_latent = frozen.get("mean_latent")
        gan_im, _ = self.generator.apply(
            gen_p, [latent], frozen["noise"], input_is_w=True,
            truncation=self.truncation, truncation_latent=mean_latent)
        gan_im = jnp.clip(gan_im, -1.0, 1.0)
        gan_im = resize(gan_im, (self.image_size, self.image_size))

        zeros = jnp.zeros((1, self.z_dim))
        depth_stop = self.generator.n_mlp - self.F1_d
        center_w = self.generator.apply(gen_p, zeros, method="style_forward")
        center_h = self.generator.apply(gen_p, zeros, depth=depth_stop,
                                        method="style_forward")
        return jax.lax.stop_gradient(
            {"gan_im": gan_im, "center_w": center_w, "center_h": center_h})

    def step2_sample(self, key, collected, n_proj_samples):
        """Pseudo-sample generation (reference model.py:186-191) — the
        stop-gradient sampling phase of step 2, separated so the trainer can
        optionally regenerate the pool every K iterations
        (`pseudo_pool_every`, a documented deviation, default K=1 ==
        reference behavior)."""
        collected = jax.lax.stop_gradient(collected)
        normal, light_a, light_b, albedo, depth = collected
        pseudo_im, mask = self.sample_pseudo_imgs(
            key, n_proj_samples, normal, light_a, light_b, albedo, depth)
        return (jax.lax.stop_gradient(pseudo_im),
                jax.lax.stop_gradient(mask))

    def step2_loss(self, params, frozen, latent, pseudo_im, mask,
                   invariants):
        """GAN-inversion loss phase of step 2 (reference model.py:193-223)."""
        gen_p = frozen["generator"]
        mean_latent = frozen.get("mean_latent")
        gan_im = invariants["gan_im"]
        center_w = invariants["center_w"]
        center_h = invariants["center_h"]

        offset, latent_proj = self.latent_projection(
            params, frozen, pseudo_im, gan_im, latent, center_w, center_h)
        projected_image, offset = self.generator.apply(
            gen_p, (offset, latent_proj), noise=frozen["noise"],
            truncation=self.truncation, mean_latent=mean_latent,
            method="invert")
        projected_image = resize(projected_image,
                                 (self.image_size, self.image_size))

        loss_l1 = photometric_loss(projected_image, pseudo_im, mask=mask)
        # the reference feeds image_size inputs into the gan_size-built
        # discriminator (model.py:217-219) — ftr_num early-exit keeps the
        # spatial dims valid; keep the same contract
        disc_apply = lambda x, n: self.discriminator.apply(
            frozen["discriminator"], x, ftr_num=n)
        loss_rec = discriminator_feature_loss(
            disc_apply, projected_image, pseudo_im, mask=mask,
            ftr_num=self.disc_ftr_num)
        loss_latent_norm = jnp.mean(offset ** 2)
        loss = loss_l1 + loss_rec + self.lam_regular * loss_latent_norm

        collected = (jax.lax.stop_gradient(projected_image),
                     jax.lax.stop_gradient(mask))
        return loss, collected

    def forward_step2(self, params, frozen, image, latent, collected, key,
                      n_proj_samples=8, invariants=None):
        pseudo_im, mask = self.step2_sample(key, collected, n_proj_samples)
        if invariants is None:
            invariants = self.step2_invariants(frozen, latent)
        return self.step2_loss(params, frozen, latent, pseudo_im, mask,
                               invariants)

    # ---------------- step 3 (reference model.py:225-280) ----------------

    def forward_step3(self, params, frozen, images, latents, collected):
        projected_samples, masks = jax.lax.stop_gradient(collected)
        b = projected_samples.shape[0]

        step1_loss, c = self.forward_step1(params, frozen, images,
                                           step1=False)
        normal, _, _, albedo, depth = c

        view = self.viewpoint_net.apply(params["viewpoint"],
                                        projected_samples)
        view = view + self.view_light_sampler.view_mean[None]
        rot, trans = get_transform_matrices(self.get_view_transformation(view))

        light = self.lighting_net.apply(params["lighting"], projected_samples)
        light = light + self.view_light_sampler.light_mean[None]
        light_a, light_b, light_d = self.get_lighting_directions(light)

        diffuse, texture = self.get_shading(normal, light_a, light_b,
                                            light_d, albedo)

        h = w = self.image_size
        depth_b = jnp.broadcast_to(depth[:1], (b, h, w))
        recon_depth = self.renderer.warp_canon_depth(depth_b, rot, trans)
        grid = self.renderer.get_inv_warped_2d_grid(recon_depth, rot, trans)
        margin = (self.max_depth - self.min_depth) / 2
        recon_mask = jax.lax.stop_gradient(
            (recon_depth < self.max_depth + margin
             ).astype(images.dtype))[:, None] * masks
        recon_im = jnp.clip(grid_sample(texture, grid), -1.0, 1.0)

        loss_l1 = photometric_loss(recon_im, projected_samples,
                                   mask=recon_mask)
        loss_perc = jnp.mean(self.lpips.apply(
            frozen["lpips"], recon_im * recon_mask,
            projected_samples * recon_mask))
        loss = step1_loss + loss_l1 + self.lam_perc * loss_perc
        return loss, None

    # ---------------- evaluation (reference model.py:362-368) ----------------

    def evaluate_results(self, params, frozen, image):
        recon_im, recon_depth_warped = self.forward_step1(
            params, frozen, image, eval_mode=True)
        depth_raw = self.depth_net.apply(params["depth"], image)[:, 0]
        recon_depth = self.get_clamped_depth(depth_raw, clamp_border=False)
        return recon_im, recon_depth
