"""Component ablation of the step-2 / step-3 hot loops on the real chip.

Times 25-iteration jitted scans of progressively stripped variants of the
step bodies (same Adam/optimizer structure), so per-component cost =
difference between adjacent rows.  Inputs vary per scan iteration (fresh
PRNG keys / perturbed images) to defeat the runtime's identical-input
memoization.

    python tools/ablate_steps.py [--iters 25]
"""

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--n-proj", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from gan2shape_tpu.core.trainer import (
        Trainer, default_optimizer, _split, STEP_SUBSETS)
    from gan2shape_tpu.ops.grid_sample import grid_sample
    from gan2shape_tpu.ops.resize import resize
    from gan2shape_tpu.core.losses import (
        photometric_loss, discriminator_feature_loss)
    from gan2shape_tpu.rendering.renderer import get_transform_matrices

    s = 128
    n = args.iters
    n_proj = args.n_proj
    config = {
        "image_size": s, "gan_size": s, "z_dim": 512,
        "channel_multiplier": 1, "category": "face",
        "n_proj_samples": n_proj, "n_epochs_prior": 10,
        "learning_rate": 1e-4, "prior_name": "box",
        "rot_center_depth": 1.0, "fov": 10,
    }
    trainer = Trainer(config)
    model = trainer.model
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(-1, 1, (1, 3, s, s)).astype(np.float32))
    latent = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))

    params, _, collected, _ = trainer._run_step1(
        trainer.params, trainer.opt_states[1], trainer.frozen, image,
        n_iters=2)
    frozen = trainer.frozen
    opt = default_optimizer()

    def timed(name, make_scan):
        fn = jax.jit(make_scan)
        key = jax.random.PRNGKey(0)
        jax.block_until_ready(fn(params, key))
        ts = []
        for i in range(3):
            key = jax.random.PRNGKey(i + 1)
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, key))
            ts.append(time.perf_counter() - t0)
        print(f"{name:24s} {min(ts) / n * 1000:8.2f} ms/iter")

    inv2 = jax.jit(lambda fr, lat: model.step2_invariants(fr, lat))(
        frozen, latent)

    # ---------- step 2 ladder ----------
    def scan_sample_only(params, key):
        def body(c, k):
            pseudo, mask = model.step2_sample(k, collected, n_proj)
            return c, jnp.sum(pseudo) + jnp.sum(mask)
        return jax.lax.scan(body, 0.0, jax.random.split(key, n))[1]

    def scan_sample_noraster(params, key):
        normal, light_a, light_b, albedo, depth = [
            jax.lax.stop_gradient(t) for t in collected]
        x_min, x_max, y_min, y_max, d_min, d_max, alpha = model.rand_light

        def body(c, k):
            k_xy, k_diff, k_view = jax.random.split(k, 3)
            dxy = jax.random.uniform(k_xy, (n_proj, 2),
                                     minval=jnp.asarray([x_min, y_min]),
                                     maxval=jnp.asarray([x_max, y_max]))
            light_d = jnp.concatenate([dxy, jnp.ones((n_proj, 1))], 1)
            light_d = light_d / jnp.sqrt(
                jnp.sum(light_d ** 2, axis=1, keepdims=True))
            shading = jnp.clip(jnp.sum(
                normal[0][None] * light_d.reshape(-1, 1, 1, 3), axis=3),
                0, None)[:, None]
            rand = jax.random.uniform(k_diff, (n_proj, 1, 1, 1),
                                      minval=d_min, maxval=d_max)
            pseudo = (albedo[0][None] / 2 + 0.5) * (
                light_a[0] + alpha * rand
                + (light_b[0] + rand) * shading) * 2 - 1
            return c, jnp.sum(pseudo)
        return jax.lax.scan(body, 0.0, jax.random.split(key, n))[1]

    pool_fixed = jax.jit(lambda k: model.step2_sample(k, collected, n_proj)
                         )(jax.random.PRNGKey(9))

    def make_loss_scan(loss_fn):
        def scan(params, key):
            sub, rest = _split(params, STEP_SUBSETS[2])
            st = opt.init(sub)

            def body(carry, k):
                sub, st = carry
                loss, grads = jax.value_and_grad(
                    lambda sb: loss_fn({**rest, **sb}, k))(sub)
                upd, st = opt.update(grads, st, sub)
                return (optax.apply_updates(sub, upd), st), loss
            return jax.lax.scan(body, (sub, st),
                                jax.random.split(key, n))[1]
        return scan

    def loss_full(p, k):
        return model.forward_step2(p, frozen, image, latent, collected, k,
                                   n_proj_samples=n_proj, invariants=inv2)[0]

    def loss_fixed_pool(p, k):
        pseudo, mask = jax.tree.map(
            lambda x: x + 1e-6 * jax.random.uniform(k, ()), pool_fixed)
        return model.step2_loss(p, frozen, latent, pseudo, mask, inv2)[0]

    def loss_no_disc(p, k):
        pseudo, mask = jax.tree.map(
            lambda x: x + 1e-6 * jax.random.uniform(k, ()), pool_fixed)
        offset, latent_proj = model.latent_projection(
            p, frozen, pseudo, inv2["gan_im"], latent, inv2["center_w"],
            inv2["center_h"])
        projected, offset = model.generator.apply(
            frozen["generator"], (offset, latent_proj),
            noise=frozen["noise"], truncation=model.truncation,
            mean_latent=None, method="invert")
        projected = resize(projected, (s, s))
        return (photometric_loss(projected, pseudo, mask=mask)
                + model.lam_regular * jnp.mean(offset ** 2))

    def loss_offset_only(p, k):
        pseudo, mask = jax.tree.map(
            lambda x: x + 1e-6 * jax.random.uniform(k, ()), pool_fixed)
        off = model.offset_encoder_net.apply(p["offset_encoder"], pseudo)
        return jnp.mean(off ** 2)

    timed("s2 full", make_loss_scan(loss_full))
    timed("s2 fixed-pool (no sample)", make_loss_scan(loss_fixed_pool))
    timed("s2 no-disc", make_loss_scan(loss_no_disc))
    timed("s2 offset-only", make_loss_scan(loss_offset_only))
    timed("s2 sampling only", scan_sample_only)
    timed("s2 sampling no-raster", scan_sample_noraster)

    # ---------- step 3 ladder ----------
    # _run_step2 donates params/opt_state — keep the returned params alive
    params, _, coll2, _ = trainer._run_step2(
        params, trainer.opt_states[2], frozen, image, latent, collected,
        jax.random.PRNGKey(3), n_iters=1, n_proj=n_proj)
    proj_samples, masks = coll2

    def make_s3_scan(loss_fn):
        def scan(params, key):
            sub, rest = _split(params, STEP_SUBSETS[3])
            st = opt.init(sub)

            def body(carry, k):
                sub, st = carry
                loss, grads = jax.value_and_grad(
                    lambda sb: loss_fn({**rest, **sb}, k))(sub)
                upd, st = opt.update(grads, st, sub)
                return (optax.apply_updates(sub, upd), st), loss
            return jax.lax.scan(body, (sub, st),
                                jax.random.split(key, n))[1]
        return scan

    def s3_full(p, k):
        img = image + 1e-6 * jax.random.uniform(k, ())
        return model.forward_step3(p, frozen, img, latent,
                                   (proj_samples, masks))[0]

    def s3_no_step1(p, k):
        img = image + 1e-6 * jax.random.uniform(k, ())
        _, c = model.forward_step1(p, frozen, img, step1=False)
        normal, _, _, albedo, depth = c
        view = model.viewpoint_net.apply(p["viewpoint"], proj_samples)
        view = view + model.view_light_sampler.view_mean[None]
        rot, trans = get_transform_matrices(
            model.get_view_transformation(view))
        light = model.lighting_net.apply(p["lighting"], proj_samples)
        light = light + model.view_light_sampler.light_mean[None]
        la, lb, ld = model.get_lighting_directions(light)
        _, texture = model.get_shading(normal, la, lb, ld, albedo)
        b = proj_samples.shape[0]
        depth_b = jnp.broadcast_to(depth[:1], (b, s, s))
        recon_depth = model.renderer.warp_canon_depth(depth_b, rot, trans)
        grid = model.renderer.get_inv_warped_2d_grid(recon_depth, rot, trans)
        recon_im = jnp.clip(grid_sample(texture, grid), -1, 1)
        return photometric_loss(recon_im, proj_samples, mask=masks)

    def s3_no_raster(p, k):
        img = image + 1e-6 * jax.random.uniform(k, ())
        loss1, c = model.forward_step1(p, frozen, img, step1=False)
        normal, _, _, albedo, depth = c
        view = model.viewpoint_net.apply(p["viewpoint"], proj_samples)
        light = model.lighting_net.apply(p["lighting"], proj_samples)
        la, lb, ld = model.get_lighting_directions(
            light + model.view_light_sampler.light_mean[None])
        _, texture = model.get_shading(normal, la, lb, ld, albedo)
        recon_im = jnp.clip(texture, -1, 1)
        loss_l1 = photometric_loss(recon_im, proj_samples, mask=masks)
        loss_perc = jnp.mean(model.lpips.apply(
            frozen["lpips"], recon_im * masks, proj_samples * masks))
        return loss1 + loss_l1 + loss_perc + 0 * jnp.sum(view)

    def s3_step1_only(p, k):
        img = image + 1e-6 * jax.random.uniform(k, ())
        return model.forward_step1(p, frozen, img, step1=False)[0]

    timed("s3 full", make_s3_scan(s3_full))
    timed("s3 no-step1-loss", make_s3_scan(s3_no_step1))
    timed("s3 no-raster (has lpips)", make_s3_scan(s3_no_raster))
    timed("s3 step1-part only", make_s3_scan(s3_step1_only))


if __name__ == "__main__":
    main()
