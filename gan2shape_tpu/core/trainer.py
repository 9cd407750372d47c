"""Training orchestration — instance mode and generalizing mode.

Behavioral parity target: /root/reference/GAN2Shape/trainer.py.  The decisive
TPU redesign: the reference dispatches ONE optimizer step per Python iteration
(trainer.py:99-108 — thousands of host->device round trips per image); here
each step's whole iteration block is a single jitted `lax.scan`, so a stage
like {step1: 700, step2: 700, step3: 600} is three device-resident loops with
no host in the hot path.

Per-step optimizers (reference trainer.py:40-48):
    step1 -> albedo | step2 -> offset_encoder
    step3 -> lighting + viewpoint + depth + albedo
Optimizer: Adam(lr=1e-4, betas=(0.9, 0.999)) with torch-style weight decay
5e-4 added to the gradient before the moment updates (trainer.py:163-171).
"""

import logging
import time
from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gan2shape_tpu.core.model import GAN2Shape
from gan2shape_tpu.core.priors import PriorGenerator
from gan2shape_tpu.core.checkpoint import CheckpointManager
from gan2shape_tpu.utils.cache import enable_compilation_cache

log = logging.getLogger(__name__)

STEP_SUBSETS = {
    1: ("albedo",),
    2: ("offset_encoder",),
    3: ("lighting", "viewpoint", "depth", "albedo"),
}


def default_optimizer(lr=1e-4, betas=(0.9, 0.999), weight_decay=5e-4):
    """torch.optim.Adam(weight_decay=...) equivalent: decay enters the
    gradient before the Adam moments (NOT AdamW)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.scale(-lr),
    )


def _split(params, subset):
    sub = {k: params[k] for k in subset}
    rest = {k: v for k, v in params.items() if k not in subset}
    return sub, rest


class Trainer:
    """Instance-mode trainer (reference trainer.py:13-171): per image, prior
    pretraining then `stages` x (step1, step2, step3)."""

    def __init__(self, model_config, debug=False, plot_intermediate=False,
                 log_wandb=False, save_ckpts=False, load_dict=None,
                 frozen=None, seed=0):
        enable_compilation_cache()
        self.config = dict(model_config)
        self.model = GAN2Shape(model_config)
        self.image_size = model_config.get("image_size", 128)
        self.category = model_config.get("category", "face")
        self.n_proj_samples = model_config.get("n_proj_samples", 8)
        self.n_epochs_prior = model_config.get("n_epochs_prior", 1000)
        self.learning_rate = model_config.get("learning_rate", 1e-4)
        self.plot_intermediate = plot_intermediate
        self.log_wandb = log_wandb
        self.save_ckpts = save_ckpts
        self.debug = debug

        key = jax.random.PRNGKey(seed)
        k_params, k_frozen, self._key = jax.random.split(key, 3)
        self.params = self.model.init_params(k_params)
        self.frozen = frozen if frozen is not None \
            else self.model.init_frozen(k_frozen)

        self.prior_generator = PriorGenerator(
            self.image_size, self.category,
            model_config.get("prior_name", "ellipsoid"))

        self.optimizers = {
            s: default_optimizer(self.learning_rate) for s in (1, 2, 3)}
        self.opt_states = {
            s: self.optimizers[s].init(_split(self.params, sub)[0])
            for s, sub in STEP_SUBSETS.items()}

        self.ckpt = CheckpointManager(
            model_config.get("our_nets_ckpts",
                             {"VLADE_nets": "checkpoints/our_nets"}
                             )["VLADE_nets"])
        if load_dict is not None:
            self.params = self.ckpt.load_latest_general(
                load_dict["category"], self.params)
        self.load_dict = load_dict

        self._build_jitted_steps()

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ---------------- jitted runners ----------------

    def _build_jitted_steps(self):
        model = self.model
        opt1, opt2, opt3 = (self.optimizers[i] for i in (1, 2, 3))

        @partial(jax.jit, static_argnames=("n_iters",), donate_argnums=(0, 1))
        def run_prior(depth_params, opt_state, image, prior, n_iters):
            def body(carry, _):
                p, s = carry
                (loss, _), grads = jax.value_and_grad(
                    lambda pp: model.depth_net_forward(
                        {"depth": pp}, image, prior), has_aux=True)(p)
                updates, s = opt1.update(grads, s, p)
                return (optax.apply_updates(p, updates), s), loss
            (p, s), losses = jax.lax.scan(body, (depth_params, opt_state),
                                          None, length=n_iters)
            return p, s, losses

        @partial(jax.jit, static_argnames=("n_iters",), donate_argnums=(0, 1))
        def run_step1(params, opt_state, frozen, images, n_iters):
            sub, rest = _split(params, STEP_SUBSETS[1])

            # hoist the loop-invariant subgraph (depth/view/light nets,
            # rasterization, warp grid, smoothness) out of the scan —
            # only the albedo branch runs per iteration
            inv = model.step1_invariants(params, frozen, images)

            def loss_fn(sub):
                return model.step1_iter({**rest, **sub}, frozen, images, inv)

            albedo0 = jnp.zeros(jax.eval_shape(loss_fn, sub)[1].shape)

            def body(carry, _):
                sub, s, _ = carry
                (loss, albedo), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(sub)
                updates, s = opt1.update(grads, s, sub)
                return (optax.apply_updates(sub, updates), s, albedo), loss
            (sub, s, albedo), losses = jax.lax.scan(
                body, (sub, opt_state, albedo0), None, length=n_iters)
            collected = (inv["normal"], inv["light_a"], inv["light_b"],
                         albedo, inv["depth"])
            return {**rest, **sub}, s, collected, losses

        # pseudo_pool_every = K > 1 regenerates the pseudo-sample pool only
        # every K step-2 iterations (documented deviation, PARITY.md; K=1 =
        # reference behavior: fresh samples every iteration,
        # reference model.py:186-191)
        pool_every = int(self.config.get("pseudo_pool_every", 1))

        @partial(jax.jit,
                 static_argnames=("n_iters", "n_proj"),
                 donate_argnums=(0, 1))
        def run_step2(params, opt_state, frozen, image, latent, collected,
                      key, n_iters, n_proj):
            sub, rest = _split(params, STEP_SUBSETS[2])

            # GAN re-synthesis + mapping anchors are constant over the block
            inv2 = model.step2_invariants(frozen, latent)

            def loss_fn(sub, pseudo_im, mask):
                return model.step2_loss({**rest, **sub}, frozen, latent,
                                        pseudo_im, mask, inv2)

            keys = jax.random.split(key, n_iters)
            pool0 = model.step2_sample(keys[0], collected, n_proj)
            coll_shapes = jax.eval_shape(loss_fn, sub, *pool0)[1]
            coll0 = jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), coll_shapes)

            def body(carry, inp):
                sub, s, pool, _ = carry
                k, i = inp
                if pool_every == 1:
                    pool = model.step2_sample(k, collected, n_proj)
                else:
                    pool = jax.lax.cond(
                        i % pool_every == 0,
                        lambda: model.step2_sample(k, collected, n_proj),
                        lambda: pool)
                (loss, coll2), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(sub, *pool)
                updates, s = opt2.update(grads, s, sub)
                return (optax.apply_updates(sub, updates), s, pool,
                        coll2), loss
            (sub, s, _, coll2), losses = jax.lax.scan(
                body, (sub, opt_state, pool0, coll0),
                (keys, jnp.arange(n_iters)))
            return {**rest, **sub}, s, coll2, losses

        @partial(jax.jit, static_argnames=("n_iters",), donate_argnums=(0, 1))
        def run_step3(params, opt_state, frozen, images, latents, collected,
                      n_iters):
            sub, rest = _split(params, STEP_SUBSETS[3])

            def body(carry, _):
                sub, s = carry
                def loss_fn(sub):
                    loss, _ = model.forward_step3({**rest, **sub}, frozen,
                                                  images, latents, collected)
                    return loss
                loss, grads = jax.value_and_grad(loss_fn)(sub)
                updates, s = opt3.update(grads, s, sub)
                return (optax.apply_updates(sub, updates), s), loss
            (sub, s), losses = jax.lax.scan(body, (sub, opt_state), None,
                                            length=n_iters)
            return {**rest, **sub}, s, losses

        self._run_prior = run_prior
        self._run_step1 = run_step1
        self._run_step2 = run_step2
        self._run_step3 = run_step3

    # ---------------- training loops ----------------

    def debug_report(self, image, latent):
        """Gradient-flow check: which nets receive gradients in each step
        (the reference's --debug alerter, debug_grad_updates.py, as in-graph
        norms instead of backward-hook prints)."""
        from gan2shape_tpu.core import diagnostics

        g1 = jax.grad(lambda p: self.model.forward_step1(
            p, self.frozen, image)[0])(self.params)
        diagnostics.report_grad_norms(diagnostics.grad_norms(g1), "step1")
        _, coll = self.model.forward_step1(self.params, self.frozen, image)
        g2 = jax.grad(lambda p: self.model.forward_step2(
            p, self.frozen, image, latent, coll, jax.random.PRNGKey(0),
            n_proj_samples=2)[0])(self.params)
        diagnostics.report_grad_norms(diagnostics.grad_norms(g2), "step2")
        _, coll2 = self.model.forward_step2(
            self.params, self.frozen, image, latent, coll,
            jax.random.PRNGKey(0), n_proj_samples=2)
        g3 = jax.grad(lambda p: self.model.forward_step3(
            p, self.frozen, image, latent, coll2)[0])(self.params)
        diagnostics.report_grad_norms(diagnostics.grad_norms(g3), "step3")

    def pretrain_on_prior(self, image, image_idx, plot_depth_map=False):
        """Fit the depth net to the shape prior (reference trainer.py:130-161;
        fresh Adam per image as in trainer.py:131)."""
        prior = self.prior_generator(np.asarray(image))
        prior = jnp.asarray(prior[0] if prior.ndim == 3 else prior)
        opt_state = self.optimizers[1].init(self.params["depth"])
        depth_params, _, losses = self._run_prior(
            self.params["depth"], opt_state, image, prior,
            n_iters=self.n_epochs_prior)
        self.params["depth"] = depth_params
        log.info("prior pretrain image %s: loss %.3e -> %.3e", image_idx,
                 float(losses[0]), float(losses[-1]))
        return losses

    def fit(self, images_latents, stages=None, batch_size=1, shuffle=False,
            plot_depth_map=False, **_):
        """Sequential per-instance training (reference trainer.py:57-128)."""
        stages = stages or [{"step1": 1, "step2": 1, "step3": 1}] * 2
        total_it = 0
        history = []
        for idx in range(len(images_latents)):
            image, latent, data_index = images_latents[idx]
            image = jnp.asarray(image)[None]
            latent = jnp.asarray(latent)
            if latent.ndim == 1:
                latent = latent[None]
            log.info("training on image %d/%d", idx + 1, len(images_latents))

            if self.debug and idx == 0:
                self.debug_report(image, latent)
            if self.load_dict is None:
                self.pretrain_on_prior(image, data_index, plot_depth_map)

            collected = None
            for stage_i, stage in enumerate(stages):
                t0 = time.time()
                self.params, self.opt_states[1], collected, l1 = \
                    self._run_step1(self.params, self.opt_states[1],
                                    self.frozen, image,
                                    n_iters=stage["step1"])
                self.params, self.opt_states[2], collected2, l2 = \
                    self._run_step2(self.params, self.opt_states[2],
                                    self.frozen, image, latent, collected,
                                    self._next_key(),
                                    n_iters=stage["step2"],
                                    n_proj=self.n_proj_samples)
                self.params, self.opt_states[3], l3 = \
                    self._run_step3(self.params, self.opt_states[3],
                                    self.frozen, image, latent, collected2,
                                    n_iters=stage["step3"])
                total_it += stage["step1"] + stage["step2"] + stage["step3"]
                jax.block_until_ready(l3)
                dt = time.time() - t0
                log.info(
                    "image %s stage %d: losses %.4f/%.4f/%.4f (%.1fs, %d it)",
                    data_index, stage_i, float(l1[-1]), float(l2[-1]),
                    float(l3[-1]), dt, total_it)
                history.append({
                    "image": int(data_index), "stage": stage_i,
                    "loss_step1": float(l1[-1]), "loss_step2": float(l2[-1]),
                    "loss_step3": float(l3[-1]), "seconds": dt,
                    "total_it": total_it})
                self._log_wandb(history[-1])

                if self.save_ckpts:
                    self.ckpt.save(self.params, data_index, stage_i,
                                   total_it, self.category)

            if self.plot_intermediate:
                try:
                    from gan2shape_tpu.utils import plotting
                    recon_im, recon_depth = self.evaluate(image)
                    plotting.plot_reconstructions(
                        np.asarray(recon_im), np.asarray(recon_depth),
                        total_it=str(total_it), im_idx=str(data_index))
                except Exception as e:  # plotting must never kill training
                    log.warning("intermediate plot failed: %s", e)
        log.info("finished training")
        return history

    def _log_wandb(self, record):
        if not self.log_wandb:
            return
        try:
            import wandb
            wandb.log(record)
        except ImportError:
            pass

    def evaluate(self, image):
        return self.model.evaluate_results(self.params, self.frozen, image)


class GeneralizingTrainer(Trainer):
    """Shared-nets variant (reference GeneralizingTrainer2, trainer.py:338-479
    — the first GeneralizingTrainer crashes in the reference and is not
    replicated): per epoch, batched step1 across images, then per-image
    step2/step3 blocks."""

    def __init__(self, model_config, **kw):
        super().__init__(model_config, **kw)
        self.n_epochs = model_config.get("n_epochs_generalized", 1)

    def fit(self, images_latents, stages=None, batch_size=2, shuffle=False,
            plot_depth_map=False, **_):
        stages = stages or [{"step1": 1, "step2": 1, "step3": 1}]
        n = len(images_latents)
        total_it = 0
        history = []

        # priors for every image, precomputed host-side
        # (reference trainer.py:301-311)
        images, latents, priors = [], [], []
        for i in range(n):
            im, lat, _ = images_latents[i]
            images.append(np.asarray(im))
            lat = np.asarray(lat)
            latents.append(lat[None] if lat.ndim == 1 else lat)
            priors.append(np.asarray(self.prior_generator(np.asarray(im))))
        images = jnp.asarray(np.stack(images))
        latents = jnp.asarray(np.concatenate(latents))
        priors = jnp.asarray(np.stack(priors)).reshape(
            n, self.image_size, self.image_size)

        if self.load_dict is None:
            opt_state = self.optimizers[1].init(self.params["depth"])
            for e in range(0, self.n_epochs_prior, 100):
                block = min(100, self.n_epochs_prior - e)
                self.params["depth"], opt_state, losses = self._run_prior(
                    self.params["depth"], opt_state, images, priors,
                    n_iters=block)
            log.info("prior pretrain done: %.3e", float(losses[-1]))

        for epoch in range(self.n_epochs):
            for start in range(0, n, batch_size):
                idxs = slice(start, min(start + batch_size, n))
                imgs = images[idxs]
                lats = latents[idxs]

                self.params, self.opt_states[1], collected, l1 = \
                    self._run_step1(self.params, self.opt_states[1],
                                    self.frozen, imgs,
                                    n_iters=stages[0]["step1"])
                total_it += stages[0]["step1"]

                for bi in range(imgs.shape[0]):
                    coll_i = jax.tree.map(lambda x: x[bi:bi + 1], collected)
                    self.params, self.opt_states[2], coll2, l2 = \
                        self._run_step2(self.params, self.opt_states[2],
                                        self.frozen, imgs[bi:bi + 1],
                                        lats[bi:bi + 1], coll_i,
                                        self._next_key(),
                                        n_iters=stages[0]["step2"],
                                        n_proj=self.n_proj_samples)
                    self.params, self.opt_states[3], l3 = \
                        self._run_step3(self.params, self.opt_states[3],
                                        self.frozen, imgs[bi:bi + 1],
                                        lats[bi:bi + 1], coll2,
                                        n_iters=stages[0]["step3"])
                    total_it += stages[0]["step2"] + stages[0]["step3"]
                # per-batch record (the reference logs per-step losses,
                # trainer.py:460-465; one record per batch with the final
                # iteration's losses keeps the same observability without
                # a host sync per device step)
                rec = {"epoch": epoch, "batch_start": start,
                       "total_it": total_it,
                       "loss_step1": float(l1[-1]),
                       "loss_step2": float(l2[-1]),
                       "loss_step3": float(l3[-1])}
                history.append(rec)
                self._log_wandb(rec)
            log.info("epoch %d: %.4f/%.4f/%.4f", epoch, float(l1[-1]),
                     float(l2[-1]), float(l3[-1]))
            if epoch % 20 == 0 and self.save_ckpts:
                self.ckpt.save(self.params, "", epoch, total_it,
                               self.category)
        log.info("finished training")
        return history


# alias matching the reference's live class name (main.py:138)
GeneralizingTrainer2 = GeneralizingTrainer
