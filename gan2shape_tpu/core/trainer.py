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


def chunk_sizes(n, chunk):
    """Decompose an iteration count into repeats of `chunk` plus a
    remainder.  Mathematically identical to one scan of length n (the
    optimizer/param carry threads through); used by both trainers so every
    schedule value sharing the chunk compiles ONE executable per step."""
    if n <= 0:
        return []
    if chunk <= 0 or n <= chunk:
        return [n]
    out = [chunk] * (n // chunk)
    if n % chunk:
        out.append(n % chunk)
    return out


def _cat(chunks):
    """Concatenate per-chunk loss arrays (empty list -> empty array, so
    zero-iteration steps don't crash the logging path)."""
    if not chunks:
        return np.zeros((0,), np.float32)
    return np.concatenate([np.asarray(c) for c in chunks])


def _last(arr):
    return float(arr[-1]) if len(arr) else float("nan")


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

        # Iteration blocks execute as repeats of `compile_chunk`-sized scans
        # (plus one remainder), so every schedule value sharing the chunk
        # compiles ONE executable per step: the reference schedule's 7
        # distinct (step, n_iters) shapes ({700,700,600} + 3x{200,500,400} +
        # 1000 prior) collapse to 4 compiles with the default chunk of 100.
        # compile_chunk=0 disables chunking (one scan per block).
        self.compile_chunk = int(model_config.get("compile_chunk", 100))

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
            # stage/iteration/time selectors (reference main.py:111-113:
            # config keys narrow the resume glob, default "*")
            self.params = self.ckpt.load_latest_general(
                load_dict["category"], self.params,
                stage=load_dict.get("stage", "*"),
                iteration=load_dict.get("iteration", "*"),
                time=load_dict.get("time", "*"))
        self.load_dict = load_dict

        self._build_jitted_steps()

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _chunk_sizes(self, n):
        """See chunk_sizes.  Step-2's PRNG consumes one fresh key per chunk
        instead of one per block — a different but equally valid sample
        stream."""
        return chunk_sizes(n, self.compile_chunk)

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

            if n_iters == 0:
                # zero-length chunk (stage schedules step1: 0): no updates,
                # but step 2 consumes `collected` — return the real albedo
                _, albedo = loss_fn(sub)
                collected = (inv["normal"], inv["light_a"], inv["light_b"],
                             albedo, inv["depth"])
                return ({**rest, **sub}, opt_state, collected,
                        jnp.zeros((0,), jnp.float32))

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

            # max(n_iters, 1): n_iters == 0 still computes pool0/coll2 (the
            # zero-length-chunk call fit() issues when a stage schedules
            # step2: 0 but step3 > 0 — step 3 needs step 2's collected)
            keys = jax.random.split(key, max(n_iters, 1))
            pool0 = model.step2_sample(keys[0], collected, n_proj)
            if n_iters == 0:
                # zero-length chunk: no updates, but step 3 still needs a
                # REAL collected (projected samples from the current params)
                _, coll2 = loss_fn(sub, *pool0)
                return ({**rest, **sub}, opt_state, coll2,
                        jnp.zeros((0,), jnp.float32))
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
                (keys[:n_iters], jnp.arange(n_iters)))
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
        all_losses = []
        for c in self._chunk_sizes(self.n_epochs_prior):
            self.params["depth"], opt_state, losses = self._run_prior(
                self.params["depth"], opt_state, image, prior, n_iters=c)
            all_losses.append(losses)
        if not all_losses:
            return jnp.zeros((0,))
        losses = jnp.concatenate(all_losses)
        log.info("prior pretrain image %s: loss %.3e -> %.3e", image_idx,
                 float(losses[0]), float(losses[-1]))
        return losses

    def fit(self, images_latents, stages=None, shuffle=False,
            plot_depth_map=False, **_):
        """Sequential per-instance training (reference trainer.py:57-128).

        Instance mode is batch-1 by construction (the reference pins
        DataLoader(batch_size=1), trainer.py:66-69); `shuffle` permutes the
        image order exactly like the reference's DataLoader(shuffle=True)."""
        stages = stages or [{"step1": 1, "step2": 1, "step3": 1}] * 2
        total_it = 0
        history = []
        order = np.arange(len(images_latents))
        if shuffle:
            order = np.asarray(
                jax.random.permutation(self._next_key(), len(order)))
        for pos, idx in enumerate(order):
            image, latent, data_index = images_latents[int(idx)]
            image = jnp.asarray(image)[None]
            latent = jnp.asarray(latent)
            if latent.ndim == 1:
                latent = latent[None]
            log.info("training on image %d/%d (dataset index %d)",
                     pos + 1, len(images_latents), idx)

            if self.debug and idx == 0:
                self.debug_report(image, latent)
            if self.load_dict is None:
                self.pretrain_on_prior(image, data_index, plot_depth_map)

            collected = None
            for stage_i, stage in enumerate(stages):
                t0 = time.time()
                l1s, l2s, l3s = [], [], []
                # zero-iteration guard: a stage scheduling 0 iterations for
                # step 1/2 still issues one zero-length call IF a later step
                # consumes its `collected` output (step 2 needs step 1's,
                # step 3 needs step 2's) — otherwise the step is skipped
                # entirely (no compile)
                need1 = [0] if (stage["step2"] or stage["step3"]) else []
                need2 = [0] if stage["step3"] else []
                for c in (self._chunk_sizes(stage["step1"]) or need1):
                    self.params, self.opt_states[1], collected, l1c = \
                        self._run_step1(self.params, self.opt_states[1],
                                        self.frozen, image, n_iters=c)
                    l1s.append(l1c)
                for c in (self._chunk_sizes(stage["step2"]) or need2):
                    self.params, self.opt_states[2], collected2, l2c = \
                        self._run_step2(self.params, self.opt_states[2],
                                        self.frozen, image, latent, collected,
                                        self._next_key(), n_iters=c,
                                        n_proj=self.n_proj_samples)
                    l2s.append(l2c)
                for c in self._chunk_sizes(stage["step3"]):
                    self.params, self.opt_states[3], l3c = \
                        self._run_step3(self.params, self.opt_states[3],
                                        self.frozen, image, latent,
                                        collected2, n_iters=c)
                    l3s.append(l3c)
                if l3s:
                    jax.block_until_ready(l3s[-1])
                dt = time.time() - t0
                # full per-iteration loss curves (the reference logs every
                # iteration, trainer.py:111-115; the scans return the whole
                # arrays — stream them at block end, zero host syncs inside)
                l1, l2, l3 = (_cat(ls) for ls in (l1s, l2s, l3s))
                log.info(
                    "image %s stage %d: losses %.4f/%.4f/%.4f (%.1fs, %d it)",
                    data_index, stage_i, _last(l1), _last(l2),
                    _last(l3), dt, total_it + len(l1) + len(l2) + len(l3))
                history.append({
                    "image": int(data_index), "stage": stage_i,
                    "loss_step1": _last(l1), "loss_step2": _last(l2),
                    "loss_step3": _last(l3), "seconds": dt,
                    "total_it": total_it + len(l1) + len(l2) + len(l3),
                    "losses_step1": l1.tolist(), "losses_step2": l2.tolist(),
                    "losses_step3": l3.tolist()})
                total_it = self._log_wandb_iters(
                    stage_i, data_index, total_it, l1, l2, l3)

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

    def _log_wandb_iters(self, stage_i, data_index, total_it, l1, l2, l3):
        """Per-iteration wandb records with the reference's exact keys
        (trainer.py:111-115: stage, total_it, loss_step{k}, image_num).
        Always advances and returns the global iteration counter."""
        wandb = None
        if self.log_wandb:
            try:
                import wandb
            except ImportError:
                wandb = None
        for k, arr in ((1, l1), (2, l2), (3, l3)):
            for v in np.asarray(arr):
                total_it += 1
                if wandb is not None:
                    wandb.log({"stage": stage_i, "total_it": total_it,
                               f"loss_step{k}": float(v),
                               "image_num": int(data_index)})
        return total_it

    def evaluate(self, image):
        return self.model.evaluate_results(self.params, self.frozen, image)


class GeneralizingTrainer(Trainer):
    """Shared-nets variant (reference GeneralizingTrainer2, trainer.py:338-479
    — the first GeneralizingTrainer crashes in the reference and is not
    replicated): per epoch, batched step1 across images, then per-image
    step2/step3 blocks.

    Data parallelism: the batched phases (prior pretraining and step 1)
    shard the image-batch axis over a device mesh with REPLICATED
    parameters; XLA's sharding propagation inserts the gradient all-reduces.
    Pass `mesh` (or set config `data_parallel: true` to use all local
    devices).  Per-image phases (step 2/3, batch 1) run replicated.  This
    scales the surface the reference's broken DDP trainer attempted
    (reference trainer.py:213, stylegan2 train.py:436-450)."""

    def __init__(self, model_config, mesh=None, **kw):
        super().__init__(model_config, **kw)
        self.n_epochs = model_config.get("n_epochs_generalized", 1)
        if mesh is None and model_config.get("data_parallel", False):
            from gan2shape_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(axis_name="batch")
        self.mesh = mesh
        if mesh is not None:
            from gan2shape_tpu.parallel import distributed as dist
            self.params = dist.put_replicated(self.params, mesh)
            self.frozen = dist.put_replicated(self.frozen, mesh)

    def _shard_batch(self, x):
        """Shard a leading-batch-axis array over the mesh (replicate when
        the batch doesn't divide the mesh — XLA requires even shards).
        Multi-host safe: routes through parallel.distributed's put helpers,
        which use make_array_from_process_local_data when processes > 1
        (plain device_put cannot address other hosts' devices)."""
        if self.mesh is None:
            return x
        from gan2shape_tpu.parallel import distributed as dist
        if x.shape[0] % self.mesh.devices.size == 0:
            return dist.put_batch(x, self.mesh)
        return dist.put_replicated(x, self.mesh)

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

        if self.load_dict is None and self.n_epochs_prior > 0:
            opt_state = self.optimizers[1].init(self.params["depth"])
            losses = None
            im_sh = self._shard_batch(images)
            pr_sh = self._shard_batch(priors)
            for c in self._chunk_sizes(self.n_epochs_prior):
                self.params["depth"], opt_state, losses = self._run_prior(
                    self.params["depth"], opt_state, im_sh, pr_sh,
                    n_iters=c)
            log.info("prior pretrain done: %.3e", float(losses[-1]))

        order = np.arange(n)
        for epoch in range(self.n_epochs):
            if shuffle:
                order = np.asarray(
                    jax.random.permutation(self._next_key(), n))
            for start in range(0, n, batch_size):
                idxs = order[start:start + batch_size]
                imgs = self._shard_batch(images[idxs])
                lats = latents[idxs]

                l1s = []
                # zero-iteration guard: see Trainer.fit — a zero-length call
                # is issued only when a later step consumes the collected
                need1 = [0] if (stages[0]["step2"] or stages[0]["step3"]) \
                    else []
                need2 = [0] if stages[0]["step3"] else []
                for c in (self._chunk_sizes(stages[0]["step1"]) or need1):
                    self.params, self.opt_states[1], collected, l1c = \
                        self._run_step1(self.params, self.opt_states[1],
                                        self.frozen, imgs, n_iters=c)
                    l1s.append(l1c)
                l1 = _cat(l1s)
                # step-1 iterations are batch-level: stream them once per
                # batch (reference logs epoch/total_it/loss_step1 per
                # iteration with no image context, trainer.py:407-410)
                total_it = self._log_wandb_iters(
                    epoch, -1, total_it, l1, np.zeros(0), np.zeros(0))

                for bi in range(imgs.shape[0]):
                    coll_i = jax.tree.map(lambda x: x[bi:bi + 1], collected)
                    l2s, l3s = [], []
                    for c in (self._chunk_sizes(stages[0]["step2"]) or need2):
                        self.params, self.opt_states[2], coll2, l2c = \
                            self._run_step2(self.params, self.opt_states[2],
                                            self.frozen, imgs[bi:bi + 1],
                                            lats[bi:bi + 1], coll_i,
                                            self._next_key(), n_iters=c,
                                            n_proj=self.n_proj_samples)
                        l2s.append(l2c)
                    for c in self._chunk_sizes(stages[0]["step3"]):
                        self.params, self.opt_states[3], l3c = \
                            self._run_step3(self.params, self.opt_states[3],
                                            self.frozen, imgs[bi:bi + 1],
                                            lats[bi:bi + 1], coll2,
                                            n_iters=c)
                        l3s.append(l3c)
                    l2 = _cat(l2s)
                    l3 = _cat(l3s)
                    image_num = int(idxs[bi])
                    # per-image record with full loss curves (reference
                    # logs per-step losses each iteration with image
                    # context, trainer.py:460-465)
                    rec = {"epoch": epoch, "image_num": image_num,
                           "total_it": total_it + len(l2) + len(l3),
                           "loss_step1": _last(l1),
                           "loss_step2": _last(l2),
                           "loss_step3": _last(l3),
                           "losses_step2": l2.tolist(),
                           "losses_step3": l3.tolist()}
                    history.append(rec)
                    total_it = self._log_wandb_iters(
                        epoch, image_num, total_it, np.zeros(0), l2, l3)
                history[-1]["losses_step1"] = l1.tolist()
            log.info("epoch %d: %.4f/%.4f/%.4f", epoch, _last(l1),
                     _last(l2), _last(l3))
            if epoch % 20 == 0 and self.save_ckpts:
                self.ckpt.save(self.params, "", epoch, total_it,
                               self.category)
        log.info("finished training")
        return history

    def _log_wandb_iters(self, epoch, data_index, total_it, l1, l2, l3):
        """Per-iteration records with the reference's generalizing-mode keys:
        epoch/total_it/loss_step1 for the batched step 1 (reference
        trainer.py:407-410, no image context) and epoch/total_it/
        loss_step{2,3}/image_num for the per-image steps (trainer.py:461-465).
        Always advances and returns the global iteration counter."""
        wandb = None
        if self.log_wandb:
            try:
                import wandb
            except ImportError:
                wandb = None
        for v in np.asarray(l1):
            total_it += 1
            if wandb is not None:
                wandb.log({"epoch": epoch, "total_it": total_it,
                           "loss_step1": float(v)})
        for k, arr in ((2, l2), (3, l3)):
            for v in np.asarray(arr):
                total_it += 1
                if wandb is not None:
                    wandb.log({"epoch": epoch, "total_it": total_it,
                               f"loss_step{k}": float(v),
                               "image_num": int(data_index)})
        return total_it


# alias matching the reference's live class name (main.py:138)
GeneralizingTrainer2 = GeneralizingTrainer
