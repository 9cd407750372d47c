"""Instance-parallel training: N image instances optimized simultaneously,
one per-instance copy of the 5 trainable nets, sharded across the device mesh.

This is the TPU-native answer to the reference's strictly sequential
per-instance loop (trainer.py:67-127): the method trains independent
parameters per image, so the instance axis is embarrassingly parallel —
`vmap` the whole (scan-of-steps) stage over instances, `jit` with instance
shardings, and XLA partitions it across the mesh with zero collectives in
the hot path (the frozen GAN/LPIPS weights are replicated once).

The generalizing (shared-nets) mode instead data-parallelizes the image batch
with replicated parameters; gradient all-reduces come from XLA's sharding
propagation — see GeneralizingTrainer + batch sharding in core/trainer.py.
"""

import logging
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gan2shape_tpu.core.model import GAN2Shape
from gan2shape_tpu.core.trainer import default_optimizer, _split, STEP_SUBSETS
from gan2shape_tpu.parallel.mesh import (
    make_mesh, instance_sharding, replicated,
)

log = logging.getLogger(__name__)


class InstanceParallelTrainer:
    """Train N instances at once across a mesh.

    Usage:
        t = InstanceParallelTrainer(config, n_instances=8)
        t.fit(images, latents, priors, stages)   # arrays with leading N axis
    """

    def __init__(self, model_config, n_instances, mesh=None, frozen=None,
                 seed=0):
        from gan2shape_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        self.model = GAN2Shape(model_config)
        self.n = n_instances
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_proj_samples = model_config.get("n_proj_samples", 8)
        self.n_epochs_prior = model_config.get("n_epochs_prior", 1000)
        self.learning_rate = model_config.get("learning_rate", 1e-4)

        key = jax.random.PRNGKey(seed)
        kp, kf, self._key = jax.random.split(key, 3)

        # per-instance parameters: independent inits stacked on axis 0
        # (one traced vmap instead of n eager inits)
        keys = jax.random.split(kp, n_instances)
        self.params = jax.jit(jax.vmap(self.model.init_params))(keys)
        self.frozen = frozen if frozen is not None \
            else self.model.init_frozen(kf)

        self.optimizers = {
            s: default_optimizer(self.learning_rate) for s in (1, 2, 3)}

        self._inst = instance_sharding(self.mesh)
        self._repl = replicated(self.mesh)
        self.params = jax.device_put(self.params, self._inst)
        self.frozen = jax.device_put(self.frozen, self._repl)
        self._build()

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _build(self):
        model = self.model
        opts = self.optimizers
        n_proj = self.n_proj_samples

        def stage_one_instance(params, image, latent, key, opt_states,
                               n1, n2, n3):
            """One full stage (step1 x n1, step2 x n2, step3 x n3) for a
            single instance; image (3,H,W), latent (D,)."""
            image = image[None]
            latent = latent[None]
            k2 = key

            # ---- step 1 (invariants hoisted out of the scan) ----
            sub, rest = _split(params, STEP_SUBSETS[1])
            inv = model.step1_invariants(params, self.frozen, image)

            def s1_loss(sub):
                return model.step1_iter({**rest, **sub}, self.frozen, image,
                                        inv)
            albedo0 = jax.lax.pcast(
                jnp.zeros(jax.eval_shape(s1_loss, sub)[1].shape),
                (axis,), to="varying")

            def s1_body(carry, _):
                sub, s, _ = carry
                (loss, albedo), grads = jax.value_and_grad(
                    s1_loss, has_aux=True)(sub)
                upd, s = opts[1].update(grads, s, sub)
                return (optax.apply_updates(sub, upd), s, albedo), loss
            (sub, st1, albedo), l1 = jax.lax.scan(
                s1_body, (sub, opt_states[0], albedo0), None, length=n1)
            collected = (inv["normal"], inv["light_a"], inv["light_b"],
                         albedo, inv["depth"])
            params = {**rest, **sub}

            # ---- step 2 ----
            sub, rest = _split(params, STEP_SUBSETS[2])
            inv2 = model.step2_invariants(self.frozen, latent)

            def s2_loss(sub, k):
                return model.forward_step2({**rest, **sub}, self.frozen,
                                           image, latent, collected, k,
                                           n_proj_samples=n_proj,
                                           invariants=inv2)
            keys = jax.random.split(k2, n2)
            coll20 = jax.tree.map(
                lambda sd: jax.lax.pcast(jnp.zeros(sd.shape, sd.dtype),
                                         (axis,), to="varying"),
                jax.eval_shape(s2_loss, sub, keys[0])[1])

            def s2_body(carry, k):
                sub, s, _ = carry
                (loss, coll2), grads = jax.value_and_grad(
                    s2_loss, has_aux=True)(sub, k)
                upd, s = opts[2].update(grads, s, sub)
                return (optax.apply_updates(sub, upd), s, coll2), loss
            (sub, st2, coll2), l2 = jax.lax.scan(
                s2_body, (sub, opt_states[1], coll20), keys)
            params = {**rest, **sub}

            # ---- step 3 ----
            sub, rest = _split(params, STEP_SUBSETS[3])

            def s3_loss(sub):
                return model.forward_step3({**rest, **sub}, self.frozen,
                                           image, latent, coll2)[0]

            def s3_body(carry, _):
                sub, s = carry
                loss, grads = jax.value_and_grad(s3_loss)(sub)
                upd, s = opts[3].update(grads, s, sub)
                return (optax.apply_updates(sub, upd), s), loss
            (sub, st3), l3 = jax.lax.scan(s3_body, (sub, opt_states[2]),
                                          None, length=n3)
            params = {**rest, **sub}
            return params, (st1, st2, st3), (l1[-1], l2[-1], l3[-1])

        from jax.sharding import PartitionSpec as P
        mesh = self.mesh
        axis = mesh.axis_names[0]

        @partial(jax.jit, static_argnames=("n1", "n2", "n3"),
                 donate_argnums=(0, 3))
        def run_stage(params, images, latents, opt_states, keys,
                      n1, n2, n3):
            # shard_map (not jit sharding propagation): the per-instance
            # vmapped convs lower to grouped convolutions that XLA's SPMD
            # partitioner cannot split along the group axis; explicit
            # per-device blocks with a local vmap sidestep that — the work is
            # embarrassingly parallel, zero collectives.
            def local(params, images, latents, opt_states, keys):
                return jax.vmap(
                    lambda p, im, la, k, os: stage_one_instance(
                        p, im, la, k, os, n1, n2, n3),
                    in_axes=(0, 0, 0, 0, 0))(params, images, latents, keys,
                                             opt_states)
            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
                out_specs=(P(axis), P(axis), P(axis)))(
                params, images, latents, opt_states, keys)

        @partial(jax.jit, static_argnames=("n_iters",), donate_argnums=(0,))
        def run_prior(params_depth, images, priors, n_iters):
            def one(pd, image, prior):
                opt = opts[1].init(pd)

                def body(carry, _):
                    pd, s = carry
                    (loss, _), grads = jax.value_and_grad(
                        lambda p: model.depth_net_forward(
                            {"depth": p}, image[None], prior),
                        has_aux=True)(pd)
                    upd, s = opts[1].update(grads, s, pd)
                    return (optax.apply_updates(pd, upd), s), loss
                (pd, _), losses = jax.lax.scan(body, (pd, opt), None,
                                               length=n_iters)
                return pd, losses

            def local(params_depth, images, priors):
                return jax.vmap(one)(params_depth, images, priors)
            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis)),
                out_specs=(P(axis), P(axis)))(params_depth, images, priors)

        self._run_stage = run_stage
        self._run_prior = run_prior

    def init_opt_states(self):
        def per_instance(params):
            return tuple(
                self.optimizers[s].init(_split(params, sub)[0])
                for s, sub in STEP_SUBSETS.items())
        states = jax.vmap(per_instance)(self.params)
        return jax.device_put(states, self._inst)

    def fit(self, images, latents, priors=None, stages=None):
        """images (N,3,H,W), latents (N,D), priors (N,H,W) — all numpy/jnp."""
        stages = stages or [{"step1": 1, "step2": 1, "step3": 1}]
        images = jax.device_put(jnp.asarray(images), self._inst)
        latents = jax.device_put(jnp.asarray(latents), self._inst)

        if priors is not None:
            priors = jax.device_put(jnp.asarray(priors), self._inst)
            depth, losses = self._run_prior(self.params["depth"], images,
                                            priors,
                                            n_iters=self.n_epochs_prior)
            self.params["depth"] = depth
            log.info("prior pretrain: %.3e", float(losses[:, -1].mean()))

        opt_states = self.init_opt_states()
        history = []
        for i, stage in enumerate(stages):
            keys = jax.random.split(self._next_key(), self.n)
            self.params, opt_states, losses = self._run_stage(
                self.params, images, latents, opt_states, keys,
                n1=stage["step1"], n2=stage["step2"], n3=stage["step3"])
            rec = {"stage": i,
                   "loss_step1": np.asarray(losses[0]).mean().item(),
                   "loss_step2": np.asarray(losses[1]).mean().item(),
                   "loss_step3": np.asarray(losses[2]).mean().item()}
            history.append(rec)
            log.info("stage %d: %.4f/%.4f/%.4f", i, rec["loss_step1"],
                     rec["loss_step2"], rec["loss_step3"])
        return history

    def evaluate(self, images):
        from jax.sharding import PartitionSpec as P
        axis = self.mesh.axis_names[0]
        images = jax.device_put(jnp.asarray(images), self._inst)

        def local(params, images):
            return jax.vmap(
                lambda p, im: self.model.evaluate_results(p, self.frozen,
                                                          im[None]))(
                params, images)
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis))))(self.params, images)
