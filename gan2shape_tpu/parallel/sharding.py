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
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gan2shape_tpu.core.model import GAN2Shape
from gan2shape_tpu.core.trainer import (
    default_optimizer, _split, _last, STEP_SUBSETS)
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
                 seed=0, model=None, save_ckpts=False):
        from gan2shape_tpu.utils.cache import enable_compilation_cache
        from gan2shape_tpu.core.checkpoint import CheckpointManager
        enable_compilation_cache()
        self.model = model if model is not None else GAN2Shape(model_config)
        self.n = n_instances
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_proj_samples = model_config.get("n_proj_samples", 8)
        self.n_epochs_prior = model_config.get("n_epochs_prior", 1000)
        self.learning_rate = model_config.get("learning_rate", 1e-4)
        # same chunked-compile scheme as the sequential Trainer: every
        # iteration count sharing the chunk reuses ONE executable per step
        self.compile_chunk = int(model_config.get("compile_chunk", 100))
        self.category = model_config.get("category", "face")
        self.save_ckpts = save_ckpts
        self.ckpt = CheckpointManager(
            model_config.get("our_nets_ckpts",
                             {"VLADE_nets": "checkpoints/our_nets"}
                             )["VLADE_nets"])

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
        # Adam moments persist across fit() calls (matching the sequential
        # Trainer's self.opt_states): stage-split or resumed fits continue
        # from the same optimizer state instead of silently resetting it.
        self.opt_states = self.init_opt_states()

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _build(self):
        model = self.model
        opts = self.optimizers
        n_proj = self.n_proj_samples

        from jax.sharding import PartitionSpec as P
        mesh = self.mesh
        axis = mesh.axis_names[0]

        def pvary(x):
            return jax.lax.pcast(x, (axis,), to="varying")

        # The three steps compile as SEPARATE jit modules (one fused
        # stage module takes tens of minutes in XLA:CPU for the dryruns),
        # each as shard_map(vmap(...)): the per-instance vmapped convs lower
        # to grouped convolutions that the SPMD partitioner cannot split
        # along the group axis, so explicit per-device blocks with a local
        # vmap are used — the work is embarrassingly parallel, zero
        # collectives.
        n_per_dev = max(1, self.n // mesh.devices.size)

        def sharded(fn, n_in, n_out):
            # frozen params ride along as a REPLICATED runtime argument —
            # closing over them makes XLA treat every frozen weight as a
            # compile-time constant and constant-fold conv transposes for
            # minutes (8+ min on XLA:CPU for the LPIPS VGG alone).
            # With one instance per device the vmap is skipped entirely
            # (vmap of a size-1 axis still multiplies XLA:CPU compile time).
            def wrapper(frozen, *args):
                def local(frozen, *a):
                    if n_per_dev == 1:
                        sq = [jax.tree.map(lambda x: x[0], t) for t in a]
                        out = fn(frozen, *sq)
                        return tuple(
                            jax.tree.map(lambda x: x[None], t) for t in out)
                    return jax.vmap(fn, in_axes=(None,) + (0,) * len(a))(
                        frozen, *a)
                # check_vma=False: the Pallas rasterizer's out_shapes
                # carry no varying-across-mesh annotation, and this map is
                # embarrassingly parallel (no collectives to validate)
                return jax.shard_map(
                    local, mesh=mesh, in_specs=(P(),) + (P(axis),) * n_in,
                    out_specs=(P(axis),) * n_out,
                    check_vma=False)(frozen, *args)
            return wrapper

        # The per-step iteration counts are bound as leading Python ints via
        # functools.partial (each n retraces under its static jit arg) —
        # never smuggled through instance attributes at trace time.
        def step1_one(n1, frozen, params, image, opt_state):
            image = image[None]
            sub, rest = _split(params, STEP_SUBSETS[1])
            inv = model.step1_invariants(params, frozen, image)

            def s1_loss(sub):
                return model.step1_iter({**rest, **sub}, frozen, image, inv)

            if n1 == 0:
                # zero-length chunk (stage schedules step1: 0 but a later
                # step consumes `collected`): no updates, real albedo
                _, albedo = s1_loss(sub)
                collected = (inv["normal"], inv["light_a"], inv["light_b"],
                             albedo, inv["depth"])
                return ({**rest, **sub}, opt_state, collected,
                        jnp.zeros((0,), jnp.float32))
            albedo0 = pvary(jnp.zeros(jax.eval_shape(s1_loss, sub)[1].shape))

            def body(carry, _):
                sub, s, _ = carry
                (loss, albedo), grads = jax.value_and_grad(
                    s1_loss, has_aux=True)(sub)
                upd, s = opts[1].update(grads, s, sub)
                return (optax.apply_updates(sub, upd), s, albedo), loss
            if n1 == 1:  # no scan machinery for single-iteration runs
                (sub, st, albedo), loss = body((sub, opt_state, albedo0),
                                               None)
                losses = loss[None]
            else:
                (sub, st, albedo), losses = jax.lax.scan(
                    body, (sub, opt_state, albedo0), None, length=n1)
            collected = (inv["normal"], inv["light_a"], inv["light_b"],
                         albedo, inv["depth"])
            return {**rest, **sub}, st, collected, losses

        def step2_one(n2, frozen, params, image, latent, collected, key,
                      opt_state):
            image = image[None]
            latent = latent[None]
            sub, rest = _split(params, STEP_SUBSETS[2])
            inv2 = model.step2_invariants(frozen, latent)

            def s2_loss(sub, k):
                return model.forward_step2({**rest, **sub}, frozen,
                                           image, latent, collected, k,
                                           n_proj_samples=n_proj,
                                           invariants=inv2)
            keys = jax.random.split(key, max(n2, 1))
            if n2 == 0:
                # zero-length chunk: step 3 still needs a REAL collected
                _, coll2 = s2_loss(sub, keys[0])
                return ({**rest, **sub}, opt_state, coll2,
                        jnp.zeros((0,), jnp.float32))
            coll20 = jax.tree.map(
                lambda sd: pvary(jnp.zeros(sd.shape, sd.dtype)),
                jax.eval_shape(s2_loss, sub, keys[0])[1])

            def body(carry, k):
                sub, s, _ = carry
                (loss, coll2), grads = jax.value_and_grad(
                    s2_loss, has_aux=True)(sub, k)
                upd, s = opts[2].update(grads, s, sub)
                return (optax.apply_updates(sub, upd), s, coll2), loss
            if n2 == 1:
                (sub, st, coll2), loss = body((sub, opt_state, coll20),
                                              keys[0])
                losses = loss[None]
            else:
                (sub, st, coll2), losses = jax.lax.scan(
                    body, (sub, opt_state, coll20), keys)
            return {**rest, **sub}, st, coll2, losses

        def step3_one(n3, frozen, params, image, latent, coll2, opt_state):
            image = image[None]
            latent = latent[None]
            sub, rest = _split(params, STEP_SUBSETS[3])

            def s3_loss(sub):
                return model.forward_step3({**rest, **sub}, frozen,
                                           image, latent, coll2)[0]

            def body(carry, _):
                sub, s = carry
                loss, grads = jax.value_and_grad(s3_loss)(sub)
                upd, s = opts[3].update(grads, s, sub)
                return (optax.apply_updates(sub, upd), s), loss
            if n3 == 1:
                (sub, st), loss = body((sub, opt_state), None)
                losses = loss[None]
            else:
                (sub, st), losses = jax.lax.scan(body, (sub, opt_state),
                                                 None, length=n3)
            return {**rest, **sub}, st, losses

        @partial(jax.jit, static_argnames=("n1",), donate_argnums=(1, 2))
        def run_stage1(frozen, params, opt_state, images, n1):
            return sharded(partial(step1_one, n1), 3, 4)(
                frozen, params, images, opt_state)

        @partial(jax.jit, static_argnames=("n2",), donate_argnums=(1, 2))
        def run_stage2(frozen, params, opt_state, images, latents, collected,
                       keys, n2):
            return sharded(partial(step2_one, n2), 6, 4)(
                frozen, params, images, latents, collected, keys, opt_state)

        @partial(jax.jit, static_argnames=("n3",), donate_argnums=(1, 2))
        def run_stage3(frozen, params, opt_state, images, latents, coll2,
                       n3):
            return sharded(partial(step3_one, n3), 5, 3)(
                frozen, params, images, latents, coll2, opt_state)

        self._run_stage1 = run_stage1
        self._run_stage2 = run_stage2
        self._run_stage3 = run_stage3

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
                out_specs=(P(axis), P(axis)),
                check_vma=False)(params_depth, images, priors)

        self._run_prior = run_prior

    def init_opt_states(self):
        def per_instance(params):
            return tuple(
                self.optimizers[s].init(_split(params, sub)[0])
                for s, sub in STEP_SUBSETS.items())
        # every leaf of the Adam chain's fresh state is zeros (count, mu,
        # nu; the decay/scale links are EmptyState), so build the tree from
        # eval_shape instead of compiling a jit(vmap(optax.init)) module —
        # that compile alone cost ~30 s of every cold multichip dryrun
        shapes = jax.eval_shape(jax.vmap(per_instance), self.params)
        states = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        return jax.device_put(states, self._inst)

    def fit(self, images, latents, priors=None, stages=None,
            reset_opt=False, data_indices=None):
        """images (N,3,H,W), latents (N,D), priors (N,H,W) — all numpy/jnp.

        Optimizer moments carry across calls; pass reset_opt=True for the
        reference's fresh-Adam-per-fit behavior.  `data_indices` names each
        instance for checkpointing/eval (defaults to 0..N-1); checkpoints
        are the same per-image manifests the sequential Trainer writes, so
        `evaluate_results.py` consumes this trainer's output unchanged.

        Iteration blocks run as `compile_chunk`-sized repeats (one compiled
        executable per step for the whole schedule, exactly like the
        sequential Trainer), and the returned history carries the FULL
        per-iteration loss curve per instance."""
        from gan2shape_tpu.core.trainer import chunk_sizes

        stages = stages or [{"step1": 1, "step2": 1, "step3": 1}]
        if data_indices is None:
            data_indices = list(range(self.n))
        images = jax.device_put(jnp.asarray(images), self._inst)
        latents = jax.device_put(jnp.asarray(latents), self._inst)

        if priors is not None:
            priors = jax.device_put(jnp.asarray(priors), self._inst)
            depth, losses = self._run_prior(self.params["depth"], images,
                                            priors,
                                            n_iters=self.n_epochs_prior)
            self.params["depth"] = depth
            log.info("prior pretrain: %.3e", float(losses[:, -1].mean()))

        if reset_opt:
            self.opt_states = self.init_opt_states()
        st1, st2, st3 = self.opt_states
        history = []
        total_it = 0

        def cat(chunks, axis=1):
            if not chunks:
                return np.zeros((self.n, 0), np.float32)
            return np.concatenate([np.asarray(c) for c in chunks], axis)

        for i, stage in enumerate(stages):
            t0 = time.time()
            # zero-iteration guard mirrors the sequential trainer: a step
            # scheduling 0 iterations still issues one zero-length call IF
            # a later step consumes its collected output
            need1 = [0] if (stage["step2"] or stage["step3"]) else []
            need2 = [0] if stage["step3"] else []
            l1s, l2s, l3s = [], [], []
            collected = coll2 = None
            for c in (chunk_sizes(stage["step1"], self.compile_chunk)
                      or need1):
                self.params, st1, collected, l1c = self._run_stage1(
                    self.frozen, self.params, st1, images, n1=c)
                l1s.append(l1c)
            for c in (chunk_sizes(stage["step2"], self.compile_chunk)
                      or need2):
                keys = jax.random.split(self._next_key(), self.n)
                self.params, st2, coll2, l2c = self._run_stage2(
                    self.frozen, self.params, st2, images, latents,
                    collected, keys, n2=c)
                l2s.append(l2c)
            for c in chunk_sizes(stage["step3"], self.compile_chunk):
                self.params, st3, l3c = self._run_stage3(
                    self.frozen, self.params, st3, images, latents, coll2,
                    n3=c)
                l3s.append(l3c)
            if l3s:
                jax.block_until_ready(l3s[-1])
            dt = time.time() - t0
            l1, l2, l3 = cat(l1s), cat(l2s), cat(l3s)
            n_it = l1.shape[1] + l2.shape[1] + l3.shape[1]
            total_it += n_it
            # per-instance records with the sequential Trainer's schema
            for j, idx in enumerate(data_indices):
                history.append({
                    "image": int(idx), "stage": i,
                    "loss_step1": _last(l1[j]), "loss_step2": _last(l2[j]),
                    "loss_step3": _last(l3[j]), "seconds": dt,
                    "total_it": total_it,
                    "losses_step1": l1[j].tolist(),
                    "losses_step2": l2[j].tolist(),
                    "losses_step3": l3[j].tolist()})
            log.info("stage %d: %.4f/%.4f/%.4f (%.1fs, %d instances)", i,
                     float(np.nanmean(l1[:, -1])) if l1.size else float("nan"),
                     float(np.nanmean(l2[:, -1])) if l2.size else float("nan"),
                     float(np.nanmean(l3[:, -1])) if l3.size else float("nan"),
                     dt, self.n)
            if self.save_ckpts:
                self.save_checkpoints(data_indices, i, total_it)
        self.opt_states = (st1, st2, st3)
        return history

    def save_checkpoints(self, data_indices, stage, total_it):
        """Per-instance checkpoints in the sequential Trainer's manifest
        format (one per image, same files evaluate_results.py globs)."""
        host = jax.device_get(self.params)
        for j, idx in enumerate(data_indices):
            params_j = jax.tree.map(lambda x: x[j], host)
            self.ckpt.save(params_j, idx, stage, total_it, self.category)

    def evaluate(self, images):
        """Returns (recon_im (N,3,H,W), recon_depth (N,H,W))."""
        from jax.sharding import PartitionSpec as P
        axis = self.mesh.axis_names[0]
        images = jax.device_put(jnp.asarray(images), self._inst)

        def local(frozen, params, images):
            return jax.vmap(
                lambda p, im: jax.tree.map(
                    lambda x: x[0],
                    self.model.evaluate_results(p, frozen, im[None])),
                in_axes=(0, 0))(params, images)
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False))(self.frozen, self.params, images)
