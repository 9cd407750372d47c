"""Multi-device data-parallel StyleGAN2 training on the 8-way virtual CPU
mesh: sharding the real batch over the mesh must produce the SAME update as
the single-device step — XLA's inserted gradient all-reduces are the
TPU-native replacement for the reference's broken DDP/NCCL path
(reference stylegan2-pytorch/train.py:436-450, imports a missing
`distributed` module at train.py:23)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gan2shape_tpu.models.stylegan2_train import StyleGAN2Trainer
from gan2shape_tpu.parallel.mesh import make_mesh


@pytest.mark.slow
def test_train_step_sharded_matches_single_device():
    mesh = make_mesh(8)
    trainer = StyleGAN2Trainer(size=16, style_dim=32, n_mlp=2,
                               channel_multiplier=1)
    state = trainer.init(jax.random.PRNGKey(0), batch_size=8)

    rng = np.random.default_rng(0)
    real_np = rng.uniform(-1, 1, (8, 3, 16, 16)).astype(np.float32)
    key = jax.random.PRNGKey(7)

    from jax.sharding import NamedSharding, PartitionSpec as P
    data_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    repl = NamedSharding(mesh, P())

    # single-device (donate_argnums on state: run from fresh copies)
    state_a = jax.tree.map(jnp.copy, state)
    new_a, logs_a = trainer.train_step(state_a, jnp.asarray(real_np), key)
    logs_a = {k: float(v) for k, v in logs_a.items()}

    # batch sharded over the 8-device mesh, params/key replicated
    state_b = jax.device_put(jax.tree.map(jnp.copy, state), repl)
    real_b = jax.device_put(jnp.asarray(real_np), data_sh)
    new_b, logs_b = trainer.train_step(state_b, real_b, key)

    # the sharded batch really lives on all 8 devices
    assert len(real_b.sharding.device_set) == 8

    # identical losses/scores (reduction reorder tolerance only)
    for k in ("d_loss", "g_loss", "real_score", "fake_score"):
        assert abs(logs_a[k] - float(logs_b[k])) < 1e-4, (
            k, logs_a[k], float(logs_b[k]))

    # gradient all-reduce equivalence, asserted on the GRADIENTS themselves
    # (the updated params go through Adam with b1=0, whose first step is
    # ~lr*sign(grad) — a reduction-order wobble on a near-zero grad flips
    # the sign and reads as a full lr-sized param diff, so params are the
    # wrong place to pin numerical equivalence)
    from gan2shape_tpu.models.stylegan2_train import d_logistic_loss

    kd_lat, kd_noise = jax.random.split(key, 2)

    def d_loss(d_params, g_params, real):
        latent = trainer._mixed_latent(g_params, kd_lat, real.shape[0])
        noise = trainer._fresh_noise(kd_noise, real.shape[0])
        fake = jax.lax.stop_gradient(trainer._synth(g_params, latent, noise))
        real_pred, _ = trainer.discriminator.apply(d_params, real)
        fake_pred, _ = trainer.discriminator.apply(d_params, fake)
        return d_logistic_loss(real_pred, fake_pred)

    grad_fn = jax.jit(jax.grad(d_loss))
    g_single = grad_fn(state.d_params, state.g_params,
                       jnp.asarray(real_np))
    g_shard = grad_fn(jax.device_put(state.d_params, repl),
                      jax.device_put(state.g_params, repl), real_b)
    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_shard)):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-3)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale + 1e-6

    # and the full train_step's params stay within the Adam sign-noise
    # envelope of each other (loose sanity bound)
    leaves_a = jax.tree_util.tree_leaves(
        {"g": new_a.g_params, "d": new_a.d_params})
    leaves_b = jax.tree_util.tree_leaves(
        {"g": new_b.g_params, "d": new_b.d_params})
    worst = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(leaves_a, leaves_b))
    assert worst < 1e-2, worst
