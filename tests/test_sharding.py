"""Multi-device tests on the 8-way virtual CPU mesh: instance-parallel
training (the BASELINE.md v4-8 scaling config) and sharded data-parallel
step-1."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gan2shape_tpu.parallel import (
    make_mesh, instance_sharding, InstanceParallelTrainer,
)
from gan2shape_tpu.parallel.mesh import replicate_tree, shard_instance_tree

CFG = {
    "image_size": 64, "gan_size": 32, "z_dim": 512,
    "channel_multiplier": 1, "category": "face", "disc_ftr_num": 3,
    "n_epochs_prior": 2, "n_proj_samples": 2, "learning_rate": 1e-4,
    "prior_name": "box", "rot_center_depth": 1.0, "fov": 10,
    "raster_mode": "scatter",
}


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_helpers():
    mesh = make_mesh()
    x = jnp.zeros((8, 4))
    xs = shard_instance_tree(x, mesh)
    assert len(xs.sharding.device_set) == 8
    r = replicate_tree({"a": jnp.ones(3)}, mesh)
    assert r["a"].sharding.is_fully_replicated


@pytest.mark.slow
def test_instance_parallel_stage():
    n = 8
    mesh = make_mesh()
    trainer = InstanceParallelTrainer(CFG, n_instances=n, mesh=mesh)
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (n, 3, 64, 64)).astype(np.float32)
    latents = rng.standard_normal((n, 512)).astype(np.float32)
    priors = np.full((n, 64, 64), 1.0, np.float32)

    history = trainer.fit(images, latents, priors,
                          stages=[{"step1": 1, "step2": 1, "step3": 1}])
    assert len(history) == 1
    assert np.isfinite(history[0]["loss_step1"])
    assert np.isfinite(history[0]["loss_step2"])
    assert np.isfinite(history[0]["loss_step3"])

    # per-instance params are sharded over the mesh
    leaf = jax.tree_util.tree_leaves(trainer.params)[0]
    assert leaf.shape[0] == n
    assert len(leaf.sharding.device_set) == 8

    # per-instance nets actually diverged from each other
    depths = np.asarray(
        jax.tree_util.tree_leaves(trainer.params["depth"])[0])
    assert not np.allclose(depths[0], depths[1])

    recon_im, recon_depth = trainer.evaluate(images)
    assert recon_im.shape == (n, 3, 64, 64)
    assert recon_depth.shape == (n, 64, 64)

    # Adam moments persist across fit calls (stage-split fits continue the
    # same trajectory, matching the sequential Trainer's self.opt_states):
    # the Adam step counter accumulates across both fits
    def step1_count(states):
        return int(np.asarray(
            [l for l in jax.tree_util.tree_leaves(states[0])
             if l.dtype == jnp.int32][0]).max())
    assert step1_count(trainer.opt_states) == 1
    trainer.fit(images, latents,
                stages=[{"step1": 1, "step2": 1, "step3": 1}])
    assert step1_count(trainer.opt_states) == 2
    trainer.fit(images, latents,
                stages=[{"step1": 1, "step2": 1, "step3": 1}],
                reset_opt=True)
    assert step1_count(trainer.opt_states) == 1


@pytest.mark.slow
def test_instance_parallel_multiple_per_device():
    """16 instances on the 8-device mesh drives the n_per_dev=2 vmap branch
    of sharded() (previously only the squeeze branch ever executed)."""
    n = 16
    s = 64  # OffsetEncoder supports sizes {64, 128} (reference contract)
    mesh = make_mesh()
    trainer = InstanceParallelTrainer(CFG, n_instances=n, mesh=mesh)
    rng = np.random.default_rng(1)
    images = rng.uniform(-1, 1, (n, 3, s, s)).astype(np.float32)
    latents = rng.standard_normal((n, 512)).astype(np.float32)
    priors = np.full((n, s, s), 1.0, np.float32)

    history = trainer.fit(images, latents, priors,
                          stages=[{"step1": 1, "step2": 1, "step3": 1}])
    assert np.isfinite(history[0]["loss_step1"])
    assert np.isfinite(history[0]["loss_step2"])
    assert np.isfinite(history[0]["loss_step3"])
    leaf = jax.tree_util.tree_leaves(trainer.params)[0]
    assert leaf.shape[0] == n
    assert len(leaf.sharding.device_set) == 8
    depths = np.asarray(
        jax.tree_util.tree_leaves(trainer.params["depth"])[0])
    assert not np.allclose(depths[0], depths[1])
