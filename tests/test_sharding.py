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
    # one record per (instance, stage), sequential-Trainer schema incl.
    # the full per-iteration loss curves
    assert len(history) == n
    assert sorted(h["image"] for h in history) == list(range(n))
    for h in history:
        assert np.isfinite(h["loss_step1"])
        assert np.isfinite(h["loss_step2"])
        assert np.isfinite(h["loss_step3"])
        assert len(h["losses_step1"]) == 1
        assert len(h["losses_step2"]) == 1
        assert len(h["losses_step3"]) == 1
    # instances see different images -> different loss values
    assert history[0]["loss_step1"] != history[1]["loss_step1"]

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
    assert len(history) == n
    assert np.isfinite(history[0]["loss_step1"])
    assert np.isfinite(history[0]["loss_step2"])
    assert np.isfinite(history[0]["loss_step3"])
    leaf = jax.tree_util.tree_leaves(trainer.params)[0]
    assert leaf.shape[0] == n
    assert len(leaf.sharding.device_set) == 8
    depths = np.asarray(
        jax.tree_util.tree_leaves(trainer.params["depth"])[0])
    assert not np.allclose(depths[0], depths[1])


@pytest.mark.slow
def test_instance_parallel_checkpoint_roundtrip(tmp_path):
    """--n-instances --save-ckpts writes per-image manifests that the
    sequential CheckpointManager (and thus evaluate_results.py) loads."""
    from gan2shape_tpu.core.checkpoint import CheckpointManager

    n = 2
    cfg = {**CFG, "compile_chunk": 2,
           "our_nets_ckpts": {"VLADE_nets": str(tmp_path)}}
    mesh = make_mesh(2)  # instance axis must divide the mesh
    trainer = InstanceParallelTrainer(cfg, n_instances=n, mesh=mesh,
                                      save_ckpts=True)
    rng = np.random.default_rng(2)
    images = rng.uniform(-1, 1, (n, 3, 64, 64)).astype(np.float32)
    latents = rng.standard_normal((n, 512)).astype(np.float32)

    # 3 iterations with chunk 2 -> chunked (2, 1) execution path
    history = trainer.fit(images, latents,
                          stages=[{"step1": 3, "step2": 1, "step3": 1}],
                          data_indices=[5, 9])
    assert len(history[0]["losses_step1"]) == 3

    ckpt = CheckpointManager(str(tmp_path))
    for j, idx in enumerate([5, 9]):
        ms = ckpt.select("face", img_idx=idx)
        assert len(ms) == 1
        template = jax.tree.map(lambda x: np.asarray(x[j]), trainer.params)
        loaded = ckpt.load_manifest(ms[-1], template)
        for net in ("depth", "albedo"):
            a = jax.tree_util.tree_leaves(loaded[net])
            b = jax.tree_util.tree_leaves(template[net])
            assert all(np.allclose(x, y) for x, y in zip(a, b))
