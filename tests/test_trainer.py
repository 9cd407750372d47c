"""Trainer integration tests: the minimal end-to-end slice (prior pretrain +
one stage of the 3 steps) on synthetic data, checkpoint save/load roundtrip,
and the generalizing variant."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gan2shape_tpu.core.trainer import (
    Trainer, GeneralizingTrainer, default_optimizer, STEP_SUBSETS,
)
from gan2shape_tpu.core.checkpoint import CheckpointManager

CFG = {
    "image_size": 64, "gan_size": 32, "z_dim": 512,
    "channel_multiplier": 1, "category": "face", "disc_ftr_num": 3,
    "n_epochs_prior": 3, "n_proj_samples": 2, "learning_rate": 1e-4,
    "prior_name": "box",
    "rot_center_depth": 1.0, "fov": 10, "raster_mode": "scatter",
}


class SyntheticData:
    def __init__(self, n=1, image_size=64, z_dim=512, seed=0):
        rng = np.random.default_rng(seed)
        self.images = rng.uniform(-1, 1, (n, 3, image_size, image_size)
                                  ).astype(np.float32)
        self.latents = rng.standard_normal((n, z_dim)).astype(np.float32)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return self.images[i], self.latents[i], i


def test_default_optimizer_matches_torch_adam(rng):
    """One Adam+weight-decay step against torch.optim.Adam."""
    import torch
    p0 = rng.standard_normal(16).astype(np.float32)
    g0 = rng.standard_normal(16).astype(np.float32)

    tp = torch.from_numpy(p0.copy()).requires_grad_(True)
    opt = torch.optim.Adam([tp], lr=1e-2, betas=(0.9, 0.999),
                           weight_decay=5e-4)
    tp.grad = torch.from_numpy(g0.copy())
    opt.step()

    jopt = default_optimizer(lr=1e-2, weight_decay=5e-4)
    state = jopt.init(jnp.asarray(p0))
    updates, state = jopt.update(jnp.asarray(g0), state, jnp.asarray(p0))
    jp = jnp.asarray(p0) + updates
    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(), atol=1e-6)


@pytest.mark.slow
def test_trainer_fit_one_stage(tmp_path):
    cfg = dict(CFG)
    cfg["our_nets_ckpts"] = {"VLADE_nets": str(tmp_path / "ckpts")}
    trainer = Trainer(cfg, save_ckpts=True)
    data = SyntheticData(1)
    history = trainer.fit(data, stages=[{"step1": 2, "step2": 2, "step3": 2}])
    assert len(history) == 1
    for k in ("loss_step1", "loss_step2", "loss_step3"):
        assert np.isfinite(history[0][k])

    # checkpoint roundtrip: saved params reload bit-exact
    mgr = CheckpointManager(cfg["our_nets_ckpts"]["VLADE_nets"])
    template = trainer.model.init_params(jax.random.PRNGKey(9))
    loaded = mgr.load_latest_general("face", template)
    for net in STEP_SUBSETS[3]:
        want = jax.tree_util.tree_leaves(trainer.params[net])
        got = jax.tree_util.tree_leaves(loaded[net])
        for a, b in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # evaluation path runs on the trained params
    recon_im, recon_depth = trainer.evaluate(jnp.asarray(data.images[:1]))
    assert recon_im.shape == (1, 3, 64, 64)


@pytest.mark.slow
def test_prior_pretraining_reduces_loss():
    cfg = dict(CFG)
    cfg["n_epochs_prior"] = 40
    trainer = Trainer(cfg)
    data = SyntheticData(1)
    image = jnp.asarray(data.images[:1])
    losses = trainer.pretrain_on_prior(image, 0)
    assert float(losses[-1]) < float(losses[0])


@pytest.mark.slow
def test_generalizing_trainer_two_images(tmp_path):
    cfg = dict(CFG)
    cfg["n_epochs_generalized"] = 1
    cfg["n_epochs_prior"] = 2
    cfg["our_nets_ckpts"] = {"VLADE_nets": str(tmp_path / "ckpts")}
    trainer = GeneralizingTrainer(cfg)
    data = SyntheticData(2)
    history = trainer.fit(data, stages=[{"step1": 1, "step2": 1, "step3": 1}],
                          batch_size=2)
    # one record per image (reference logs per-image context,
    # trainer.py:460-465), each carrying the full loss curves
    assert len(history) == 2
    for rec in history:
        assert np.isfinite(rec["loss_step1"])
        assert len(rec["losses_step2"]) == 1
    assert len(history[-1]["losses_step1"]) == 1


def test_chunk_sizes_decomposition():
    t = Trainer.__new__(Trainer)
    t.compile_chunk = 100
    assert t._chunk_sizes(700) == [100] * 7
    assert t._chunk_sizes(250) == [100, 100, 50]
    assert t._chunk_sizes(40) == [40]
    assert t._chunk_sizes(0) == []
    t.compile_chunk = 0
    assert t._chunk_sizes(700) == [700]
    # the reference schedule ({700,700,600} + 3x{200,500,400} + 1000 prior)
    # collapses to 3 distinct scan lengths with the default chunk of 100
    t.compile_chunk = 100
    lengths = {c for n in (700, 600, 200, 500, 400, 1000)
               for c in t._chunk_sizes(n)}
    assert lengths == {100}


@pytest.mark.slow
def test_chunked_prior_matches_unchunked():
    """Chunked scans thread the same (params, opt_state) carry: a [3,3,1]
    decomposition is mathematically the same program as one 7-iteration
    scan."""
    data = SyntheticData(1)
    image = jnp.asarray(data.images[:1])
    results = []
    for chunk in (0, 3):
        cfg = dict(CFG)
        cfg["n_epochs_prior"] = 7
        cfg["compile_chunk"] = chunk
        trainer = Trainer(cfg)
        losses = trainer.pretrain_on_prior(image, 0)
        results.append((np.asarray(losses), trainer.params["depth"]))
    (l_a, p_a), (l_b, p_b) = results
    assert l_a.shape == l_b.shape == (7,)
    np.testing.assert_allclose(l_a, l_b, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_generalizing_prior_zero_epochs_no_crash():
    """n_epochs_prior=0 previously hit an unbound `losses` NameError; with
    zero-iteration step guards the step1-only fit returns nan for the
    skipped steps instead of crashing."""
    cfg = dict(CFG)
    cfg["n_epochs_prior"] = 0
    cfg["n_epochs_generalized"] = 1
    trainer = GeneralizingTrainer(cfg)
    data = SyntheticData(1)
    history = trainer.fit(
        data, stages=[{"step1": 2, "step2": 0, "step3": 0}], batch_size=1)
    assert len(history) == 1
    assert np.isfinite(history[0]["loss_step1"])
    assert np.isnan(history[0]["loss_step2"])
    assert len(history[0]["losses_step1"]) == 2


@pytest.mark.slow
def test_generalizing_data_parallel_sharding():
    """The generalizing mode's batched phases shard the image batch over the
    mesh with replicated params (VERDICT r2 item 5): check placement and a
    working sharded step-1 block on a 2-device mesh."""
    from jax.sharding import PartitionSpec as P
    from gan2shape_tpu.parallel.mesh import make_mesh

    cfg = dict(CFG)
    cfg["n_epochs_prior"] = 2
    cfg["n_epochs_generalized"] = 1
    mesh = make_mesh(2, axis_name="batch")
    trainer = GeneralizingTrainer(cfg, mesh=mesh)

    # params/frozen replicated over the mesh
    for leaf in jax.tree_util.tree_leaves(trainer.params):
        assert leaf.sharding.spec == P()

    data = SyntheticData(2)
    batch = trainer._shard_batch(jnp.asarray(data.images))
    assert batch.sharding.spec == P("batch")
    # odd batch cannot split evenly -> replicated fallback
    odd = trainer._shard_batch(jnp.asarray(data.images[:1]))
    assert odd.sharding.spec == P()

    history = trainer.fit(
        data, stages=[{"step1": 2, "step2": 0, "step3": 0}], batch_size=2)
    assert len(history) == 2
    for rec in history:
        assert np.isfinite(rec["loss_step1"])
    # params remain replicated after the sharded update
    for leaf in jax.tree_util.tree_leaves(trainer.params):
        assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_fit_shuffle_permutes_order():
    cfg = dict(CFG)
    cfg["n_epochs_prior"] = 1
    trainer = Trainer(cfg)
    seen = []

    class Recording(SyntheticData):
        def __getitem__(self, i):
            seen.append(i)
            return super().__getitem__(i)

    data = Recording(5)
    trainer.fit(data, stages=[{"step1": 1, "step2": 0, "step3": 0}],
                shuffle=True)
    assert sorted(seen) == [0, 1, 2, 3, 4]
    assert seen != [0, 1, 2, 3, 4]  # PRNGKey-seeded permutation is not id


@pytest.mark.slow
def test_fit_zero_step2_with_step3():
    """A stage scheduling step2: 0 but step3 > 0 must not crash: the
    zero-length step-2 call still produces the `collected` that step 3
    consumes (previously an unbound-variable NameError under compile
    chunking)."""
    cfg = dict(CFG)
    cfg["n_epochs_prior"] = 1
    trainer = Trainer(cfg)
    data = SyntheticData(1)
    history = trainer.fit(
        data, stages=[{"step1": 1, "step2": 0, "step3": 1}])
    assert len(history) == 1
    assert np.isfinite(history[0]["loss_step1"])
    assert np.isnan(history[0]["loss_step2"])  # no iterations ran
    assert np.isfinite(history[0]["loss_step3"])
    assert len(history[0]["losses_step3"]) == 1
