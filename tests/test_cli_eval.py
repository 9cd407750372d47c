"""Script-level smoke test: train briefly, save reference-style checkpoints,
then run the evaluate_results pipeline end-to-end (checkpoint discovery,
reconstruction, masking, plots, loss recording) on synthetic data."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


def test_eval_pipeline_end_to_end(tmp_path, monkeypatch, rng):
    from PIL import Image

    cat = "face"
    data_dir = tmp_path / "data" / cat
    os.makedirs(data_dir / "latents")
    img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    Image.fromarray(img).save(data_dir / "img0.png")
    with open(data_dir / "list.txt", "w") as f:
        f.write("img0.png\n")
    np.save(data_dir / "latents" / "img0.npy",
            rng.standard_normal(512).astype(np.float32))

    cfg = {
        "image_size": 64, "gan_size": 32, "z_dim": 512,
        "channel_multiplier": 1, "category": cat, "disc_ftr_num": 3,
        "n_epochs_prior": 2, "n_proj_samples": 2, "prior_name": "box",
        "rot_center_depth": 1.0, "fov": 10, "raster_mode": "scatter",
        "root_path": str(tmp_path / "data"),
        "our_nets_ckpts": {"VLADE_nets": str(tmp_path / "ckpts")},
    }

    # --- short training run with checkpoint saving ---
    from gan2shape_tpu.core.trainer import Trainer
    from gan2shape_tpu.core.dataset import ImageLatentDataset

    monkeypatch.chdir(tmp_path)
    trainer = Trainer(cfg, save_ckpts=True)
    data = ImageLatentDataset(str(data_dir), image_size=64)
    trainer.fit(data, stages=[{"step1": 1, "step2": 1, "step3": 1}])

    # --- evaluation pipeline (what evaluate_results.py drives) ---
    from gan2shape_tpu.core.model import GAN2Shape
    from gan2shape_tpu.core.checkpoint import CheckpointManager
    from gan2shape_tpu.core.masking import make_masking_model
    from gan2shape_tpu.utils import plotting

    model = GAN2Shape(cfg)
    frozen = trainer.frozen
    template = model.init_params(jax.random.PRNGKey(0))
    mgr = CheckpointManager(cfg["our_nets_ckpts"]["VLADE_nets"])
    masker = make_masking_model(cat, 64)

    found = list(mgr.load_per_image(cat, template))
    assert len(found) == 1
    img_idx, params = found[0]

    image = jnp.asarray(data[0][0])[None]
    recon_im, recon_depth = model.evaluate_results(params, frozen, image)
    assert recon_im.shape == (1, 3, 64, 64)

    mask = masker.image_mask(np.asarray(image))
    depth_masked = np.where(np.asarray(mask).reshape(64, 64) > 0.5,
                            np.asarray(recon_depth[0]), np.nan)
    plotting.plot_reconstructions(np.asarray(recon_im),
                                  np.asarray(recon_depth), im_idx="0")
    plotting.plot_3d_depth(depth_masked, image=np.asarray(image[0]),
                           img_idx=0, n_frames=2)
    assert os.path.exists("results/plots/depth3d_0.gif")

    # --record-loss protocol
    loss, _ = model.forward_step1(params, frozen, image)
    stats = plotting.plot_loss_distribution([float(loss)])
    assert np.isfinite(stats[0])
