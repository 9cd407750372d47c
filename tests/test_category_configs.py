"""Non-face category smoke: the gan_size > image_size path.

Cat/church configs synthesize at GAN-native 256 and train at image 128
(configs/cat.yml, reference minimal_config.yml:4): step 2 resizes the
synthesized and inverted images DOWN (area mode), and the discriminator is
built at gan_size while being fed image_size inputs through the ftr_num
early-exit (reference model.py:217-219).  All other tests run the
gan_size <= image_size direction; this drives the downscale direction
through a full stage at CPU-affordable sizes with the cat ratio (2:1) and
its n_proj/channel settings.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gan2shape_tpu.core.trainer import Trainer

CAT_LIKE = {
    # cat.yml structure at 1/2 scale: gan native 2x the training size
    # (image_size must be 64 or 128 — the OffsetEncoder's supported sizes,
    # reference networks.py:207)
    # z_dim must be 512: the OffsetEncoder emits a fixed 512-dim w-offset
    # (reference networks.py Table 7), as in every reference category config
    "image_size": 64, "gan_size": 128, "z_dim": 512,
    "channel_multiplier": 1, "category": "cat",
    "n_proj_samples": 4, "n_epochs_prior": 2, "learning_rate": 1e-4,
    "prior_name": "box", "rot_center_depth": 1.0, "fov": 10,
    "disc_ftr_num": 3, "raster_mode": "scatter",
}


@pytest.mark.slow
def test_cat_like_stage_runs():
    trainer = Trainer(CAT_LIKE)
    rng = np.random.default_rng(0)
    data = [(jnp.asarray(rng.uniform(-1, 1, (3, 64, 64)).astype(np.float32)),
             jnp.asarray(rng.standard_normal(512).astype(np.float32)), 0)]
    history = trainer.fit(data,
                          stages=[{"step1": 2, "step2": 2, "step3": 2}])
    assert len(history) == 1
    for k in ("loss_step1", "loss_step2", "loss_step3"):
        assert np.isfinite(history[0][k]), k
    recon_im, recon_depth = trainer.evaluate(
        jnp.asarray(rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)))
    assert recon_im.shape == (1, 3, 64, 64)
    assert np.isfinite(np.asarray(recon_depth)).all()
