"""Evaluation runner (parity target: /root/reference/evaluate_results.py).

    python evaluate_results.py --category face
    python evaluate_results.py --category face --record-loss
    python evaluate_results.py --category face --general

Loads per-image (or latest general) checkpoints, reconstructs each image,
writes reconstruction/depth plots, a rotating 3D surface per image, and —
with --record-loss — the step-1 reconstruction-loss distribution (mean/std +
box plot, the reference's only quantitative protocol)."""

import argparse
import logging

import numpy as np

log = logging.getLogger(__name__)


def main():
    parser = argparse.ArgumentParser(description="Evaluate GAN-2D-to-3D")
    parser.add_argument("--category", dest="CATEGORY", default="face")
    parser.add_argument("--config-file", dest="CONFIG", default=None)
    parser.add_argument("--general", dest="GENERAL", action="store_true",
                        help="use the latest general checkpoint for all "
                             "images instead of per-image checkpoints")
    parser.add_argument("--record-loss", dest="RECORD_LOSS",
                        action="store_true")
    parser.add_argument("--images", dest="IMAGES", action="append", type=int,
                        default=None, nargs="+")
    parser.add_argument("--stage", dest="STAGE", default="*",
                        help="glob selector on the checkpoint stage "
                             "(reference config key `stage`, main.py:111)")
    parser.add_argument("--iteration", dest="ITERATION", default="*",
                        help="glob selector on the checkpoint iteration "
                             "count (reference config key `iteration`)")
    parser.add_argument("--time", dest="TIME", default="*",
                        help="glob selector on the checkpoint timestamp "
                             "(reference config key `time`)")
    parser.add_argument("--gallery", dest="GALLERY", action="store_true",
                        help="assemble all per-image artifacts into "
                             "results/index.html (the reference's "
                             "docs/index.html gallery)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax.numpy as jnp
    from os import path
    from gan2shape_tpu.utils.config import (load_config,
                                            create_results_folder)
    from gan2shape_tpu.utils import plotting
    from gan2shape_tpu.core.dataset import ImageDataset
    from gan2shape_tpu.core.model import GAN2Shape
    from gan2shape_tpu.core.checkpoint import CheckpointManager
    from gan2shape_tpu.core.masking import make_masking_model
    from main import build_frozen_assets
    import jax

    config = load_config(category=args.CATEGORY, config_file=args.CONFIG)
    create_results_folder()

    subset = args.IMAGES
    if subset is not None:
        subset = [i for lst in subset for i in lst]
    dataset = ImageDataset(path.join(config["root_path"], args.CATEGORY),
                           image_size=config["image_size"], subset=subset)

    model = GAN2Shape(config)
    frozen = build_frozen_assets(model, config)
    params_template = model.init_params(jax.random.PRNGKey(0))
    mgr = CheckpointManager(config["our_nets_ckpts"]["VLADE_nets"])
    masker = make_masking_model(args.CATEGORY, config["image_size"])

    losses = []
    sel = dict(stage=args.STAGE, iteration=args.ITERATION, time=args.TIME)
    if args.GENERAL:
        params = mgr.load_latest_general(args.CATEGORY, params_template,
                                         **sel)
        pairs = ((i, params) for i in range(len(dataset)))
    else:
        pairs = ((int(img), p) for img, p in
                 mgr.load_per_image(args.CATEGORY, params_template, **sel))

    originals, recons = [], []
    for img_idx, params in pairs:
        image = jnp.asarray(dataset[img_idx])[None]
        recon_im, recon_depth = model.evaluate_results(params, frozen, image)
        plotting.plot_reconstructions(recon_im, recon_depth,
                                      im_idx=str(img_idx))
        originals.append(np.asarray(image[0]))
        recons.append(np.asarray(recon_im[0]))

        # mask the depth background with NaNs (reference
        # evaluate_results.py:103 + model.py:545-548)
        depth = np.asarray(recon_depth[0])
        mask = np.asarray(masker.image_mask(np.asarray(image))) \
            .reshape(-1, depth.shape[0], depth.shape[1])[0]
        depth_masked = np.where(mask > 0.5, depth, np.nan)
        plotting.plot_3d_depth(depth_masked, image=np.asarray(image[0]),
                               img_idx=img_idx)

        if args.RECORD_LOSS:
            loss, _ = model.forward_step1(params, frozen, image)
            losses.append(float(loss))
            log.info("image %d step-1 loss: %.5f", img_idx, losses[-1])

    if originals:
        plotting.plot_originals_v_reconstructions(originals, recons)

    if args.RECORD_LOSS and losses:
        stats = plotting.plot_loss_distribution(losses)
        np.save("results/step1_losses.npy", np.asarray(losses))
        print(f"step-1 loss mean={np.mean(losses):.5f} "
              f"std={np.std(losses):.5f} over {len(losses)} images")

    if args.GALLERY:
        out = plotting.make_gallery()
        if out:
            print(f"gallery written to {out}")


if __name__ == "__main__":
    main()
