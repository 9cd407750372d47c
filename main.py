"""CLI runner (parity target: /root/reference/main.py).

    python main.py --category face --save-ckpts
    python main.py --category car --prior smoothed_box --generalize
    python main.py --category face --images 0 1 2

Differences from the reference: runs on TPU/CPU via JAX (no CUDA gate);
`--n-instances K` trains K instances in parallel across the device mesh
(instance sharding — a capability the reference lacks); frozen GAN / LPIPS /
MVN assets are converted on the fly from the reference checkpoint files when
present, else random-initialized with a warning.
"""

import argparse
import logging
import time
from os import path

from gan2shape_tpu.utils.config import load_config, create_results_folder

log = logging.getLogger(__name__)


def build_frozen_assets(model, config):
    from gan2shape_tpu.convert.torch2jax import build_frozen, convert_mvn
    import jax

    gan_ckpt = config.get("gan_ckpt_path")
    gan_ckpt = gan_ckpt if gan_ckpt and path.exists(gan_ckpt) else None
    if gan_ckpt is None:
        log.warning("GAN checkpoint not found — using random weights "
                    "(run download_data.py for the reference assets)")
    vgg = config.get("vgg_ckpt_path", "checkpoints/vgg/vgg16.pth")
    lp = config.get("lpips_ckpt_path", "checkpoints/lpips/vgg.pth")
    frozen = build_frozen(
        model, gan_ckpt_path=gan_ckpt,
        vgg_path=vgg if path.exists(vgg) else None,
        lpips_path=lp if path.exists(lp) else None,
        key=jax.random.PRNGKey(7))
    vm, lm = config.get("view_mvn_path"), config.get("light_mvn_path")
    if vm and path.exists(vm) and lm and path.exists(lm):
        model.set_samplers(convert_mvn(vm), convert_mvn(lm))
    else:
        log.warning("view/light MVN stats not found — using neutral sampler")
    return frozen


def main():
    parser = argparse.ArgumentParser(
        description="Run GAN 2D-to-3D shape recovery (TPU-native)")
    parser.add_argument("--config-file", dest="CONFIG", default="config.yml")
    parser.add_argument("--category", dest="CATEGORY", default=None)
    parser.add_argument("--prior", dest="PRIOR", default=None)
    parser.add_argument("--wandb", dest="WANDB", action="store_true")
    parser.add_argument("--save-ckpts", dest="SAVE_CKPTS",
                        action="store_true")
    parser.add_argument("--debug", dest="DEBUG", action="store_true")
    parser.add_argument("--log-file", dest="LOG_FILE", default=None)
    parser.add_argument("--load-pretrained", dest="LOAD_PRETRAINED",
                        action="store_true")
    parser.add_argument("--generalize", dest="GENERALIZE",
                        action="store_true")
    parser.add_argument("--images", dest="IMAGES", action="append", type=int,
                        default=None, nargs="+")
    parser.add_argument("--n-instances", dest="N_INSTANCES", type=int,
                        default=0,
                        help="train this many instances in parallel across "
                             "the device mesh (0 = sequential reference "
                             "behavior)")
    parser.add_argument("--distributed", dest="DISTRIBUTED",
                        action="store_true",
                        help="join a multi-host runtime (coordinates from "
                             "G2S_COORDINATOR/G2S_NUM_PROCESSES/"
                             "G2S_PROCESS_ID, or TPU-pod autodetection); "
                             "the env vars alone also activate it")
    args = parser.parse_args()

    logging.basicConfig(
        filename=args.LOG_FILE,
        format="%(asctime)s %(levelname)-8s %(message)s", level=logging.INFO)

    # must run before any backend-initializing JAX call
    from gan2shape_tpu.parallel import distributed
    if args.DISTRIBUTED:
        import os
        os.environ.setdefault("G2S_MULTIHOST", "1")
    distributed.initialize_from_env()

    config = load_config(category=args.CATEGORY,
                         config_file=None if args.CATEGORY else args.CONFIG,
                         overrides={"prior_name": args.PRIOR})
    category = config.get("category")

    if args.WANDB:
        try:
            import wandb
            wandb.init(project="gan-2d-to-3d-tpu", config=config)
        except ImportError:
            log.warning("wandb not installed; continuing without")

    create_results_folder()

    from gan2shape_tpu.core.dataset import ImageLatentDataset
    from gan2shape_tpu.core.trainer import Trainer, GeneralizingTrainer2

    data_folder = path.join(config.get("root_path"), category)
    subset = args.IMAGES
    if subset is not None:
        subset = [i for lst in subset for i in lst]
    images_latents = ImageLatentDataset(
        data_folder, image_size=config.get("image_size"), subset=subset)

    load_dict = None
    if args.LOAD_PRETRAINED:
        # stage/iteration/time come from the config like the reference
        # (main.py:111-113) — glob-style selectors, default "*"
        load_dict = {"category": category,
                     "base_path": config.get("our_nets_ckpts")["VLADE_nets"],
                     "stage": config.get("stage", "*"),
                     "iteration": config.get("iteration", "*"),
                     "time": config.get("time", "*")}

    if not args.SAVE_CKPTS:
        print(">>> Warning, not saving checkpoints. "
              "Rerun with --save-ckpts for a real run <<<")
        time.sleep(0.5)

    if args.GENERALIZE:
        stages = [{"step1": 13, "step2": 22, "step3": 18}]
        trainer_cls = GeneralizingTrainer2
    else:
        stages = [{"step1": 700, "step2": 700, "step3": 600},
                  {"step1": 200, "step2": 500, "step3": 400},
                  {"step1": 200, "step2": 500, "step3": 400},
                  {"step1": 200, "step2": 500, "step3": 400}]
        trainer_cls = Trainer

    if args.N_INSTANCES > 0 and not args.GENERALIZE:
        import numpy as np
        from gan2shape_tpu.core.model import GAN2Shape
        from gan2shape_tpu.core.priors import PriorGenerator
        from gan2shape_tpu.parallel import InstanceParallelTrainer

        n = min(args.N_INSTANCES, len(images_latents))
        model = GAN2Shape(config)
        frozen = build_frozen_assets(model, config)
        trainer = InstanceParallelTrainer(config, n_instances=n,
                                          frozen=frozen, model=model,
                                          save_ckpts=args.SAVE_CKPTS)
        pg = PriorGenerator(config.get("image_size"), category,
                            config.get("prior_name", "ellipsoid"))
        ims, lats, prs, idxs = [], [], [], []
        for i in range(n):
            im, lat, idx = images_latents[i]
            ims.append(im)
            lats.append(lat)
            prs.append(pg(im)[0])
            idxs.append(int(idx))
        trainer.fit(np.stack(ims), np.stack(lats), np.stack(prs),
                    stages=stages, data_indices=idxs)
        return

    trainer = trainer_cls(config, debug=args.DEBUG, plot_intermediate=True,
                          log_wandb=args.WANDB, save_ckpts=args.SAVE_CKPTS,
                          load_dict=load_dict)
    trainer.frozen = build_frozen_assets(trainer.model, config)
    trainer.fit(images_latents, stages=stages,
                batch_size=config.get("batch_size", 2))


if __name__ == "__main__":
    main()
