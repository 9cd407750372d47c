"""StyleGAN2 training CLI — TPU-native.

Behavioral parity target: the reference's (broken in-repo) trainer CLI
(/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch/train.py:332-526):
same flags, schedules (lazy R1 every d_reg_every, path-length reg every
g_reg_every), adaptive augmentation controller, EMA sample grids every 100
iterations, full-state checkpoints every --ckpt_every.  Data parallelism is
mesh sharding over all local devices (XLA collectives) instead of
DDP/NCCL.

    python tools/prepare_data.py --out data/gan_cache --size 64 images/
    python tools/train_gan.py data/gan_cache --size 64 --batch 16 --augment
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save_grid(images, path, value_range=(-1, 1)):
    """Save a (N, 3, H, W) batch as one PNG grid (the reference's
    utils.save_image, train.py:309-315)."""
    from PIL import Image
    lo, hi = value_range
    imgs = np.clip((np.asarray(images) - lo) / (hi - lo), 0, 1)
    n, c, h, w = imgs.shape
    ncol = max(1, int(np.sqrt(n)))
    nrow = (n + ncol - 1) // ncol
    grid = np.ones((nrow * h, ncol * w, 3), np.float32)
    for i in range(n):
        r, cc = divmod(i, ncol)
        grid[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = \
            imgs[i].transpose(1, 2, 0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((grid * 255 + 0.5).astype(np.uint8)).save(path)


def main():
    parser = argparse.ArgumentParser(description="StyleGAN2 trainer (TPU)")
    parser.add_argument("path", type=str,
                        help="prepared dataset dir (tools/prepare_data.py)")
    parser.add_argument("--iter", type=int, default=800000)
    parser.add_argument("--batch", type=int, default=16,
                        help="global batch size (sharded over the mesh)")
    parser.add_argument("--n_sample", type=int, default=64)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--r1", type=float, default=10)
    parser.add_argument("--path_regularize", type=float, default=2)
    parser.add_argument("--path_batch_shrink", type=int, default=2)
    parser.add_argument("--d_reg_every", type=int, default=16)
    parser.add_argument("--g_reg_every", type=int, default=4)
    parser.add_argument("--mixing", type=float, default=0.9)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint to resume from")
    parser.add_argument("--lr", type=float, default=0.002)
    parser.add_argument("--channel_multiplier", type=int, default=2)
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--augment_p", type=float, default=0,
                        help="fixed augment probability (0 = adaptive)")
    parser.add_argument("--ada_target", type=float, default=0.6)
    parser.add_argument("--ada_length", type=int, default=500 * 1000)
    parser.add_argument("--ada_every", type=int, default=256,
                        help="(reference flag; the controller updates every "
                             "8 D steps as in train.py:157)")
    parser.add_argument("--sample_every", type=int, default=100)
    parser.add_argument("--ckpt_every", type=int, default=10000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out_dir", type=str, default=".")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gan2shape_tpu.core.dataset import MultiResolutionDataset
    from gan2shape_tpu.models.stylegan2_train import StyleGAN2Trainer
    from gan2shape_tpu.models.augment import AdaptiveAugment

    wandb = None
    if args.wandb:
        try:
            import wandb
            wandb.init(project="stylegan 2")
        except ImportError:
            print("wandb not installed; continuing without")
            wandb = None

    dataset = MultiResolutionDataset(args.path, resolution=args.size)
    print(f"dataset: {len(dataset)} images @ {args.size}px")

    trainer = StyleGAN2Trainer(
        size=args.size, style_dim=512, n_mlp=8,
        channel_multiplier=args.channel_multiplier, lr=args.lr,
        r1_weight=args.r1, d_reg_every=args.d_reg_every,
        g_reg_every=args.g_reg_every, mixing=args.mixing,
        path_regularize=args.path_regularize,
        path_batch_shrink=args.path_batch_shrink,
        use_augment=args.augment)

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    state = trainer.init(k_init, batch_size=args.batch)
    start_iter = 0
    ada_p = args.augment_p

    if args.ckpt is not None:
        print("load model:", args.ckpt)
        state, start_iter, saved_p = trainer.load_checkpoint(
            args.ckpt, batch_size=args.batch)
        if args.augment_p == 0:
            ada_p = saved_p

    # data-parallel mesh over every local device; batch must divide evenly
    devices = jax.devices()
    n_dev = max(d for d in range(1, len(devices) + 1)
                if args.batch % d == 0)
    mesh = Mesh(np.array(devices[:n_dev]), ("data",))
    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    print(f"mesh: {n_dev} device(s), {args.batch // n_dev} samples each")

    ada = AdaptiveAugment(args.ada_target, args.ada_length, 8)
    rng = np.random.default_rng(args.seed)
    sample_z = jnp.asarray(
        rng.standard_normal((args.n_sample, 512)).astype(np.float32))

    mean_path = 0.0
    for i in range(start_iter, args.iter):
        idx = rng.integers(0, len(dataset), args.batch)
        flip = rng.random(args.batch) < 0.5
        real = jnp.asarray(dataset.get_batch(idx, flip))
        real = jax.device_put(real, data_sharding)

        key, k1, k2, k3 = jax.random.split(key, 4)
        state, metrics = trainer.train_step(state, real, k1,
                                            jnp.float32(ada_p))
        if args.augment and args.augment_p == 0:
            ada_p = ada.tune(metrics["real_sign_sum"], args.batch)

        r1_val = path_val = 0.0
        if i % args.d_reg_every == 0:
            state, r1 = trainer.d_reg_step(state, real, k2,
                                           jnp.float32(ada_p))
            r1_val = float(r1)
        if i % args.g_reg_every == 0:
            state, pmetrics = trainer.g_reg_step(state, k3)
            path_val = float(pmetrics["path_loss"])
            mean_path = float(pmetrics["mean_path_length"])

        if i % 10 == 0:
            print(f"iter {i}: d: {float(metrics['d_loss']):.4f}; "
                  f"g: {float(metrics['g_loss']):.4f}; r1: {r1_val:.4f}; "
                  f"path: {path_val:.4f}; mean path: {mean_path:.4f}; "
                  f"augment: {ada_p:.4f}")
        if wandb is not None:
            wandb.log({"Generator": float(metrics["g_loss"]),
                       "Discriminator": float(metrics["d_loss"]),
                       "Augment": ada_p, "Rt": ada.r_t_stat, "R1": r1_val,
                       "Path Length Regularization": path_val,
                       "Mean Path Length": mean_path,
                       "Real Score": float(metrics["real_score"]),
                       "Fake Score": float(metrics["fake_score"])})

        if i % args.sample_every == 0:
            sample = trainer.sample_ema(state, sample_z)
            save_grid(sample,
                      os.path.join(args.out_dir, "sample",
                                   f"{str(i).zfill(6)}.png"))
        if i % args.ckpt_every == 0:
            trainer.save_checkpoint(
                state,
                os.path.join(args.out_dir, "checkpoint",
                             f"{str(i).zfill(6)}.msgpack"),
                iteration=i, ada_p=ada_p)

    print("Done!")


if __name__ == "__main__":
    main()
