"""Sample images (+ their w latents) from a trained StyleGAN2 generator.

Behavioral parity target: the reference's generate.py
(/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch/generate.py:1-72):
draw z ~ N(0,1), map to w, synthesize with truncation toward the mean
latent, save each image to {save_path}/{count:06d}.png and its TRUNCATED w
latent to {save_path}/latents/{count:06d} (generate.py:20,30 — the saved
latent is mean + t*(w - mean), the exact convention the GAN2Shape dataset
consumes).  Latents are saved as .npy (core.dataset.load_latent accepts the
.npy sibling convention).

Accepts either a reference torch checkpoint (.pt with a 'g_ema' key) or a
trainer checkpoint from tools/train_gan.py (.msgpack).

    python tools/generate.py --ckpt checkpoint/000000.msgpack --size 64 \
        --pics 20 --truncation 0.7
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_generator(ckpt_path, size, channel_multiplier, batch):
    """Returns (generator module, g_ema params)."""
    from gan2shape_tpu.models.stylegan2 import Generator
    if ckpt_path.endswith(".pt") or ckpt_path.endswith(".pth"):
        from gan2shape_tpu.convert.torch2jax import (load_torch_file,
                                                     convert_generator)
        ckpt = load_torch_file(ckpt_path)
        params, _ = convert_generator(ckpt["g_ema"], n_mlp=8)
        gen = Generator(size=size, style_dim=512, n_mlp=8,
                        channel_multiplier=channel_multiplier)
        return gen, params
    from gan2shape_tpu.models.stylegan2_train import StyleGAN2Trainer
    trainer = StyleGAN2Trainer(size=size, style_dim=512, n_mlp=8,
                               channel_multiplier=channel_multiplier)
    state, _, _ = trainer.load_checkpoint(ckpt_path, batch_size=batch)
    return trainer.generator, state.g_ema


def save_png(img_chw, path):
    from PIL import Image
    arr = np.clip((np.asarray(img_chw) + 1) * 0.5, 0, 1)
    arr = (arr.transpose(1, 2, 0) * 255 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def main():
    parser = argparse.ArgumentParser(description="Generate GAN samples")
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--sample", type=int, default=1,
                        help="samples per batch")
    parser.add_argument("--pics", type=int, default=20,
                        help="number of batches")
    parser.add_argument("--truncation", type=float, default=0.7)
    parser.add_argument("--truncation_mean", type=int, default=4096)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--channel_multiplier", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--save_path", type=str, default="sample")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    os.makedirs(os.path.join(args.save_path, "latents"), exist_ok=True)

    gen, params = load_generator(args.ckpt, args.size,
                                 args.channel_multiplier, args.sample)
    key = jax.random.PRNGKey(args.seed)

    mean_latent = None
    if args.truncation < 1:
        key, km = jax.random.split(key)
        mean_latent = gen.apply(params, km, args.truncation_mean,
                                method="mean_latent")

    # deterministic per-run noise buffers (the reference's stored noises)
    key, kn = jax.random.split(key)
    noise = gen.apply(params, kn, method="make_noise")

    @jax.jit
    def synth(z):
        w = gen.apply(params, z, method="style_forward")
        img, _ = gen.apply(params, [w], noise, input_is_w=True,
                           truncation=args.truncation,
                           truncation_latent=mean_latent)
        # the saved latent is the truncated w (generate.py:20)
        w_out = w if mean_latent is None else \
            mean_latent + args.truncation * (w - mean_latent)
        return img, w_out

    count = 0
    for i in range(args.pics):
        key, kz = jax.random.split(key)
        z = jax.random.normal(kz, (args.sample, 512))
        img, w = synth(z)
        img = np.asarray(img)
        w = np.asarray(w)
        for j in range(args.sample):
            stem = str(count).zfill(6)
            save_png(img[j], os.path.join(args.save_path, f"{stem}.png"))
            np.save(os.path.join(args.save_path, "latents", f"{stem}.npy"),
                    w[j])
            count += 1
        print(f"\r{count}/{args.pics * args.sample}", end="", flush=True)
    print()


if __name__ == "__main__":
    main()
