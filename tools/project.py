"""Image-to-latent projector CLI.

Behavioral parity target: the reference projector CLI
(/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch/projector.py:75-251):
same flags, same outputs — per-image `<name>-project.png` re-syntheses and a
`latents/<first-image>.pt`-style result file holding image/latent/noise per
input (saved as .npz here; core.dataset.load_latent reads the .npy latent
sibling written alongside, so projected latents plug straight into the
GAN2Shape pipeline).

    python tools/project.py --ckpt checkpoint.pt --size 128 img1.png img2.png
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.generate import load_generator, save_png  # noqa: E402


def load_image(path, size):
    """Resize-shortest-side + center crop + [-1, 1] (projector.py:131-140)."""
    from PIL import Image
    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        scale = size / min(w, h)
        im = im.resize((max(size, round(w * scale)),
                        max(size, round(h * scale))), Image.LANCZOS)
        w, h = im.size
        left, top = (w - size) // 2, (h - size) // 2
        im = im.crop((left, top, left + size, top + size))
        arr = np.asarray(im, np.float32) / 255.0
    return arr.transpose(2, 0, 1) * 2.0 - 1.0


def main():
    parser = argparse.ArgumentParser(
        description="Image projector to the generator latent spaces")
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--channel_multiplier", type=int, default=2)
    parser.add_argument("--lr_rampup", type=float, default=0.05)
    parser.add_argument("--lr_rampdown", type=float, default=0.25)
    parser.add_argument("--lr", type=float, default=0.1)
    parser.add_argument("--noise", type=float, default=0.05)
    parser.add_argument("--noise_ramp", type=float, default=0.75)
    parser.add_argument("--step", type=int, default=1000)
    parser.add_argument("--noise_regularize", type=float, default=1e5)
    parser.add_argument("--mse", type=float, default=0)
    parser.add_argument("--w_plus", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lpips_ckpt", type=str,
                        default="checkpoints/lpips/vgg.pth")
    parser.add_argument("--vgg_ckpt", type=str,
                        default="checkpoints/vgg/vgg16.pth")
    parser.add_argument("files", metavar="FILES", nargs="+")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from gan2shape_tpu.models.lpips import LPIPS
    from gan2shape_tpu.projector import Projector

    resize = min(args.size, 256)
    imgs = np.stack([load_image(f, resize) for f in args.files])

    gen, g_params = load_generator(args.ckpt, args.size,
                                   args.channel_multiplier, len(imgs))

    lpips = LPIPS()
    if os.path.exists(args.vgg_ckpt) and os.path.exists(args.lpips_ckpt):
        from gan2shape_tpu.convert.torch2jax import (load_torch_file,
                                                     convert_lpips)
        lp_params = convert_lpips(load_torch_file(args.vgg_ckpt),
                                  load_torch_file(args.lpips_ckpt))
    else:
        print(">>> LPIPS weights not found — random-feature perceptual "
              "distance (run download_data.py for the real assets) <<<")
        lp_params = lpips.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, 3, resize, resize)),
                               jnp.zeros((1, 3, resize, resize)))

    proj = Projector(gen, g_params, lpips, lp_params, w_plus=args.w_plus,
                     lr=args.lr, noise=args.noise,
                     noise_ramp=args.noise_ramp,
                     noise_regularize_weight=args.noise_regularize,
                     mse_weight=args.mse, lr_rampup=args.lr_rampup,
                     lr_rampdown=args.lr_rampdown)

    def report(rec):
        print(f"step {rec['step']}: perceptual: {rec['perceptual']:.4f}; "
              f"noise regularize: {rec['noise_regularize']:.6f}; "
              f"mse: {rec['mse']:.4f}; lr: {rec['lr']:.4f}")

    result = proj.project(jax.random.PRNGKey(args.seed), imgs,
                          steps=args.step, progress=report)

    # outputs (projector.py:227-251): latents dir next to the first input
    out_dir = os.path.join(os.path.dirname(args.files[0]) or ".", "latents")
    os.makedirs(out_dir, exist_ok=True)
    latent = np.asarray(result["latent"])
    image = np.asarray(result["image"])
    payload = {}
    for i, input_name in enumerate(args.files):
        stem = os.path.splitext(os.path.basename(input_name))[0]
        save_png(image[i], f"{stem}-project.png")
        payload[f"{stem}_latent"] = latent[i]
        payload[f"{stem}_img"] = image[i]
        # .npy latent consumable by core.dataset.load_latent
        np.save(os.path.join(
            out_dir, os.path.basename(input_name) + ".npy"), latent[i])
    for k, nz in enumerate(result["noises"]):
        payload[f"noise_{k}"] = np.asarray(nz)
    np.savez(os.path.join(
        out_dir, os.path.basename(args.files[0]) + ".npz"), **payload)
    print("saved latents to", out_dir)


if __name__ == "__main__":
    main()
