"""Prepare a multi-resolution image cache for GAN training.

Behavioral parity target: the reference's prepare_data.py
(/root/reference/GAN2Shape/stylegan2/stylegan2-pytorch/prepare_data.py:1-101):
walk an image folder, LANCZOS-resize + center-crop each image to every
requested size, and store the results keyed by (size, index).  The LMDB +
JPEG-bytes store is replaced by the framework's native mmap cache (flat
uint8 CHW records per resolution + meta.json — no lmdb dependency, zero-copy
reads through gan2shape_tpu/native/src/cache.cpp), consumed by
core.dataset.MultiResolutionDataset and tools/train_gan.py.

    python tools/prepare_data.py --out data/gan_cache --size 64,128 \
        --n_worker 8 path/to/images
"""

import argparse
import json
import multiprocessing
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}


def find_images(root):
    """Sorted recursive image listing (the reference sorts
    ImageFolder.imgs by path, prepare_data.py:48)."""
    files = []
    for dirpath, _, names in os.walk(root):
        for name in names:
            if os.path.splitext(name)[1].lower() in IMG_EXTS:
                files.append(os.path.join(dirpath, name))
    return sorted(files)


def resize_and_convert(img, size, resample):
    """LANCZOS resize shortest-side + center crop (prepare_data.py:13-20),
    returning CHW uint8."""
    from PIL import Image
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((max(size, round(w * scale)),
                      max(size, round(h * scale))), resample)
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, np.uint8).transpose(2, 0, 1)


def resize_worker(item, sizes, resample):
    from PIL import Image
    i, file = item
    with Image.open(file) as img:
        img = img.convert("RGB")
        out = [resize_and_convert(img, size, resample) for size in sizes]
    return i, out


def prepare(out_dir, files, n_worker, sizes, resample):
    os.makedirs(out_dir, exist_ok=True)
    n = len(files)
    # preallocate the flat record files, then write each record at its
    # index offset (workers may complete out of order)
    outs = {}
    for size in sizes:
        f = open(os.path.join(out_dir, f"{size}.bin"), "wb+")
        f.truncate(n * 3 * size * size)
        outs[size] = f

    work = list(enumerate(files))
    fn = partial(resize_worker, sizes=sizes, resample=resample)
    done = 0
    if n_worker > 1:
        pool = multiprocessing.Pool(n_worker)
        it = pool.imap_unordered(fn, work)
    else:
        pool = None
        it = map(fn, work)
    for i, imgs in it:
        for size, img in zip(sizes, imgs):
            outs[size].seek(i * 3 * size * size)
            outs[size].write(img.tobytes())
        done += 1
        if done % 100 == 0 or done == n:
            print(f"\r{done}/{n}", end="", flush=True)
    print()
    if pool is not None:
        pool.close()
        pool.join()
    for f in outs.values():
        f.close()
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"length": n, "sizes": sizes, "layout": "chw_uint8"}, f)


def main():
    from PIL import Image
    parser = argparse.ArgumentParser(
        description="Preprocess images for GAN training")
    parser.add_argument("--out", type=str, required=True,
                        help="output cache directory")
    parser.add_argument("--size", type=str, default="128,256,512,1024",
                        help="comma-separated resolutions")
    parser.add_argument("--n_worker", type=int, default=8)
    parser.add_argument("--resample", type=str, default="lanczos",
                        choices=["lanczos", "bilinear"])
    parser.add_argument("path", type=str, help="path to the image folder")
    args = parser.parse_args()

    resample = {"lanczos": Image.LANCZOS,
                "bilinear": Image.BILINEAR}[args.resample]
    sizes = [int(s.strip()) for s in args.size.split(",")]
    files = find_images(args.path)
    if not files:
        raise SystemExit(f"no images under {args.path}")
    print(f"Make dataset of image sizes: {', '.join(map(str, sizes))} "
          f"({len(files)} images)")
    prepare(args.out, files, args.n_worker, sizes, resample)


if __name__ == "__main__":
    main()
