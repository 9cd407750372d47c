"""Host-side data pipeline: images + per-image GAN w-latents.

Behavioral parity target: /root/reference/GAN2Shape/dataset.py — list.txt CSV
manifest, PIL decode, resize to image_size, scale to [-1, 1]; latents from
`latents/<name>.pt` (torch checkpoint files; a .npy sibling is also accepted
so the pipeline has no hard torch dependency).

Arrays are numpy (N C H W float32); device placement happens at the trainer
boundary.  The optional native C++ prefetcher (gan2shape_tpu/native) overlaps
decode with device compute for large datasets.
"""

import os
from os import path

import numpy as np


def _read_list(root_dir, list_filename):
    list_path = path.join(root_dir, list_filename)
    with open(list_path) as f:
        names = [line.strip().split(",")[0] for line in f if line.strip()]
    return names


def load_image(img_path, image_size):
    from PIL import Image
    with Image.open(img_path) as im:
        im = im.convert("RGB")
        if im.size != (image_size, image_size):
            im = im.resize((image_size, image_size), Image.BILINEAR)
        arr = np.asarray(im, np.float32) / 255.0
    return arr.transpose(2, 0, 1) * 2.0 - 1.0


def load_latent(latent_path):
    npy = latent_path.rsplit(".", 1)[0] + ".npy"
    if path.exists(npy):
        latent = np.load(npy)
    else:
        import torch
        latent = torch.load(latent_path, map_location="cpu",
                            weights_only=False)
        if isinstance(latent, dict):
            if "latent" not in latent:
                latent = latent.popitem()[1]
            latent = latent["latent"]
        latent = latent.detach().numpy()
    latent = np.asarray(latent, np.float32)
    if latent.ndim == 2 and latent.shape[0] == 1:
        latent = latent[0]
    return latent


class ImageDataset:
    """(reference dataset.py:8-30)"""

    def __init__(self, root_dir, list_filename="list.txt", image_size=128,
                 subset=None):
        self.root_dir = root_dir
        self.image_size = image_size
        try:
            self.file_list = _read_list(root_dir, list_filename)
        except FileNotFoundError as e:
            raise FileNotFoundError(
                f"{e}\nDid you forget to run download_data.py?") from e
        if subset is not None:
            self.file_list = [self.file_list[i] for i in subset]

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, index):
        return load_image(path.join(self.root_dir, self.file_list[index]),
                          self.image_size)


class LatentDataset:
    """(reference dataset.py:33-61)"""

    def __init__(self, root_dir, list_filename="list.txt",
                 latent_folder="latents", subset=None):
        self.root_dir = root_dir
        self.latent_folder = latent_folder
        self.file_list = _read_list(root_dir, list_filename)
        if subset is not None:
            self.file_list = [self.file_list[i] for i in subset]

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, index):
        name = self.file_list[index].split(".")[0] + ".pt"
        return load_latent(path.join(self.root_dir, self.latent_folder, name))


class MultiResolutionDataset:
    """Multi-resolution training dataset for the StyleGAN2 trainer
    (behavioral parity target: the reference's LMDB-backed
    MultiResolutionDataset, stylegan2-pytorch/dataset.py:7-40) — backed by
    the native mmap cache (gan2shape_tpu/native) instead of LMDB: one flat
    uint8 CHW record file per resolution (`{path}/{res}.bin`) plus a
    `meta.json`, written by tools/prepare_data.py.  Returns float32 images
    in [-1, 1] (the reference's ToTensor + Normalize(0.5, 0.5))."""

    def __init__(self, root, resolution=256):
        import json
        meta_path = path.join(root, "meta.json")
        try:
            with open(meta_path) as f:
                meta = json.load(f)
        except FileNotFoundError as e:
            raise FileNotFoundError(
                f"{e}\nRun tools/prepare_data.py to build the cache") from e
        if resolution not in meta["sizes"]:
            raise ValueError(f"resolution {resolution} not in prepared "
                             f"sizes {meta['sizes']}")
        from gan2shape_tpu.native import TensorCache
        self.resolution = resolution
        self.length = int(meta["length"])
        self.cache = TensorCache(path.join(root, f"{resolution}.bin"),
                                 self.length,
                                 (3, resolution, resolution), "uint8")

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        return self.cache.get_batch([index])[0]

    def get_batch(self, indices, flip=None):
        """Batched fetch (one native mmap read per record); `flip` is an
        optional boolean mask applying per-sample horizontal flips (the
        reference's RandomHorizontalFlip, train.py:507-513)."""
        batch = self.cache.get_batch(indices)
        if flip is not None:
            batch[flip] = batch[flip][..., ::-1]
        return batch


class ImageLatentDataset:
    """(reference dataset.py:64-79): (image, w_latent, index) triples."""

    def __init__(self, root_dir, list_filename="list.txt", image_size=128,
                 latent_folder="latents", subset=None):
        self.image_dataset = ImageDataset(root_dir, list_filename, image_size,
                                          subset)
        self.latent_dataset = LatentDataset(root_dir, list_filename,
                                            latent_folder, subset)
        assert len(self.image_dataset) == len(self.latent_dataset)

    def __len__(self):
        return len(self.image_dataset)

    def __getitem__(self, index):
        return (self.image_dataset[index], self.latent_dataset[index], index)
