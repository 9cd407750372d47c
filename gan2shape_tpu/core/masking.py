"""Segmentation-backed masking (parity target:
/root/reference/GAN2Shape/model.py:473-551 MaskingModel).

face -> BiSeNet face parser (19 classes, input 512²);
other categories -> PSPNet-50 (21 VOC classes, input 473²).

Masks are host-side preprocessing for priors/eval, so the mask logic runs in
numpy around a jitted network forward.  Weights convert from the reference's
checkpoints (checkpoints/parsing/{bisenet,pspnet_voc}.pth) when present;
construction raises otherwise so PriorGenerator can fall back.
"""

import logging
from os import path

import numpy as np
import jax
import jax.numpy as jnp

from gan2shape_tpu.models.segmentation import PSPNet, BiSeNet
from gan2shape_tpu.ops.resize import resize

log = logging.getLogger(__name__)

CATEGORIES = ["aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
              "car", "cat", "chair", "cow", "diningtable", "dog",
              "horse", "motorbike", "person", "pottedplant",
              "sheep", "sofa", "train", "tvmonitor"]
CATEGORY2NUMBER = {c: i + 1 for i, c in enumerate(CATEGORIES)}


class MaskingModel:
    def __init__(self, category, image_size=128, ckpt_dir="checkpoints/parsing",
                 params=None):
        self.category = category
        self.image_size = image_size
        self.net_size = 512 if category == "face" else 473
        if category == "face":
            self.net = BiSeNet(n_classes=19)
            ckpt = path.join(ckpt_dir, "bisenet.pth")
        else:
            self.net = PSPNet(classes=21)
            ckpt = path.join(ckpt_dir, "pspnet_voc.pth")

        if params is not None:
            self.params = params
        elif path.exists(ckpt):
            from gan2shape_tpu.convert.torch2jax import (
                load_torch_file, convert_bisenet, convert_pspnet)
            sd = load_torch_file(ckpt)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            self.params = (convert_bisenet(sd) if category == "face"
                           else convert_pspnet(sd))
            log.info("loaded segmentation weights from %s", ckpt)
        else:
            raise FileNotFoundError(f"no segmentation checkpoint at {ckpt}")

        self._forward = jax.jit(
            lambda x: self.net.apply(self.params, x))

    def _logits(self, image):
        image = jnp.asarray(np.asarray(image, np.float32))
        if image.ndim == 3:
            image = image[None]
        image = resize(image, (self.net_size, self.net_size))
        return np.asarray(self._forward(image))

    def confidence_mask(self, image, depth=None):
        """Soft [0,1] mask (reference model.py:495-517)."""
        out = self._logits(image)
        if self.category in CATEGORIES:
            n = CATEGORY2NUMBER[self.category]
            mask = out[:, n:n + 1]
        elif self.category == "face":
            mask = out[:, 1:13].sum(1, keepdims=True)
        else:
            mask = np.ones_like(out[:, 0:1])
        mask = mask - mask.min()
        mask = mask / max(mask.max(), 1e-12)
        return np.asarray(resize(jnp.asarray(mask),
                                 (self.image_size, self.image_size)))[0]

    def image_mask(self, image, depth=None):
        """Hard mask; with `depth`, NaN out the background at net resolution
        (reference model.py:519-551)."""
        out = self._logits(image)
        if self.category in CATEGORIES:
            lab = out.argmax(1, keepdims=True)
            mask = lab == CATEGORY2NUMBER[self.category]
        elif self.category == "face":
            out = np.concatenate([out[:, :17], out[:, 18:]], 1)
            lab = out.argmax(1, keepdims=True)
            mask_all = (lab >= 1) == (lab != 16)
            mask_face = (lab >= 1) == (lab <= 13)
            mask = mask_all & mask_face
        else:
            mask = np.ones_like(out[:, 0:1], bool)
        if not mask.any():
            log.warning("did not find any %s in image", self.category)
            mask = np.ones_like(mask)
        if depth is not None:
            depth = np.asarray(resize(jnp.asarray(np.asarray(depth)),
                                      (self.net_size, self.net_size)))
            depth = depth.copy()
            depth[~mask[0]] = np.nan
            mask = depth
        mask = mask.astype(np.float32)
        return np.asarray(resize(jnp.asarray(mask),
                                 (self.image_size, self.image_size)))[0]


def make_masking_model(category, image_size=128, **kw):
    """MaskingModel if segmentation weights exist, else the deterministic
    fallback from core.priors."""
    try:
        return MaskingModel(category, image_size, **kw)
    except Exception as e:
        from gan2shape_tpu.core.priors import FallbackMasker
        log.warning("segmentation masker unavailable (%s); using fallback", e)
        return FallbackMasker(image_size)
