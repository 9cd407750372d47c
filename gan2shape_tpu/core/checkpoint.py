"""Checkpoint I/O for the five trainable nets.

Keeps the reference's per-net, glob-discoverable file contract
(/root/reference/GAN2Shape/model.py:385-445:
 {base}/{category}/{net}_image_{idx}_stage_{stage}_{it}_it_{time}.msgpack)
but backs it with flax msgpack serialization plus a JSON manifest, replacing
the reference's filename-parsing lambdas with structured metadata."""

import datetime
import json
import logging
import os
from glob import glob

import jax
from flax import serialization

log = logging.getLogger(__name__)

NETS = ("lighting", "viewpoint", "depth", "albedo", "offset_encoder")


class CheckpointManager:
    def __init__(self, base_path):
        self.base = base_path

    def _path(self, category, net, img_idx, stage, total_it, stamp):
        return (f"{self.base}/{category}/{net}_image_{img_idx}_stage_"
                f"{stage}_{total_it}_it_{stamp}.msgpack")

    def save(self, params, img_idx, stage, total_it, category):
        """Per-net state dumps + manifest (reference model.py:385-408 —
        including its save-failure-tolerant behavior)."""
        try:
            stamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M")
            os.makedirs(f"{self.base}/{category}", exist_ok=True)
            manifest = {"total_it": int(total_it), "dataset": str(category),
                        "image": str(img_idx), "stage": int(stage),
                        "nets": {}}
            for net in NETS:
                path = self._path(category, net, img_idx, stage, total_it,
                                  stamp)
                with open(path, "wb") as f:
                    f.write(serialization.to_bytes(params[net]))
                manifest["nets"][net] = path
            mpath = (f"{self.base}/{category}/manifest_image_{img_idx}_stage_"
                     f"{stage}_{total_it}_it_{stamp}.json")
            with open(mpath, "w") as f:
                json.dump(manifest, f, indent=1)
        except Exception as e:
            log.error("saving failed (%s)... continuing training", e)

    # -------- discovery (reference model.py:410-445 contract) --------

    def manifests(self, category):
        paths = sorted(glob(f"{self.base}/{category}/manifest_*.json"))
        return [json.load(open(p)) for p in paths]

    def load_manifest(self, manifest, params_template):
        params = dict(params_template)
        for net in NETS:
            with open(manifest["nets"][net], "rb") as f:
                params[net] = serialization.from_bytes(
                    params_template[net], f.read())
        return params

    def load_latest_general(self, category, params_template):
        ms = self.manifests(category)
        if not ms:
            raise FileNotFoundError(
                f"no checkpoints under {self.base}/{category}")
        log.info("resuming from %s", ms[-1]["nets"]["depth"])
        return self.load_manifest(ms[-1], params_template)

    def load_per_image(self, category, params_template):
        """Yield (img_idx, params) per distinct image, latest checkpoint each
        (the reference's `load_from_checkpoints` eval iteration,
        model.py:410-414)."""
        by_image = {}
        for m in self.manifests(category):
            by_image[m["image"]] = m  # sorted() => later timestamps win
        for img, m in sorted(by_image.items()):
            yield img, self.load_manifest(m, params_template)
