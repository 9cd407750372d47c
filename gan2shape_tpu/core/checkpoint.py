"""Checkpoint I/O for the five trainable nets.

Keeps the reference's per-net, glob-discoverable file contract
(/root/reference/GAN2Shape/model.py:385-445:
 {base}/{category}/{net}_image_{idx}_stage_{stage}_{it}_it_{time}.msgpack)
but backs it with flax msgpack serialization plus a JSON manifest, replacing
the reference's filename-parsing lambdas with structured metadata.

Selection contract (reference main.py:111-113 + model.py:429-445): resume /
eval loading accepts glob-style `stage` / `iteration` / `time` selectors
(default "*"), and "latest" means *temporally* latest — ordering is by the
manifest's own save timestamp, tie-broken by (stage, total_it), never by
filename (lexical filename order breaks with multiple images or stage >= 10).
"""

import datetime
import fnmatch
import json
import logging
import os
import re
from glob import glob

from flax import serialization

log = logging.getLogger(__name__)

NETS = ("lighting", "viewpoint", "depth", "albedo", "offset_encoder")

_STAMP_FMT = "%Y_%m_%d_%H_%M_%S"
# stamp regex for manifests predating the explicit "time" field (minute or
# second granularity)
_STAMP_RE = re.compile(r"_it_(\d{4}_\d{2}_\d{2}_\d{2}_\d{2}(?:_\d{2})?)\.json$")


def _order_key(m):
    """Temporal-latest ordering: save timestamp, then (stage, total_it) to
    break same-minute ties from older manifests."""
    return (m.get("time", ""), int(m.get("stage", 0)),
            int(m.get("total_it", 0)))


def _match(value, pattern):
    """Glob-style selector match against a stringified manifest field
    (the reference passes '*' or literal values into a glob,
    model.py:426-428)."""
    return fnmatch.fnmatch(str(value), str(pattern))


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
            stamp = datetime.datetime.now().strftime(_STAMP_FMT)
            os.makedirs(f"{self.base}/{category}", exist_ok=True)
            manifest = {"total_it": int(total_it), "dataset": str(category),
                        "image": str(img_idx), "stage": int(stage),
                        "time": stamp, "nets": {}}
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
        """All manifests for a category, ordered oldest -> newest by save
        time (manifest `time` field; parsed from the filename for manifests
        written before the field existed)."""
        out = []
        for p in glob(f"{self.base}/{category}/manifest_*.json"):
            m = json.load(open(p))
            if "time" not in m:
                match = _STAMP_RE.search(p)
                m["time"] = match.group(1) if match else ""
            out.append(m)
        out.sort(key=_order_key)
        return out

    def select(self, category, img_idx="*", stage="*", iteration="*",
               time="*"):
        """Manifests matching glob-style selectors (reference
        model.py:426-428 builds exactly this glob:
        {net}_image_{img_idx}_stage_{stage}_{it}_it_{time}.pth), ordered
        oldest -> newest."""
        return [m for m in self.manifests(category)
                if _match(m["image"], img_idx)
                and _match(m["stage"], stage)
                and _match(m["total_it"], iteration)
                and _match(m["time"], time)]

    def load_manifest(self, manifest, params_template):
        params = dict(params_template)
        for net in NETS:
            with open(manifest["nets"][net], "rb") as f:
                params[net] = serialization.from_bytes(
                    params_template[net], f.read())
        return params

    def load_latest_general(self, category, params_template, stage="*",
                            iteration="*", time="*"):
        """Latest (temporally) manifest matching the optional stage /
        iteration / time selectors (reference --load-pretrained resume,
        main.py:106-114 with config keys stage/iteration/time
        main.py:111-113)."""
        ms = self.select(category, stage=stage, iteration=iteration,
                         time=time)
        if not ms:
            raise FileNotFoundError(
                f"no checkpoints under {self.base}/{category} matching "
                f"stage={stage} iteration={iteration} time={time}")
        log.info("resuming from %s", ms[-1]["nets"]["depth"])
        return self.load_manifest(ms[-1], params_template)

    def load_per_image(self, category, params_template, stage="*",
                       iteration="*", time="*"):
        """Yield (img_idx, params) per distinct image, temporally-latest
        matching checkpoint each (the reference's `load_from_checkpoints`
        eval iteration, model.py:410-414)."""
        by_image = {}
        for m in self.select(category, stage=stage, iteration=iteration,
                             time=time):
            by_image[m["image"]] = m  # ordered oldest->newest: latest wins
        for img, m in sorted(by_image.items(),
                             key=lambda kv: (len(kv[0]), kv[0])):
            yield img, self.load_manifest(m, params_template)
