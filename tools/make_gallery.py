"""Assemble the qualitative results gallery.

Collects every per-image artifact under results/ (interactive 3D HTML
viewers, rotating GIFs, reconstruction plots) into one results/index.html —
the reference's docs/index.html gallery (reference README.md:4-11), minus
its CDN dependencies.

    python tools/make_gallery.py [--results results] [--title "..."]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan2shape_tpu.utils.plotting import make_gallery  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="Build results gallery")
    parser.add_argument("--results", default="results")
    parser.add_argument("--title", default="GAN2Shape Results (TPU)")
    args = parser.parse_args()
    out = make_gallery(args.results, title=args.title)
    if out is None:
        raise SystemExit("nothing to collect — run evaluate_results.py "
                         "(or main.py with plotting) first")
    print(f"gallery written to {out}")


if __name__ == "__main__":
    main()
