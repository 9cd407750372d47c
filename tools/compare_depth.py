"""Depth-MAD parity harness (BASELINE.md fidelity metric).

Compares two sets of depth maps — e.g. this framework's reconstructions vs
the PyTorch reference's saved outputs — and reports mean absolute difference
statistics over the foreground.

    python tools/compare_depth.py ours.npy theirs.npy [--mask masks.npy]

Accepts .npy arrays shaped (N, H, W) (or (H, W)); NaNs in either input are
treated as background and excluded.
"""

import argparse
import json

import numpy as np


def depth_mad(a, b, mask=None):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a = a[None]
    if b.ndim == 2:
        b = b[None]
    assert a.shape == b.shape, (a.shape, b.shape)
    valid = np.isfinite(a) & np.isfinite(b)
    if mask is not None:
        valid &= np.asarray(mask) > 0.5
    diff = np.abs(a - b)
    per_image = [float(diff[i][valid[i]].mean()) if valid[i].any()
                 else float("nan") for i in range(len(a))]
    flat = diff[valid]
    return {
        "mad": float(flat.mean()),
        "median_ad": float(np.median(flat)),
        "p95_ad": float(np.percentile(flat, 95)),
        "per_image_mad": per_image,
        "n_images": len(a),
        "valid_fraction": float(valid.mean()),
    }


def main():
    ap = argparse.ArgumentParser(description="depth-MAD parity")
    ap.add_argument("ours")
    ap.add_argument("theirs")
    ap.add_argument("--mask", default=None)
    args = ap.parse_args()
    mask = np.load(args.mask) if args.mask else None
    stats = depth_mad(np.load(args.ours), np.load(args.theirs), mask)
    print(json.dumps(stats, indent=1))


if __name__ == "__main__":
    main()
