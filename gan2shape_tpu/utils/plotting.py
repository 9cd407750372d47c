"""Visualization: depth-map plots, reconstruction grids, rotating-3D-surface
animations (parity target: /root/reference/plotting.py).

matplotlib renders the static plots; the 3D animation uses plotly when
importable (HTML export, like the reference's results/htmls gallery) and
falls back to a matplotlib-3D GIF otherwise (this image has no plotly)."""

import logging
import os

import numpy as np

log = logging.getLogger(__name__)

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
except Exception:  # pragma: no cover
    plt = None

try:
    import plotly.graph_objects as go
except Exception:
    go = None


def _ensure_dirs():
    os.makedirs("results/plots", exist_ok=True)
    os.makedirs("results/htmls", exist_ok=True)


def to_image(t):
    """(C,H,W) [-1,1] -> (H,W,C) [0,1]"""
    arr = np.asarray(t)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.shape[0] in (1, 3):
        arr = arr.transpose(1, 2, 0)
    return np.clip(arr / 2 + 0.5, 0, 1)


def plot_predicted_depth_map(depth, image_size=128, img_idx=0, save=True,
                             filename="depth", block=False):
    """(reference plotting.py:133-150)"""
    if plt is None:
        return
    _ensure_dirs()
    depth = np.asarray(depth).reshape(-1, image_size, image_size)[0]
    fig, ax = plt.subplots()
    im = ax.imshow(depth, cmap="viridis")
    fig.colorbar(im)
    if save:
        fig.savefig(f"results/plots/{filename}_{img_idx}.png", dpi=120)
    plt.close(fig)


def plot_reconstructions(recon_im, recon_depth, total_it="", im_idx="",
                         stage="", epoch=""):
    """Side-by-side reconstruction + depth (reference plotting.py:153-187)."""
    if plt is None:
        return
    _ensure_dirs()
    img = to_image(recon_im)
    depth = np.asarray(recon_depth)
    if depth.ndim == 3:
        depth = depth[0]
    fig, axes = plt.subplots(1, 2, figsize=(8, 4))
    axes[0].imshow(img)
    axes[0].set_title("reconstruction")
    d = axes[1].imshow(depth, cmap="viridis")
    axes[1].set_title("depth")
    fig.colorbar(d, ax=axes[1])
    tag = f"it_{total_it}_im_{im_idx}" + (f"_stage_{stage}" if stage else "") \
        + (f"_epoch_{epoch}" if epoch else "")
    fig.savefig(f"results/plots/recon_{tag}.png", dpi=120)
    plt.close(fig)


def plot_3d_depth(depth, image=None, img_idx=0, n_frames=18,
                  save_html=True, save_gif=True):
    """Rotating 3D surface of a depth map (reference plotly_3d_animate,
    plotting.py:58-130).  NaNs in `depth` mark masked-out background."""
    _ensure_dirs()
    depth = np.asarray(depth, np.float32)
    if depth.ndim == 3:
        depth = depth[0]
    z = -depth  # near = up
    h, w = z.shape
    colors = None
    if image is not None:
        colors = to_image(image)

    if go is not None and save_html:
        surf = go.Surface(z=z, surfacecolor=None if colors is None
                          else colors.mean(-1))
        fig = go.Figure(data=[surf])
        fig.write_html(f"results/htmls/depth_{img_idx}.html")
        log.info("wrote results/htmls/depth_%s.html", img_idx)

    if plt is None or not save_gif:
        return
    from PIL import Image as PILImage
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n_frames):
        fig = plt.figure(figsize=(4, 4))
        ax = fig.add_subplot(111, projection="3d")
        fc = None if colors is None else colors.reshape(-1, colors.shape[-1])
        ax.plot_surface(xx, yy, z, cmap=None if colors is not None else "viridis",
                        facecolors=None if colors is None else colors,
                        rstride=4, cstride=4, linewidth=0, antialiased=False)
        ax.view_init(elev=60, azim=i * 360 / n_frames)
        ax.set_axis_off()
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(PILImage.fromarray(buf))
        plt.close(fig)
    path = f"results/plots/depth3d_{img_idx}.gif"
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=120, loop=0)
    log.info("wrote %s", path)


def plot_originals_v_reconstructions(originals, reconstructions, n=4):
    if plt is None:
        return
    _ensure_dirs()
    n = min(n, len(originals))
    fig, axes = plt.subplots(2, n, figsize=(3 * n, 6))
    axes = np.atleast_2d(axes)
    for i in range(n):
        axes[0, i].imshow(to_image(originals[i]))
        axes[1, i].imshow(to_image(reconstructions[i]))
        axes[0, i].set_axis_off()
        axes[1, i].set_axis_off()
    fig.savefig("results/plots/originals_v_reconstructions.png", dpi=120)
    plt.close(fig)


def plot_loss_distribution(losses, filename="loss_box"):
    """Box plot + mean/std of the step-1 loss list
    (reference evaluate_results.py:107-114 + plotting.py:190-196)."""
    if plt is None:
        return None
    _ensure_dirs()
    losses = np.asarray(losses, np.float64)
    fig, ax = plt.subplots()
    ax.boxplot(losses)
    ax.set_title(f"mean={losses.mean():.4f} std={losses.std():.4f}")
    fig.savefig(f"results/plots/{filename}.png", dpi=120)
    plt.close(fig)
    return float(losses.mean()), float(losses.std())
