"""Offline 3D / feature-map visualization (headless replacements for the
reference's mayavi tools).

The reference ships two interactive mayavi scripts —
``src/utils/3d_visualize.py`` (point cloud + gt boxes in 3D with a ground
grid, axis triad and preset camera views, png dir -> avi via ffmpeg) and
``src/utils/lidar_top_feature_visualize.py`` (BEV feature-map inspection
over the top view) — plus ``src/train_data_render.py`` (per-drive annotated
video dump). None of their display stacks (mayavi, cv2 windows, ffmpeg,
skvideo) exist headless; these functions produce the same artifacts as files:

  * :func:`render_cloud_3d` — matplotlib-Agg 3D scatter with the reference's
    ground grid / axis triad / preset viewpoints and wireframe boxes
    (3d_visualize.py:58-137 ``draw_didi_lidar``/``draw_didi_boxes3d``,
    MM_* presets :31-34);
  * :func:`render_top_feature_maps` — per-channel BEV heatmap sheet with gt
    box overlays (lidar_top_feature_visualize.py:169-221);
  * :func:`pngs_to_gif` — directory-of-frames -> animation
    (3d_visualize.py:141-158 ``dir_to_avi``; GIF because PIL is the only
    codec in this image).
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from ..config import Config, cfg as _default_cfg

# reference camera presets (azimuth, elevation): MM_TOP_VIEW / MM_PER_VIEW1-3
# (3d_visualize.py:31-34); matplotlib uses (elev, azim)
VIEWS = {
    "top": (90, 180),
    "per1": (60, 120),
    "per2": (45, 30),
    "per3": (60, 120),
}

_BOX_EDGES = ([(k, (k + 1) % 4) for k in range(4)] +
              [(k + 4, (k + 1) % 4 + 4) for k in range(4)] +
              [(k, k + 4) for k in range(4)])


def render_cloud_3d(points: np.ndarray, boxes3d: Optional[np.ndarray] = None,
                    out_path: str = "cloud3d.png", view: str = "per1",
                    grid: bool = True, axis: bool = True,
                    max_points: int = 60000) -> str:
    """(N, >=3) cloud [+ (K, 8, 3) boxes] -> one 3D png from a preset view."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(points)
    if len(pts) > max_points:           # plotting budget, not a data change
        pts = pts[np.linspace(0, len(pts) - 1, max_points).astype(int)]
    refl = np.clip(pts[:, 3], 0, 1) if pts.shape[1] > 3 else None

    fig = plt.figure(figsize=(7, 7), facecolor="black")
    ax = fig.add_subplot(projection="3d", facecolor="black")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.2, c=refl,
               cmap="viridis", linewidths=0)

    if grid:                            # 50 m ground grid at z=-2 (ref :66-80)
        for v in np.arange(-25, 26, 5):
            ax.plot([-25, 25], [v, v], [-2, -2], color="0.3", lw=0.5)
            ax.plot([v, v], [-25, 25], [-2, -2], color="0.3", lw=0.5)
    if axis:                            # rgb axis triad (ref :82-91)
        for vec, c in (((2, 0, 0), "r"), ((0, 2, 0), "g"), ((0, 0, 2), "b")):
            ax.plot([0, vec[0]], [0, vec[1]], [0, vec[2]], color=c, lw=2)

    if boxes3d is not None and len(boxes3d):
        boxes3d = np.asarray(boxes3d)
        if boxes3d.shape == (8, 3):
            boxes3d = boxes3d[None]
        for b in boxes3d:               # 12 wireframe edges (ref :118-130)
            for i, j in _BOX_EDGES:
                ax.plot([b[i, 0], b[j, 0]], [b[i, 1], b[j, 1]],
                        [b[i, 2], b[j, 2]], color="w", lw=1)

    elev, azim = VIEWS.get(view, VIEWS["per1"])
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=110, bbox_inches="tight", facecolor="black")
    plt.close(fig)
    return out_path


def render_top_feature_maps(top_view: np.ndarray,
                            gt_boxes3d: Optional[np.ndarray] = None,
                            out_path: str = "top_features.png",
                            channels: Optional[Sequence[int]] = None,
                            cols: int = 7,
                            cfg: Config = _default_cfg) -> str:
    """(H, W, C) top view -> one sheet of per-channel BEV heatmaps with gt
    boxes overlaid (feature inspection, lidar_top_feature_visualize.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..ops import boxes3d as box3d_ops
    from . import viz

    top = np.asarray(top_view, np.float32)
    chans = list(channels if channels is not None else range(top.shape[-1]))
    rows = -(-len(chans) // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.2 * rows))
    axes = np.atleast_1d(axes).reshape(-1)

    top_boxes = None
    if gt_boxes3d is not None and len(gt_boxes3d):
        top_boxes = np.asarray(
            box3d_ops.box3d_to_top_box(np.asarray(gt_boxes3d), cfg))
    for ax, c in zip(axes, chans):
        ax.imshow(top[:, :, c], cmap="magma")
        if top_boxes is not None:
            for x1, y1, x2, y2 in top_boxes:
                ax.plot([x1, x2, x2, x1, x1], [y1, y1, y2, y2, y1],
                        color="cyan", lw=0.6)
        ax.set_title(f"ch {c}", fontsize=7, color="0.3")
        ax.set_axis_off()
    for ax in axes[len(chans):]:
        ax.set_axis_off()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    # also drop the composite BEV image the reference draws boxes on
    img = viz.draw_top_image(top)
    if gt_boxes3d is not None and len(gt_boxes3d):
        img = viz.draw_box3d_on_top(img, np.asarray(gt_boxes3d),
                                    color=(255, 255, 255), cfg=cfg)
    from PIL import Image
    Image.fromarray(img).save(out_path.replace(".png", "_bev.png"))
    return out_path


def pngs_to_gif(png_dir: str, out_path: str, fps: int = 15,
                label_timestamps: bool = True) -> str:
    """Sorted ``<png_dir>/*.png`` -> animated GIF (dir_to_avi equivalent;
    the reference stamps each frame with its timestamp name, :145-153)."""
    from PIL import Image, ImageDraw

    files = sorted(glob.glob(os.path.join(png_dir, "*.png")))
    if not files:
        raise FileNotFoundError(f"no pngs under {png_dir}")
    frames = []
    for f in files:
        img = Image.open(f).convert("P", palette=Image.ADAPTIVE)
        if label_timestamps:
            img = img.convert("RGB")
            d = ImageDraw.Draw(img)
            name = os.path.basename(f)[:-4].replace("_", ":")
            d.text((6, 6), name, fill=(0, 0, 0))
            d.text((5, 5), name, fill=(225, 225, 225))
            img = img.convert("P", palette=Image.ADAPTIVE)
        frames.append(img)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    frames[0].save(out_path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)
    return out_path


def mark_gt_box3d(lidar_dir: str, gt_boxes3d_dir: str, mark_dir: str,
                  view: str = "per1") -> list:
    """Walk a preprocessed drive's ``lidar/`` + ``gt_boxes3d/`` ``.npy``
    pairs and render each frame in 3D (reference ``mark_gt_box3d``,
    3d_visualize.py:164-190, non-interactive)."""
    out = []
    for f in sorted(glob.glob(os.path.join(lidar_dir, "*.npy"))):
        name = os.path.basename(f)[:-4]
        gt_file = os.path.join(gt_boxes3d_dir, name + ".npy")
        boxes = np.load(gt_file) if os.path.exists(gt_file) else None
        out.append(render_cloud_3d(
            np.load(f), boxes, os.path.join(mark_dir, name + ".png"),
            view=view))
    return out
