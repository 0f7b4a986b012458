"""Per-drive annotated data render: preprocessed drive -> composite frames +
animation.

Equivalent of the reference's ``src/train_data_render.py``: for every frame
of a preprocessed drive it builds the same composite — [front view strip;
plain top image | gt-boxed top image; camera image with gt boxes, resized to
match] (train_data_render.py:140-152) — and writes ``frames/%05d.png`` plus
one ``<drive>.gif`` (the reference writes .mp4 via skvideo/ffmpeg, which
this image lacks; PIL GIF carries the same content).

Input layout = this repo's offline preprocessor dump (data/preprocess.py,
reference-compatible): ``top/<tag>.npy.npz`` (key top_view),
``front/<tag>.npy.npz``, ``rgb/<tag>.png``, ``gt_boxes3d/<tag>.npy``.

Usage:
    python -m mv3d_tpu.cli.render <drive_dir> [-o out_dir] [--fps 15]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from ..config import cfg as _default_cfg
from .common import add_config_args, resolve_config


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("drive_dir", help="preprocessed drive directory")
    p.add_argument("-o", "--out-dir", default=None,
                   help="output dir (default <drive_dir>/render)")
    p.add_argument("--fps", type=int, default=15)
    p.add_argument("--format", default="gif", choices=["gif", "avi"],
                   help="video container: gif (PIL) or avi (MJPEG, the "
                        "video-file counterpart of the reference's "
                        "skvideo mp4 — no encoder in this image)")
    add_config_args(p)
    return p.parse_args(argv)


def render_frame(top: np.ndarray, rgb, gt_boxes3d, front, cfg) -> np.ndarray:
    """One composite frame (reference train_data_render.py:140-152)."""
    from PIL import Image

    from ..utils import viz

    top_image = viz.draw_top_image(top)
    boxed = top_image
    if gt_boxes3d is not None and len(gt_boxes3d):
        boxed = viz.draw_box3d_on_top(top_image.copy(), gt_boxes3d,
                                      color=(255, 255, 0), cfg=cfg)
    row = np.concatenate([top_image, boxed], axis=1)
    if front is not None:
        # front strip above, zero-padded/cropped to the row width (ref :148)
        fimg = viz.draw_top_image(front.transpose(1, 0, 2)
                                  if front.ndim == 3 else front[..., None])
        strip = np.zeros((fimg.shape[0], row.shape[1], 3), np.uint8)
        w = min(fimg.shape[1], row.shape[1])
        strip[:, :w] = fimg[:, :w]
        row = np.concatenate([strip, row], axis=0)
    if rgb is not None:
        rgb_img = np.asarray(rgb, np.uint8)
        if gt_boxes3d is not None and len(gt_boxes3d):
            rgb_img = viz.draw_rgb_projections(rgb_img.copy(), gt_boxes3d,
                                               color=(255, 0, 0), cfg=cfg)
        h = row.shape[0]
        wn = max(1, int(h * rgb_img.shape[1] / rgb_img.shape[0]))
        rgb_img = np.asarray(Image.fromarray(rgb_img).resize((wn, h)))
        row = np.concatenate([row, rgb_img], axis=1)
    return row


def render_drive(drive_dir: str, out_dir: str, cfg=_default_cfg,
                 fps: int = 15, fmt: str = "gif") -> str:
    from PIL import Image

    from ..utils.viz3d import pngs_to_gif

    frame_dir = os.path.join(out_dir, "frames")
    os.makedirs(frame_dir, exist_ok=True)
    tops = sorted(glob.glob(os.path.join(drive_dir, "top", "*.npy.npz")))
    if not tops:
        raise FileNotFoundError(f"no top views under {drive_dir}/top")
    for tf in tops:
        tag = os.path.basename(tf)[: -len(".npy.npz")]
        top = np.load(tf)["top_view"]
        gt_file = os.path.join(drive_dir, "gt_boxes3d", tag + ".npy")
        gt = np.load(gt_file) if os.path.exists(gt_file) else None
        rgb_file = os.path.join(drive_dir, "rgb", tag + ".png")
        rgb = (np.asarray(Image.open(rgb_file))
               if os.path.exists(rgb_file) else None)
        front_file = os.path.join(drive_dir, "front", tag + ".npy.npz")
        front = (np.load(front_file)["front_view"]
                 if os.path.exists(front_file) else None)
        img = render_frame(top, rgb, gt, front, cfg)
        Image.fromarray(img).save(os.path.join(frame_dir, tag + ".png"))
    base = os.path.join(out_dir, os.path.basename(
        os.path.normpath(drive_dir)))
    if fmt == "avi":
        from ..utils.video import write_mjpeg_avi
        pngs = sorted(glob.glob(os.path.join(frame_dir, "*.png")))
        return write_mjpeg_avi(base + ".avi",
                               (np.asarray(Image.open(p).convert("RGB"))
                                for p in pngs), fps=fps)
    return pngs_to_gif(frame_dir, base + ".gif", fps=fps)


def main(argv=None) -> str:
    args = parse_args(argv)
    cfg = resolve_config(args)
    out_dir = args.out_dir or os.path.join(args.drive_dir, "render")
    path = render_drive(args.drive_dir, out_dir, cfg, fps=args.fps,
                        fmt=args.format)
    print(f"wrote {path}")
    return path


if __name__ == "__main__":
    main()
