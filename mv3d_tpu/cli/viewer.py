"""Standalone lidar viewer/converter.

Clean-room replacement of the reference's PCL+OpenCV tooling
(`src/lidar_data_preprocess/lidar_image_generator.cpp`, interactive .bin
player, and `npyConverter/npy_converter.cpp`, .npy -> image converter):
renders a velodyne ``.bin`` scan (or a preprocessed ``top`` .npy/.npz dump)
to BEV / front-view images. Non-interactive by design — frames go to files;
``--step`` walks a directory like the reference's keyboard player.

Usage:
  python -m mv3d_tpu.cli.viewer scan.bin -o out/           # one scan
  python -m mv3d_tpu.cli.viewer velodyne_dir/ -o out/ --limit 10
  python -m mv3d_tpu.cli.viewer top/00000.npy.npz -o out/  # converter mode
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="MV3D lidar viewer (file-based)")
    ap.add_argument("path", help=".bin scan, .npy/.npz top dump, or a "
                                 "directory of either")
    ap.add_argument("-o", "--out-dir", default="viewer_out")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--no-front", action="store_true",
                    help="skip the front view (bin inputs only)")
    from .common import add_config_args
    add_config_args(ap)
    return ap.parse_args(argv)


def _save(img: np.ndarray, path: str):
    from PIL import Image
    Image.fromarray(img).save(path)


def render_bin(path: str, out_dir: str, cfg, front: bool = True) -> list:
    """Velodyne .bin -> top (+front) pngs via the numpy oracle voxelizers."""
    from ..data.kitti import read_velodyne
    from ..ops import voxelize_ref
    from ..utils import viz

    scan = read_velodyne(path)
    stem = os.path.splitext(os.path.basename(path))[0]
    written = []

    top = voxelize_ref.lidar_to_top_np(scan, cfg)
    p = os.path.join(out_dir, f"{stem}_top.png")
    _save(viz.draw_top_image(top), p)
    written.append(p)

    if front:
        fv = voxelize_ref.lidar_to_front_np(scan, cfg)
        lo, hi = fv.min(), fv.max()
        img = ((fv - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
        p = os.path.join(out_dir, f"{stem}_front.png")
        _save(img.transpose(1, 0, 2), p)
        written.append(p)
    return written


def render_npy(path: str, out_dir: str, cfg) -> list:
    """Preprocessed top dump (.npy / .npz key 'top_view') -> png
    (reference npy_converter.cpp equivalent)."""
    from ..utils import viz

    if path.endswith(".npz") or path.endswith(".npy.npz"):
        with np.load(path) as z:
            top = z["top_view"]
    else:
        top = np.load(path)
    stem = os.path.basename(path).split(".")[0]
    p = os.path.join(out_dir, f"{stem}_top.png")
    _save(viz.draw_top_image(top), p)
    return [p]


def main(argv=None):
    args = parse_args(argv)
    from .common import resolve_config
    cfg = resolve_config(args)

    if os.path.isdir(args.path):
        files = sorted(glob.glob(os.path.join(args.path, "*.bin")) +
                       glob.glob(os.path.join(args.path, "*.np[yz]")) +
                       glob.glob(os.path.join(args.path, "*.npy.npz")))
    else:
        files = [args.path]
    if args.limit:
        files = files[:args.limit]

    os.makedirs(args.out_dir, exist_ok=True)
    total = []
    for f in files:
        if f.endswith(".bin"):
            total += render_bin(f, args.out_dir, cfg,
                                front=not args.no_front)
        else:
            total += render_npy(f, args.out_dir, cfg)
    print(f"rendered {len(total)} images from {len(files)} inputs "
          f"-> {args.out_dir}")


if __name__ == "__main__":
    main()
