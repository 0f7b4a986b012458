"""Visualization helpers: draw gt/proposal/detection boxes on BEV and camera
images (PIL-based; replaces the reference's cv2 renderers:
``draw_box3d_on_top``/``draw_rgb_projections`` boxes3d.py:211-254, the rpn
debug renderers rpn_target_op.py:216-296, and draw_top_image data.py:248)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..config import Config, cfg as _default_cfg
from ..ops import boxes3d as box3d_ops


def _draw_lines(img: np.ndarray, pts, color, width=1):
    from PIL import Image, ImageDraw
    pil = Image.fromarray(img)
    d = ImageDraw.Draw(pil)
    for (x0, y0), (x1, y1) in pts:
        d.line([(float(x0), float(y0)), (float(x1), float(y1))],
               fill=tuple(color), width=width)
    return np.asarray(pil)


def draw_top_image(top: np.ndarray) -> np.ndarray:
    """Normalized channel-sum BEV image (parity: data.py:248-254)."""
    img = np.sum(top, axis=2)
    img = img - img.min()
    div = img.max() - img.min()
    img = img / div * 255 if div > 0 else img
    return np.dstack([img] * 3).astype(np.uint8)


def draw_boxes2d(image: np.ndarray, boxes: np.ndarray,
                 color=(255, 255, 0), width=1) -> np.ndarray:
    """Draw (N, 4) [x1,y1,x2,y2] boxes."""
    segs = []
    for b in np.asarray(boxes):
        x1, y1, x2, y2 = b[:4]
        segs += [((x1, y1), (x2, y1)), ((x2, y1), (x2, y2)),
                 ((x2, y2), (x1, y2)), ((x1, y2), (x1, y1))]
    return _draw_lines(image, segs, color, width)


def draw_box3d_on_top(image: np.ndarray, boxes3d: np.ndarray,
                      color=(255, 255, 255), width=1,
                      cfg: Config = _default_cfg) -> np.ndarray:
    """Draw 3D boxes' bottom faces on the BEV image (boxes3d.py:231-254)."""
    boxes3d = np.asarray(boxes3d)
    if len(boxes3d) == 0:
        return image
    us, vs = box3d_ops.lidar_to_top_coords(
        boxes3d[:, 0:4, 0], boxes3d[:, 0:4, 1], cfg)
    us, vs = np.asarray(us), np.asarray(vs)
    segs = []
    for n in range(len(boxes3d)):
        for k in range(4):
            j = (k + 1) % 4
            segs.append(((us[n, k], vs[n, k]), (us[n, j], vs[n, j])))
    return _draw_lines(image, segs, color, width)


def draw_rgb_projections(image: np.ndarray, boxes3d: np.ndarray,
                         color=(255, 0, 255), width=1,
                         cfg: Config = _default_cfg) -> np.ndarray:
    """Draw 3D wireframes projected into the camera (boxes3d.py:211-228)."""
    boxes3d = np.asarray(boxes3d)
    if len(boxes3d) == 0:
        return image
    proj = np.asarray(box3d_ops.box3d_to_rgb_box(
        boxes3d.astype(np.float32), cfg))
    segs = []
    for q in proj:
        for k in range(4):
            j = (k + 1) % 4
            segs.append((tuple(q[k]), tuple(q[j])))
            segs.append((tuple(q[k + 4]), tuple(q[j + 4])))
            segs.append((tuple(q[k]), tuple(q[k + 4])))
    return _draw_lines(image, segs, color, width)
