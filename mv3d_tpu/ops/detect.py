"""Final detection post-processing (in-graph rcnn NMS).

Replaces the reference's host-side ``rcnn_nms`` (src/net/rcnn_nms_op.py:62-85):
score threshold -> corner-delta decode -> box regularisation -> BEV NMS.
Everything fixed-shape and masked, so it fuses into the same XLA program as
the network — the last host hop of the reference inference path disappears.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import Config, cfg as _default_cfg
from . import boxes3d as box3d_ops
from .nms import greedy_nms


class Detections(NamedTuple):
    boxes3d: jnp.ndarray   # (R, 8, 3) decoded, regularised 3D boxes
    probs: jnp.ndarray     # (R,) class-1 probabilities
    mask: jnp.ndarray      # (R,) bool — live detections


def rcnn_nms(probs: jnp.ndarray, deltas: jnp.ndarray, rois3d: jnp.ndarray,
             roi_mask: jnp.ndarray, score_threshold: float = None,
             nms_threshold: float = None,
             cfg: Config = _default_cfg) -> Detections:
    """Decode + suppress fusion-head outputs into final 3D detections.

    Args:
      probs: (R, num_class) fusion softmax probabilities.
      deltas: (R, num_class, 8, 3) per-class corner deltas.
      rois3d: (R, 8, 3) the lifted 3D rois the deltas refer to.
      roi_mask: (R,) bool validity of roi slots.
    """
    score_threshold = (cfg.rcnn.score_threshold if score_threshold is None
                       else score_threshold)
    nms_threshold = (cfg.rcnn.nms_thresh if nms_threshold is None
                     else nms_threshold)

    cls = 1   # class-one only, like the reference (rcnn_nms_op.py:65)
    p = probs[:, cls].astype(jnp.float32)
    keep = roi_mask & (p > score_threshold)

    d = deltas[:, cls].astype(jnp.float32)
    boxes3d = box3d_ops.box3d_transform_inv(rois3d, d)
    boxes3d = box3d_ops.regularise_box3d(boxes3d)
    top_boxes = box3d_ops.box3d_to_top_box(boxes3d, cfg)

    r = probs.shape[0]
    keep_idx, keep_mask = greedy_nms(top_boxes, p, keep, nms_threshold, r)
    return Detections(boxes3d=boxes3d[keep_idx],
                      probs=jnp.where(keep_mask, p[keep_idx], 0.0),
                      mask=keep_mask)
