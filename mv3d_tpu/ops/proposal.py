"""RPN proposal generation, fully in-graph.

Replaces the reference's ``tf.py_func`` host escape (src/net/rpn_nms_op.py:
82-165: numpy decode + clip + min-size filter + sort + cython NMS executed on
the host in the middle of the TF graph) with a fixed-shape XLA pipeline:

    decode -> clip -> min-size mask -> top-k(pre_topn) -> greedy NMS(post_topn)

Output is always (post_topn, 5) rois (leading batch-index column, parity with
rpn_nms_op.py:142-143) plus a validity mask — the padded/masked equivalent of
the reference's ragged proposal list.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import Config, cfg as _default_cfg
from . import boxes as box_ops
from .nms import greedy_nms


class Proposals(NamedTuple):
    rois: jnp.ndarray     # (post_topn, 5) — (batch_ind, x1, y1, x2, y2)
    scores: jnp.ndarray   # (post_topn,)
    mask: jnp.ndarray     # (post_topn,) bool


def rpn_proposals(scores: jnp.ndarray, deltas: jnp.ndarray,
                  anchors: jnp.ndarray, inside_mask: jnp.ndarray,
                  cfg: Config = _default_cfg,
                  nms_thresh: float = None) -> Proposals:
    """Generate NMS'd proposals from dense RPN outputs.

    Args:
      scores: (A, 2) per-anchor logits-softmaxed probabilities (col 1 = fg),
              or any array reshapeable to (A, 2).
      deltas: (A, 4) box regression output.
      anchors: (A, 4) static anchor boxes.
      inside_mask: (A,) bool — anchors surviving the empty-anchor filter
              (the in-graph equivalent of ``top_inside_inds``).
    """
    r = cfg.rpn
    nms_thresh = r.nms_thresh if nms_thresh is None else nms_thresh
    img_height, img_width = cfg.top.shape[:2]

    probs = scores.reshape(-1, 2)[:, 1]
    deltas = deltas.reshape(-1, 4)
    anchors = anchors.astype(jnp.float32)

    proposals = box_ops.box_transform_inv(anchors, deltas)
    proposals = box_ops.clip_boxes(proposals, img_width, img_height)

    keep = inside_mask & box_ops.filter_boxes_mask(proposals, r.nms_min_size)
    masked_probs = jnp.where(keep, probs, -1.0)

    # pre-NMS top-k (sort by score, take 1000 — rpn_nms_op.py:116-121)
    pre_topn = min(r.nms_pre_topn, masked_probs.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked_probs, pre_topn)
    top_boxes = proposals[top_idx]
    top_valid = top_scores > -0.5

    keep_idx, keep_mask = greedy_nms(top_boxes, top_scores, top_valid,
                                     nms_thresh, r.nms_post_topn)
    out_boxes = top_boxes[keep_idx]
    out_scores = jnp.where(keep_mask, top_scores[keep_idx], 0.0)
    rois = jnp.concatenate(
        [jnp.zeros((r.nms_post_topn, 1), jnp.float32), out_boxes], axis=1)
    rois = jnp.where(keep_mask[:, None], rois, 0.0)
    return Proposals(rois=rois, scores=out_scores, mask=keep_mask)
