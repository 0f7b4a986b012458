"""In-graph greedy non-max suppression on fixed-size, masked arrays.

Replaces the reference's host/CUDA NMS zoo — cython ``cpu_nms``
(src/net/lib/nms/cpu_nms.pyx), bitmask CUDA ``gpu_nms``
(src/net/lib/nms/nms_kernel.cu) and the ``tf.py_func`` escape hatch that pulls
proposal NMS onto the host mid-graph (src/net/rpn_nms_op.py:150-165) — with a
jit-safe masked implementation: sort once, then ``max_out`` sequential
pick-and-suppress steps over the fixed candidate set (O(max_out * K) VPU work,
no data-dependent shapes).

Suppression rule parity: IoU in the "+1" pixel convention, suppress when
``iou > threshold`` (strict), identical to cpu_nms.pyx:45-63.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps

NEG_INF = -1e30


def greedy_nms(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
               iou_threshold: float, max_out: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over a fixed-size candidate set.

    Args:
      boxes:  (K, 4) candidate boxes (x1, y1, x2, y2).
      scores: (K,) candidate scores.
      valid:  (K,) bool mask of live candidates.
      iou_threshold: suppress candidates with IoU > threshold vs a kept box.
      max_out: number of output slots (static).

    Returns:
      keep_idx:  (max_out,) int32 indices into the candidate set, in
                 descending-score order (garbage where keep_mask is False).
      keep_mask: (max_out,) bool — which output slots hold real detections.
    """
    k = boxes.shape[0]
    iou = bbox_overlaps(boxes, boxes)                     # (K, K)
    live_scores = jnp.where(valid, scores, NEG_INF)

    def body(_, state):
        live, keep_idx, keep_mask, slot = state
        best = jnp.argmax(live)
        ok = live[best] > NEG_INF / 2
        keep_idx = keep_idx.at[slot].set(jnp.int32(best))
        keep_mask = keep_mask.at[slot].set(ok)
        # suppress the pick itself and everything overlapping it
        suppress = (iou[best] > iou_threshold) | (
            jnp.arange(k) == best)
        live = jnp.where(ok & suppress, NEG_INF, live)
        return live, keep_idx, keep_mask, slot + 1

    init = (live_scores,
            jnp.zeros(max_out, jnp.int32),
            jnp.zeros(max_out, bool),
            jnp.int32(0))
    _, keep_idx, keep_mask, _ = jax.lax.fori_loop(0, max_out, body, init)
    return keep_idx, keep_mask


def nms_select(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
               iou_threshold: float, max_out: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS returning gathered (boxes, scores, mask) of size max_out."""
    keep_idx, keep_mask = greedy_nms(boxes, scores, valid, iou_threshold, max_out)
    return boxes[keep_idx], jnp.where(keep_mask, scores[keep_idx], 0.0), keep_mask
