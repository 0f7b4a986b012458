"""Masked RPN / fusion losses (parity with reference mv3d_net.py:623-718).

Both losses take the fixed-size masked outputs of :mod:`targets` so the whole
step stays one XLA program. Masked means reproduce the reference's
``tf.reduce_mean`` over gathered dynamic index sets, with a safe denominator
(``max(count, 1)``) instead of the reference's NaN-on-empty behavior (its
training loop dodges NaNs by skipping frames without positives, mv3d.py:
1050-1051, 1163-1164 — the mask count does the same in-graph).

Faithfully replicated quirk: the reference's RPN smooth-L1 uses a linear
branch of ``|x| - 0.0/sigma^2`` (a typo for 0.5, mv3d_net.py:690) while the
fusion loss uses the standard ``|x| - 0.5/sigma^2`` (mv3d_net.py:636). We keep
both exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def modified_smooth_l1(diffs: jnp.ndarray, sigma: float = 3.0,
                       linear_offset: float = 0.5) -> jnp.ndarray:
    """SmoothL1(x) = 0.5*(sigma*x)^2 if |x| < 1/sigma^2 else |x| - offset/sigma^2."""
    sigma2 = sigma * sigma
    a = jnp.abs(diffs)
    quad = diffs * diffs * 0.5 * sigma2
    lin = a - linear_offset / sigma2
    return jnp.where(a < 1.0 / sigma2, quad, lin)


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.maximum(jnp.sum(mask.astype(values.dtype)), 1.0)
    return jnp.sum(jnp.where(mask, values, 0.0)) / cnt


def _softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-row sparse softmax cross-entropy."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return logz - picked


def rpn_loss(scores: jnp.ndarray, deltas: jnp.ndarray, tg,
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RPN classification + box losses.

    Parity: reference ``rpn_loss`` (mv3d_net.py:677-718): CE averaged over all
    sampled anchors; smooth-L1 (sigma=3, zero linear offset) summed over the 4
    deltas and averaged over positive anchors.

    Args:
      scores: (A, 2) anchor logits.
      deltas: (A, 4) anchor box regression.
      tg: RpnTargets.
    """
    ce = _softmax_ce(scores.reshape(-1, 2).astype(jnp.float32), tg.labels)
    cls_loss = _masked_mean(ce, tg.cls_mask)

    diffs = deltas.reshape(-1, 4).astype(jnp.float32) - tg.targets
    sl1 = jnp.sum(modified_smooth_l1(diffs, sigma=3.0, linear_offset=0.0),
                  axis=1)
    reg_loss = _masked_mean(sl1, tg.pos_mask)
    return cls_loss, reg_loss


def fuse_loss(scores: jnp.ndarray, deltas: jnp.ndarray, tg,
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fusion-head classification + 3D corner regression losses.

    Parity: reference ``fuse_loss`` (mv3d_net.py:623-675): CE with positive
    reweighting (pos-mean added to all-mean, :649-653); smooth-L1 (sigma=3) on
    the per-roi *labeled class*'s (8,3) corner deltas, restricted to positive
    rois (:655-670).

    Args:
      scores: (R, num_class) fusion logits.
      deltas: (R, num_class, 8, 3) per-class corner deltas.
      tg: FusionTargets.
    """
    scores = scores.astype(jnp.float32)
    deltas = deltas.astype(jnp.float32)
    ce = _softmax_ce(scores, tg.labels)
    cls_pos = _masked_mean(ce, tg.pos_mask)
    cls_all = _masked_mean(ce, tg.mask)
    cls_loss = cls_pos * (2.0 - 1.0) + cls_all * 1.0

    # select each roi's labeled-class deltas (mv3d_net.py:656-659)
    picked = jnp.take_along_axis(
        deltas, tg.labels[:, None, None, None], axis=1)[:, 0]      # (R, 8, 3)
    diffs = picked - tg.targets
    sl1 = jnp.sum(modified_smooth_l1(diffs, sigma=3.0, linear_offset=0.5),
                  axis=(1, 2))
    reg_loss = _masked_mean(sl1, tg.pos_mask)
    return cls_loss, reg_loss
