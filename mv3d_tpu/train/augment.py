"""In-graph training-time augmentation of raw lidar batches.

The reference trains with NO augmentation (its loader hands frames straight
to fit_iteration, src/utils/batch_loading.py); the MV3D paper itself reports
training with per-frame horizontal flips and global yaw rotations. Because
this framework voxelizes *inside* the jitted step, augmentation can operate
on the raw points + gt corner boxes and every derived view (BEV, front,
occupancy) stays consistent automatically — something the reference's
precomputed-view pipeline could not do.

Both transforms are rigid maps of the lidar frame applied identically to the
point cloud and the (G, 8, 3) gt corners:

  * flip: y -> -y with probability ``train.aug_flip_prob`` (KITTI lidar y is
    the lateral axis, so this mirrors left/right);
  * rotate: yaw theta ~ U(-a, a) about the z axis, a = ``train.aug_rotate_rad``.

Padding point rows (placed at -1e9 by ``pad_points``) stay far outside every
crop bound under both maps, so the padding convention survives augmentation.
RGB is left untouched (the rigid lidar map has no cheap image-space
equivalent; the reference's RGB pathway gets no augmentation either way).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import Config


def _augment_frame(points: jnp.ndarray, gt3d: jnp.ndarray, key: jax.Array,
                   cfg: Config) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, 4) points + (G, 8, 3) gt corners -> augmented pair."""
    t = cfg.train
    kf, kr = jax.random.split(key)

    flip = (jax.random.uniform(kf) < t.aug_flip_prob) if t.aug_flip_prob > 0 \
        else jnp.bool_(False)
    sy = jnp.where(flip, -1.0, 1.0)

    theta = (jax.random.uniform(kr, minval=-t.aug_rotate_rad,
                                maxval=t.aug_rotate_rad)
             if t.aug_rotate_rad > 0 else jnp.float32(0.0))
    c, s = jnp.cos(theta), jnp.sin(theta)

    def rigid(xy):
        x, y = xy[..., 0], xy[..., 1] * sy
        return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)

    points = jnp.concatenate([rigid(points[..., :2]), points[..., 2:]],
                             axis=-1)
    gt3d = jnp.concatenate([rigid(gt3d[..., :2]), gt3d[..., 2:]], axis=-1)
    # a mirror reverses the box corner winding; re-permute so the corners
    # stay in box3d_compose's canonical order (M R(yaw) base_k =
    # R(-yaw) M base_k and M maps base corner k to base corner perm[k])
    perm = jnp.array([1, 0, 3, 2, 5, 4, 7, 6])
    gt3d = jnp.where(flip, gt3d[..., perm, :], gt3d)
    return points, gt3d


def augment_batch(batch: Dict[str, jnp.ndarray], key: jax.Array,
                  cfg: Config) -> Dict[str, jnp.ndarray]:
    """Per-frame random flip/rotate of a raw-point training batch.

    No-op (identity, no PRNG consumed) when both augmentation knobs are 0 or
    the batch carries precomputed views instead of raw points.
    """
    t = cfg.train
    if (t.aug_flip_prob <= 0 and t.aug_rotate_rad <= 0) \
            or "points" not in batch or "top" in batch:
        return batch
    keys = jax.random.split(key, batch["points"].shape[0])
    pts, gt3d = jax.vmap(lambda p, g, k: _augment_frame(p, g, k, cfg))(
        batch["points"], batch["gt_boxes3d"], keys)
    out = dict(batch)
    out["points"] = pts
    out["gt_boxes3d"] = gt3d
    return out
