"""Training-time augmentation correctness: the random flip/rotate transforms
the point cloud and the gt corner boxes by the SAME rigid map, keeps the gt
corners in box3d_compose's canonical winding, and is a strict no-op when
disabled (the reference has no augmentation; this is paper-parity extra)."""

import dataclasses

import jax
import numpy as np
import pytest

from mv3d_tpu.ops import boxes3d as box3d_ops
from mv3d_tpu.train.augment import augment_batch

from test_model import CFG


def _cfg(flip=0.0, rot=0.0):
    return dataclasses.replace(CFG, train=dataclasses.replace(
        CFG.train, aug_flip_prob=flip, aug_rotate_rad=rot))


def _batch(rng, b=2, n=64, g=3):
    gt3d = np.zeros((b, g, 8, 3), np.float32)
    for i in range(b):
        for j in range(g):
            gt3d[i, j] = np.asarray(box3d_ops.box3d_compose(
                [6.0 + 2 * j + i, -2.0 + j, -1.5], [1.5, 1.6, 4.0],
                [0, 0, 0.3 * j - 0.2], CFG))
    pts = rng.uniform(-5, 15, (b, n, 4)).astype(np.float32)
    # plant points exactly at the first gt box's corners
    pts[:, :8, :3] = gt3d[:, 0]
    return {"points": pts, "gt_boxes3d": gt3d,
            "gt_labels": np.ones((b, g), np.int32),
            "gt_mask": np.ones((b, g), bool)}


def test_disabled_or_precomputed_is_identity():
    rng = np.random.RandomState(0)
    b = _batch(rng)
    out = augment_batch(b, jax.random.PRNGKey(0), _cfg())
    assert out is b
    b2 = dict(b, top=np.zeros((2, 4, 4, 3), np.float32))
    out2 = augment_batch(b2, jax.random.PRNGKey(0), _cfg(flip=1.0, rot=0.5))
    assert out2 is b2


def test_points_and_gt_share_the_rigid_map():
    """Points planted at gt corners land on the augmented gt corners (up to
    the winding permutation a mirror applies), for flip+rotate combined."""
    rng = np.random.RandomState(1)
    b = _batch(rng)
    out = augment_batch(b, jax.random.PRNGKey(3), _cfg(flip=1.0, rot=0.8))
    pts = np.asarray(out["points"])
    gt = np.asarray(out["gt_boxes3d"])
    perm = [1, 0, 3, 2, 5, 4, 7, 6]   # flip=1.0 always mirrors
    np.testing.assert_allclose(pts[:, perm, :3], gt[:, 0], atol=1e-5)
    # reflectance untouched
    np.testing.assert_array_equal(pts[..., 3],
                                  np.asarray(b["points"])[..., 3])


def test_flip_yields_canonical_mirrored_boxes():
    rng = np.random.RandomState(2)
    b = _batch(rng)
    out = augment_batch(b, jax.random.PRNGKey(0), _cfg(flip=1.0))
    gt0 = np.asarray(b["gt_boxes3d"]).reshape(-1, 8, 3)
    gt1 = np.asarray(out["gt_boxes3d"]).reshape(-1, 8, 3)
    t0, s0, r0 = (np.asarray(a) for a in box3d_ops.boxes3d_decompose(gt0, CFG))
    t1, s1, r1 = (np.asarray(a) for a in box3d_ops.boxes3d_decompose(gt1, CFG))
    np.testing.assert_allclose(s1, s0, atol=1e-5)            # sizes preserved
    np.testing.assert_allclose(t1[:, 0], t0[:, 0], atol=1e-5)
    np.testing.assert_allclose(t1[:, 1], -t0[:, 1], atol=1e-5)  # y mirrored
    np.testing.assert_allclose(np.sin(r1[:, 2]), -np.sin(r0[:, 2]), atol=1e-4)
    # points y mirrored, x/z/reflectance intact
    np.testing.assert_allclose(np.asarray(out["points"])[..., 1],
                               -np.asarray(b["points"])[..., 1], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["points"])[..., [0, 2, 3]],
                                  np.asarray(b["points"])[..., [0, 2, 3]])


def test_rotation_rotates_both():
    rng = np.random.RandomState(3)
    b = _batch(rng)
    out = augment_batch(b, jax.random.PRNGKey(7), _cfg(rot=0.6))
    p0 = np.asarray(b["points"])[..., :2]
    p1 = np.asarray(out["points"])[..., :2]
    # norms preserved (pure rotation)
    np.testing.assert_allclose(np.linalg.norm(p1, axis=-1),
                               np.linalg.norm(p0, axis=-1), rtol=1e-5)
    # corners map with the SAME index (no winding change)
    np.testing.assert_allclose(p1[:, :8], np.asarray(out["gt_boxes3d"])[:, 0, :, :2],
                               atol=1e-5)
    # per-frame independent draws: the two frames rotate by different angles
    ang = lambda a, c: np.arctan2(c[..., 1], c[..., 0]) - np.arctan2(a[..., 1], a[..., 0])
    th0 = ang(p0[0, 10], p1[0, 10])
    th1 = ang(p0[1, 10], p1[1, 10])
    assert abs(th0 - th1) > 1e-4
