"""Tests for 3D box geometry (mv3d_tpu.ops.boxes3d): compose/decompose
round-trips, transform round-trips, projection sanity and the yaw-aware 3D IoU
self-test replicated from the reference (src/net/processing/boxes3d.py:546-602,
which expects IoU=1.0 for identical box sets and 1/3 for a 1-of-3 subset)."""

import numpy as np
import pytest

from mv3d_tpu.config import kitti_config
from mv3d_tpu.ops import boxes3d

CFG = kitti_config()


def compose_batch(trans, sizes, rots):
    return np.stack([
        np.asarray(boxes3d.box3d_compose(t, s, r, CFG))
        for t, s, r in zip(trans, sizes, rots)])


def test_compose_decompose_roundtrip(rng):
    n = 16
    trans = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    sizes = np.stack([rng.uniform(1, 2, n), rng.uniform(1.4, 2.0, n),
                      rng.uniform(3, 5, n)], axis=1).astype(np.float32)
    yaws = rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, n)
    rots = np.stack([np.zeros(n), np.zeros(n), yaws], axis=1).astype(np.float32)

    b = np.asarray(boxes3d.box3d_compose(trans, sizes, rots, CFG))
    assert b.shape == (n, 8, 3)
    t2, s2, r2 = (np.asarray(v) for v in boxes3d.boxes3d_decompose(b, CFG))
    # KITTI decompose: translation = bottom-face centroid = compose translation
    np.testing.assert_allclose(t2, trans, atol=1e-4)
    np.testing.assert_allclose(s2, sizes, atol=1e-4)
    # yaw may flip by pi (edge direction ambiguity) — compare modulo pi
    dyaw = np.abs(((r2[:, 2] - yaws) + np.pi / 2) % np.pi - np.pi / 2)
    assert np.all(dyaw < 1e-4)


def test_box3d_transform_roundtrip(rng):
    n = 8
    et = compose_batch(rng.uniform(-10, 10, (n, 3)),
                       rng.uniform(1, 4, (n, 3)),
                       np.stack([np.zeros(n), np.zeros(n),
                                 rng.uniform(-1, 1, n)], 1))
    gt = et + rng.uniform(-0.5, 0.5, et.shape)
    deltas = np.asarray(boxes3d.box3d_transform(et, gt))
    back = np.asarray(boxes3d.box3d_transform_inv(et, deltas))
    np.testing.assert_allclose(back, gt, rtol=1e-4, atol=1e-4)


def test_regularise_box3d():
    b = np.asarray(boxes3d.box3d_compose(
        np.array([5.0, 2.0, -1.0]), np.array([1.5, 1.6, 4.0]),
        np.array([0.0, 0.0, 0.7]), CFG))
    noisy = b + np.random.RandomState(1).uniform(-0.05, 0.05, b.shape)
    reg = np.asarray(boxes3d.regularise_box3d(noisy[None]))[0]
    # vertical edges exactly upright and all the same length
    edges = reg[4:8] - reg[0:4]
    np.testing.assert_allclose(edges[:, 0:2], 0, atol=1e-6)
    assert np.ptp(edges[:, 2]) < 1e-6


def test_top_box_roundtrip():
    # lift a top box to 3d and project back: must recover the box (+1 offset
    # inherent to the reference's coordinate maps is absorbed exactly)
    tb = np.array([[100.0, 200.0, 150.0, 260.0]], np.float32)
    b3d = np.asarray(boxes3d.top_box_to_box3d(tb, CFG))
    assert b3d.shape == (1, 8, 3)
    assert np.all(b3d[:, 0:4, 2] == CFG.model.box3d_z_min)
    assert np.all(b3d[:, 4:8, 2] == CFG.model.box3d_z_max)
    back = np.asarray(boxes3d.box3d_to_top_box(b3d, CFG))
    # reference maps are offset by one pixel (Yn vs Yn-1 indexing): the
    # round-trip reproduces box corners within one cell
    np.testing.assert_allclose(back, tb, atol=1.0)


def test_camera_lidar_roundtrip(rng):
    pts = rng.uniform(-10, 10, (32, 3)).astype(np.float32)
    cam = np.asarray(boxes3d.lidar_to_camera_points(pts, CFG))
    back = np.asarray(boxes3d.camera_to_lidar_points(cam, CFG))
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_rgb_projection_center():
    # a point straight ahead of the camera should project near image center
    b = np.asarray(boxes3d.box3d_compose(
        np.array([20.0, 0.0, -1.0]), np.array([1.5, 1.6, 4.0]),
        np.array([0.0, 0.0, 0.0]), CFG))[None]
    proj = np.asarray(boxes3d.box3d_to_rgb_box(b, CFG))
    assert proj.shape == (1, 8, 2)
    assert np.all(proj[..., 0] > 400) and np.all(proj[..., 0] < 900)
    assert np.all(proj[..., 1] > 100) and np.all(proj[..., 1] < 300)


def test_score_iou_reference_selftest():
    """Replicates the reference __main__ self-test (boxes3d.py:553-602)."""
    trans = np.array([[1.6, 17.5, -1.0], [11.6, 17.5, -1.0], [21.6, 17.5, -1.0]])
    size = np.array([[1.6, 2.5, 6.0]] * 3)
    rota = np.array([[0.0, 0.0, 1.6]] * 3)
    gt = compose_batch(trans, size, rota)
    pred = compose_batch(trans, size, rota)

    iou = boxes3d.boxes3d_score_iou(gt, pred, CFG)
    assert abs(iou - 1.0) < 1e-5
    iou_1 = boxes3d.boxes3d_score_iou(gt, pred[0:1], CFG)
    assert abs(iou_1 - 1.0 / 3.0) < 1e-5


def test_intersection_rotated():
    # two identical boxes rotated 90deg about a shared center: intersection of
    # the 4x2 footprints is the 2x2 center square
    a = np.asarray(boxes3d.box3d_compose(
        np.array([0.0, 0.0, 0.0]), np.array([1.0, 2.0, 4.0]),
        np.array([0.0, 0.0, 0.0]), CFG))
    b = np.asarray(boxes3d.box3d_compose(
        np.array([0.0, 0.0, 0.0]), np.array([1.0, 2.0, 4.0]),
        np.array([0.0, 0.0, np.pi / 2]), CFG))
    inter = boxes3d.box3d_intersection(a.T, b.T)
    assert abs(inter - 2 * 2 * 1.0) < 1e-5
