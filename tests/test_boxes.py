"""Tests for 2D box geometry (mv3d_tpu.ops.boxes) against independent numpy
implementations of the reference formulas (src/net/processing/boxes.py,
src/net/lib/utils/bbox.pyx)."""

import numpy as np

from mv3d_tpu.ops import boxes


def rand_boxes(rng, n, lo=0, hi=500):
    x1 = rng.uniform(lo, hi - 20, n)
    y1 = rng.uniform(lo, hi - 20, n)
    w = rng.uniform(1, 100, n)
    h = rng.uniform(1, 100, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_transform_roundtrip(rng):
    # NOTE: the reference transform pair is NOT an exact inverse: in the "+1"
    # pixel convention the decode yields x2+1/y2+1 (boxes.py:74-82). We
    # replicate that faithfully and assert the exact reference round-trip.
    et = rand_boxes(rng, 64)
    gt = rand_boxes(rng, 64)
    deltas = np.asarray(boxes.box_transform(et, gt))
    back = np.asarray(boxes.box_transform_inv(et, deltas))
    expected = gt + np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(back, expected, rtol=1e-4, atol=1e-2)


def test_transform_values(rng):
    # hand-computed case in the "+1" convention
    et = np.array([[0.0, 0.0, 9.0, 9.0]], np.float32)     # w=h=10, c=(5,5)
    gt = np.array([[5.0, 5.0, 24.0, 24.0]], np.float32)   # w=h=20, c=(15,15)
    d = np.asarray(boxes.box_transform(et, gt))
    np.testing.assert_allclose(d, [[1.0, 1.0, np.log(2.0), np.log(2.0)]],
                               rtol=1e-6)


def test_clip_boxes():
    b = np.array([[-5.0, -5.0, 700.0, 900.0]], np.float32)
    c = np.asarray(boxes.clip_boxes(b, 601, 801))
    np.testing.assert_array_equal(c, [[0.0, 0.0, 600.0, 800.0]])


def np_overlaps(b, q):
    """Independent IoU matrix in the +1 convention."""
    n, k = len(b), len(q)
    out = np.zeros((n, k))
    for i in range(n):
        for j in range(k):
            iw = min(b[i, 2], q[j, 2]) - max(b[i, 0], q[j, 0]) + 1
            ih = min(b[i, 3], q[j, 3]) - max(b[i, 1], q[j, 1]) + 1
            if iw > 0 and ih > 0:
                ab = (b[i, 2] - b[i, 0] + 1) * (b[i, 3] - b[i, 1] + 1)
                aq = (q[j, 2] - q[j, 0] + 1) * (q[j, 3] - q[j, 1] + 1)
                out[i, j] = iw * ih / (ab + aq - iw * ih)
    return out


def test_bbox_overlaps(rng):
    b = rand_boxes(rng, 40)
    q = rand_boxes(rng, 17)
    got = np.asarray(boxes.bbox_overlaps(b, q))
    want = np_overlaps(b, q)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_filter_boxes_mask():
    b = np.array([[0, 0, 6, 100], [0, 0, 7, 100], [0, 0, 100, 100]], np.float32)
    m = np.asarray(boxes.filter_boxes_mask(b, 8.0))
    np.testing.assert_array_equal(m, [False, True, True])
