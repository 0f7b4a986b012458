"""Native C++ preprocessing library: build, bit-parity vs the numpy oracle,
crop+pad correctness. Mirrors the reference's CUDA-vs-CPU golden test
(front_top_preprocess.py:195-223)."""

import numpy as np
import pytest

from mv3d_tpu import native
from mv3d_tpu.config import kitti_config
from mv3d_tpu.ops import voxelize_ref

CFG = kitti_config()

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def cloud(rng, n=20000):
    return np.stack([rng.uniform(-5, 85, n), rng.uniform(-35, 35, n),
                     rng.uniform(-5, 1.5, n), rng.uniform(0, 1, n)],
                    1).astype(np.float32)


def test_native_top_parity(rng):
    pts = cloud(rng)
    got = native.lidar_to_top(pts, CFG)
    want = voxelize_ref.lidar_to_top_np(pts, CFG)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_native_front_parity(rng):
    pts = cloud(rng)
    got = native.lidar_to_front(pts, CFG)
    want = voxelize_ref.lidar_to_front_np(pts, CFG)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-5)


def test_crop_pad(rng):
    pts = cloud(rng, 5000)
    out, n = native.crop_pad(pts, 8192, CFG)
    want_mask = voxelize_ref.crop_mask(pts, CFG)
    assert n == int(want_mask.sum())
    np.testing.assert_array_equal(out[:n], pts[want_mask][:n])
    assert np.all(out[n:, 0] == -1e9)


def test_crop_pad_truncates(rng):
    pts = cloud(rng, 5000)
    out, n = native.crop_pad(pts, 100, CFG)
    assert n == 100
