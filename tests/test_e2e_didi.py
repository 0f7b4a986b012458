"""Didi pipeline end-to-end on a synthesized bag-converter-layout drive:
raw didi dir -> KittiRawDataset (didi layout fallback) -> offline preprocess
dump -> short training run (center-car filter + didi camera projection live
in-graph) -> per-frame prediction -> tracklet XML -> 3D-IoU scoring.

Closes the round-2 gap "the Didi path has never been exercised end-to-end"
(reference live path: src/tracking.py:27-93 over Didi drives; layout
reference data.py:692-699)."""

import dataclasses
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mv3d_tpu.cli.tracking import pred_and_save
from mv3d_tpu.config import didi_config
from mv3d_tpu.data import tracklets
from mv3d_tpu.data.kitti import KittiRawDataset
from mv3d_tpu.data.loader import BatchLoader
from mv3d_tpu.data.preprocess import Preprocessor
from mv3d_tpu.eval import tracklet_score
from mv3d_tpu.models.nets import SUBNET_NAMES
from mv3d_tpu.ops import voxelize
from mv3d_tpu.train.trainer import Trainer


def tiny_didi_config():
    cfg = didi_config()
    top = dataclasses.replace(cfg.top, x_min=-12.0, x_max=12.0,
                              y_min=-6.0, y_max=6.0)       # (120, 60, 14)
    front = dataclasses.replace(cfg.front, width=64, height=32)
    rpn = dataclasses.replace(cfg.rpn, nms_pre_topn=200, nms_post_topn=16)
    rcnn = dataclasses.replace(cfg.rcnn, batch_size=32)
    pipe = dataclasses.replace(cfg.pipeline, max_points=4096, max_gt=8)
    # a small didi-style camera: 100 rows with 30+20 cropped (sky/hood)
    return dataclasses.replace(cfg, top=top, front=front, rpn=rpn, rcnn=rcnn,
                               pipeline=pipe, image_width=96,
                               image_height=100, image_crop_top=30,
                               image_crop_bottom=20)


CFG = tiny_didi_config()
N_FRAMES = 4
CENTERS = [(5.0 + 0.3 * i, 1.0) for i in range(N_FRAMES)]


def _make_didi_drive(root):
    """Write a didi bag-converter-layout drive: <root>/1/15/{velodyne_points/
    data/*.bin, image_02/data/*.png, tracklet_labels.xml}."""
    from PIL import Image
    base = os.path.join(root, "1", "15")
    os.makedirs(os.path.join(base, "velodyne_points", "data"))
    os.makedirs(os.path.join(base, "image_02", "data"))
    for i in range(N_FRAMES):
        rng = np.random.RandomState(10 + i)
        ground = np.stack([rng.uniform(-12, 12, 2000),
                           rng.uniform(-6, 6, 2000),
                           rng.uniform(-2.0, -1.8, 2000),
                           rng.uniform(0, 0.2, 2000)], 1)
        cx, cy = CENTERS[i]
        car = np.stack([rng.uniform(cx - 2, cx + 2, 1200),
                        rng.uniform(cy - 0.8, cy + 0.8, 1200),
                        rng.uniform(-1.6, -0.2, 1200),
                        rng.uniform(0.6, 1.0, 1200)], 1)
        # capture-car returns: must be removed by the center-car filter
        ego = np.stack([rng.uniform(-1.5, 1.5, 500),
                        rng.uniform(-0.8, 0.8, 500),
                        rng.uniform(-1.5, 0.0, 500),
                        rng.uniform(0.5, 1.0, 500)], 1)
        pts = np.concatenate([ground, car, ego]).astype(np.float32)
        pts.tofile(os.path.join(base, "velodyne_points", "data",
                                f"{i:010d}.bin"))
        Image.fromarray(np.full((100, 96, 3), 60, np.uint8)).save(
            os.path.join(base, "image_02", "data", f"{i:010d}.png"))
    t = tracklets.Tracklet("Car", 1.5, 1.6, 4.0, first_frame=0)
    for cx, cy in CENTERS:
        t.poses.append({"tx": cx, "ty": cy, "tz": -1.6,
                        "rx": 0.0, "ry": 0.0, "rz": 0.0})
    tracklets.write_tracklets(os.path.join(base, "tracklet_labels.xml"), [t])
    return base


def test_didi_drive_end_to_end(tmp_path):
    base = _make_didi_drive(str(tmp_path / "raw"))
    ds = KittiRawDataset(str(tmp_path / "raw"), "1", "15", CFG)
    assert len(ds) == N_FRAMES
    f0 = ds.load_frame(0)
    assert f0.gt_boxes3d.shape[0] == 1 and f0.gt_labels.tolist() == [1]
    # didi camera crop: loader-prepared rgb is the cropped shape
    assert CFG.rgb_shape == (50, 96, 3)

    # center-car filter: the ego-return points leave the cells around the
    # origin empty in the voxelized view (reference filter_center_car,
    # data.py:224-227 — didi datasets only)
    import jax.numpy as jnp
    padded, n = voxelize.pad_points(f0.points, CFG.pipeline.max_points)
    top = np.asarray(voxelize.lidar_to_top(jnp.asarray(padded), CFG,
                                           num_points=jnp.int32(n)))
    t = CFG.top
    r0 = t.xn - 1 - int((1.5 - t.x_min) / t.x_div)
    r1 = t.xn - 1 - int((-1.5 - t.x_min) / t.x_div)
    c0 = t.yn - 1 - int((0.8 - t.y_min) / t.y_div)
    c1 = t.yn - 1 - int((-0.8 - t.y_min) / t.y_div)
    assert top[r0:r1 + 1, c0:c1 + 1].sum() == 0.0

    # offline preprocess dump (didi grid + cropped rgb)
    pp = Preprocessor(str(tmp_path / "prep"), CFG)
    assert pp.run(ds) == N_FRAMES
    assert os.path.exists(tmp_path / "prep" / "top" / "1_15_00000.npy.npz")
    from PIL import Image
    rgb = np.asarray(Image.open(tmp_path / "prep" / "rgb" / "1_15_00000.png"))
    assert rgb.shape == (50, 96, 3)

    # short training run on the raw drive (in-graph voxelize + didi rgb
    # projection in the roi pooling path)
    with BatchLoader(ds, CFG, batch_size=1, shuffle=True) as bl:
        tr = Trainer(bl, train_targets=list(SUBNET_NAMES), cfg=CFG,
                     log_tag="didi", checkpoint_dir=str(tmp_path / "c"),
                     log_dir=str(tmp_path / "l"), lr=1e-3)
        for _ in range(3):
            losses = tr.fit_iteration(bl.load())
        assert np.isfinite(list(losses.values())).all()

    # predict -> tracklet XML -> score vs the gt tracklets
    out = str(tmp_path / "pred")
    pred_path = pred_and_save(ds, tr, out, score_threshold=0.01, cfg=CFG,
                              log=lambda *a: None)
    assert os.path.exists(pred_path)
    res = tracklet_score(pred_path,
                         os.path.join(base, "tracklet_labels.xml"),
                         output_dir=str(tmp_path / "eval"),
                         volume_method="box")
    assert os.path.exists(tmp_path / "eval" / "iou_per_obj.csv")
    assert "All" in res["iou_per_obj"]
