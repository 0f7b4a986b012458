"""End-to-end CLI-path smoke tests on the tiny config: a synthetic raw drive
through pred_and_save -> tracklet XML -> scorer. This is the equivalent of the
reference's 1-iteration fast-test harness (experiments/manager.py check +
task.py -t)."""

import os

import numpy as np
import pytest

from mv3d_tpu.cli.tracking import pred_and_save
from mv3d_tpu.data import tracklets
from mv3d_tpu.data.kitti import KittiRawDataset
from mv3d_tpu.train.trainer import MV3D

from test_model import CFG


@pytest.fixture
def raw_drive(tmp_path):
    base = tmp_path / "raw" / "2011_09_26" / "2011_09_26_drive_0005_sync"
    os.makedirs(base / "velodyne_points" / "data")
    os.makedirs(base / "image_02" / "data")
    rng = np.random.RandomState(0)
    from PIL import Image
    for i in range(3):
        pts = np.stack([rng.uniform(0, 16, 3000), rng.uniform(-6, 6, 3000),
                        rng.uniform(-4, 0.8, 3000), rng.uniform(0, 1, 3000)],
                       1).astype(np.float32)
        pts.tofile(base / "velodyne_points" / "data" / f"{i:010d}.bin")
        Image.fromarray(np.zeros((64, 96, 3), np.uint8)).save(
            base / "image_02" / "data" / f"{i:010d}.png")
    t = tracklets.Tracklet("Car", 1.5, 1.6, 4.0, first_frame=0)
    for i in range(3):
        t.poses.append({"tx": 8.0, "ty": 1.0, "tz": -1.5,
                        "rx": 0.0, "ry": 0.0, "rz": 0.2})
    tracklets.write_tracklets(str(base / "tracklet_labels.xml"), [t])
    return str(tmp_path / "raw")


def test_raw_dataset(raw_drive):
    import dataclasses
    didi = dataclasses.replace(CFG, dataset_type="didi2")  # bypass trunc filter
    ds = KittiRawDataset(raw_drive, "2011_09_26", "0005", didi)
    assert len(ds) == 3
    f = ds.load_frame(1)
    assert f.points.shape[1] == 4
    assert f.gt_boxes3d.shape == (1, 8, 3)
    assert f.gt_labels.tolist() == [1]


@pytest.mark.slow   # >50s: quick tier targets <5 min on one core
def test_pred_and_save_pipeline(raw_drive, tmp_path):
    ds = KittiRawDataset(raw_drive, "2011_09_26", "0005", CFG)
    m = MV3D(cfg=CFG, log_tag="cli", checkpoint_dir=str(tmp_path / "ckpt"),
             log_dir=str(tmp_path / "log"))
    out = str(tmp_path / "pred")
    path = pred_and_save(ds, m, out, score_threshold=0.0, cfg=CFG,
                         log=lambda *a: None)
    assert os.path.exists(path)
    back = tracklets.parse_tracklets(path)
    # untrained model: any accepted detections parse back cleanly
    for t in back:
        assert t.object_type == "Car"
        assert t.n_frames == 1

    # scorer runs end-to-end on the outputs
    from mv3d_tpu.eval import tracklet_score
    gt = os.path.join(raw_drive, "2011_09_26",
                      "2011_09_26_drive_0005_sync", "tracklet_labels.xml")
    res = tracklet_score(path, gt, volume_method="box")
    assert "All" in res["iou_per_obj"]
