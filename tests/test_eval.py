"""Evaluation tests: tracklet scorer sanity (perfect predictions -> IoU 1,
P/R 1; shifted predictions degrade; csv outputs), KITTI export round-trip."""

import os

import numpy as np

from mv3d_tpu.config import kitti_config
from mv3d_tpu.data import tracklets
from mv3d_tpu.eval import tracklet_score
from mv3d_tpu.eval.kitti_export import detection_to_kitti_lines
from mv3d_tpu.ops import boxes3d as box3d_ops
from mv3d_tpu.data.kitti import kitti_label_to_lidar_box3d

CFG = kitti_config()


def write_xml(path, offsets=(0.0, 0.0)):
    ts = []
    for j, dy in enumerate((0.0, 6.0)):
        t = tracklets.Tracklet("Car", h=1.5, w=1.6, l=4.0, first_frame=0)
        for i in range(5):
            t.poses.append({"tx": 10.0 + i + offsets[0],
                            "ty": dy + offsets[1], "tz": -0.9,
                            "rx": 0.0, "ry": 0.0, "rz": 0.3})
        ts.append(t)
    tracklets.write_tracklets(path, ts)


def test_perfect_predictions(tmp_path):
    gt = str(tmp_path / "gt.xml")
    pred = str(tmp_path / "pred.xml")
    write_xml(gt)
    write_xml(pred)
    res = tracklet_score(pred, gt, output_dir=str(tmp_path),
                         volume_method="box")
    assert abs(res["iou_per_obj"]["Car"] - 1.0) < 1e-6
    assert abs(res["iou_per_obj"]["All"] - 1.0) < 1e-6
    for thr, pr in res["pr_per_iou"].items():
        assert pr["precision"] == 1.0 and pr["recall"] == 1.0
    assert os.path.exists(tmp_path / "iou_per_obj.csv")
    assert os.path.exists(tmp_path / "pr_per_iou.csv")
    with open(tmp_path / "pr_per_iou.csv") as f:
        assert len(f.readlines()) == 9   # header + 8 thresholds


def test_shifted_predictions_degrade(tmp_path):
    gt = str(tmp_path / "gt.xml")
    pred = str(tmp_path / "pred.xml")
    write_xml(gt)
    write_xml(pred, offsets=(1.0, 0.5))
    res = tracklet_score(pred, gt, volume_method="box")
    iou = res["iou_per_obj"]["Car"]
    assert 0.05 < iou < 0.9
    # high thresholds lose precision/recall
    assert res["pr_per_iou"][0.8]["recall"] < 1.0
    assert res["pr_per_iou"][0.1]["recall"] == 1.0


def test_sphere_method(tmp_path):
    gt = str(tmp_path / "gt.xml")
    write_xml(gt)
    res = tracklet_score(gt, gt, volume_method="sphere")
    assert abs(res["iou_per_obj"]["Car"] - 1.0) < 1e-6


def test_missed_and_spurious(tmp_path):
    gt = str(tmp_path / "gt.xml")
    pred = str(tmp_path / "pred.xml")
    write_xml(gt)
    # prediction: only one far-away spurious box
    t = tracklets.Tracklet("Car", 1.5, 1.6, 4.0, first_frame=0)
    t.poses.append({"tx": 100.0, "ty": 50.0, "tz": 0.0,
                    "rx": 0, "ry": 0, "rz": 0})
    tracklets.write_tracklets(pred, [t])
    res = tracklet_score(pred, gt, volume_method="box")
    assert res["iou_per_obj"]["All"] == 0.0
    assert res["pr_per_iou"][0.5]["precision"] == 0.0
    assert res["pr_per_iou"][0.5]["recall"] == 0.0


def test_kitti_export_roundtrip():
    # compose a lidar box, export to KITTI line, re-parse -> same box
    box = np.asarray(box3d_ops.box3d_compose(
        [20.0, 3.0, -1.2], [1.5, 1.6, 4.1], [0.0, 0.0, 0.4], CFG))[None]
    probs = np.array([0.9], np.float32)
    lines = detection_to_kitti_lines(box, probs, CFG)
    assert len(lines) == 1 and lines[0].startswith("Car")
    back, labels = kitti_label_to_lidar_box3d(lines, "Car",
                                              positive_only=False, cfg=CFG)
    t0, s0, r0 = (np.asarray(v) for v in box3d_ops.boxes3d_decompose(box, CFG))
    t1, s1, r1 = (np.asarray(v) for v in box3d_ops.boxes3d_decompose(back, CFG))
    np.testing.assert_allclose(t1, t0, atol=0.02)
    np.testing.assert_allclose(s1, s0, atol=0.01)
    dyaw = abs(((r1[0, 2] - r0[0, 2]) + np.pi / 2) % np.pi - np.pi / 2)
    assert dyaw < 0.01
