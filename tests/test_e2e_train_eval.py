"""Full-system integration: train on a synthetic multi-frame dataset (points
in, carved-signal BEV via aux injection is NOT used — real in-graph
voxelization from points), predict per frame, write tracklet XML, score with
the 3D-IoU evaluator. Asserts the plumbing end-to-end; detection quality at
toy scale is not asserted beyond basic sanity."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow   # ~6 min cold: full train->eval integration

from mv3d_tpu.cli.tracking import pred_and_save
from mv3d_tpu.data import tracklets
from mv3d_tpu.data.kitti import Frame
from mv3d_tpu.data.loader import BatchLoader
from mv3d_tpu.eval import tracklet_score
from mv3d_tpu.models.nets import SUBNET_NAMES
from mv3d_tpu.ops import boxes3d as box3d_ops
from mv3d_tpu.train.trainer import Trainer

from test_model import CFG


class SynthDriveDataset:
    """Synthetic 'drive': one car-sized dense point cluster per frame on a
    sparse ground plane, with matching gt."""

    def __init__(self, n_frames=6, seed=0):
        self.rng = np.random.RandomState(seed)
        self.n = n_frames
        self.centers = [
            (6.0 + 0.5 * i, -2.0 + 0.5 * i) for i in range(n_frames)]

    def __len__(self):
        return self.n

    def gt_for(self, i):
        cx, cy = self.centers[i]
        return np.asarray(box3d_ops.box3d_compose(
            [cx, cy, -1.6], [1.5, 1.6, 4.0], [0, 0, 0.0], CFG)
        ).astype(np.float32)[None]

    def load_frame(self, i):
        rng = np.random.RandomState(100 + i)
        ground = np.stack([rng.uniform(0, 16, 4000),
                           rng.uniform(-6, 6, 4000),
                           rng.uniform(-2.0, -1.8, 4000),
                           rng.uniform(0, 0.2, 4000)], 1)
        cx, cy = self.centers[i]
        car = np.stack([rng.uniform(cx - 2, cx + 2, 3000),
                        rng.uniform(cy - 0.8, cy + 0.8, 3000),
                        rng.uniform(-1.6, -0.2, 3000),
                        rng.uniform(0.6, 1.0, 3000)], 1)
        pts = np.concatenate([ground, car]).astype(np.float32)
        return Frame(tag=f"{i:05d}", points=pts,
                     rgb=np.zeros((64, 96, 3), np.uint8),
                     gt_boxes3d=self.gt_for(i),
                     gt_labels=np.ones(1, np.int32))


@pytest.mark.slow
def test_train_predict_eval_pipeline(tmp_path):
    ds = SynthDriveDataset()
    with BatchLoader(ds, CFG, batch_size=1, shuffle=True) as bl:
        tr = Trainer(bl, train_targets=list(SUBNET_NAMES), cfg=CFG,
                     log_tag="e2e", checkpoint_dir=str(tmp_path / "c"),
                     log_dir=str(tmp_path / "l"), lr=2e-3)
        first = None
        for _ in range(40):
            batch = bl.load()
            losses = tr.fit_iteration(batch)
            first = first or losses
        assert losses["top_cls_loss"] < first["top_cls_loss"]

    # per-frame prediction -> tracklet XML
    class _DS:
        def __len__(self):
            return len(ds)

        def load_frame(self, i):
            return ds.load_frame(i)

    out = str(tmp_path / "pred")
    pred_path = pred_and_save(_DS(), tr, out, score_threshold=0.01, cfg=CFG,
                              log=lambda *a: None)
    assert os.path.exists(pred_path)

    # ground-truth tracklet XML for the drive
    gt_path = str(tmp_path / "gt.xml")
    t = tracklets.Tracklet("Car", 1.5, 1.6, 4.0, first_frame=0)
    for i in range(len(ds)):
        cx, cy = ds.centers[i]
        t.poses.append({"tx": cx, "ty": cy, "tz": -1.6,
                        "rx": 0.0, "ry": 0.0, "rz": 0.0})
    tracklets.write_tracklets(gt_path, [t])

    res = tracklet_score(pred_path, gt_path, output_dir=str(tmp_path / "eval"),
                         volume_method="box")
    assert os.path.exists(tmp_path / "eval" / "iou_per_obj.csv")
    assert "All" in res["iou_per_obj"]
    assert 0.0 <= res["iou_per_obj"]["All"] <= 1.0
