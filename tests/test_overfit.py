"""End-to-end learning test: overfit the tiny model on one synthetic frame and
verify the pipeline actually learns — losses converge, and the trained RPN's
eval-mode response localizes the carved gt region (the strongest end-to-end
signal a toy-scale model can guarantee; the reference's only end-to-end check
is a 1-iteration run, task.py -t)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv3d_tpu.models.nets import SUBNET_NAMES
from mv3d_tpu.ops import boxes as box_ops
from mv3d_tpu.ops import boxes3d as box3d_ops
from mv3d_tpu.train.trainer import Trainer

from test_model import CFG, make_batch
from test_trainer import FixedDataset


@pytest.mark.slow
def test_overfit_single_frame(tmp_path):
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    # carve a strong signal into the top view under the gt boxes
    top = np.asarray(batch["top"]).copy()
    gt3d = np.asarray(batch["gt_boxes3d"])[0]
    gt_top = np.asarray(box3d_ops.box3d_to_top_box(gt3d[:2], CFG))
    for x1, y1, x2, y2 in gt_top.astype(int):
        top[0, max(y1, 0):y2, max(x1, 0):x2, :] += 2.0
    batch = dict(batch)
    batch["top"] = jnp.asarray(top)
    ds = FixedDataset(batch)

    # Staged schedule, as the reference trains (task.py:26-44: RPN alone,
    # then everything): joint training from scratch on one toy frame is
    # chaotic — under some numeric streams the RPN hasn't localized by the
    # time the fusion head converges, so fusion correctly learns that every
    # (misplaced) proposal is background and inference collapses to zero
    # detections. RPN-first makes stage-2 fusion train on localized
    # proposals, which converges under every backend.
    tr = Trainer(ds, train_targets=["top_view_rpn"], cfg=CFG,
                 log_tag="overfit", checkpoint_dir=str(tmp_path / "c"),
                 log_dir=str(tmp_path / "l"), lr=2e-3)
    first = tr.fit_iteration(ds.load())
    # score at a low gate: a toy model's calibrated confidence after ~90
    # iterations need not clear the serving 0.75 gate; the IoU-improves
    # signal is about localization, not calibration, so gate at 0.1
    # (validation_iou's gate parameter mirrors the reference's
    # log_prediction score_threshold, mv3d.py:940)
    iou_untrained = tr.validation_iou(ds.load(), score_threshold=0.1)
    for _ in range(45):
        tr.fit_iteration(ds.load())
    tr2 = Trainer(ds, train_targets=list(SUBNET_NAMES), cfg=CFG,
                  log_tag="overfit2", checkpoint_dir=str(tmp_path / "c2"),
                  log_dir=str(tmp_path / "l"), lr=2e-3)
    tr2.variables = tr.variables      # stage handoff (reference: train.py -w)
    for _ in range(45):
        last = tr2.fit_iteration(ds.load())
    tr = tr2
    iou_trained = tr.validation_iou(ds.load(), score_threshold=0.1)

    # losses converge hard on a single frame
    assert last["top_cls_loss"] < first["top_cls_loss"] * 0.5
    assert last["fuse_cls_loss"] < max(first["fuse_cls_loss"] * 0.5, 0.05)
    assert np.isfinite(list(last.values())).all()

    # ...and the online detection-quality signal moves the right way: the
    # trained model's 3D IoU vs gt beats the untrained one (the strongest
    # accuracy-parity proxy available without a real dataset)
    assert iou_trained > iou_untrained, (iou_untrained, iou_trained)
    assert iou_trained > 0.0

    # the trained RPN localizes the carved region in EVAL mode: the
    # highest-probability anchor overlaps a gt top box
    rpn = tr.model.top_rpn.apply(
        tr.variables["top_view_rpn"], batch["top"], False)
    probs = np.asarray(jax.nn.softmax(rpn["scores"][0], -1))[:, 1]
    assert probs.max() > 0.4, f"RPN never confident (max {probs.max():.3f})"
    anchors = np.asarray(tr.model.anchors, np.float32)
    best = anchors[np.argsort(-probs)[:5]]
    iou = np.asarray(box_ops.bbox_overlaps(
        jnp.asarray(best), jnp.asarray(gt_top, jnp.float32)))
    assert iou.max() > 0.3, f"top anchors miss gt (best IoU {iou.max():.3f})"

    # the full inference pipeline stays live end-to-end
    boxes3d, _, probs_det = tr.predict(
        np.asarray(batch["top"][0]), np.asarray(batch["front"][0]),
        np.asarray(batch["rgb"][0]), score_threshold=0.0)
    assert boxes3d.shape[1:] == (8, 3)
    assert np.isfinite(boxes3d).all()
