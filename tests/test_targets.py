"""Tests for in-graph target assignment and losses (mv3d_tpu.train)."""

import jax
import jax.numpy as jnp
import numpy as np

from mv3d_tpu.config import kitti_config
from mv3d_tpu.ops import anchors as anchor_ops
from mv3d_tpu.ops import boxes as box_ops
from mv3d_tpu.ops import boxes3d as box3d_ops
from mv3d_tpu.train import losses, targets

CFG = kitti_config()


def small_anchor_grid():
    """A small dense anchor grid for fast target tests."""
    bases = anchor_ops.mv3d_car_bases()
    anchors, _ = anchor_ops.make_anchors(bases, 8, (160, 120), (20, 15))
    return anchors


def make_gt(boxes, labels, max_gt=8):
    g = np.zeros((max_gt, 4), np.float32)
    l = np.zeros(max_gt, np.int32)
    m = np.zeros(max_gt, bool)
    g[:len(boxes)] = boxes
    l[:len(labels)] = labels
    m[:len(boxes)] = True
    return jnp.asarray(g), jnp.asarray(l), jnp.asarray(m)


def test_rpn_target_assignment():
    anchors = small_anchor_grid()
    A = len(anchors)
    gt, gl, gm = make_gt([[40, 40, 56, 66], [80, 20, 100, 50]], [1, 1])
    key = jax.random.PRNGKey(0)
    tg = targets.rpn_target(jnp.asarray(anchors), jnp.ones(A, bool),
                            gt, gl, gm, key, CFG)
    cls_mask = np.asarray(tg.cls_mask)
    labels = np.asarray(tg.labels)
    pos = np.asarray(tg.pos_mask)

    assert pos.sum() > 0
    assert pos.sum() <= int(CFG.rpn.fg_fraction * CFG.rpn.batch_size)
    assert cls_mask.sum() <= CFG.rpn.batch_size
    # positives have decent IoU with some gt (or are a gt's best anchor)
    ov = np.asarray(box_ops.bbox_overlaps(
        jnp.asarray(anchors, jnp.float32), gt[:2]))
    mx = ov.max(1)
    gt_best = ov.max(0)
    for a in np.where(pos)[0]:
        assert mx[a] >= CFG.rpn.fg_thresh_lo or np.any(
            np.isclose(ov[a], gt_best) & (gt_best > 0))
    # negatives are below the bg threshold
    neg = cls_mask & (labels == 0)
    assert np.all(mx[neg] < CFG.rpn.bg_thresh_hi)
    # targets at positives encode the assigned gt
    tgt = np.asarray(tg.targets)
    a0 = np.where(pos)[0][0]
    g0 = ov[a0].argmax()
    want = np.asarray(box_ops.box_transform(
        jnp.asarray(anchors[a0:a0 + 1], jnp.float32), gt[g0:g0 + 1]))
    np.testing.assert_allclose(tgt[a0], want[0], rtol=1e-5)


def test_rpn_target_fills_batch_with_negatives():
    anchors = small_anchor_grid()
    A = len(anchors)
    gt, gl, gm = make_gt([[40, 40, 56, 66]], [1])
    tg = targets.rpn_target(jnp.asarray(anchors), jnp.ones(A, bool),
                            gt, gl, gm, jax.random.PRNGKey(1), CFG)
    # pos + neg = RPN batch size when enough candidates exist
    assert int(np.asarray(tg.cls_mask).sum()) == CFG.rpn.batch_size


def test_rpn_target_respects_inside_mask():
    anchors = small_anchor_grid()
    A = len(anchors)
    inside = np.zeros(A, bool)   # everything filtered out
    gt, gl, gm = make_gt([[40, 40, 56, 66]], [1])
    tg = targets.rpn_target(jnp.asarray(anchors), jnp.asarray(inside),
                            gt, gl, gm, jax.random.PRNGKey(2), CFG)
    assert not np.asarray(tg.cls_mask).any()
    assert not np.asarray(tg.pos_mask).any()


def test_rpn_target_deterministic_per_key():
    anchors = small_anchor_grid()
    A = len(anchors)
    gt, gl, gm = make_gt([[40, 40, 56, 66], [80, 20, 100, 50]], [1, 1])
    t1 = targets.rpn_target(jnp.asarray(anchors), jnp.ones(A, bool), gt, gl, gm,
                            jax.random.PRNGKey(7), CFG)
    t2 = targets.rpn_target(jnp.asarray(anchors), jnp.ones(A, bool), gt, gl, gm,
                            jax.random.PRNGKey(7), CFG)
    np.testing.assert_array_equal(np.asarray(t1.cls_mask), np.asarray(t2.cls_mask))
    t3 = targets.rpn_target(jnp.asarray(anchors), jnp.ones(A, bool), gt, gl, gm,
                            jax.random.PRNGKey(8), CFG)
    assert not np.array_equal(np.asarray(t1.cls_mask), np.asarray(t3.cls_mask))


def test_fusion_target():
    P = CFG.rpn.nms_post_topn
    gtb = np.array([[100, 100, 130, 160], [300, 400, 330, 450]], np.float32)
    gt, gl, gm = make_gt(gtb, [1, 1])
    gt3d = np.zeros((8, 8, 3), np.float32)
    gt3d[0] = np.asarray(box3d_ops.box3d_compose(
        [30, 10, -1], [1.5, 1.6, 4.0], [0, 0, 0.3], CFG))
    gt3d[1] = np.asarray(box3d_ops.box3d_compose(
        [50, -5, -1], [1.5, 1.6, 4.0], [0, 0, -0.2], CFG))

    rois = np.zeros((P, 5), np.float32)
    rois[0, 1:] = [101, 102, 131, 161]      # near gt0 -> fg
    rois[1, 1:] = [500, 600, 530, 660]      # far -> fp
    rois[2, 1:] = [98, 99, 133, 158]        # near gt0 -> fg
    mask = np.zeros(P, bool)
    mask[:3] = True

    tg = targets.fusion_target(jnp.asarray(rois), jnp.asarray(mask),
                               gt, jnp.asarray(gt3d), gl, gm,
                               jax.random.PRNGKey(0), CFG)
    labels = np.asarray(tg.labels)
    m = np.asarray(tg.mask)
    pos = np.asarray(tg.pos_mask)
    out_rois = np.asarray(tg.rois)

    # gt boxes were fused into the roi set: at least the 2 gt + 2 fg proposals
    assert pos.sum() >= 4
    assert pos.sum() <= int(round(CFG.rcnn.fg_fraction * CFG.rcnn.batch_size))
    # fp slots labeled 0, positive slots labeled 1
    assert set(np.unique(labels[m])) <= {0, 1}
    # the far proposal appears with label 0
    far = np.where((m) & (np.abs(out_rois[:, 1] - 500) < 1e-3))[0]
    assert len(far) == 1 and labels[far[0]] == 0
    # targets zero on negatives, non-trivial on positives
    t = np.asarray(tg.targets)
    assert np.all(t[~pos] == 0)
    assert np.any(t[pos] != 0)


def test_fusion_target_quota():
    # no fg at all: fp fills the whole rcnn batch
    P = CFG.rpn.nms_post_topn
    gt, gl, gm = make_gt([[100, 100, 130, 160]], [1])
    gt3d = jnp.zeros((8, 8, 3), jnp.float32)
    rois = np.zeros((P, 5), np.float32)
    rng = np.random.RandomState(0)
    rois[:, 1] = rng.uniform(300, 500, P)
    rois[:, 2] = rng.uniform(300, 500, P)
    rois[:, 3] = rois[:, 1] + 30
    rois[:, 4] = rois[:, 2] + 30
    mask = np.ones(P, bool)
    tg = targets.fusion_target(jnp.asarray(rois), jnp.asarray(mask),
                               gt, gt3d, gl, gm, jax.random.PRNGKey(0), CFG)
    m = np.asarray(tg.mask)
    # 30 fp proposals + 1 gt (gt is fg) -> 31 live slots
    assert m.sum() == P + 1
    assert np.asarray(tg.pos_mask).sum() == 1


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def np_ce(logits, label):
    z = logits - logits.max()
    return float(np.log(np.exp(z).sum()) - z[label])


def test_rpn_loss_values():
    A = 6
    scores = np.random.RandomState(0).randn(A, 2).astype(np.float32)
    deltas = np.random.RandomState(1).randn(A, 4).astype(np.float32) * 0.1
    tgts = np.zeros((A, 4), np.float32)
    cls_mask = np.array([1, 1, 1, 0, 0, 0], bool)
    pos_mask = np.array([1, 0, 0, 0, 0, 0], bool)
    labels = np.array([1, 0, 0, 0, 0, 0], np.int32)
    tg = targets.RpnTargets(cls_mask=jnp.asarray(cls_mask),
                            labels=jnp.asarray(labels),
                            pos_mask=jnp.asarray(pos_mask),
                            targets=jnp.asarray(tgts))
    cls, reg = losses.rpn_loss(jnp.asarray(scores), jnp.asarray(deltas), tg)

    want_cls = np.mean([np_ce(scores[i], labels[i]) for i in range(3)])
    np.testing.assert_allclose(float(cls), want_cls, rtol=1e-5)

    # rpn smooth-l1 quirk: |x| - 0 in the linear branch
    d = deltas[0]
    s2 = 9.0
    sl1 = np.where(np.abs(d) < 1 / s2, 0.5 * s2 * d * d, np.abs(d))
    np.testing.assert_allclose(float(reg), sl1.sum(), rtol=1e-5)


def test_fuse_loss_values():
    R = 4
    rs = np.random.RandomState(2)
    scores = rs.randn(R, 2).astype(np.float32)
    deltas = rs.randn(R, 2, 8, 3).astype(np.float32) * 0.1
    tgts = rs.randn(R, 8, 3).astype(np.float32) * 0.1
    labels = np.array([1, 0, 0, 0], np.int32)
    mask = np.array([1, 1, 1, 0], bool)
    pos = np.array([1, 0, 0, 0], bool)
    tg = targets.FusionTargets(rois=jnp.zeros((R, 5)),
                               labels=jnp.asarray(labels),
                               targets=jnp.asarray(tgts),
                               mask=jnp.asarray(mask),
                               pos_mask=jnp.asarray(pos),
                               rois3d=jnp.zeros((R, 8, 3)))
    cls, reg = losses.fuse_loss(jnp.asarray(scores), jnp.asarray(deltas), tg)

    ce = [np_ce(scores[i], labels[i]) for i in range(R)]
    want_cls = ce[0] + np.mean(ce[:3])
    np.testing.assert_allclose(float(cls), want_cls, rtol=1e-5)

    d = deltas[0, 1] - tgts[0]
    s2 = 9.0
    sl1 = np.where(np.abs(d) < 1 / s2, 0.5 * s2 * d * d, np.abs(d) - 0.5 / s2)
    np.testing.assert_allclose(float(reg), sl1.sum(), rtol=1e-5)


def test_losses_safe_on_empty():
    A = 4
    tg = targets.RpnTargets(cls_mask=jnp.zeros(A, bool),
                            labels=jnp.zeros(A, jnp.int32),
                            pos_mask=jnp.zeros(A, bool),
                            targets=jnp.zeros((A, 4)))
    cls, reg = losses.rpn_loss(jnp.zeros((A, 2)), jnp.zeros((A, 4)), tg)
    assert np.isfinite(float(cls)) and float(reg) == 0.0
