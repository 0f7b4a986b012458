"""Tests for anchors, empty-anchor filter, NMS, proposals, ROI align and final
detection decode — each against an independent numpy implementation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mv3d_tpu.config import kitti_config
from mv3d_tpu.ops import anchors as anchor_ops
from mv3d_tpu.ops import boxes as box_ops
from mv3d_tpu.ops import detect, nms, proposal, roi_align

CFG = kitti_config()


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------

def test_make_bases_faster_rcnn():
    b = anchor_ops.make_bases(16, (0.5, 1, 2), (8, 16, 32))
    assert b.shape == (9, 4)
    # the classic Faster-RCNN base at ratio 1, scale 8: 120x120 around (7.5,7.5)
    np.testing.assert_allclose(b[3], [-56.0, -56.0, 71.0, 71.0])


def test_anchor_setup_count():
    anchors, inside = anchor_ops.anchor_setup(CFG)
    h, w = CFG.top_feature_shape()
    assert (h, w) == (100, 75)
    assert anchors.shape == (h * w * 4, 4)
    assert inside.all()
    # 120000 is the reference's cfg.ANCHOR_AMOUNT (config.py:56): 600*800/64*4
    assert len(anchors) == 30000  # per-grid-cell 4 bases at stride 8


def test_non_empty_anchor_mask(rng):
    view = np.zeros((40, 30, 3), np.float32)
    view[10:20, 5:15, :] = 1.0
    anchors = np.array([
        [0, 0, 4, 4],      # empty corner
        [5, 10, 15, 20],   # covers the occupied block (x=cols 5:15, y=rows 10:20)
        [14, 19, 16, 21],  # touches the block edge
        [20, 25, 29, 39],  # empty
        [-5, -5, 3, 3],    # negative coords, clamped, empty
    ], np.int32)
    mask = np.asarray(anchor_ops.non_empty_anchor_mask(
        jnp.asarray(view), jnp.asarray(anchors), 0.0))

    # independent check with the CUDA-kernel semantics (clamp to dim-1,
    # exclusive ends)
    def rect_sum(a):
        x1, y1, x2, y2 = a
        x1 = np.clip(x1, 0, 29); x2 = np.clip(x2, 0, 29)
        y1 = np.clip(y1, 0, 39); y2 = np.clip(y2, 0, 39)
        return view[y1:max(y2, y1), x1:max(x2, x1), :].sum()

    want = np.array([rect_sum(a) > 0 for a in anchors])
    np.testing.assert_array_equal(mask, want)


def test_non_empty_anchor_mask_random(rng):
    view = (rng.rand(50, 40, 5) < 0.01).astype(np.float32)
    anchors = np.stack([
        rng.randint(-10, 45, 200), rng.randint(-10, 55, 200),
        rng.randint(-10, 45, 200), rng.randint(-10, 55, 200)], axis=1
    ).astype(np.int32)
    got = np.asarray(anchor_ops.non_empty_anchor_mask(
        jnp.asarray(view), jnp.asarray(anchors), 0.0))

    def rect_sum(a):
        x1, y1, x2, y2 = np.clip(a, [0, 0, 0, 0], [39, 49, 39, 49])
        return view[y1:max(y2, y1), x1:max(x2, x1), :].sum()

    want = np.array([rect_sum(a) > 0 for a in anchors])
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

def np_greedy_nms(boxes, scores, thresh):
    """Classic greedy NMS (cpu_nms.pyx semantics)."""
    order = np.argsort(-scores)
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        for j in order:
            if sup[j] or j == i:
                continue
            iw = min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0]) + 1
            ih = min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1]) + 1
            if iw > 0 and ih > 0:
                ai = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
                aj = (boxes[j, 2] - boxes[j, 0] + 1) * (boxes[j, 3] - boxes[j, 1] + 1)
                if iw * ih / (ai + aj - iw * ih) > thresh:
                    sup[j] = True
    return keep


def test_greedy_nms_matches_numpy(rng):
    n = 100
    boxes = np.stack([rng.uniform(0, 200, n), rng.uniform(0, 200, n)], 1)
    boxes = np.hstack([boxes, boxes + rng.uniform(10, 80, (n, 2))]).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.5)

    keep_idx, keep_mask = nms.greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.ones(n, bool), 0.5, n)
    got = np.asarray(keep_idx)[np.asarray(keep_mask)]
    np.testing.assert_array_equal(got, want)


def test_greedy_nms_respects_validity(rng):
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.array([False, True, True])
    keep_idx, keep_mask = nms.greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 3)
    got = np.asarray(keep_idx)[np.asarray(keep_mask)]
    np.testing.assert_array_equal(got, [1, 2])


# ---------------------------------------------------------------------------
# proposals
# ---------------------------------------------------------------------------

def test_rpn_proposals_basic(rng):
    anchors, _ = anchor_ops.anchor_setup(CFG)
    A = len(anchors)
    scores = rng.rand(A, 2).astype(np.float32)
    deltas = (rng.randn(A, 4) * 0.1).astype(np.float32)
    inside = np.ones(A, bool)

    out = proposal.rpn_proposals(jnp.asarray(scores), jnp.asarray(deltas),
                                 jnp.asarray(anchors), jnp.asarray(inside), CFG)
    rois = np.asarray(out.rois)
    mask = np.asarray(out.mask)
    sc = np.asarray(out.scores)
    assert rois.shape == (CFG.rpn.nms_post_topn, 5)
    assert mask.any()
    live = rois[mask]
    # batch index column zero, boxes clipped to view bounds
    assert np.all(live[:, 0] == 0)
    assert live[:, 1:].min() >= 0
    assert live[:, 1].max() <= 599 and live[:, 2].max() <= 799
    # scores descending among live slots
    s = sc[mask]
    assert np.all(np.diff(s) <= 1e-6)


def test_rpn_proposals_all_filtered():
    anchors, _ = anchor_ops.anchor_setup(CFG)
    A = len(anchors)
    scores = np.full((A, 2), 0.5, np.float32)
    deltas = np.zeros((A, 4), np.float32)
    inside = np.zeros(A, bool)   # empty-anchor filter removed everything
    out = proposal.rpn_proposals(jnp.asarray(scores), jnp.asarray(deltas),
                                 jnp.asarray(anchors), jnp.asarray(inside), CFG)
    assert not np.asarray(out.mask).any()


# ---------------------------------------------------------------------------
# ROI align
# ---------------------------------------------------------------------------

def test_roi_align_constant(rng):
    feat = np.full((50, 60, 8), 3.5, np.float32)
    rois = np.array([[4, 6, 30, 40], [0, 0, 59, 49]], np.float32)
    out = np.asarray(roi_align.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                         spatial_scale=1.0, pooled=(6, 6)))
    assert out.shape == (2, 6, 6, 8)
    np.testing.assert_allclose(out, 3.5, rtol=1e-6)


def test_roi_align_ramp():
    # feature = x coordinate: bin centers should recover the ramp linearly
    h, w = 40, 80
    feat = np.tile(np.arange(w, dtype=np.float32)[None, :, None], (h, 1, 1))
    rois = np.array([[10, 10, 50, 30]], np.float32)
    out = np.asarray(roi_align.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                         spatial_scale=1.0, pooled=(4, 4)))[0, :, :, 0]
    # column centers: x1 + (j + 0.5) * bin_w with bin_w = 40/4 = 10
    want = 10 + (np.arange(4) + 0.5) * 10
    np.testing.assert_allclose(out[0], want, atol=1e-4)
    # rows identical (no y variation)
    np.testing.assert_allclose(out, np.tile(out[0], (4, 1)), atol=1e-5)


def test_roi_align_spatial_scale():
    # same roi at half-resolution features with scale 0.5 reads the same region
    feat = np.tile(np.arange(40, dtype=np.float32)[None, :, None], (20, 1, 1))
    rois = np.array([[20, 8, 60, 24]], np.float32)   # view coords
    out = np.asarray(roi_align.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                         spatial_scale=0.5, pooled=(2, 2)))[0, :, :, 0]
    want_cols = 10 + (np.arange(2) + 0.5) * 10   # feature-cell coords
    np.testing.assert_allclose(out[0], want_cols, atol=1e-4)


def test_roi_pool_max_vs_align():
    rng = np.random.RandomState(3)
    feat = rng.rand(30, 30, 4).astype(np.float32)
    rois = np.array([[2, 2, 20, 20]], np.float32)
    mx = np.asarray(roi_align.roi_pool_max(jnp.asarray(feat), jnp.asarray(rois), 1.0))
    av = np.asarray(roi_align.roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0))
    assert np.all(mx >= av - 1e-6)


def test_roi_align_matmul_parity():
    """roi_align_matmul (separable weight-matrix einsums on the MXU —
    model.roi_align_impl='matmul') matches the gather formulation to float
    tolerance for in-range ROIs, and its gradient flows (it is linear in
    the features)."""
    import jax

    rng = np.random.RandomState(7)
    H, W, C = 40, 30, 16
    feat = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    rois = []
    for _ in range(24):
        x1 = rng.uniform(0, 8 * (W - 10))
        y1 = rng.uniform(0, 8 * (H - 10))
        rois.append([x1, y1, x1 + rng.uniform(16, 60),
                     y1 + rng.uniform(16, 60)])
    rois = jnp.asarray(np.array(rois, np.float32))
    a = np.asarray(roi_align.roi_align(feat, rois, 1 / 8.0, (6, 6), 2))
    b = np.asarray(roi_align.roi_align_matmul(feat, rois, 1 / 8.0,
                                              (6, 6), 2))
    np.testing.assert_allclose(a, b, atol=2e-6)

    g = jax.grad(lambda f: roi_align.roi_align_matmul(
        f, rois, 1 / 8.0, (6, 6), 2).sum())(feat)
    assert g.shape == feat.shape and float(jnp.abs(g).sum()) > 0

    # edge-touching ROIs: the matmul form clamps taps to the map edge (the
    # documented sub-cell deviation) but stays finite and close
    edge = jnp.asarray(np.array([[-8.0, -8.0, 40.0, 40.0]], np.float32))
    ae = np.asarray(roi_align.roi_align(feat, edge, 1 / 8.0, (6, 6), 2))
    be = np.asarray(roi_align.roi_align_matmul(feat, edge, 1 / 8.0,
                                               (6, 6), 2))
    assert np.isfinite(be).all()
    assert np.abs(ae - be).max() < 1.0


def test_roi_align_differentiable():
    feat = jnp.ones((20, 20, 2))
    rois = jnp.array([[2.0, 2.0, 15.0, 15.0]])

    def f(x):
        return jnp.sum(roi_align.roi_align(x, rois, 1.0))

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.asarray(g).sum() > 0


# ---------------------------------------------------------------------------
# final detection decode
# ---------------------------------------------------------------------------

def test_rcnn_nms(rng):
    from mv3d_tpu.ops import boxes3d as b3
    R = 16
    # rois3d: a line of separated boxes; half above score threshold
    rois3d = np.stack([
        np.asarray(b3.box3d_compose(
            np.array([10.0 + 8 * i, 0.0, -1.0]), np.array([1.5, 1.6, 4.0]),
            np.array([0.0, 0.0, 0.0]), CFG)) for i in range(R)])
    probs = np.zeros((R, 2), np.float32)
    probs[:, 1] = np.linspace(0.99, 0.2, R)
    deltas = np.zeros((R, 2, 8, 3), np.float32)
    mask = np.ones(R, bool)

    det = detect.rcnn_nms(jnp.asarray(probs), jnp.asarray(deltas),
                          jnp.asarray(rois3d), jnp.asarray(mask),
                          score_threshold=0.75, cfg=CFG)
    m = np.asarray(det.mask)
    assert m.sum() == (probs[:, 1] > 0.75).sum()
    # decoded boxes with zero deltas = regularised rois
    got = np.asarray(det.boxes3d)[m]
    want = np.asarray(b3.regularise_box3d(jnp.asarray(rois3d)))[:m.sum()]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rcnn_nms_suppression():
    from mv3d_tpu.ops import boxes3d as b3
    # two nearly identical boxes: lower-scoring one must be suppressed even at
    # the tiny 0.001 threshold (rcnn_nms_op.py:62)
    base = np.asarray(b3.box3d_compose(
        np.array([20.0, 0.0, -1.0]), np.array([1.5, 1.6, 4.0]),
        np.array([0.0, 0.0, 0.0]), CFG))
    rois3d = np.stack([base, base + 0.01])
    probs = np.array([[0.1, 0.9], [0.2, 0.8]], np.float32)
    deltas = np.zeros((2, 2, 8, 3), np.float32)
    det = detect.rcnn_nms(jnp.asarray(probs), jnp.asarray(deltas),
                          jnp.asarray(rois3d), jnp.ones(2, bool), cfg=CFG)
    m = np.asarray(det.mask)
    assert m.sum() == 1
    assert np.asarray(det.probs)[m][0] == np.float32(0.9)


def test_rpn_proposals_golden_chain(rng):
    """Golden test of the full proposal chain against an independent numpy
    implementation of the reference semantics (rpn_nms_op.py:90-145):
    decode -> clip -> min-size -> sort -> pre-topk -> greedy NMS -> post-topk."""
    import dataclasses
    from mv3d_tpu.config import kitti_config
    cfg = dataclasses.replace(
        kitti_config(),
        rpn=dataclasses.replace(kitti_config().rpn, nms_pre_topn=200,
                                nms_post_topn=12))
    anchors, _ = anchor_ops.make_anchors(
        anchor_ops.mv3d_car_bases(), 8, cfg.top.shape[:2],
        cfg.top_feature_shape())
    A = len(anchors)
    probs1 = rng.rand(A).astype(np.float32)
    scores = np.stack([1 - probs1, probs1], 1)
    deltas = (rng.randn(A, 4) * 0.1).astype(np.float32)
    inside = rng.rand(A) < 0.7

    out = proposal.rpn_proposals(jnp.asarray(scores), jnp.asarray(deltas),
                                 jnp.asarray(anchors), jnp.asarray(inside),
                                 cfg)

    # numpy reference chain
    h, w = cfg.top.shape[:2]
    af = anchors.astype(np.float32)
    dec = np.asarray(box_ops.box_transform_inv(jnp.asarray(af),
                                               jnp.asarray(deltas)))
    dec = np.asarray(box_ops.clip_boxes(jnp.asarray(dec), w, h))
    ws = dec[:, 2] - dec[:, 0] + 1
    hs = dec[:, 3] - dec[:, 1] + 1
    keep = inside & (ws >= cfg.rpn.nms_min_size) & (hs >= cfg.rpn.nms_min_size)
    idx = np.where(keep)[0]
    order = idx[np.argsort(-probs1[idx], kind="stable")][:cfg.rpn.nms_pre_topn]
    cand_boxes, cand_scores = dec[order], probs1[order]
    kept = np_greedy_nms(cand_boxes, cand_scores, cfg.rpn.nms_thresh)
    kept = kept[:cfg.rpn.nms_post_topn]

    mask = np.asarray(out.mask)
    got_boxes = np.asarray(out.rois)[mask][:, 1:]
    want_boxes = cand_boxes[kept]
    assert mask.sum() == len(kept)
    np.testing.assert_allclose(got_boxes, want_boxes, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.scores)[mask],
                               cand_scores[kept], atol=1e-6)


def test_structured_anchor_mask_matches_generic(rng):
    """The gather-free strided-slice filter must match the generic
    integral-image filter exactly, including edge clamping."""
    import dataclasses
    cfg = dataclasses.replace(
        kitti_config(),
        top=dataclasses.replace(kitti_config().top, x_max=16.0, y_min=-6.0,
                                y_max=6.0, x_div=0.2, y_div=0.2))  # (80,60,27)
    bases = anchor_ops.mv3d_car_bases()
    feat = cfg.top_feature_shape()
    anchors, _ = anchor_ops.make_anchors(bases, 8, cfg.top.shape[:2], feat)
    view = (rng.rand(*cfg.top.shape) < 0.003).astype(np.float32)

    generic = np.asarray(anchor_ops.non_empty_anchor_mask(
        jnp.asarray(view), jnp.asarray(anchors), 0.0))
    structured = np.asarray(anchor_ops.non_empty_anchor_mask_structured(
        jnp.asarray(view), bases, 8, feat, 0.0))
    np.testing.assert_array_equal(structured, generic)


def test_structured_anchor_mask_all_modes(rng):
    """window (default), rect-matmul, and integral formulations agree with
    the generic filter bit-for-bit, including border clamping."""
    import dataclasses
    cfg = dataclasses.replace(
        kitti_config(),
        top=dataclasses.replace(kitti_config().top, x_max=16.0, y_min=-6.0,
                                y_max=6.0, x_div=0.2, y_div=0.2))  # (80,60,27)
    bases = anchor_ops.mv3d_car_bases()
    feat = cfg.top_feature_shape()
    anchors, _ = anchor_ops.make_anchors(bases, 8, cfg.top.shape[:2], feat)
    view = (rng.rand(*cfg.top.shape) < 0.003).astype(np.float32)
    view[-1, :, 0] = 1.0   # exercise the clamp-excluded last row/col
    view[:, -1, 0] = 1.0
    generic = np.asarray(anchor_ops.non_empty_anchor_mask(
        jnp.asarray(view), jnp.asarray(anchors), 0.0))
    for mode in ("window", "rect-matmul", "integral"):
        got = np.asarray(anchor_ops.non_empty_anchor_mask_structured(
            jnp.asarray(view), bases, 8, feat, 0.0, mode=mode))
        np.testing.assert_array_equal(got, generic, err_msg=mode)


def test_structured_anchor_mask_full_grid(rng):
    bases = anchor_ops.mv3d_car_bases()
    feat = CFG.top_feature_shape()
    anchors, _ = anchor_ops.make_anchors(bases, 8, CFG.top.shape[:2], feat)
    view = np.zeros(CFG.top.shape, np.float32)
    view[100:140, 200:230, :] = 1.0
    generic = np.asarray(anchor_ops.non_empty_anchor_mask(
        jnp.asarray(view), jnp.asarray(anchors), 0.0))
    structured = np.asarray(anchor_ops.non_empty_anchor_mask_structured(
        jnp.asarray(view), bases, 8, feat, 0.0))
    np.testing.assert_array_equal(structured, generic)
    assert structured.any() and not structured.all()


def test_multiclass_nms_and_box_vote(rng):
    from mv3d_tpu.ops.nms import box_vote, non_max_suppress
    n, nc = 40, 3
    base = rand_boxes = np.stack([rng.uniform(0, 150, n),
                                  rng.uniform(0, 150, n)], 1)
    boxes1 = np.hstack([base, base + rng.uniform(20, 60, (n, 2))])
    boxes = np.hstack([boxes1 for _ in range(nc)]).astype(np.float32)
    scores = rng.rand(n, nc).astype(np.float32)
    out = non_max_suppress(boxes, scores, nc, nms_after_thresh=0.3,
                           max_per_image=10)
    assert len(out) == nc and len(out[0]) == 0
    total = sum(len(out[j]) for j in range(1, nc))
    assert 0 < total <= 10
    for j in range(1, nc):
        if len(out[j]) > 1:
            assert np.all(np.diff(out[j][:, -1]) <= 1e-6)

    # box_vote of a det against itself is identity
    dets = np.array([[10, 10, 50, 50, 0.9]], np.float32)
    voted = box_vote(dets, dets)
    np.testing.assert_allclose(voted, dets, atol=1e-5)
    # with a shifted overlapping box, the voted box moves toward it
    all_dets = np.array([[10, 10, 50, 50, 0.5], [14, 14, 54, 54, 0.5]],
                        np.float32)
    voted = box_vote(dets, all_dets)
    assert 10 < voted[0, 0] < 14


def test_greedy_nms_np_matches_in_graph_kernel(rng):
    """Host-side greedy_nms_np produces the identical keep-set as the jitted
    kernel across varied candidate counts — it exists so non_max_suppress
    doesn't retrace per distinct count (VERDICT r3 weak #6)."""
    for n in (1, 7, 33, 100, 250):
        base = np.stack([rng.uniform(0, 200, n), rng.uniform(0, 200, n)], 1)
        boxes = np.hstack([base, base + rng.uniform(10, 80, (n, 2))]
                          ).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        keep_idx, keep_mask = nms.greedy_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool),
            0.5, n)
        want = np.asarray(keep_idx)[np.asarray(keep_mask)]
        got = nms.greedy_nms_np(boxes, scores, 0.5)
        np.testing.assert_array_equal(got, want)
        # and both agree with the classic-division oracle
        np.testing.assert_array_equal(got, np_greedy_nms(boxes, scores, 0.5))
