"""End-to-end model tests on a scaled-down config: init, inference pipeline,
training forward + gradients, staged loss mix. This is the jit'd equivalent of
the reference's 1-iteration smoke harness (src/task.py -t / manager.py check)."""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv3d_tpu.config import kitti_config
from mv3d_tpu.models import (MV3DNet, SUBNET_NAMES, TOP_VIEW_RPN, total_loss)
from mv3d_tpu.ops import boxes3d as box3d_ops


def tiny_config():
    cfg = kitti_config()
    top = dataclasses.replace(cfg.top, x_max=16.0, y_min=-6.0, y_max=6.0,
                              x_div=0.2, y_div=0.2)        # (80, 60, 27)
    front = dataclasses.replace(cfg.front, width=64, height=32)
    rpn = dataclasses.replace(cfg.rpn, nms_pre_topn=200, nms_post_topn=16)
    rcnn = dataclasses.replace(cfg.rcnn, batch_size=32)
    pipe = dataclasses.replace(cfg.pipeline, max_points=2048, max_gt=8)
    return dataclasses.replace(cfg, top=top, front=front, rpn=rpn, rcnn=rcnn,
                               pipeline=pipe, image_width=96, image_height=64)


CFG = tiny_config()


@pytest.fixture(scope="module")
def model_and_vars():
    model = MV3DNet(CFG)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


def make_batch(rng, b=1):
    g = CFG.pipeline.max_gt
    top = rng.rand(b, *CFG.top_shape).astype(np.float32) * 0.1
    rgb = rng.rand(b, *CFG.rgb_shape).astype(np.float32)
    front = rng.rand(b, *CFG.front_shape).astype(np.float32)
    gt3d = np.zeros((b, g, 8, 3), np.float32)
    gt_labels = np.zeros((b, g), np.int32)
    gt_mask = np.zeros((b, g), bool)
    for i in range(b):
        for j in range(2):
            gt3d[i, j] = np.asarray(box3d_ops.box3d_compose(
                [6.0 + 4 * j, -2.0 + 2 * j, -1.5], [1.5, 1.6, 4.0],
                [0, 0, 0.2 * j], CFG))
            gt_labels[i, j] = 1
            gt_mask[i, j] = True
    return {
        "top": jnp.asarray(top), "rgb": jnp.asarray(rgb),
        "front": jnp.asarray(front), "gt_boxes3d": jnp.asarray(gt3d),
        "gt_labels": jnp.asarray(gt_labels), "gt_mask": jnp.asarray(gt_mask),
    }


def test_init_structure(model_and_vars):
    model, variables = model_and_vars
    assert set(variables.keys()) == set(SUBNET_NAMES)
    for name in SUBNET_NAMES:
        assert "params" in variables[name]
        assert "batch_stats" in variables[name]


def test_inference_shapes(model_and_vars, rng):
    model, variables = model_and_vars
    batch = make_batch(rng)
    dets, props = model.forward_inference(
        variables, batch["top"], batch["rgb"], batch["front"],
        score_threshold=0.0)
    r = CFG.rcnn.batch_size
    p = CFG.rpn.nms_post_topn
    assert np.asarray(props.rois).shape == (1, p, 5)
    assert np.asarray(dets.boxes3d).shape == (1, p, 8, 3)
    assert np.asarray(dets.probs).shape == (1, p)
    assert np.isfinite(np.asarray(dets.boxes3d)).all()


@pytest.mark.slow   # >50s: quick tier targets <5 min on one core
def test_train_forward_and_grads(model_and_vars, rng):
    model, variables = model_and_vars
    batch = make_batch(rng)
    key = jax.random.PRNGKey(1)

    params = {n: variables[n]["params"] for n in SUBNET_NAMES}
    stats = {n: {"batch_stats": variables[n]["batch_stats"]} for n in SUBNET_NAMES}

    def loss_fn(params):
        var = {n: {"params": params[n], **stats[n]} for n in SUBNET_NAMES}
        loss_dict, aux = model.forward_train(var, batch, key)
        return total_loss(loss_dict, SUBNET_NAMES, CFG), loss_dict

    (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k, v in loss_dict.items():
        assert np.isfinite(float(v)), k
    # gradients reach every *active* subnet (front is deprecated/off by
    # default, mirroring cfg.USE_FRONT=0 — its params exist but are unused)
    active = {"top_view_rpn", "image_feature", "fusion"}
    for name in SUBNET_NAMES:
        gnorm = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads[name], 0.0)
        if name in active:
            assert gnorm > 0, f"no gradient into {name}"
        else:
            assert gnorm == 0.0


def test_train_forward_updates_batchstats(model_and_vars, rng):
    model, variables = model_and_vars
    batch = make_batch(rng)
    _, aux = model.forward_train(variables, batch, jax.random.PRNGKey(2))
    ups = aux["updates"]
    assert ups[TOP_VIEW_RPN] is not None
    leaves = jax.tree_util.tree_leaves(ups[TOP_VIEW_RPN])
    assert len(leaves) > 0


def test_staged_loss_mix():
    ld = {"top_cls_loss": jnp.float32(1.0), "top_reg_loss": jnp.float32(2.0),
          "fuse_cls_loss": jnp.float32(3.0), "fuse_reg_loss": jnp.float32(4.0)}
    # rpn-only stage
    assert float(total_loss(ld, [TOP_VIEW_RPN], CFG)) == 3.0
    # full-net stage: 1*(1*1 + 0.05*2) + 1*3 + 0.1*4
    want = 1.0 * (1.0 * 1.0 + 0.05 * 2.0) + 1.0 * 3.0 + 0.1 * 4.0
    np.testing.assert_allclose(float(total_loss(ld, SUBNET_NAMES, CFG)), want,
                               rtol=1e-6)
    # fusion stage
    assert float(total_loss(ld, ["fusion"], CFG)) == 7.0


@pytest.mark.slow   # >50s: quick tier targets <5 min on one core
def test_batch_two_frames(model_and_vars, rng):
    model, variables = model_and_vars
    batch = make_batch(rng, b=2)
    loss_dict, aux = model.forward_train(variables, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss_dict["top_cls_loss"]))
    assert np.asarray(aux["fusion_targets"].rois).shape == (
        2, CFG.rcnn.batch_size, 5)


def test_siamese_fusion_mode(rng):
    """USE_SIAMESE_FUSION parity: enlarged-roi twin towers + extra fc layer."""
    import dataclasses
    cfg = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, use_siamese_fusion=True))
    model = MV3DNet(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    # ctx towers and the third fc layer exist
    fusion_params = variables["fusion"]["params"]
    assert "top_ctx_tower" in fusion_params
    assert "fc_all_3" in fusion_params
    batch = make_batch(rng)
    dets, props = model.forward_inference(
        variables, batch["top"], batch["rgb"], batch["front"],
        score_threshold=0.0)
    assert np.isfinite(np.asarray(dets.boxes3d)).all()
    # enlarge_rois geometry
    from mv3d_tpu.models.mv3d_net import enlarge_rois
    r = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
    e = np.asarray(enlarge_rois(r, 1.5))
    np.testing.assert_allclose(e, [[5.0, 10.0, 35.0, 70.0]])


def test_s2d2_view_layout_function_equivalence(rng):
    """A model on the folded (view_layout=s2d2) view with stem weights
    permuted by the fixed channel map equals the standard model on the
    standard view — the fold is function-preserving for a conv stem."""
    from mv3d_tpu.ops.voxelize import fold_view_s2d2

    f32 = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, compute_dtype="float32"))
    folded_cfg = dataclasses.replace(
        f32, pipeline=dataclasses.replace(f32.pipeline, view_layout="s2d2"))

    m_std = MV3DNet(f32)
    m_fold = MV3DNet(folded_cfg)
    var_std = m_std.init_variables(jax.random.PRNGKey(3))
    var_fold = jax.tree.map(lambda x: x, var_std)

    # folded channel j -> s2d(view) channel index (see fold_view_s2d2)
    zn = CFG.top.zn
    perm = np.empty(4 * (zn + 2), np.int64)
    for j in range(4 * zn):
        dydx, s = divmod(j, zn)
        perm[j] = dydx * (zn + 2) + s
    for a in range(2):                      # intensity, density groups
        for dydx in range(4):
            perm[4 * zn + 4 * a + dydx] = dydx * (zn + 2) + zn + a
    stem = var_std[TOP_VIEW_RPN]["params"]["trunk"]["ConvBnRelu_0"]["Conv_0"]
    fold_params = jax.tree.map(lambda x: x, var_fold[TOP_VIEW_RPN])
    fold_params["params"]["trunk"]["ConvBnRelu_0"]["Conv_0"] = {
        **stem, "kernel": stem["kernel"][:, :, perm, :]}
    var_fold[TOP_VIEW_RPN] = fold_params

    top = (rng.rand(1, *CFG.top_shape).astype(np.float32) * 0.1)
    out_std = m_std.top_rpn.apply(var_std[TOP_VIEW_RPN], jnp.asarray(top),
                                  False)
    out_fold = m_fold.top_rpn.apply(var_fold[TOP_VIEW_RPN],
                                    fold_view_s2d2(jnp.asarray(top)), False)
    np.testing.assert_allclose(np.asarray(out_std["scores"]),
                               np.asarray(out_fold["scores"]),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_std["features"]),
                               np.asarray(out_fold["features"]),
                               rtol=0, atol=2e-4)


def test_backbone_ablation_surface(rng):
    """The reference's backbone ablation family is constructible and runs:
    VGG rgb trunk (mv3d_net.py:214-252, cfg.RGB_BASENET) and basic-block
    resnets (resnet.py:185-258)."""
    batch = make_batch(rng)
    for mcfg in (dict(rgb_basenet="vgg"),
                 dict(backbone_block="basic")):
        cfg = dataclasses.replace(
            CFG, model=dataclasses.replace(CFG.model, **mcfg))
        model = MV3DNet(cfg)
        variables = model.init_variables(jax.random.PRNGKey(0))
        dets, props = jax.jit(partial(model.forward_inference,
                                      score_threshold=0.0))(
            variables, batch["top"], batch["rgb"], batch["front"])
        assert np.isfinite(np.asarray(dets.probs)).all(), mcfg
    # vgg trunk actually selected (param tree shape differs)
    cfg = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, rgb_basenet="vgg"))
    v = MV3DNet(cfg).init_variables(jax.random.PRNGKey(0))
    assert "block1_conv1" in v["image_feature"]["params"]["trunk"]
    # wrong stride for deeper repetitions is rejected
    with pytest.raises(AssertionError):
        MV3DNet(dataclasses.replace(CFG, model=dataclasses.replace(
            CFG.model, backbone_repetitions=(2, 2, 2, 2))))


def test_s2d2p_split_stem_function_equivalence(rng):
    """The lane-padded (s2d2p) model with its split stem built from an s2d2
    model's stem weights (heights lanes = the first 4*zn folded channels,
    aux conv = the last 8) produces the SAME trunk outputs — conv is linear
    over input-channel groups and the pad lanes/columns are zero."""
    from mv3d_tpu.ops.voxelize import fold_view_s2d2, fold_view_s2d2p

    f32 = dataclasses.replace(
        CFG, model=dataclasses.replace(CFG.model, compute_dtype="float32"))
    fold_cfg = dataclasses.replace(
        f32, pipeline=dataclasses.replace(
            f32.pipeline, use_pallas_fused=True, view_layout="s2d2"))
    pad_cfg = dataclasses.replace(
        f32, pipeline=dataclasses.replace(
            f32.pipeline, use_pallas_fused=True, view_layout="s2d2p"))

    m_fold = MV3DNet(fold_cfg)
    m_pad = MV3DNet(pad_cfg)
    vf = m_fold.init_variables(jax.random.PRNGKey(5))[TOP_VIEW_RPN]
    vp = jax.tree.map(lambda x: x,
                      m_pad.init_variables(jax.random.PRNGKey(6))[TOP_VIEW_RPN])

    zn = CFG.top.zn
    stem = vf["params"]["trunk"]["ConvBnRelu_0"]
    k = np.asarray(stem["Conv_0"]["kernel"])          # (3, 3, 4*zn+8, 64)
    kh = np.zeros(k.shape[:2] + (128, k.shape[3]), k.dtype)
    kh[:, :, :4 * zn] = k[:, :, :4 * zn]
    # build the pad model's variables from the fold model's: same tree except
    # the stem (ConvBnRelu_0 -> stem_h/stem_aux/stem_bn)
    for col, src in (("params", "BatchNorm_0"), ("batch_stats", "BatchNorm_0")):
        trunk_f = vf[col]["trunk"]
        trunk_p = dict(trunk_f)
        del trunk_p["ConvBnRelu_0"]
        if col == "params":
            trunk_p["stem_h"] = {"kernel": jnp.asarray(kh)}
            trunk_p["stem_aux"] = {"kernel": stem["Conv_0"]["kernel"][:, :, 4 * zn:]}
            trunk_p["stem_bn"] = trunk_f["ConvBnRelu_0"][src]
        else:
            trunk_p["stem_bn"] = trunk_f["ConvBnRelu_0"][src]
        vp[col] = dict(vf[col])
        vp[col]["trunk"] = trunk_p

    top = (rng.rand(1, *CFG.top_shape).astype(np.float32) * 0.1)
    out_fold = m_fold.top_rpn.apply(vf, fold_view_s2d2(jnp.asarray(top)),
                                    False)
    out_pad = m_pad.top_rpn.apply(vp, fold_view_s2d2p(jnp.asarray(top)),
                                  False)
    np.testing.assert_allclose(np.asarray(out_fold["scores"]),
                               np.asarray(out_pad["scores"]),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_fold["features"]),
                               np.asarray(out_pad["features"]),
                               rtol=0, atol=2e-4)


def test_s2d2p_training_step_runs(rng):
    """forward_train works end-to-end on the lane-padded pair layout."""
    import jax.numpy as jnp

    from mv3d_tpu.ops import voxelize

    cfg = dataclasses.replace(CFG, pipeline=dataclasses.replace(
        CFG.pipeline, use_pallas_fused=True, view_layout="s2d2p"))
    model = MV3DNet(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    b = make_batch(np.random.RandomState(0))
    pts = np.stack([np.random.RandomState(1).uniform(0, 16, (1, 2048)),
                    np.random.RandomState(2).uniform(-6, 6, (1, 2048)),
                    np.random.RandomState(3).uniform(-4.2, 0.8, (1, 2048)),
                    np.random.RandomState(4).uniform(0, 1, (1, 2048))],
                   -1).astype(np.float32)
    top, occ = voxelize.lidar_to_top_batch(jnp.asarray(pts), cfg,
                                           return_occ=True)
    batch = {"top": top, "top_occ": occ,
             "rgb": jnp.asarray(b["rgb"]), "front": jnp.asarray(b["front"]),
             "gt_boxes3d": jnp.asarray(b["gt_boxes3d"]),
             "gt_labels": jnp.asarray(b["gt_labels"]),
             "gt_mask": jnp.asarray(b["gt_mask"])}
    loss_dict, aux = jax.jit(model.forward_train)(
        variables, batch, jax.random.PRNGKey(1))
    for k, v in loss_dict.items():
        assert np.isfinite(float(v)), (k, v)
    # inference path too (anchor occ derived from the pair when no occ given)
    dets, props = jax.jit(partial(model.forward_inference,
                                  score_threshold=0.0))(
        variables, top, batch["rgb"], batch["front"])
    assert np.isfinite(np.asarray(dets.probs)).all()


def test_s2d2_training_step_runs(rng):
    """forward_train works end-to-end on the folded view layout (the batch
    carries top+top_occ from the voxelizer; anchor filter consumes occ)."""
    import jax.numpy as jnp

    from mv3d_tpu.ops import voxelize

    cfg = dataclasses.replace(CFG, pipeline=dataclasses.replace(
        CFG.pipeline, use_pallas_fused=True, view_layout="s2d2"))
    model = MV3DNet(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0))
    b = make_batch(np.random.RandomState(0))
    pts = np.stack([np.random.RandomState(1).uniform(0, 16, (1, 2048)),
                    np.random.RandomState(2).uniform(-6, 6, (1, 2048)),
                    np.random.RandomState(3).uniform(-4.2, 0.8, (1, 2048)),
                    np.random.RandomState(4).uniform(0, 1, (1, 2048))],
                   -1).astype(np.float32)
    top, occ = voxelize.lidar_to_top_batch(jnp.asarray(pts), cfg,
                                           return_occ=True)
    batch = {"top": top, "top_occ": occ,
             "rgb": jnp.asarray(b["rgb"]), "front": jnp.asarray(b["front"]),
             "gt_boxes3d": jnp.asarray(b["gt_boxes3d"]),
             "gt_labels": jnp.asarray(b["gt_labels"]),
             "gt_mask": jnp.asarray(b["gt_mask"])}
    loss_dict, aux = jax.jit(model.forward_train)(
        variables, batch, jax.random.PRNGKey(1))
    for k, v in loss_dict.items():
        assert np.isfinite(float(v)), (k, v)


def test_anchor_mask_layout_equivalence(rng):
    """model.anchor_mask gives the SAME anchor mask for the hwc view, the
    folded s2d2 view, and the lane-padded s2d2p pair — the invariant the
    diagnostic paths (Trainer._rpn, cli/test.py rpn_only/probe_rpn) rely on
    when they call anchor_mask(_frame0(top)) instead of the layout-naive
    generic non_empty_anchor_mask (VERDICT r2 weak #6)."""
    from mv3d_tpu.ops.voxelize import fold_view_s2d2, fold_view_s2d2p

    fold_cfg = dataclasses.replace(
        CFG, pipeline=dataclasses.replace(
            CFG.pipeline, use_pallas_fused=True, view_layout="s2d2"))
    pad_cfg = dataclasses.replace(
        CFG, pipeline=dataclasses.replace(
            CFG.pipeline, use_pallas_fused=True, view_layout="s2d2p"))
    m_hwc = MV3DNet(CFG)
    m_fold = MV3DNet(fold_cfg)
    m_pad = MV3DNet(pad_cfg)

    top = rng.rand(*CFG.top_shape).astype(np.float32)
    top[top < 0.7] = 0.0              # sparse occupancy like a real scan
    top = jnp.asarray(top)
    want = np.asarray(m_hwc.anchor_mask(top))
    got_fold = np.asarray(m_fold.anchor_mask(fold_view_s2d2(top)))
    got_pad = np.asarray(m_pad.anchor_mask(fold_view_s2d2p(top)))
    assert want.any() and not want.all()
    np.testing.assert_array_equal(want, got_fold)
    np.testing.assert_array_equal(want, got_pad)
