"""Attribution INSIDE the network stage via full-program deltas.

Same methodology as tools/profile_stages.py (standalone timings are
unreliable through the remote relay; only steady-state full-pipeline deltas
reproduce): the complete lidar->boxes program is timed with individual
network-internal stages replaced by shape-preserving stand-ins.

Variants:
  full          the shipped program                       (baseline)
  no-rcnn-nms   final NMS replaced by a top-k passthrough (final-NMS cost)
  no-fusion     ROI align + fusion head skipped, zeros    (ROI+fusion cost)
  no-proposal   rpn_proposals replaced by fixed rois      (proposal cost)
  no-anchmask   empty-anchor filter skipped (inside=1)    (filter cost)
  rpn-only      rgb/front trunks skipped                  (aux trunk cost)

Usage:  python tools/profile_net_stages.py [--batch 8] [--iters 12]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--distinct", type=int, default=6)
    ap.add_argument("--only", default="",
                    help="comma list of variant names to run (always "
                         "include 'full' for the delta base)")
    ap.add_argument("--roi-matmul", action="store_true",
                    help="run with model.roi_align_impl='matmul' (compare "
                         "a --only full run against the default)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mv3d_tpu.config import kitti_config
    from mv3d_tpu.models import mv3d_net as M
    from mv3d_tpu.models.mv3d_net import MV3DNet
    from mv3d_tpu.ops import boxes3d as box3d_ops
    from mv3d_tpu.ops import voxelize
    from mv3d_tpu.ops.detect import rcnn_nms
    from mv3d_tpu.ops.proposal import Proposals, rpn_proposals

    B, N_MEAS, N_DIST = args.batch, args.iters, args.distinct
    on_tpu = jax.default_backend() != "cpu"
    base = kitti_config()
    cfg = dataclasses.replace(base, pipeline=dataclasses.replace(
        base.pipeline, use_pallas_fused=on_tpu, use_pallas_heights=on_tpu))
    if args.roi_matmul:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, roi_align_impl="matmul"))
    model = MV3DNet(cfg)
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    n_pts = cfg.pipeline.max_points
    rng = np.random.RandomState(0)
    pts = [jax.device_put(jnp.asarray(np.stack([
        rng.uniform(0, 80, (B, n_pts)), rng.uniform(-30, 30, (B, n_pts)),
        rng.uniform(-4.2, 0.8, (B, n_pts)), rng.uniform(0, 1, (B, n_pts)),
    ], axis=-1).astype(np.float32))) for _ in range(N_DIST)]
    rgbs = [jax.device_put(jnp.asarray(
        rng.rand(B, *cfg.rgb_shape).astype(np.float32)))
        for _ in range(N_DIST)]

    def forward(variables, top, rgb, front, *, occ=None, no_rcnn_nms=False,
                no_fusion=False, no_proposal=False, no_anchmask=False,
                traced_ones_mask=False, no_interleave=False,
                rpn_only=False, cheap_roi=False):
        """forward_inference with stage toggles (mirrors mv3d_net.py)."""
        if rpn_only:
            rpn_out = model.top_rpn.apply(variables[M.TOP_VIEW_RPN], top,
                                          False)
            outs = {"rpn": rpn_out}
        else:
            outs, _ = model.extract_features(variables, top, rgb, front,
                                             train=False)
        rpn = outs["rpn"]
        n_r = cfg.rpn.nms_post_topn

        def per_frame(top_i, occ_i, scores_i, deltas_i, feat_top_i,
                      feat_rgb_i, feat_front_i):
            if no_anchmask:
                inside = jnp.ones(model.anchors.shape[0], bool)
            elif traced_ones_mask:
                # traced (non-constant) all-true mask with trivial compute:
                # isolates mask COMPUTATION cost from mask USAGE cost
                inside = jnp.full(model.anchors.shape[0],
                                  top_i[0, 0, 0] * 0 == 0)
            elif no_interleave:
                # full window-mode rect-sum compute but WITHOUT the
                # (gh,gw,4)->(A,) base-minor stack/reshape: isolates the
                # interleave relayout from the arithmetic
                h, w = top_i.shape[0], top_i.shape[1]
                gh, gw = model._feat_shape
                stride = cfg.model.rpn_stride
                occ_z = jnp.sum(top_i, axis=-1)
                occ_z = occ_z.at[h - 1, :].set(0.0).at[:, w - 1].set(0.0)
                acc = None
                for bb in model._bases_np:
                    x1, y1, x2, y2 = (int(bb[0]), int(bb[1]),
                                      int(bb[2]), int(bb[3]))
                    dy, dx = y2 - y1, x2 - x1
                    rows = jax.lax.reduce_window(
                        occ_z, 0.0, jax.lax.add, (dy, 1), (stride, 1),
                        ((-y1, y1 + (gh - 1) * stride + dy - h), (0, 0)))
                    rect = jax.lax.reduce_window(
                        rows, 0.0, jax.lax.add, (1, dx), (1, stride),
                        ((0, 0), (-x1, x1 + (gw - 1) * stride + dx - w)))
                    m = rect > cfg.pipeline.remove_empty_thresh
                    acc = m if acc is None else (acc | m)
                inside = jnp.full(model.anchors.shape[0], acc.any())
            else:
                inside = model.anchor_mask(top_i, occ=occ_i)
            if no_proposal:
                rois = jnp.concatenate(
                    [jnp.zeros((n_r, 1), jnp.float32),
                     jnp.asarray(model.anchors[:n_r], jnp.float32)], axis=1)
                props = Proposals(rois=rois + inside[0],
                                  scores=scores_i[:n_r, 1],
                                  mask=jnp.ones(n_r, bool))
            else:
                props = rpn_proposals(scores_i, deltas_i, model.anchors,
                                      inside, cfg)
            rois3d = box3d_ops.top_box_to_box3d(props.rois[:, 1:5], cfg)
            feats = {"top": feat_top_i}
            if feat_rgb_i is not None:
                feats["rgb"] = feat_rgb_i
            if feat_front_i is not None:
                feats["front"] = feat_front_i
            if no_fusion or rpn_only:
                pooled = None
            elif cheap_roi:
                # shape-identical pooled features from a STATIC slice (no
                # data-dependent gathers), with a per-roi dependence so XLA
                # cannot collapse the downstream tower/fusion compute:
                # delta vs full == cost of the bilinear roi_align gathers
                ph, pw = cfg.model.roi_pool_size
                jitter = props.scores[:, None, None, None] * 1e-3
                pooled = {}
                for nm, ft in feats.items():
                    base = ft[:ph, :pw, :][None]
                    pooled[nm] = base + jitter
                    if cfg.model.use_siamese_fusion:
                        pooled[nm + "_ctx"] = base + jitter * 2.0
            else:
                pooled = model.pool_rois(feats, rois3d, props.rois[:, 1:5])
            return props, rois3d, pooled

        frgb = outs.get("rgb_features")
        ffront = outs.get("front_features")
        in_axes = (0, 0 if occ is not None else None, 0, 0, 0,
                   0 if frgb is not None else None,
                   0 if ffront is not None else None)
        props, rois3d, pooled = jax.vmap(per_frame, in_axes=in_axes)(
            top, occ, rpn["scores"], rpn["deltas"], rpn["features"],
            frgb, ffront)

        b, r = props.rois.shape[0], props.rois.shape[1]
        if no_fusion or rpn_only:
            probs = jnp.zeros((b, r, cfg.model.num_class), jnp.float32) \
                + props.scores[..., None]
            deltas = jnp.zeros((b, r, cfg.model.num_class, 8, 3), jnp.float32)
        else:
            flat = {k: v.reshape((b * r,) + v.shape[2:])
                    for k, v in pooled.items()}
            fuse = model.fusion.apply(variables[M.FUSION], flat, False)
            probs = fuse["probs"].reshape(b, r, -1)
            deltas = fuse["deltas"].reshape(b, r, cfg.model.num_class, 8, 3)

        if no_rcnn_nms:
            return probs, deltas, rois3d, props.mask
        dets = jax.vmap(partial(rcnn_nms, cfg=cfg, score_threshold=0.05))(
            probs, deltas, rois3d, props.mask)
        return dets.boxes3d, dets.probs, dets.mask

    def pipeline(variables, points, rgb, **toggles):
        top, occ = voxelize.lidar_to_top_batch(points, cfg, return_occ=True)
        front = voxelize.lidar_to_front_batch(points, cfg)
        return forward(variables, top, rgb, front, occ=occ, **toggles)

    variants = [
        ("full", {}),
        ("no-rcnn-nms", {"no_rcnn_nms": True}),
        ("no-fusion", {"no_fusion": True}),
        ("cheap-roi", {"cheap_roi": True}),
        ("no-proposal", {"no_proposal": True}),
        ("no-anchmask", {"no_anchmask": True}),
        ("mask-traced-ones", {"traced_ones_mask": True}),
        ("mask-no-interleave", {"no_interleave": True}),
        ("rpn-only", {"rpn_only": True}),
    ]
    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]
    results = {}
    for name, toggles in variants:
        f = jax.jit(partial(pipeline, **toggles))
        t0 = time.time()
        jax.block_until_ready(f(variables, pts[0], rgbs[0]))
        log(f"[{name}] compile {time.time()-t0:.1f}s")
        for i in range(2 * N_DIST):
            out = f(variables, pts[i % N_DIST], rgbs[i % N_DIST])
        jax.block_until_ready(out)
        t0 = time.time()
        outs = []
        for i in range(N_MEAS):
            outs.append(f(variables, pts[i % N_DIST], rgbs[i % N_DIST]))
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / N_MEAS / B * 1000
        results[name] = dt
        log(f"[{name}] {dt:.3f} ms/frame")

    full = results["full"]
    log("\n--- deltas vs full (positive = stage cost) ---")
    for name, _ in variants[1:]:
        log(f"{name:14s} {full - results[name]:+.3f} ms/frame")


if __name__ == "__main__":
    main()
