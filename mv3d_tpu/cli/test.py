"""Test/inspection CLI (parity: reference src/test.py:21-292).

Subcommands:
  test_rpn         dump per-frame proposals (+scores) as npy
  test_mv3d        full-net inference, dump <tag>_boxes3d.npy/<tag>_probs.npy
  test_single_mv3d one-frame inference, print detections
  export_kitti     full-net inference over a split, KITTI txt output
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description="MV3D test utilities (TPU)")
    ap.add_argument("command", choices=["test_rpn", "test_mv3d",
                                        "test_single_mv3d", "export_kitti"])
    ap.add_argument("-n", "--tag", default="unknown_tag")
    ap.add_argument("--kitti-object", required=True)
    ap.add_argument("--split", default="")
    ap.add_argument("--out-dir", default="test_output")
    ap.add_argument("--checkpoint-dir", default="checkpoint")
    ap.add_argument("--score-threshold", type=float, default=None)
    ap.add_argument("--limit", type=int, default=0, help="max frames (0=all)")
    from .common import add_config_args
    add_config_args(ap)
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax.numpy as jnp

    from .common import resolve_config
    cfg = resolve_config(args)
    from ..data.kitti import KittiObjectDataset
    from ..data.loader import frames_to_batch
    from ..train.trainer import Predictor

    ds = KittiObjectDataset(args.kitti_object, split_file=args.split, cfg=cfg)
    predictor = Predictor(cfg, log_tag=args.tag,
                          checkpoint_dir=args.checkpoint_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    n = len(ds) if not args.limit else min(args.limit, len(ds))

    if args.command == "test_rpn":
        import jax
        from ..ops.voxelize import lidar_to_top_batch
        from ..ops.anchors import non_empty_anchor_mask
        from ..ops.proposal import rpn_proposals

        model = predictor.model

        @jax.jit
        def rpn_only(variables, points, num_points):
            top = lidar_to_top_batch(points, cfg, num_points)
            out = model.top_rpn.apply(variables["top_view_rpn"], top, False)
            inside = non_empty_anchor_mask(top[0], model.anchors,
                                           cfg.pipeline.remove_empty_thresh)
            props = rpn_proposals(out["scores"][0], out["deltas"][0],
                                  model.anchors, inside, cfg)
            return props

        for i in range(n):
            f = ds.load_frame(i)
            b = frames_to_batch([f], cfg)
            props = rpn_only(predictor.variables, jnp.asarray(b["points"]),
                             jnp.asarray(b["num_points"]))
            mask = np.asarray(props.mask)
            np.save(os.path.join(args.out_dir, f"{f.tag}_proposals.npy"),
                    np.asarray(props.rois)[mask])
            np.save(os.path.join(args.out_dir, f"{f.tag}_proposal_scores.npy"),
                    np.asarray(props.scores)[mask])
        print(f"dumped proposals for {n} frames to {args.out_dir}")

    elif args.command in ("test_mv3d", "test_single_mv3d"):
        frames = range(1) if args.command == "test_single_mv3d" else range(n)
        for i in frames:
            f = ds.load_frame(i)
            b = frames_to_batch([f], cfg)
            boxes3d, _, probs = predictor.predict_from_points(
                b["points"], b["num_points"], b["rgb"],
                score_threshold=args.score_threshold)
            np.save(os.path.join(args.out_dir, f"{f.tag}_boxes3d.npy"), boxes3d)
            np.save(os.path.join(args.out_dir, f"{f.tag}_probs.npy"), probs)
            if args.command == "test_single_mv3d":
                print(f"{f.tag}: {len(boxes3d)} detections, probs={probs}")
        print(f"dumped detections to {args.out_dir}")

    elif args.command == "export_kitti":
        from ..eval.kitti_export import export_kitti_detections
        dets = {}
        for i in range(n):
            f = ds.load_frame(i)
            b = frames_to_batch([f], cfg)
            boxes3d, _, probs = predictor.predict_from_points(
                b["points"], b["num_points"], b["rgb"],
                score_threshold=args.score_threshold)
            dets[f.tag] = (boxes3d, probs)
        export_kitti_detections(dets, args.out_dir, cfg)
        print(f"wrote KITTI txt for {len(dets)} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
