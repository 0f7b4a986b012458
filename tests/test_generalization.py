"""Synthetic generalization gate: train on N fixture frames, score on M
HELD-OUT frames the model never saw (VERDICT r4 next-round #3).

This is the strongest accuracy proxy buildable without real KITTI data:
``make_fixture`` samples each frame's car pose and size independently, so a
model that merely memorizes training-frame anchor responses scores ~0 3D IoU
on the held-out frames, while a model whose (translation-equivariant) BEV
trunk actually learned the car-cluster signature localizes them. The chain
under test is the full rehearsal command: fixture -> layout check -> split
-> staged two-stage training -> per-frame prediction -> tracklet XML ->
iou_per_obj.csv / pr_per_iou.csv (reference end state
evaluate_tracklets.py:359-366; split training src/train.py:132-139).

The gate value (held-out mean 3D IoU and a PR point) is recorded per round
in BASELINE.md ("generalization gate" row).
"""

import json
import os

import pytest

from test_cli_mains import TINY_OVERRIDES

# Floor calibrated on the round-5 build host (measured 0.52 held-out IoU at
# 150 iters/stage, seed 0); 0.30 leaves headroom for backend numeric drift
# while still failing hard if the model stops generalizing (memorization
# alone scores ~0 because every held-out pose is an independent draw).
IOU_FLOOR = 0.30


@pytest.mark.slow   # two-stage training on 8 frames: minutes, not seconds
def test_heldout_generalization(tmp_path, capsys):
    from mv3d_tpu.cli.rehearsal import main

    cfgfile = tmp_path / "tiny.json"
    cfgfile.write_text(json.dumps(TINY_OVERRIDES))
    out = str(tmp_path / "gen")
    res = main(["--synthetic-fixture", "--fixture-frames", "10", "-o", out,
                "-i", "150", "-b", "2", "--score-threshold", "0.05",
                "--split-fraction", "0.8", "--config", str(cfgfile)])

    # the split really held frames out
    with open(os.path.join(out, "splits", "train.txt")) as f:
        train_tags = set(f.read().split())
    with open(os.path.join(out, "splits", "val.txt")) as f:
        val_tags = set(f.read().split())
    assert len(val_tags) == 2 and len(train_tags) == 8
    assert not (train_tags & val_tags)

    # held-out detection quality above the floor
    iou = res["iou_per_obj"]["All"]
    assert iou > IOU_FLOOR, (
        f"held-out 3D IoU {iou:.3f} <= floor {IOU_FLOOR}: the model stopped "
        f"generalizing to unseen poses (train tags {sorted(train_tags)})")

    # ...and at least one PR operating point finds the held-out cars
    lo = min(res["pr_per_iou"])
    pr = res["pr_per_iou"][lo]
    assert pr["recall"] > 0.0 and pr["precision"] > 0.0, res["pr_per_iou"]

    # the CSVs the reference publishes exist
    assert os.path.exists(os.path.join(out, "eval", "iou_per_obj.csv"))
    assert os.path.exists(os.path.join(out, "eval", "pr_per_iou.csv"))
    print(f"generalization gate: held-out IoU {iou:.3f} "
          f"(floor {IOU_FLOOR}), PR@{lo}: {pr}")
