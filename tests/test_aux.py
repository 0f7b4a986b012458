"""Tests for auxiliary subsystems: UKF/tracker, MAC counter, data checks,
splitter, experiment task retry, viz renderers."""

import os

import numpy as np
import pytest

from mv3d_tpu.tracking import MultiObjectTracker, UnscentedKalmanFilter
from mv3d_tpu.utils import datacheck, macs, viz
from mv3d_tpu.experiments.task import run_task
from mv3d_tpu.config import kitti_config

CFG = kitti_config()


def test_ukf_tracks_constant_velocity():
    ukf = UnscentedKalmanFilter()
    rng = np.random.RandomState(0)
    # object moving at 10 m/s along x
    for i in range(30):
        z = np.array([i * 1.0, 5.0]) + rng.normal(0, 0.1, 2)
        ukf.step(z, dt=0.1)
    assert abs(ukf.x[0] - 29.0) < 0.5
    assert abs(ukf.x[1] - 5.0) < 0.3
    assert abs(ukf.x[2] - 10.0) < 1.5     # velocity estimate
    assert abs(ukf.x[3]) < 0.2            # heading ~ 0


def test_ukf_turning():
    ukf = UnscentedKalmanFilter()
    dt, v, yawd = 0.1, 8.0, 0.3
    yaw, px, py = 0.0, 0.0, 0.0
    for i in range(50):
        px += v * dt * np.cos(yaw)
        py += v * dt * np.sin(yaw)
        yaw += yawd * dt
        ukf.step(np.array([px, py]), dt=dt)
    assert np.linalg.norm(ukf.x[0:2] - [px, py]) < 0.5
    assert abs(ukf.x[4] - yawd) < 0.15


def test_tracker_association():
    tr = MultiObjectTracker(dt=0.1, min_hits=2)
    for i in range(6):
        dets = np.array([[10.0 + i * 0.5, 2.0, -1.0],
                         [30.0, -5.0 - i * 0.5, -1.0]])
        sizes = np.tile([1.5, 1.6, 4.0], (2, 1))
        yaws = np.zeros(2)
        confirmed = tr.update(dets, sizes, yaws)
    assert len(confirmed) == 2
    ids = sorted(t.track_id for t in confirmed)
    assert ids == [0, 1]
    # both tracks accumulated full history
    assert all(t.hits == 6 for t in confirmed)


def test_tracker_drops_stale():
    tr = MultiObjectTracker(dt=0.1, max_missed=2, min_hits=1)
    tr.update(np.array([[5.0, 0.0, 0.0]]), np.array([[1.5, 1.6, 4.0]]),
              np.zeros(1))
    for _ in range(4):
        tr.update(np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0))
    assert len(tr.tracks) == 0


def test_count_params():
    tree = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(7)}}
    assert macs.count_params(tree) == 19


def test_datacheck_and_split(tmp_path):
    for sub in ("top", "gt_boxes3d", "gt_labels"):
        os.makedirs(tmp_path / sub)
    for i in range(4):
        tag = f"2011_09_26_0005_{i:05d}"
        (tmp_path / "top" / f"{tag}.npy.npz").touch()
        (tmp_path / "gt_boxes3d" / f"{tag}.npy").touch()
        if i != 2:
            (tmp_path / "gt_labels" / f"{tag}.npy").touch()
    res = datacheck.check_preprocessed_dir(str(tmp_path))
    assert not res["ok"]
    assert len(res["missing"]["gt_labels"]) == 1

    tags = [f"d{di}_{i:05d}" for di in range(10) for i in range(5)]
    train, val = datacheck.split_train_val(tags, 0.7, by_drive=True)
    assert len(train) + len(val) == 50
    train_drives = {t.rsplit("_", 1)[0] for t in train}
    val_drives = {t.rsplit("_", 1)[0] for t in val}
    assert not (train_drives & val_drives)
    assert len(train_drives) == 7


def test_run_task_retries():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise RuntimeError("boom")
        return "done"

    assert run_task(flaky, retries=3, min_seconds=0.0,
                    log=lambda *a: None) == "done"
    assert len(calls) == 2


def test_viz_renderers():
    from mv3d_tpu.ops import boxes3d as b3
    img = np.zeros((100, 120, 3), np.uint8)
    out = viz.draw_boxes2d(img, np.array([[10, 10, 50, 60]]))
    assert out.sum() > 0
    box = np.asarray(b3.box3d_compose([20.0, 0.0, -1.0], [1.5, 1.6, 4.0],
                                      [0, 0, 0.3], CFG))[None]
    top_img = np.zeros((800, 600, 3), np.uint8)
    out = viz.draw_box3d_on_top(top_img, box, cfg=CFG)
    assert out.sum() > 0
    cam = np.zeros((375, 1242, 3), np.uint8)
    out = viz.draw_rgb_projections(cam, box, cfg=CFG)
    assert out.sum() > 0


def test_seq_motion_tracker_learns():
    from mv3d_tpu.tracking.seq_model import SeqMotionTracker
    rng = np.random.RandomState(0)
    # constant-velocity trajectories with noise
    B, T = 16, 10
    v = rng.uniform(-1, 1, (B, 1, 3))
    t = np.arange(T).reshape(1, T, 1)
    tracks = v * t + rng.normal(0, 0.01, (B, T, 3))
    tr = SeqMotionTracker(hidden=32, lr=5e-3)
    loss = tr.fit(tracks.astype(np.float32), steps=300)
    assert loss < 0.05
    pred = tr.predict_next(tracks[:, :-1])
    err = np.linalg.norm(pred - tracks[:, -1], axis=1)
    assert err.mean() < 0.35, err.mean()


def test_experiment_manager(tmp_path):
    import subprocess, sys
    from mv3d_tpu.experiments.manager import Manager
    exp = tmp_path / "experiments" / "exp_demo"
    os.makedirs(exp)
    with open(exp / "task.py", "w") as f:
        f.write("import sys\n"
                "assert '-n' in sys.argv\n"
                "fast = '-t' in sys.argv\n"
                "print('fast' if fast else 'full')\n")
    m = Manager(str(tmp_path / "experiments"),
                shared_dirs=())
    found = m.discover()
    assert len(found) == 1 and found[0].endswith("exp_demo")
    assert m.check(found[0])
    results = m.run_all()
    assert results[found[0]] == "ok"


def test_viz3d_renderers(tmp_path):
    """Headless 3D cloud / feature-map / gif renderers (the reference's
    mayavi 3d_visualize + lidar_top_feature_visualize equivalents)."""
    from mv3d_tpu.ops import boxes3d as box3d_ops
    from mv3d_tpu.utils import viz3d

    rng = np.random.RandomState(0)
    pts = np.stack([rng.uniform(0, 40, 500), rng.uniform(-10, 10, 500),
                    rng.uniform(-2, 1, 500), rng.uniform(0, 1, 500)],
                   1).astype(np.float32)
    gt = np.asarray(box3d_ops.box3d_compose(
        [10.0, 0.0, -1.5], [1.5, 1.6, 4.0], [0, 0, 0.3], CFG))[None]

    p1 = viz3d.render_cloud_3d(pts, gt, str(tmp_path / "cloud.png"),
                               view="top")
    assert os.path.exists(p1)

    top = rng.rand(40, 30, 5).astype(np.float32)
    p2 = viz3d.render_top_feature_maps(top, gt,
                                       str(tmp_path / "feat.png"),
                                       channels=[0, 2, 4], cfg=CFG)
    assert os.path.exists(p2)
    assert os.path.exists(str(tmp_path / "feat_bev.png"))

    # lidar/gt drive walker + gif assembly
    ldir, gdir = tmp_path / "lidar", tmp_path / "gt"
    os.makedirs(ldir); os.makedirs(gdir)
    for i in range(2):
        np.save(ldir / f"{i:05d}.npy", pts)
        np.save(gdir / f"{i:05d}.npy", gt)
    outs = viz3d.mark_gt_box3d(str(ldir), str(gdir), str(tmp_path / "mark"))
    assert len(outs) == 2 and all(os.path.exists(o) for o in outs)
    gif = viz3d.pngs_to_gif(str(tmp_path / "mark"),
                            str(tmp_path / "mark.gif"))
    assert os.path.exists(gif)


def test_render_cli(tmp_path):
    """cli/render.py: preprocessed drive -> composite frames + gif
    (train_data_render.py equivalent)."""
    from PIL import Image

    from mv3d_tpu.cli import render as render_cli
    from mv3d_tpu.ops import boxes3d as box3d_ops

    rng = np.random.RandomState(1)
    drive = tmp_path / "drive"
    for sub in ("top", "front", "rgb", "gt_boxes3d"):
        os.makedirs(drive / sub)
    gt = np.asarray(box3d_ops.box3d_compose(
        [10.0, 0.0, -1.5], [1.5, 1.6, 4.0], [0, 0, 0.3], CFG))[None]
    for i in range(2):
        tag = f"{i:05d}"
        np.savez_compressed(drive / "top" / (tag + ".npy.npz"),
                            top_view=rng.rand(40, 30, 5).astype(np.float32))
        np.savez_compressed(drive / "front" / (tag + ".npy.npz"),
                            front_view=rng.rand(20, 10, 3).astype(np.float32))
        Image.fromarray((rng.rand(24, 36, 3) * 255).astype(np.uint8)).save(
            drive / "rgb" / (tag + ".png"))
        np.save(drive / "gt_boxes3d" / (tag + ".npy"), gt)
    out = render_cli.main([str(drive), "-o", str(tmp_path / "out")])
    assert os.path.exists(out)
    frames = os.listdir(tmp_path / "out" / "frames")
    assert len(frames) == 2

    # --format avi: same frames into an MJPEG AVI container
    from mv3d_tpu.utils.video import read_avi_info
    avi = render_cli.main([str(drive), "-o", str(tmp_path / "out2"),
                           "--format", "avi", "--fps", "10"])
    assert avi.endswith(".avi")
    info = read_avi_info(avi)
    assert info["frames"] == 2 and info["jpeg_ok"] and info["fps"] == 10


def test_dashboard_renders_from_metrics_jsonl(tmp_path):
    """utils/dashboard + cli/dashboard: MetricsWriter JSONL -> standalone
    HTML with one line chart per metric, training+validation series, and a
    last-values table (the offline stand-in for mv3d.py:833-844 TensorBoard
    scalars)."""
    import os

    from mv3d_tpu.cli.dashboard import main
    from mv3d_tpu.utils.dashboard import load_metrics
    from mv3d_tpu.utils.metrics import MetricsWriter

    mw = MetricsWriter(str(tmp_path), tag="t9")
    for it in range(25):
        mw.write(it, {"top_cls_loss": 1.0 / (it + 1),
                      "top_reg_loss": 2.0 / (it + 1)}, phase="training")
        if it % 10 == 0:
            mw.write(it, {"top_cls_loss": 1.2 / (it + 1)},
                     phase="validation")
    mw.close()

    m = load_metrics(str(tmp_path))
    assert set(m["t9"]) == {"top_cls_loss", "top_reg_loss"}
    assert set(m["t9"]["top_cls_loss"]) == {"training", "validation"}
    assert len(m["t9"]["top_cls_loss"]["training"][0]) == 25

    path = main([str(tmp_path)])
    assert path == os.path.join(str(tmp_path), "dashboard.html")
    text = open(path).read()
    assert text.count("<polyline") == 3      # 2 train + 1 validation series
    assert "top_reg_loss" in text and "legend" in text
    assert "<table>" in text                  # table view exists
    # torn tail line of a live run must not break rendering
    with open(mw.path, "a") as f:
        f.write('{"step": 25, "top_cls')
    main([str(tmp_path)])

    # a stepless record (numeric metrics, no "step" key) must be skipped,
    # not poison _chart's min()/arithmetic (ADVICE r4)
    with open(mw.path, "a") as f:
        f.write('\n{"top_cls_loss": 0.5, "phase": "training"}\n')
    m2 = load_metrics(str(tmp_path))
    assert len(m2["t9"]["top_cls_loss"]["training"][0]) == 25
    main([str(tmp_path)])


def test_mjpeg_avi_writer_roundtrip(tmp_path):
    """utils/video.write_mjpeg_avi produces a structurally valid MJPEG AVI
    (the video-file counterpart of the reference's skvideo mp4 render,
    train_data_render.py:140-152 — this image has no video encoder)."""
    import numpy as np

    from mv3d_tpu.utils.video import read_avi_info, write_mjpeg_avi

    rng = np.random.RandomState(0)
    frames = [(rng.rand(48, 64, 3) * 255).astype(np.uint8) for _ in range(5)]
    path = write_mjpeg_avi(str(tmp_path / "drive.avi"), frames, fps=12)
    info = read_avi_info(path)
    assert info == {"frames": 5, "width": 64, "height": 48, "fps": 12,
                    "jpeg_ok": True, "header_frames": 5}
    # each embedded JPEG decodes back to the right shape
    import io
    import struct

    from PIL import Image
    data = open(path, "rb").read()
    pos = data.index(b"movi") + 4
    size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
    img = Image.open(io.BytesIO(data[pos + 8:pos + 8 + size]))
    assert img.size == (64, 48)
