"""KITTI dataset readers: object benchmark layout and raw drives.

Host-side replacements for the reference's reader stack — the pykitti fork
(src/kitti_data/pykitti/raw.py), ``raw_data.py`` tag-keyed readers, and the
``KittiLoading`` file discovery (src/utils/batch_loading.py:550-640) — with a
single numpy/PIL implementation and no GPU coupling.
"""

from __future__ import annotations

import glob
import math
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config, cfg as _default_cfg
from ..ops import boxes3d as box3d_ops
from . import tracklets as tracklet_io


def read_velodyne(path: str) -> np.ndarray:
    """Load a KITTI .bin scan -> (N, 4) float32 [x, y, z, reflectance]."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def read_image(path: str) -> np.ndarray:
    """Load an RGB image -> (H, W, 3) uint8."""
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def kitti_label_to_lidar_box3d(label_lines: Sequence[str],
                               object_type: str = "Car",
                               positive_only: bool = True,
                               cfg: Config = _default_cfg):
    """Parse KITTI label_2 txt lines into lidar-frame 3D boxes.

    Parity: reference ``kitti_label_to_lidar_box3d`` (src/data.py:186-221):
    camera (x,y,z) -> lidar via the calibration inverse, rz = -ry - pi/2,
    category grouping {Car, Van} / {Pedestrian} / {Cyclist}.

    Returns (boxes3d (N,8,3), labels (N,)) — unlike the reference this always
    returns labels (it returns them only when positive_only=False).
    """
    for cat in (["Car", "Van"], ["Pedestrian"], ["Cyclist"]):
        if object_type in cat:
            category = cat
            break
    else:
        return np.zeros((0, 8, 3), np.float32), np.zeros(0, np.int32)

    boxes, labels = [], []
    for line in label_lines:
        parts = line.split()
        if not parts:
            continue
        obj = parts[0]
        if positive_only and obj not in category:
            continue
        if obj == "DontCare":
            continue
        h, w, l, x, y, z, ry = [float(v) for v in parts[8:15]]
        xl, yl, zl = np.asarray(box3d_ops.camera_to_lidar_points(
            np.array([[x, y, z]], np.float32), cfg))[0]
        rz = -ry - math.pi / 2
        box = np.asarray(box3d_ops.box3d_compose(
            (xl, yl, zl), (h, w, l), (0.0, 0.0, rz), cfg))
        boxes.append(box)
        labels.append(1 if obj in category else 0)
    if not boxes:
        return np.zeros((0, 8, 3), np.float32), np.zeros(0, np.int32)
    return (np.stack(boxes).astype(np.float32),
            np.asarray(labels, np.int32))


@dataclass
class Frame:
    tag: str
    points: np.ndarray            # (N, 4) lidar
    rgb: Optional[np.ndarray]     # (H, W, 3) uint8 or None
    gt_boxes3d: np.ndarray        # (G, 8, 3)
    gt_labels: np.ndarray         # (G,)


class KittiObjectDataset:
    """KITTI object benchmark layout (parity: KittiLoading,
    batch_loading.py:550-640).

    Expects ``<root>/training/{image_2,velodyne,label_2}`` plus an optional
    split file of frame tags (one per line).
    """

    def __init__(self, object_dir: str, split_file: str = "",
                 is_testset: bool = False, object_type: str = "Car",
                 cfg: Config = _default_cfg):
        self.object_dir = object_dir
        self.cfg = cfg
        self.is_testset = is_testset
        self.object_type = object_type
        sub = "testing" if is_testset else "training"

        if split_file:
            with open(split_file) as f:
                self.tags = [l.strip() for l in f if l.strip()]
        else:
            labels = sorted(glob.glob(
                os.path.join(object_dir, sub, "velodyne", "*.bin")))
            self.tags = [os.path.splitext(os.path.basename(p))[0]
                         for p in labels]
        self.sub = sub

    def __len__(self):
        return len(self.tags)

    def _p(self, kind: str, tag: str, ext: str) -> str:
        return os.path.join(self.object_dir, self.sub, kind, tag + ext)

    def load_frame(self, i: int) -> Frame:
        tag = self.tags[i]
        points = read_velodyne(self._p("velodyne", tag, ".bin"))
        rgb_path = self._p("image_2", tag, ".png")
        rgb = read_image(rgb_path) if os.path.exists(rgb_path) else None
        if self.is_testset:
            gt_boxes = np.zeros((0, 8, 3), np.float32)
            gt_labels = np.zeros(0, np.int32)
        else:
            with open(self._p("label_2", tag, ".txt")) as f:
                lines = f.readlines()
            gt_boxes, gt_labels = kitti_label_to_lidar_box3d(
                lines, self.object_type, positive_only=False, cfg=self.cfg)
        return Frame(tag=tag, points=points, rgb=rgb,
                     gt_boxes3d=gt_boxes, gt_labels=gt_labels)


class KittiRawDataset:
    """KITTI raw drive layout with tracklet gt.

    Expects ``<root>/<date>/<date>_drive_<id>_sync/{velodyne_points/data,
    image_02/data, tracklet_labels.xml}`` — the layout consumed by the
    reference's pykitti fork (src/kitti_data/pykitti/raw.py:17-300) — or,
    when that directory is absent, the Didi bag-converter layout
    ``<root>/<date>/<drive>/...`` (same subtree without the ``_sync``
    naming; reference data.py:692-699 switches on DATA_SETS_TYPE the same
    way).
    """

    def __init__(self, raw_dir: str, date: str, drive: str,
                 cfg: Config = _default_cfg):
        self.cfg = cfg
        self.date = date
        self.drive = drive
        base = os.path.join(raw_dir, date, f"{date}_drive_{drive}_sync")
        if not os.path.isdir(base):
            base = os.path.join(raw_dir, date, drive)   # didi layout
        self.base = base
        self.velo_files = sorted(glob.glob(
            os.path.join(base, "velodyne_points", "data", "*.bin")))
        self.rgb_files = sorted(glob.glob(
            os.path.join(base, "image_02", "data", "*.png")))
        self.tracklet_file = os.path.join(base, "tracklet_labels.xml")
        n = len(self.velo_files)
        if os.path.exists(self.tracklet_file):
            self.objects = tracklet_io.read_objects(
                self.tracklet_file, range(n), cfg)
        else:
            self.objects = [[] for _ in range(n)]

    def __len__(self):
        return len(self.velo_files)

    def load_frame(self, i: int) -> Frame:
        points = read_velodyne(self.velo_files[i])
        rgb = read_image(self.rgb_files[i]) if i < len(self.rgb_files) else None
        gt_boxes, gt_labels = tracklet_io.objects_to_gt_boxes3d(self.objects[i])
        tag = f"{self.date}_{self.drive}_{i:05d}"
        return Frame(tag=tag, points=points, rgb=rgb,
                     gt_boxes3d=gt_boxes, gt_labels=gt_labels)


class KittiOdometryDataset:
    """KITTI odometry benchmark layout (clean-room counterpart of the
    reference's pykitti odometry reader, src/kitti_data/pykitti/odometry.py
    — not on the reference's live detection path either; provided so drive
    sequences with ego poses load through the same Frame API).

    Expects ``<root>/sequences/<seq>/{calib.txt, times.txt, velodyne/*.bin
    [, image_2/*.png]}`` and optionally ``<root>/poses/<seq>.txt``.
    """

    def __init__(self, base_path: str, sequence: str,
                 cfg: Config = _default_cfg):
        self.cfg = cfg
        self.sequence = sequence
        self.seq_dir = os.path.join(base_path, "sequences", sequence)
        self.pose_file = os.path.join(base_path, "poses", sequence + ".txt")
        self.velo_files = sorted(glob.glob(
            os.path.join(self.seq_dir, "velodyne", "*.bin")))
        self.rgb_files = sorted(glob.glob(
            os.path.join(self.seq_dir, "image_2", "*.png")))

    def load_calib(self) -> Dict[str, np.ndarray]:
        """calib.txt -> {'P0'..'P3': (3,4) projections, 'Tr' and
        'T_cam2_velo': (4,4) velodyne->rectified-camera transforms,
        'K_cam2': (3,3) intrinsics} — the rectified cam2 extrinsic composes
        the P2 baseline shift onto Tr exactly as the reference derives it."""
        out = {}
        with open(os.path.join(self.seq_dir, "calib.txt")) as f:
            for line in f:
                if ":" not in line:
                    continue
                k, v = line.split(":", 1)
                out[k.strip()] = np.array(v.split(), dtype=np.float64)
        for k in ("P0", "P1", "P2", "P3"):
            if k in out:
                out[k] = out[k].reshape(3, 4)
        if "Tr" in out:
            tr = np.vstack([out["Tr"].reshape(3, 4), [0, 0, 0, 1]])
            out["Tr"] = tr
            if "P2" in out:
                t2 = np.eye(4)
                t2[0, 3] = out["P2"][0, 3] / out["P2"][0, 0]
                out["T_cam2_velo"] = t2 @ tr
                out["K_cam2"] = out["P2"][:3, :3]
        return out

    def load_poses(self) -> np.ndarray:
        """poses/<seq>.txt -> (N, 4, 4) world-from-cam0 transforms; empty
        (0, 4, 4) when ground truth is unavailable (test sequences)."""
        if not os.path.exists(self.pose_file):
            return np.zeros((0, 4, 4), np.float64)
        flat = np.loadtxt(self.pose_file, dtype=np.float64).reshape(-1, 3, 4)
        n = len(flat)
        out = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
        out[:, :3, :] = flat
        return out

    def load_timestamps(self) -> np.ndarray:
        """times.txt -> (N,) seconds (float64)."""
        return np.loadtxt(os.path.join(self.seq_dir, "times.txt"),
                          dtype=np.float64).reshape(-1)

    def __len__(self):
        return len(self.velo_files)

    def load_frame(self, i: int) -> Frame:
        points = read_velodyne(self.velo_files[i])
        rgb = read_image(self.rgb_files[i]) if i < len(self.rgb_files) else None
        return Frame(tag=f"{self.sequence}_{i:06d}", points=points, rgb=rgb,
                     gt_boxes3d=np.zeros((0, 8, 3), np.float32),
                     gt_labels=np.zeros(0, np.int32))
