"""ctypes bindings for the native host preprocessing library.

Builds ``libmv3d_native.so`` on demand (``make`` in this directory) and falls
back to the numpy implementations in :mod:`mv3d_tpu.ops.voxelize_ref` when no
compiler is available. This mirrors the reference's ctypes C voxelizer
(``cfg.USE_CLIDAR_TO_TOP`` -> LidarTopPreprocess.c, reference
src/data.py:21-23, 265-291) as a host-side acceleration + golden oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from ..config import Config, cfg as _default_cfg

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmv3d_native.so")
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    f = ctypes.c_float
    i = ctypes.c_int
    p = ctypes.c_void_p
    lib.mv3d_crop_pad.restype = i
    lib.mv3d_crop_pad.argtypes = [p, i, p, i, f, f, f, f, f, f, f, i]
    lib.mv3d_lidar_to_top.restype = None
    lib.mv3d_lidar_to_top.argtypes = [p, i, p] + [f] * 9 + [i] * 4
    lib.mv3d_lidar_to_front.restype = None
    lib.mv3d_lidar_to_front.argtypes = [p, i, p] + [f] * 9 + [i] * 9
    lib.mv3d_lidar_to_top_aux.restype = None
    lib.mv3d_lidar_to_top_aux.argtypes = [p, i, p] + [f] * 9 + [i] * 4
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def crop_pad(points: np.ndarray, max_points: int,
             cfg: Config = _default_cfg, pad_val: float = -1e9
             ) -> Tuple[np.ndarray, int]:
    """Crop to grid bounds and pad to (max_points, 4). Native if available."""
    points = np.ascontiguousarray(points, dtype=np.float32)
    t = cfg.top
    fc = 1 if cfg.dataset_type in ("didi", "didi2", "test") else 0
    lib = _load()
    out = np.empty((max_points, 4), np.float32)
    if lib is not None:
        n = lib.mv3d_crop_pad(_c(points), len(points), _c(out), max_points,
                              t.x_min, t.x_max, t.y_min, t.y_max,
                              t.z_min, t.z_max, pad_val, fc)
        return out, int(n)
    from ..ops.voxelize_ref import crop_mask
    kept = points[crop_mask(points, cfg)]
    n = min(len(kept), max_points)
    out.fill(pad_val)
    out[:, 3] = 0.0
    out[:n] = kept[:n]
    return out, n


def lidar_to_top(points: np.ndarray, cfg: Config = _default_cfg) -> np.ndarray:
    """Native BEV voxelizer (reference semantics); numpy fallback."""
    lib = _load()
    if lib is None:
        from ..ops.voxelize_ref import lidar_to_top_np
        return lidar_to_top_np(points, cfg)
    points = np.ascontiguousarray(points, dtype=np.float32)
    t = cfg.top
    fc = 1 if cfg.dataset_type in ("didi", "didi2", "test") else 0
    top = np.zeros(t.shape, np.float32)
    lib.mv3d_lidar_to_top(_c(points), len(points), _c(top),
                          t.x_min, t.x_max, t.y_min, t.y_max,
                          t.z_min, t.z_max, t.x_div, t.y_div, t.z_div,
                          t.xn, t.yn, t.zn, fc)
    return top


def lidar_to_top_aux(points: np.ndarray, cfg: Config = _default_cfg
                     ) -> np.ndarray:
    """(Xn, Yn, 2) [intensity, density] aux plane (reference semantics).

    Native single pass; numpy-oracle fallback slices the full voxelization.
    """
    t = cfg.top
    lib = _load()
    if lib is None:
        from ..ops.voxelize_ref import lidar_to_top_np
        return lidar_to_top_np(points, cfg)[:, :, t.zn:]
    points = np.ascontiguousarray(points, dtype=np.float32)
    fc = 1 if cfg.dataset_type in ("didi", "didi2", "test") else 0
    aux = np.zeros((t.xn, t.yn, 2), np.float32)
    lib.mv3d_lidar_to_top_aux(_c(points), len(points), _c(aux),
                              t.x_min, t.x_max, t.y_min, t.y_max,
                              t.z_min, t.z_max, t.x_div, t.y_div, t.z_div,
                              t.xn, t.yn, t.zn, fc)
    return aux


def lidar_to_front(points: np.ndarray, cfg: Config = _default_cfg) -> np.ndarray:
    """Native front-view projector (reference semantics); numpy fallback."""
    lib = _load()
    if lib is None:
        from ..ops.voxelize_ref import lidar_to_front_np
        return lidar_to_front_np(points, cfg)
    points = np.ascontiguousarray(points, dtype=np.float32)
    t, f = cfg.top, cfg.front
    # center-car filter is top-view-only in the reference (front view crops
    # to the grid bounds alone, src/data.py:72-85)
    fc = 0
    front = np.zeros(f.shape, np.float32)
    lib.mv3d_lidar_to_front(_c(points), len(points), _c(front),
                            t.x_min, t.x_max, t.y_min, t.y_max,
                            t.z_min, t.z_max, f.angular_res, f.vertical_res,
                            f.velodyne_height, f.c_offset, f.r_offset,
                            f.c_min, f.c_max, f.r_min, f.r_max,
                            f.width, f.height, fc)
    return front
