"""Compute ops: geometry, voxelization, NMS, IoU, anchors, ROI pooling."""

from . import boxes, boxes3d, voxelize, voxelize_ref  # noqa: F401
