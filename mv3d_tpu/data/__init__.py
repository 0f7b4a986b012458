"""Data layer: KITTI readers, tracklet XML I/O, batch loader, offline dump."""

from . import kitti, loader, preprocess, tracklets  # noqa: F401
from .kitti import Frame, KittiObjectDataset, KittiRawDataset  # noqa: F401
from .loader import BatchLoader, frames_to_batch  # noqa: F401
from .tracklets import TrackletSaver, parse_tracklets, read_objects  # noqa: F401
