"""Offline multi-object tracking: CTRV UKF + greedy association."""

from .ukf import UnscentedKalmanFilter  # noqa: F401
from .tracker import Track, MultiObjectTracker  # noqa: F401
