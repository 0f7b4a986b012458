"""Utilities: logging, timing, MAC counting, profiling."""

from .logger import Logger  # noqa: F401
from .timer import Timer  # noqa: F401
