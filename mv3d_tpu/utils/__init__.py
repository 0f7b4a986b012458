"""Utilities: logging, timing, metrics, MAC counting, viz, data checks."""

from . import datacheck, macs, metrics, profiling, viz  # noqa: F401
from .logger import Logger  # noqa: F401
from .timer import Timer  # noqa: F401
