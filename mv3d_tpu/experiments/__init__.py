"""Experiment orchestration: sandboxed runs and staged-training recipes."""

from .manager import Manager  # noqa: F401
from .task import Task, run_task  # noqa: F401
