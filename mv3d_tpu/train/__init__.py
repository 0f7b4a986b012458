"""Training: in-graph targets, masked losses, checkpointing, Trainer API.

``Trainer``/``MV3D``/``Predictor`` are exposed lazily to avoid a circular
import (models.mv3d_net uses train.losses/train.targets).
"""

from . import checkpoint, losses, targets  # noqa: F401

__all__ = ["checkpoint", "losses", "targets", "MV3D", "Predictor", "Trainer"]


def __getattr__(name):
    if name in ("MV3D", "Predictor", "Trainer"):
        from . import trainer
        return getattr(trainer, name)
    raise AttributeError(name)
