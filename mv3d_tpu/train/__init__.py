"""Training: in-graph targets, masked losses, checkpointing, Trainer API.

``Trainer``/``MV3D``/``Predictor`` are exposed lazily to avoid a circular
import (models.mv3d_net uses train.losses/train.targets).
"""

from . import checkpoint, losses, targets  # noqa: F401

_LAZY = ("MV3D", "Predictor", "PredictorForTest", "Trainer", "TesterRPN",
         "TesterRPNTarget", "Tester3DOP")
__all__ = ["checkpoint", "losses", "targets", *_LAZY]


def __getattr__(name):
    if name in _LAZY:
        from . import trainer
        return getattr(trainer, name)
    raise AttributeError(name)
