"""Staged-training recipes (parity: reference ``src/task.py:7-80``).

The reference encodes the published two-stage MV3D training schedule as shell
recipes: train the RPN alone, then the image/fusion stages, re-running failed
commands up to 3 times. Here the same recipes drive the Trainer API directly.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

from ..config import Config, cfg as _default_cfg
from ..models.nets import (FRONT_FEATURE, FUSION, IMAGE_FEATURE, SUBNET_NAMES,
                           TOP_VIEW_RPN)


def run_task(fn: Callable[[], object], retries: int = 3,
             min_seconds: float = 10.0, log=print):
    """Run ``fn``, retrying up to ``retries`` times if it fails or exits
    suspiciously fast (parity: task.py:7-23)."""
    for attempt in range(retries):
        t0 = time.time()
        try:
            out = fn()
        except Exception as e:  # noqa: BLE001 — retry wrapper by design
            log(f"task attempt {attempt + 1} failed: {e}")
            continue
        if time.time() - t0 >= min_seconds or attempt == retries - 1:
            return out
        log(f"task attempt {attempt + 1} finished suspiciously fast; retrying")
    raise RuntimeError(f"task failed after {retries} attempts")


class Task:
    """Staged-training driver over a Trainer factory.

    ``trainer_factory(train_targets, continue_train, pretrained)`` must return
    a Trainer. Recipes mirror reference Task.train_rpn /
    train_img_and_fusion (task.py:26-80).
    """

    def __init__(self, trainer_factory, fast_test: bool = False):
        self.factory = trainer_factory
        self.iters = 1 if fast_test else 10000

    def train_rpn(self, rounds: int = 1):
        """Stage 1: RPN alone (then alternate further rounds)."""
        tr = self.factory([TOP_VIEW_RPN], continue_train=False, pretrained=[])
        run_task(lambda: tr(max_iter=self.iters))
        for _ in range(rounds - 1):
            tr = self.factory([TOP_VIEW_RPN], continue_train=True,
                              pretrained=[])
            run_task(lambda: tr(max_iter=self.iters))
        return tr

    def train_img_and_fusion(self, rounds: int = 1):
        """Stage 2: image + fusion heads on top of a pretrained RPN."""
        targets = [IMAGE_FEATURE, FRONT_FEATURE, FUSION]
        tr = self.factory(targets, continue_train=False,
                          pretrained=[TOP_VIEW_RPN])
        run_task(lambda: tr(max_iter=self.iters))
        for _ in range(rounds - 1):
            tr = self.factory(targets, continue_train=True,
                              pretrained=[TOP_VIEW_RPN])
            run_task(lambda: tr(max_iter=self.iters))
        return tr

    def train_all(self):
        """End-to-end fine-tune of every subnet (the full-net loss mix)."""
        tr = self.factory(list(SUBNET_NAMES), continue_train=True,
                          pretrained=list(SUBNET_NAMES))
        run_task(lambda: tr(max_iter=self.iters))
        return tr
