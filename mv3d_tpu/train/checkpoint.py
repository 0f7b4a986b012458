"""Per-subnet checkpointing (compressed-npz flat dicts).

TPU-native equivalent of the reference's per-scope ``tf.train.Saver`` wrapper
``Net`` (reference src/mv3d.py:117-161): each subnet
(``top_view_rpn`` / ``image_feature`` / ``front_feature`` / ``fusion``) is
saved and restored independently under ``checkpoint/<tag>/<subnet>/<step>``,
enabling mix-and-match loading of pretrained subnets for staged training
(``train.py -w``, mv3d.py:522-537). Training progress (the global step) is
stored alongside, replacing the reference's pickled
``log/train_progress/<tag>/progress.data`` (mv3d.py:963-977).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


class SubnetCheckpointer:
    """Saves/restores one subnet's variables (params + batch_stats).

    Uses compressed ``.npz`` flat-dict files — dependency-light, atomic via
    rename, and structurally identical to what orbax would store for these
    small (~10^7 param) subnets.
    """

    def __init__(self, name: str, checkpoint_dir: str):
        self.name = name
        self.dir = os.path.join(checkpoint_dir, name)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.dir, f"{self.name}-{step}.npz")

    def save(self, variables, step: int = 0):
        flat = _flatten(jax.device_get(variables))
        tmp = self._path(step) + ".tmp"
        with open(tmp, "wb") as f:   # file object: savez won't append ".npz"
            np.savez_compressed(f, **flat)
        os.replace(tmp, self._path(step))

    def latest_step(self) -> Optional[int]:
        steps = []
        for f in os.listdir(self.dir):
            if f.startswith(self.name + "-") and f.endswith(".npz"):
                try:
                    steps.append(int(f[len(self.name) + 1:-4]))
                except ValueError:
                    pass
        return max(steps) if steps else None

    def load(self, step: Optional[int] = None):
        """Returns the stored variable tree, or None if no checkpoint exists
        (parity with the reference's use-default-weights fallback,
        mv3d.py:142-148)."""
        step = self.latest_step() if step is None else step
        if step is None or not os.path.exists(self._path(step)):
            return None
        with np.load(self._path(step)) as z:
            flat = {k: z[k] for k in z.files}
        return _unflatten(flat)

    def clean(self):
        """Remove all weights of this subnet (parity: clean_weights,
        mv3d.py:135-139)."""
        shutil.rmtree(self.dir, ignore_errors=True)
        os.makedirs(self.dir, exist_ok=True)


def save_progress(log_dir: str, tag: str, step: int):
    path = os.path.join(log_dir, "train_progress", tag)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "progress.txt"), "w") as f:
        f.write(str(step))


def load_progress(log_dir: str, tag: str) -> int:
    path = os.path.join(log_dir, "train_progress", tag, "progress.txt")
    if os.path.exists(path):
        with open(path) as f:
            return int(f.read().strip())
    return 0
