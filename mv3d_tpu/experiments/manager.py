"""Experiment manager: discover, fast-check, then run experiment scripts in
sandboxed environments.

Parity: reference ``experiments/manager.py:84-166`` — each ``exp_*`` directory
holds a ``task.py``; the manager builds a sandbox (symlinked log/checkpoint/
data dirs so experiments share storage but not state), smoke-tests each
experiment with a 1-iteration budget, then runs it for real.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
from typing import List, Optional


class Manager:
    def __init__(self, experiments_dir: str = "experiments",
                 shared_dirs=("log", "checkpoint", "data")):
        self.experiments_dir = experiments_dir
        self.shared_dirs = shared_dirs

    def discover(self) -> List[str]:
        return sorted(
            d for d in glob.glob(os.path.join(self.experiments_dir, "exp_*"))
            if os.path.isdir(d) and os.path.exists(os.path.join(d, "task.py")))

    def create_env(self, exp_dir: str):
        """Symlink shared storage into the experiment sandbox
        (parity: Manager.creat_env, manager.py:109-123)."""
        for sub in self.shared_dirs:
            target = os.path.abspath(sub)
            os.makedirs(target, exist_ok=True)
            link = os.path.join(exp_dir, sub)
            if not os.path.lexists(link):
                os.symlink(target, link)

    def _run(self, exp_dir: str, fast_test: bool) -> int:
        env = dict(os.environ)
        env["PYTHONPATH"] = (os.path.abspath(".") + os.pathsep +
                             env.get("PYTHONPATH", ""))
        args = [sys.executable, "task.py", "-n", os.path.basename(exp_dir)]
        if fast_test:
            args += ["-t", "True"]
        return subprocess.call(args, cwd=exp_dir, env=env)

    def check(self, exp_dir: str) -> bool:
        """1-iteration smoke test (parity: manager.py:143-155)."""
        self.create_env(exp_dir)
        return self._run(exp_dir, fast_test=True) == 0

    def run(self, exp_dir: str) -> bool:
        self.create_env(exp_dir)
        return self._run(exp_dir, fast_test=False) == 0

    def run_all(self, check_first: bool = True) -> dict:
        results = {}
        exps = self.discover()
        if check_first:
            for e in exps:
                if not self.check(e):
                    results[e] = "check_failed"
        for e in exps:
            if results.get(e) == "check_failed":
                continue
            results[e] = "ok" if self.run(e) else "run_failed"
        return results
