"""Checkpointing with latest/best semantics.

Replaces the reference's per-net `.pth` scheme (`models/__init__.py:5-125`:
``{label}_net_{iter}.pth`` + rolling ``latest`` + ``best``) with orbax
checkpoints of whole train-state pytrees, keeping the same resolution rules:

- `save(..., latest=True)` keeps a rolling latest (old latest deleted);
- `save(..., best=True)` tracks the best eval checkpoint;
- `load(..., which="latest"|"best"|iter)` resolves like the reference glob.
"""

import os
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _dir(self, label: str, step: int, kind: str = "") -> str:
        kind = f"{kind}_" if kind else ""
        return os.path.join(self.path, f"{label}_{kind}{step:08d}")

    def _find(self, label: str, kind: str = "") -> list:
        kind = f"{kind}_" if kind else ""
        pat = re.compile(rf"^{re.escape(label)}_{kind}(\d+)$")
        out = []
        for d in os.listdir(self.path):
            m = pat.match(d)
            if m:
                out.append((int(m.group(1)), os.path.join(self.path, d)))
        return sorted(out)

    def save(self, label: str, step: int, tree: Any, latest: bool = False,
             best: bool = False):
        """Save a pytree; with ``latest``/``best`` keep rolling copies
        (reference `models/__init__.py:5-26`)."""
        kinds = [""] if not (latest or best) else []
        if latest:
            kinds.append("latest")
        if best:
            kinds.append("best")
        tree = jax.tree_util.tree_map(np.asarray, tree)
        for kind in kinds:
            for old_step, old_dir in self._find(label, kind) if kind else []:
                shutil.rmtree(old_dir, ignore_errors=True)
            d = self._dir(label, step, kind)
            shutil.rmtree(d, ignore_errors=True)
            self._ckptr.save(d, tree)
            self._ckptr.wait_until_finished()

    def load(self, label: str, which="latest", target: Optional[Any] = None) -> Any:
        """Resolve like `load_network` (`models/__init__.py:63-97`):
        ``which`` is "latest", "best", or an int step."""
        if which in ("latest", "best"):
            found = self._find(label, which)
            if not found:
                raise FileNotFoundError(f"no {which} checkpoint for {label} in {self.path}")
            d = found[-1][1]
        else:
            d = self._dir(label, int(which))
            if not os.path.isdir(d):
                raise FileNotFoundError(d)
        if target is not None:
            return self._ckptr.restore(d, target=target)
        return self._ckptr.restore(d)

    def step_of(self, label: str, which="latest") -> int:
        found = self._find(label, which if which in ("latest", "best") else "")
        if not found:
            return 0
        return found[-1][0]
