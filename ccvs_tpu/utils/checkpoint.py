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
    """``async_save=True`` turns saves into the production TPU pattern:
    snapshot the state on-device (cheap HBM copy, safe against the train
    step's buffer donation), then stream it to disk on background threads
    while training continues. ``wait()`` (or the next save/load) joins the
    in-flight write; the rolling latest/best dirs are only swapped after
    the previous write finished, so a crash never leaves a half "latest".
    """

    def __init__(self, path: str, async_save: bool = False):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)
        self.async_save = async_save
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
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
        if self.async_save:
            # join any in-flight write before touching its directories
            self._ckptr.wait_until_finished()
            # device-side snapshot: the caller's arrays may be DONATED into
            # the next jitted step while the background write still reads
            import jax.numpy as jnp

            tree = jax.tree_util.tree_map(
                lambda x: jnp.copy(x) if isinstance(x, jax.Array) else np.asarray(x),
                tree)
        else:
            tree = jax.tree_util.tree_map(np.asarray, tree)
        for i, kind in enumerate(kinds):
            for old_step, old_dir in self._find(label, kind) if kind else []:
                shutil.rmtree(old_dir, ignore_errors=True)
            d = self._dir(label, step, kind)
            shutil.rmtree(d, ignore_errors=True)
            if self.async_save:
                self._ckptr.save(d, args=ocp.args.StandardSave(tree))
            else:
                self._ckptr.save(d, tree)
            if not self.async_save or i < len(kinds) - 1:
                # only the LAST kind's write may stay in flight
                self._ckptr.wait_until_finished()

    def wait(self):
        """Join the in-flight async write (no-op for sync managers)."""
        self._ckptr.wait_until_finished()

    def load(self, label: str, which="latest", target: Optional[Any] = None) -> Any:
        """Resolve like `load_network` (`models/__init__.py:63-97`):
        ``which`` is "latest", "best", or an int step."""
        self._ckptr.wait_until_finished()
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
            if self.async_save:
                return self._ckptr.restore(d, args=ocp.args.StandardRestore(target))
            return self._ckptr.restore(d, target=target)
        return self._ckptr.restore(d)

    def step_of(self, label: str, which="latest") -> int:
        found = self._find(label, which if which in ("latest", "best") else "")
        if not found:
            return 0
        return found[-1][0]
