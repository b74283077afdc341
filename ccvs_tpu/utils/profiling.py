"""Profiling / tracing hooks.

The reference has no profiler integration (SURVEY.md section 5.1: unprinted
`time.time()` probes only). Here: `jax.profiler` trace capture around
training/generation steps, named step annotations, and a transfer-based
synchronizer (on some remote TPU backends `block_until_ready` returns before
execution finishes, so a device->host transfer is the only reliable barrier).
"""

import contextlib
import time
from typing import Optional

import jax
import numpy as np


def device_sync(x):
    """Reliable completion barrier: transfer one element to host."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.reshape(-1)[:1])


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None).
    View with tensorboard's profile plugin."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def step_annotation(name: str, step: int):
    """Named step region for the trace viewer."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


class Timer:
    """Wall-clock step timer with transfer-sync; logs steps/sec."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self._t0 = time.perf_counter()
        self._n = 0

    def tick(self, result=None) -> Optional[float]:
        """Returns steps/sec every ``sync_every`` calls (else None)."""
        self._n += 1
        if self._n % self.sync_every:
            return None
        if result is not None:
            device_sync(result)
        dt = time.perf_counter() - self._t0
        rate = self.sync_every / dt
        self._t0 = time.perf_counter()
        return rate
