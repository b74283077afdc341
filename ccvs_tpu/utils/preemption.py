"""Graceful-preemption handling for long training runs.

Cloud TPU spot/preemptible VMs deliver SIGTERM shortly before the machine
is reclaimed; production trainers must finish the in-flight step, write a
``latest`` checkpoint, and exit cleanly so ``--resume`` continues from the
same iteration. The reference has no analog (its DDP loops die mid-step,
`helpers/frame_autoencoder_trainer.py:104-151`); this is part of the
SURVEY section 5.3 failure-recovery surface together with rolling
checkpoints + ``--resume``.

Usage::

    with PreemptionGuard() as guard:
        for it in range(start, n_iter):
            ...train step...
            if guard.triggered:
                ckpt.save(..., latest=True)
                break

The guard only *records* the signal (safe inside an XLA dispatch); the
training loop decides when to act, so the checkpoint is always written at
a step boundary with a fully-materialized state.
"""

import signal
import threading


class PreemptionGuard:
    """Context manager that latches SIGTERM/SIGINT into a boolean flag.

    Handlers are installed on ``__enter__`` and the previous handlers are
    restored on ``__exit__``, so nesting trainers (e.g. the CLI pipeline
    running AE then transformer training) behaves: the inner guard wins
    while active. A second signal while latched re-raises the default
    behaviour (propagates ``KeyboardInterrupt`` for SIGINT), so an
    impatient ctrl-C ctrl-C still kills the process.

    Only the main thread may install signal handlers (CPython rule); when
    entered from a worker thread the guard degrades to an inert flag that
    can still be set programmatically via :meth:`trigger` (used by tests
    and by external schedulers that poll a preemption notice instead of
    signalling).
    """

    SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self, on_trigger=None):
        self._triggered = threading.Event()
        self._prev = {}
        self._installed = False
        self._on_trigger = on_trigger
        self._sync_calls = 0
        self._last_global = False

    # -- flag API -----------------------------------------------------
    @property
    def triggered(self) -> bool:
        return self._triggered.is_set()

    def sync_triggered(self, every: int = 10) -> bool:
        """Cross-host agreement on the flag: on a multi-process pod the VM
        delivers SIGTERM to each host at slightly different times, so a
        purely-local check would have hosts break out of the training loop
        at DIFFERENT iterations — the remaining hosts then deadlock in the
        next step's gradient all-reduce. Global-OR of the local flags at the
        step boundary makes every host exit (and checkpoint) at the same
        iteration. Single-process: identical to :attr:`triggered`, no
        collective issued.

        The allgather is a host-side barrier, so multi-process runs only
        issue it on every ``every``-th call (all hosts call this once per
        step, so the schedule agrees globally); between scheduled syncs the
        last GLOBAL value is returned — never the local flag, which is what
        would desynchronize exits. Preemption exit is thereby delayed by at
        most ``every - 1`` steps."""
        import jax

        if jax.process_count() == 1:
            return self.triggered
        self._sync_calls += 1
        if self._last_global or (self._sync_calls - 1) % max(1, every):
            return self._last_global
        import numpy as _np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            _np.asarray([self.triggered], _np.int32))
        self._last_global = bool(_np.asarray(flags).any())
        return self._last_global

    def trigger(self, signum=None):
        """Latch the flag (idempotent). Called by the signal handler; may
        also be called directly to request a save-and-exit."""
        first = not self._triggered.is_set()
        self._triggered.set()
        if first:
            name = signal.Signals(signum).name if signum is not None else "request"
            print(f"[preemption] caught {name}; will checkpoint and exit "
                  "at the next step boundary", flush=True)
            if self._on_trigger is not None:
                self._on_trigger()

    # -- signal plumbing ----------------------------------------------
    def _handler(self, signum, frame):
        if self._triggered.is_set():
            # second signal: restore + re-deliver default behaviour
            prev = self._prev.get(signum, signal.SIG_DFL)
            signal.signal(signum, prev if callable(prev) or prev in
                          (signal.SIG_IGN, signal.SIG_DFL) else signal.SIG_DFL)
            raise KeyboardInterrupt
        self.trigger(signum)

    def __enter__(self):
        if threading.current_thread() is threading.main_thread():
            for s in self.SIGNALS:
                self._prev[s] = signal.getsignal(s)
                signal.signal(s, self._handler)
            self._installed = True
        return self

    def __exit__(self, *exc):
        if self._installed:
            for s, prev in self._prev.items():
                signal.signal(s, prev)
            self._installed = False
        return False
