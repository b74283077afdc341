"""Graceful-preemption handling (SURVEY section 5.3).

SIGTERM during training must latch, let the in-flight step finish, write a
``latest`` checkpoint at the step boundary, and exit cleanly so ``--resume``
continues the run (spot/preemptible TPU VM semantics; the reference's DDP
loops have no handler and die mid-step)."""

import os
import signal
import threading

import jax.numpy as jnp
import pytest

from ccvs_tpu.utils.preemption import PreemptionGuard

from test_trainers import _cfg  # noqa: E402  (tiny synthetic config)


def test_guard_latches_and_restores():
    prev_term = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.triggered
        signal.raise_signal(signal.SIGTERM)
        assert guard.triggered
        # idempotent programmatic trigger
        guard.trigger()
        assert guard.triggered
    assert signal.getsignal(signal.SIGTERM) is prev_term


def test_guard_second_sigint_escalates():
    with PreemptionGuard() as guard:
        signal.raise_signal(signal.SIGINT)
        assert guard.triggered
        with pytest.raises(KeyboardInterrupt):
            signal.raise_signal(signal.SIGINT)


def test_guard_inert_off_main_thread():
    out = {}

    def worker():
        with PreemptionGuard() as g:
            g.trigger()
            out["triggered"] = g.triggered

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert out["triggered"]


def test_ae_trainer_preempt_and_resume(tmp_path, monkeypatch):
    """SIGTERM at iter 1 of 5 -> trainer stops at step 2 with a latest
    checkpoint; a resumed run picks up at 2 and finishes to 5."""
    from ccvs_tpu.train.ae_trainer import FrameAutoencoderTrainer
    from ccvs_tpu.utils.logging import Logger

    cfg = _cfg(str(tmp_path))
    tr = FrameAutoencoderTrainer(cfg, dtype=jnp.float32)

    calls = {"n": 0}
    orig = Logger.log_scalars

    def fire_on_second(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            signal.raise_signal(signal.SIGTERM)  # synchronous, main thread
        return orig(self, *a, **kw)

    monkeypatch.setattr(Logger, "log_scalars", fire_on_second)
    state = tr.run(n_iter=5)
    assert int(state.step) == 2  # stopped at the it=1 step boundary
    assert tr.preempted  # CLI maps this to exit code 75 (EX_TEMPFAIL)

    monkeypatch.setattr(Logger, "log_scalars", orig)
    ckpt_dir = os.path.join(str(tmp_path), "checkpoints", "tiny")
    assert os.path.isdir(ckpt_dir)
    state = tr.run(n_iter=5, resume=True)
    assert int(state.step) == 5
    assert not tr.preempted


def test_preempt_leaves_loadable_npz_mirror(tmp_path, monkeypatch):
    """Kill-proof trained weights (VERDICT r4 item 2): with cfg.npz_mirror
    set, a SIGTERM mid-run leaves a loadable single-file fp16 npz alongside
    the orbax latest — so ANY kill after the first save loses nothing. A
    follow-on transformer run MERGES its `gpt` tree into the same file
    without clobbering `ae_gen`."""
    import dataclasses

    import jax
    import numpy as np

    from ccvs_tpu.models import FrameAutoencoder
    from ccvs_tpu.port.npz_params import load_params_npz
    from ccvs_tpu.train.ae_trainer import FrameAutoencoderTrainer
    from ccvs_tpu.train.transformer_trainer import TransformerTrainer
    from ccvs_tpu.utils.logging import Logger

    npz = os.path.join(str(tmp_path), "weights_fp16.npz")
    cfg = _cfg(str(tmp_path)).replace(npz_mirror=npz, save_latest_freq=1)
    tr = FrameAutoencoderTrainer(cfg, dtype=jnp.float32)

    calls = {"n": 0}
    orig = Logger.log_scalars

    def fire_on_second(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            signal.raise_signal(signal.SIGTERM)
        return orig(self, *a, **kw)

    monkeypatch.setattr(Logger, "log_scalars", fire_on_second)
    tr.run(n_iter=5)
    assert tr.preempted
    trees = load_params_npz(npz, "ae_gen")
    flat_gen = jax.tree_util.tree_leaves(trees["ae_gen"])
    assert flat_gen and all(np.all(np.isfinite(x)) for x in flat_gen)

    monkeypatch.setattr(Logger, "log_scalars", orig)
    tcfg = cfg.replace(
        data=dataclasses.replace(cfg.data, vid_len=2, load_vid_len=None))
    ae = FrameAutoencoder(tcfg.ae, dtype=jnp.float32)
    ae_params = ae.init(jax.random.PRNGKey(0))
    TransformerTrainer(tcfg, ae_params, dtype=jnp.float32).run(n_iter=2)
    both = load_params_npz(npz, "ae_gen", "gpt")  # merge preserved ae_gen
    assert jax.tree_util.tree_leaves(both["gpt"])
