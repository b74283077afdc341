"""Async checkpointing (`utils/checkpoint.py`, `async_save=True`).

The production TPU pattern: snapshot on-device, stream to disk on background
threads. The snapshot must be donation-safe — trainers donate the train
state into the next jitted step while the write is still in flight."""

import numpy as np
import jax
import jax.numpy as jnp

from ccvs_tpu.utils.checkpoint import CheckpointManager


def _tree(val):
    return {"w": jnp.full((64, 64), val, jnp.float32),
            "b": jnp.full((64,), val, jnp.float32),
            "step": jnp.asarray(int(val), jnp.int32)}


def test_async_save_is_donation_safe(tmp_path):
    ckpt = CheckpointManager(str(tmp_path), async_save=True)
    tree = _tree(3.0)
    ckpt.save("m", 1, tree, latest=True)
    # simulate the trainer's next step: donate the saved arrays' buffers.
    # NOTE: donation is a no-op on the CPU test backend, so this clobber
    # alone cannot catch a deferred-copy regression — the numpy in-place
    # variant below is the CPU-meaningful check.
    clobber = jax.jit(lambda x: x * 0 + 9.0, donate_argnums=0)
    tree = {k: (clobber(v) if v.dtype == jnp.float32 else v) for k, v in tree.items()}
    ckpt.wait()
    out = ckpt.load("m", "latest", target=_tree(0.0))
    assert float(np.asarray(out["w"]).max()) == 3.0  # snapshot, not clobbered
    assert float(np.asarray(out["b"]).min()) == 3.0


def test_async_save_snapshots_before_backgrounding(tmp_path):
    """save() must copy values out BEFORE returning: mutating the source
    array in place while the write is in flight is exactly what a donated
    buffer reuse does on TPU, and (unlike jit donation) an in-place numpy
    write is visible on the CPU test backend — an orbax that deferred the
    host copy to the background thread would persist 9.0 here."""
    ckpt = CheckpointManager(str(tmp_path), async_save=True)
    tree = {"w": np.full((256, 256), 3.0, np.float32),
            "b": np.full((64,), 3.0, np.float32),
            "step": np.asarray(1, np.int32)}
    ckpt.save("m", 1, tree, latest=True)
    tree["w"][:] = 9.0
    tree["b"][:] = 9.0
    ckpt.wait()
    target = {"w": np.zeros((256, 256), np.float32),
              "b": np.zeros((64,), np.float32),
              "step": np.asarray(0, np.int32)}
    out = ckpt.load("m", "latest", target=target)
    assert float(np.asarray(out["w"]).max()) == 3.0
    assert float(np.asarray(out["b"]).max()) == 3.0


def test_async_rolling_latest(tmp_path):
    ckpt = CheckpointManager(str(tmp_path), async_save=True)
    ckpt.save("m", 1, _tree(1.0), latest=True)
    ckpt.save("m", 2, _tree(2.0), latest=True)  # joins the in-flight write
    ckpt.wait()
    assert ckpt.step_of("m", "latest") == 2
    out = ckpt.load("m", "latest", target=_tree(0.0))
    assert float(np.asarray(out["w"]).max()) == 2.0


def test_async_rolling_never_without_complete_latest(tmp_path):
    """Predecessor deletion is deferred until the replacement is durable:
    at every instant of an in-flight latest write, a COMPLETE latest dir is
    resolvable (orbax writes to *.orbax-checkpoint-tmp and renames on
    finalize, so an unfinished write never matches)."""
    ckpt = CheckpointManager(str(tmp_path), async_save=True)
    ckpt.save("m", 1, _tree(1.0), latest=True)
    ckpt.wait()
    big = {"w": jnp.ones((2048, 2048), jnp.float32),
           "b": jnp.zeros((64,), jnp.float32),
           "step": jnp.asarray(2, jnp.int32)}
    ckpt.save("m", 2, big, latest=True)  # write in flight (or already done)
    assert ckpt.step_of("m", "latest") >= 1  # old survives until durable
    ckpt.wait()
    assert ckpt.step_of("m", "latest") == 2
    assert len(ckpt._find("m", "latest")) == 1  # predecessor cleaned up


def test_async_load_joins_inflight_write(tmp_path):
    ckpt = CheckpointManager(str(tmp_path), async_save=True)
    ckpt.save("m", 5, _tree(5.0), latest=True)
    # no explicit wait: load() must join the background write itself
    out = ckpt.load("m", "latest", target=_tree(0.0))
    assert int(out["step"]) == 5
