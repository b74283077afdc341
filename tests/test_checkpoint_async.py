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
    # simulate the trainer's next step: donate the saved arrays' buffers
    clobber = jax.jit(lambda x: x * 0 + 9.0, donate_argnums=0)
    tree = {k: (clobber(v) if v.dtype == jnp.float32 else v) for k, v in tree.items()}
    ckpt.wait()
    out = ckpt.load("m", "latest", target=_tree(0.0))
    assert float(np.asarray(out["w"]).max()) == 3.0  # snapshot, not clobbered
    assert float(np.asarray(out["b"]).min()) == 3.0


def test_async_rolling_latest(tmp_path):
    ckpt = CheckpointManager(str(tmp_path), async_save=True)
    ckpt.save("m", 1, _tree(1.0), latest=True)
    ckpt.save("m", 2, _tree(2.0), latest=True)  # joins the in-flight write
    ckpt.wait()
    assert ckpt.step_of("m", "latest") == 2
    out = ckpt.load("m", "latest", target=_tree(0.0))
    assert float(np.asarray(out["w"]).max()) == 2.0


def test_async_load_joins_inflight_write(tmp_path):
    ckpt = CheckpointManager(str(tmp_path), async_save=True)
    ckpt.save("m", 5, _tree(5.0), latest=True)
    # no explicit wait: load() must join the background write itself
    out = ckpt.load("m", "latest", target=_tree(0.0))
    assert int(out["step"]) == 5
