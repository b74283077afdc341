"""Decode-step cost vs context-slot bucket kb (within-run).

Marginal cost per context slot isolates the k-proportional work
(warps, corr, InterBlock convs, fusion) from the fixed trunk.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_probe9.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import bairhd_config
from ccvs_tpu.models import FrameAutoencoder

BATCH = 2


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def t(f, *a, iters=5):
    f(*a)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = bairhd_config()
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(ae.init)(key)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params)
    m = cfg.ae.skip_memory
    fifo = [jnp.asarray(jax.random.normal(key, f.shape, jnp.bfloat16))
            for f in ae._zero_inters(BATCH, m)]
    z_t = jax.random.normal(key, (BATCH, 8, 8, cfg.ae.z_size), jnp.bfloat16)
    curr = jnp.asarray(m, jnp.int32)
    step = ae._get_jit_step()
    for kb in (2, 4, 8, 15):
        dt = t(lambda: step(params, fifo, curr, z_t, None, kb=kb))
        print(f"kb={kb}: {dt*1e3:.0f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
