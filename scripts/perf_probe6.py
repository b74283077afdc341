"""Ablate the decode step to find where 327 ms/frame goes.

Variants: full / warp->identity / correlation->zeros / both. Run on TPU:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_probe6.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import ccvs_tpu.ops.warp as warp_mod
import ccvs_tpu.nn.decoder as dec_mod
from ccvs_tpu.config import bairhd_config
from ccvs_tpu.models import FrameAutoencoder

BATCH = 2


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def t(f, *a, iters=3):
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
    m = cfg.ae.skip_memory
    fifo = [jnp.asarray(jax.random.normal(key, f.shape, jnp.bfloat16))
            for f in ae._zero_inters(BATCH, m)]
    z_t = jax.random.normal(key, (BATCH, 8, 8, cfg.ae.z_size), jnp.bfloat16)
    curr = jnp.asarray(m, jnp.int32)

    orig_gs = warp_mod.grid_sample          # backwarp resolves this at call time
    orig_corr = dec_mod.local_correlation   # decoder holds a direct binding

    def zero_corr(a, b, stride=1):
        ho, wo = -(-a.shape[1] // stride), -(-a.shape[2] // stride)
        return jnp.zeros((a.shape[0], ho, wo, 49), a.dtype)

    def run_variant(name, gs=orig_gs, corr=orig_corr):
        warp_mod.grid_sample = gs
        dec_mod.local_correlation = corr
        step = jax.jit(ae._decode_step_fn, static_argnames=("kb",))
        dt = t(lambda: step(params, fifo, curr, z_t, None, kb=m))
        print(f"{name}: {dt*1e3:.0f} ms/frame", flush=True)

    run_variant("full step (kb=15)")
    run_variant("warp=identity", gs=lambda x, g: x)
    run_variant("corr=zeros", corr=zero_corr)
    run_variant("warp+corr off", gs=lambda x, g: x, corr=zero_corr)
    warp_mod.grid_sample = orig_gs
    dec_mod.local_correlation = orig_corr


if __name__ == "__main__":
    main()
