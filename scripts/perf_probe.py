"""One-process perf probe: compile once, then time every phase.

Run: python -u scripts/perf_probe.py > /tmp/perf.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import bairhd_config
from ccvs_tpu.models import FrameAutoencoder, TokenTransformer


def log(*a):
    print(*a, flush=True)


def sync(x):
    """Device->host sync: on axon, block_until_ready returns early; a
    transfer is the only reliable barrier."""
    x = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(x.reshape(-1)[:1])


def timeit(name, fn, n=3):
    sync(fn())  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    log(f"{name}: min {min(ts)*1000:.1f} ms  mean {np.mean(ts)*1000:.1f} ms")
    return min(ts)


def main():
    cfg = bairhd_config()
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.bfloat16)
    tr = TokenTransformer(cfg.gpt, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = {"ae": jax.jit(ae.init)(key), "gpt": jax.jit(lambda k: tr.init(k, batch=2))(key)}
    vid = jax.random.uniform(key, (2, 16, 256, 256, 3), jnp.float32, -1, 1)
    log("params ready")

    # encode
    enc_fn = jax.jit(ae.encode)
    enc = enc_fn(params["ae"], vid)
    jax.block_until_ready(enc["code"])
    timeit("encode 16f x B2", lambda: enc_fn(params["ae"], vid)["code"])

    ctx = enc["code"].reshape(2, -1)[:, :64]

    # token generation: check rng-dependence + timing
    log("compiling token gen...")
    t0 = time.time()
    g0 = tr.generate(params["gpt"], jax.random.PRNGKey(0), ctx, total_len=1024)
    jax.block_until_ready(g0["code"])
    log(f"token gen first call (incl compile): {time.time()-t0:.1f}s")
    g1 = tr.generate(params["gpt"], jax.random.PRNGKey(1), ctx, total_len=1024)
    jax.block_until_ready(g1["code"])
    log("rng changes output:", bool(np.asarray(g0["code"] != g1["code"]).any()))
    timeit(
        "token gen 960 steps",
        lambda: tr.generate(params["gpt"], jax.random.PRNGKey(2), ctx, total_len=1024)["code"],
        n=3,
    )

    codes = g0["code"].reshape(2, 16, 64)

    # single decode step (k=15)
    fifo = ae._zero_inters(2, cfg.ae.skip_memory)
    z1 = ae.embed_code(params["ae"], codes[:, 1]).astype(jnp.bfloat16)
    jstep = ae._get_jit_step()
    log("compiling decode step...")
    t0 = time.time()
    out = jstep(params["ae"], fifo, jnp.asarray(5), z1)
    jax.block_until_ready(out[1])
    log(f"decode step first call (incl compile): {time.time()-t0:.1f}s")
    timeit("decode step (k=15)", lambda: jstep(params["ae"], fifo, jnp.asarray(5), z1)[1])

    # full decode
    timeit(
        "decode_video 15f",
        lambda: ae.decode_video(params["ae"], codes, ctx_frames=vid[:, :1], n_ctx=1),
        n=2,
    )

    # VQ big codebook
    cb = jax.random.normal(key, (16384, 512))
    z = jax.random.normal(key, (16 * 64 * 2, 512))
    from ccvs_tpu.ops import vq_lookup

    vq = jax.jit(vq_lookup)
    jax.block_until_ready(vq(z, cb)[0])
    timeit("vq_lookup 2048x16384x512", lambda: vq(z, cb)[0])

    log("DONE")


if __name__ == "__main__":
    main()
