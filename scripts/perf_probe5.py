"""Split the bench run: AR token generation vs frame decode vs encode.

Usage: python scripts/perf_probe5.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import bairhd_config
from ccvs_tpu.generate import VideoGenerator
from ccvs_tpu.models import FrameAutoencoder, TokenTransformer

BATCH, VID_LEN, N_CTX = 2, 16, 1


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
    tr = TokenTransformer(cfg.gpt, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = {
        "ae": jax.jit(ae.init)(key),
        "gpt": jax.jit(lambda k: tr.init(k, batch=BATCH))(key),
    }
    vid = jax.random.uniform(key, (BATCH, VID_LEN, 256, 256, 3), jnp.float32, -1, 1)

    enc = jax.jit(ae.encode)
    e = enc(params["ae"], vid)
    print(f"encode 16f: {t(lambda: enc(params['ae'], vid))*1e3:.0f} ms", flush=True)

    code = e["code"].reshape(BATCH, -1)
    n0 = N_CTX * cfg.gpt.z_chunk
    gen_tokens = lambda: tr.generate(params["gpt"], jax.random.PRNGKey(1), code[:, :n0])
    out = gen_tokens()
    n_gen = out["code"].shape[1] - n0
    dt = t(gen_tokens)
    print(f"token gen {n_gen} tokens: {dt*1e3:.0f} ms ({dt/n_gen*1e3:.2f} ms/tok)", flush=True)

    codes_all = out["code"].reshape(BATCH, cfg.gpt.num_blocks, -1)
    dec = lambda: ae.decode_video(params["ae"], codes_all, ctx_frames=vid[:, :N_CTX], n_ctx=N_CTX)
    dec()
    dt = t(dec)
    print(f"decode 15f rollout: {dt*1e3:.0f} ms ({dt/15*1e3:.0f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
