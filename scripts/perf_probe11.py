"""Within-run A/B: bf16 vs int8 AR token generation at BAIR size.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_probe11.py
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import bairhd_config
from ccvs_tpu.models import TokenTransformer

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
    cfg = bairhd_config().gpt
    key = jax.random.PRNGKey(0)
    code = jax.random.randint(key, (BATCH, cfg.z_chunk), 0, cfg.z_num)

    results = {}
    for name, c in (("bf16", cfg),
                    ("int8", dataclasses.replace(cfg, serve_int8=True))):
        tr = TokenTransformer(c, dtype=jnp.bfloat16)
        params = tr.init(key, batch=BATCH)
        gen = lambda tr=tr, params=params: tr.generate(
            params, jax.random.PRNGKey(1), code)
        out = gen()
        n_gen = out["code"].shape[1] - cfg.z_chunk
        dt = t(gen)
        results[name] = dt
        print(f"{name}: {dt*1e3:.0f} ms for {n_gen} tokens "
              f"({dt/n_gen*1e3:.2f} ms/tok)", flush=True)
    print(f"speedup: {results['bf16']/results['int8']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
