"""Probe 14: is the shared-x split conv actually faster on chip?

The round-3 dec-quant gate measured exact decode ~2x slower than round-2's
recorded decode times — either a sustained slow window or a regression from
the shared-x split (committed on parity evidence only). Within-run
interleaved A/B of the full 16-frame BAIR decode with `shared_x_split`
on vs off on identical params settles it.

Run on the chip:   python scripts/perf_probe14.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 2
VID_LEN = 16
N_CTX = 1
ROUNDS = 6


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


def main():
    from ccvs_tpu.config import bairhd_config
    from ccvs_tpu.models import FrameAutoencoder

    cfg = bairhd_config()
    key = jax.random.PRNGKey(0)
    ae = {
        "split": FrameAutoencoder(cfg.ae, dtype=jnp.bfloat16),
        "plain": FrameAutoencoder(
            dataclasses.replace(cfg.ae, shared_x_split=False), dtype=jnp.bfloat16),
    }
    params = jax.jit(ae["split"].init)(key)
    vid = jax.random.uniform(key, (BATCH, VID_LEN, 256, 256, 3), jnp.float32, -1, 1)
    enc = jax.jit(ae["split"].encode)(params, vid)
    codes = enc["code"]
    ctx = vid[:, :N_CTX]

    def run(name):
        return ae[name].decode_video(params, codes, ctx_frames=ctx, n_ctx=N_CTX)

    for name in ae:
        t0 = time.time()
        sync(run(name))
        print(f"{name}: compiled+ran in {time.time() - t0:.1f}s", flush=True)

    times = {name: [] for name in ae}
    for r in range(ROUNDS):
        for name in ae:
            t0 = time.perf_counter()
            sync(run(name))
            times[name].append(time.perf_counter() - t0)
        print(f"round {r}: " + " ".join(f"{n}={times[n][-1]:.3f}s" for n in ae),
              flush=True)
    out = {}
    for name, ts in times.items():
        out[f"decode_s/{name}"] = round(min(ts), 3)
    out["split_speedup"] = round(out["decode_s/plain"] / out["decode_s/split"], 3)
    print(json.dumps(out, indent=1))
    os.makedirs("runs_r3", exist_ok=True)
    with open("runs_r3/shared_x_ab.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
