"""Serving batch-scaling study: BAIR 16-frame rollout at B=1/2/4.

The AR token loop is weights-bound at small batch (PERF_NOTES probe 3), so
serving throughput should scale sub-linearly in latency and super-linearly
in frames/sec until the MXU is fed. Records f/s and ms/token per batch size
next to the bench (which pins the reference's B=2,
`scripts/bairhd/save_videos_state_off.sh:9`). Writes
runs_r3/batch_scaling.json.

Run on the chip:   python scripts/batch_scaling_r3.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

VID_LEN = 16
N_CTX = 1
BATCHES = (1, 2, 4)


def main():
    from ccvs_tpu.config import bairhd_config
    from ccvs_tpu.generate import VideoGenerator
    from ccvs_tpu.models import FrameAutoencoder, TokenTransformer

    cfg = bairhd_config()
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.bfloat16)
    tr = TokenTransformer(cfg.gpt, dtype=jnp.bfloat16)
    gen = VideoGenerator(cfg, ae, tr)
    key = jax.random.PRNGKey(0)
    out = {}
    for b in BATCHES:
        params = {"ae": jax.jit(ae.init)(key),
                  "gpt": jax.jit(lambda k: tr.init(k, batch=b))(key)}
        vid = jax.random.uniform(key, (b, VID_LEN, 256, 256, 3), jnp.float32, -1, 1)

        def run(rng):
            o = gen.generate(params, rng, vid, rec=False, n_ctx_frames=N_CTX)
            return np.asarray(o["fake"][:, -1, :2, :2, 0])

        try:
            run(jax.random.PRNGKey(1))  # compile
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                run(jax.random.PRNGKey(2 + i))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            frames = b * (VID_LEN - N_CTX)
            out[f"fps/B{b}"] = round(frames / dt, 3)
            out[f"s_per_run/B{b}"] = round(dt, 3)
            print(f"B={b}: {frames / dt:.3f} f/s ({dt:.2f}s/run)", flush=True)
        except Exception as e:
            out[f"error/B{b}"] = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"B={b} failed: {e}", flush=True)

    print(json.dumps(out))
    os.makedirs("runs_r3", exist_ok=True)
    with open("runs_r3/batch_scaling.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
