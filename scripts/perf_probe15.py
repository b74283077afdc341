"""Probe 15: does a finer decode-bucket set pay for its extra dispatches?

The doubly-AR rollout slices the context FIFO to a static per-frame bucket
(exact: the reference only feeds `dt <= curr` slots,
`quantized_video_model.py:872`). The default set {2, 4, 8, M} leaves frames
with 9-12 true contexts running the full 15-slot program; adding a 12-bucket
saves ~12 slot-frames (~17-22 ms each) for one extra ~29 ms dispatch and one
extra compile. Within-run interleaved A/B of the full 16-frame BAIR decode
decides whether the finer set becomes the default.

Run on the chip:   python scripts/perf_probe15.py
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
SETS = {
    "b_2_4_8": (2, 4, 8),          # current default
    "b_2_4_8_12": (2, 4, 8, 12),   # candidate
    "b_2_4_6_8_11": (2, 4, 6, 8, 11),  # finer still (2 extra dispatches)
}


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


def main():
    from ccvs_tpu.config import bairhd_config
    from ccvs_tpu.models import FrameAutoencoder

    cfg = bairhd_config()
    key = jax.random.PRNGKey(0)
    aes = {
        name: FrameAutoencoder(
            dataclasses.replace(cfg.ae, decode_buckets=buckets),
            dtype=jnp.bfloat16,
        )
        for name, buckets in SETS.items()
    }
    first = next(iter(aes.values()))
    params = jax.jit(first.init)(key)
    vid = jax.random.uniform(key, (BATCH, VID_LEN, 256, 256, 3), jnp.float32, -1, 1)
    enc = jax.jit(first.encode)(params, vid)
    codes = enc["code"]
    ctx = vid[:, :N_CTX]

    def run(name):
        return aes[name].decode_video(params, codes, ctx_frames=ctx, n_ctx=N_CTX)

    ref = None
    for name in aes:
        t0 = time.time()
        out = run(name)
        sync(out)
        print(f"{name}: compiled+ran in {time.time() - t0:.1f}s", flush=True)
        # exactness across bucket sets on the real chip (CPU invariance is
        # already unit-tested; this catches backend-specific surprises)
        out_np = np.asarray(out[:, :, ::64, ::64])
        if ref is None:
            ref = out_np
        else:
            diff = float(np.abs(out_np - ref).max())
            print(f"  maxdiff vs first set (subsampled): {diff:.2e}", flush=True)
            assert diff < 3e-2, diff  # bf16 rollouts; slices only reorder fusion

    times = {name: [] for name in aes}
    for r in range(ROUNDS):
        for name in aes:
            t0 = time.perf_counter()
            sync(run(name))
            times[name].append(time.perf_counter() - t0)
        print(f"round {r}: " + " ".join(f"{n}={times[n][-1]:.3f}s" for n in aes),
              flush=True)
    out = {}
    for name, ts in times.items():
        out[f"decode_s/{name}"] = round(min(ts), 3)
        out[f"decode_s_mean/{name}"] = round(sum(ts) / len(ts), 3)
    base = out["decode_s/b_2_4_8"]
    for name in SETS:
        out[f"speedup/{name}"] = round(base / out[f"decode_s/{name}"], 3)
    print(json.dumps(out, indent=1))
    os.makedirs("runs_r3", exist_ok=True)
    with open("runs_r3/bucket_ab.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
