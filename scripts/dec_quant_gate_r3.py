"""Quality + speed gate for the quantized decoder serving paths on the chip.

Decodes the SAME fixed token stream through four decoder graphs on identical
params — exact bf16, int8 InterBlock convs (``serve_int8_dec``), int8 warp
source (``serve_q8_warp``), and both — reporting per-variant PSNR vs the
exact output plus within-run interleaved decode timing (the tunneled chip
has sustained slow windows, so only interleaved A/B is trustworthy —
CLAUDE.md perf notes). Prefers the round-3 sustained-run EMA weights
(runs_r3/checkpoints) so the PSNR gate reflects a trained decoder; falls
back to random init for timing-only runs.

Serving analog of the reference's fp32 decode loop
(`quantized_video_model.py:849-907`); results recorded in PARITY.md.

Run on the chip:   python scripts/dec_quant_gate_r3.py
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

VARIANTS = {
    "exact": {},
    "int8_dec": {"serve_int8_dec": True},
    "q8_warp": {"serve_q8_warp": True},
    "int8_dec+q8_warp": {"serve_int8_dec": True, "serve_q8_warp": True},
}


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


def main():
    from ccvs_tpu.config import bairhd_config
    from ccvs_tpu.models import FrameAutoencoder

    cfg = bairhd_config()
    key = jax.random.PRNGKey(0)

    ae0 = FrameAutoencoder(cfg.ae, dtype=jnp.bfloat16)
    params = None
    ckpt_dir = os.path.join("runs_r3", "checkpoints", "r3_ae_sustained")
    trained = False
    if os.path.isdir(ckpt_dir):
        try:
            from ccvs_tpu.utils.checkpoint import CheckpointManager

            state = CheckpointManager(ckpt_dir).load("qvid", "latest")
            # raw generator: at 400 iters the 0.999 EMA is still mostly init
            params = state["gen"]
            trained = True
            print("using trained sustained-run AE weights (raw G)", flush=True)
        except Exception as e:
            print(f"checkpoint load failed ({e}); random init", flush=True)
    if params is None:
        params = jax.jit(ae0.init)(key)

    # fixed inputs: context frame + a token stream from encoding a synthetic
    # clip (any valid indices exercise the decode identically)
    vid = jax.random.uniform(key, (BATCH, VID_LEN, 256, 256, 3), jnp.float32, -1, 1)
    enc = jax.jit(ae0.encode)(params, vid)
    codes = enc["code"]  # (B, T, z_len)
    ctx = vid[:, :N_CTX]

    aes = {
        name: FrameAutoencoder(dataclasses.replace(cfg.ae, **kw), dtype=jnp.bfloat16)
        for name, kw in VARIANTS.items()
    }

    def run(name):
        out = aes[name].decode_video(params, codes, ctx_frames=ctx, n_ctx=N_CTX)
        return out

    # compile all variants first (axon remote compiles are minutes)
    outs = {}
    for name in VARIANTS:
        t0 = time.time()
        outs[name] = run(name)
        sync(outs[name])
        print(f"{name}: compiled+ran in {time.time() - t0:.1f}s", flush=True)

    res = {"trained_weights": trained}
    ref = np.asarray(outs["exact"], np.float32)
    for name in VARIANTS:
        if name == "exact":
            continue
        got = np.asarray(outs[name], np.float32)
        mse = float(np.mean((got - ref) ** 2))
        res[f"psnr_vs_exact/{name}"] = round(10 * np.log10(4.0 / max(mse, 1e-12)), 2)

    # interleaved timing: round-robin the variants, several rounds
    rounds = 4
    times = {name: [] for name in VARIANTS}
    for _ in range(rounds):
        for name in VARIANTS:
            t0 = time.perf_counter()
            sync(run(name))
            times[name].append(time.perf_counter() - t0)
    frames = BATCH * (VID_LEN - N_CTX)
    for name, ts in times.items():
        res[f"decode_fps/{name}"] = round(frames / min(ts), 3)
        res[f"decode_s/{name}"] = round(min(ts), 3)
    for name in VARIANTS:
        if name != "exact":
            res[f"speedup/{name}"] = round(
                res[f"decode_fps/{name}"] / res["decode_fps/exact"], 3)

    print(json.dumps(res, indent=1))
    os.makedirs("runs_r3", exist_ok=True)
    with open("runs_r3/dec_quant_gate.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
