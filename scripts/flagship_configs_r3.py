"""Exercise the other two flagship configs on the real chip, timed.

BAIR 256^2 is benched by `bench.py`; this runs the remaining reference
headline configs end-to-end (AR generation + doubly-AR decode) on TPU:

- kinetics600: 16-frame 64^2 from 5 context frames, 16384-code VQ — the
  config the Pallas VQ kernel was designed for
  (`scripts/kinetics/save_videos.sh:9-15`);
- drums: 45-frame 128^2 audio-conditioned rollout, 80-token chunks
  (64 frame + 16 stft interleaved), 960-token context
  (`scripts/drums/save_videos_audio_on.sh:9-12`).

Random-init weights (no trained checkpoints exist in this environment);
throughput and shape/dtype correctness are what is being validated. Writes
runs_r3/flagship_fps.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(x.reshape(-1)[:1])


def timed_run(label, fn, iters=2):
    fn(jax.random.PRNGKey(1))  # compile + warmup
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        fn(jax.random.PRNGKey(2 + i))
        times.append(time.perf_counter() - t0)
    print(f"{label}: min {min(times):.2f}s over {iters}", flush=True)
    return min(times)


def run_kinetics(out):
    from ccvs_tpu.config import get_config
    from ccvs_tpu.generate import VideoGenerator
    from ccvs_tpu.models import FrameAutoencoder, TokenTransformer

    cfg = get_config("kinetics600")
    batch, vid_len, n_ctx = 4, 16, 5  # save_videos.sh uses batch 16; 4 keeps
    # the (B, 1280-token) KV footprint comparable to the BAIR bench
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.bfloat16)
    tr = TokenTransformer(cfg.gpt, dtype=jnp.bfloat16)
    gen = VideoGenerator(cfg, ae, tr)
    key = jax.random.PRNGKey(0)
    params = {"ae": jax.jit(ae.init)(key),
              "gpt": jax.jit(lambda k: tr.init(k, batch=batch))(key)}
    vid = jax.random.uniform(key, (batch, vid_len, 64, 64, 3), jnp.float32, -1, 1)

    def run(rng):
        o = gen.generate(params, rng, vid, rec=False, n_ctx_frames=n_ctx)
        sync(o["fake"][:, -1, :2, :2, 0])
        assert o["fake"].shape == (batch, vid_len, 64, 64, 3)

    dt = timed_run("kinetics 16f 64px (5 ctx, 16384-code VQ)", run)
    frames = batch * (vid_len - n_ctx)
    out["kinetics_16f_64px_fps"] = round(frames / dt, 3)


def run_drums(out):
    from ccvs_tpu.config import get_config
    from ccvs_tpu.generate import VideoGenerator
    from ccvs_tpu.models import FrameAutoencoder, StftModel, TokenTransformer

    cfg = get_config("drums")
    batch, vid_len = 2, 45  # save_videos_audio_on.sh: 45-frame rollouts
    n_ctx = cfg.gpt.cond_len // cfg.ae.tokens_per_frame  # 960/64 = 15
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.bfloat16)
    tr = TokenTransformer(cfg.gpt, dtype=jnp.bfloat16)
    stft_model = StftModel(cfg.stft)
    gen = VideoGenerator(cfg, ae, tr, stft_model=stft_model)
    key = jax.random.PRNGKey(0)
    params = {"ae": jax.jit(ae.init)(key),
              "gpt": jax.jit(lambda k: tr.init(k, batch=batch))(key),
              "stft": jax.jit(stft_model.init)(key)}
    vid = jax.random.uniform(key, (batch, vid_len, 128, 128, 3), jnp.float32, -1, 1)
    stft = jax.random.uniform(key, (batch, vid_len, 64, 16, 1), jnp.float32, 0, 1)

    def run(rng):
        # audio-on: condition every chunk on the true stft token stream
        o = gen.generate(params, rng, vid, stft=stft, keep_state=True, rec=False)
        sync(o["fake"][:, -1, :2, :2, 0])
        assert o["fake"].shape == (batch, vid_len, 128, 128, 3)

    dt = timed_run("drums 45f 128px audio-conditioned", run)
    frames = batch * (vid_len - n_ctx)
    out["drums_45f_128px_audio_fps"] = round(frames / dt, 3)


def _persist(out):
    # write after every config so a late crash can't lose earlier results
    path = "runs_r3/flagship_fps.json"
    prev = json.load(open(path)) if os.path.exists(path) else {}
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)


if __name__ == "__main__":
    os.makedirs("runs_r3", exist_ok=True)
    out = {}
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "kinetics"):
        run_kinetics(out)
        _persist(out)
    if which in ("both", "drums"):
        run_drums(out)
        _persist(out)
    print(json.dumps(out))
