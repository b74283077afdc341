"""Round-5 int8 serving gate: quality on TRAINED weights + within-run
END-TO-END speed A/B of the full bench pipeline (VERDICT r4 item 3).

Round 4's artifact measured int8 3.7x SLOWER end-to-end yet the bench served
int8 because the gate checked quality only. This gate fixes both sides:

1. QUALITY — teacher-forced exact-bf16 vs int8 decode on the round-5
   TRAINED GPT (the mid chain's `runs_r5` checkpoint; falls back to random
   init with `trained_weights: false`, which `bench.py:serving_mode()`
   rejects): per-token logit relative error, same-key sampled-token
   agreement at the reference's T=1 / top-k 100
   (`/root/reference/models/transformer_model.py:395-409`), top-k TV.

2. SPEED — the FULL bench pipeline (`VideoGenerator.generate`, 16-frame
   256px BAIR rollout, exactly `bench.py:main`) run INTERLEAVED
   exact/int8/exact/int8 within one process so sustained slow tunnel
   windows hit both variants equally (CLAUDE.md: only within-run
   interleaved A/B is trustworthy on this chip). `int8_e2e_speedup` =
   fps_int8_min / fps_exact_min. Weight VALUES don't affect speed, so the
   speed side uses random init at the bench config; the JSON records that.

bench.py serves int8 ONLY if quality passes AND int8_e2e_speedup > 1.

Run on the chip (after the r5 chain's gpt phase):
    python scripts/int8_gate_r5.py [--skip-speed] [--iters 3]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARGS = argparse.ArgumentParser()
ARGS.add_argument("--skip-speed", action="store_true",
                  help="quality side only (no flagship-pipeline compile)")
ARGS.add_argument("--skip-quality", action="store_true")
ARGS.add_argument("--iters", type=int, default=3, help="A/B pairs")
ARGS.add_argument("--fused", action="store_true",
                  help="measure speed on the serve_fused pipeline (the "
                       "bench's serving config since the 256px dispatch "
                       "A/B landed >=1.05x): the decode program is shared "
                       "between arms, so the delta isolates the GPT loop")
ARGS.add_argument("--out", default=os.path.join("runs_r5", "int8_gate.json"))
ARGS = ARGS.parse_args()

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def quality(out):
    """Teacher-forced exact-vs-int8 on the r5 trained mid GPT."""
    from ccvs_tpu.nn.gpt import (GPT, build_schedule, cache_to_layers,
                                 decode_step_fn)
    from ccvs_tpu.nn.quantized import decode_step_fn_int8, quantize_gpt_int8
    from ccvs_tpu.models.transformer import TokenTransformer
    from ccvs_tpu.utils.casting import cast_params_bf16
    from fvd_mid_r5 import SAVE, mid_cfg, names

    cfg = mid_cfg("bair").gpt
    _, gpt_name, _, npz = names("bair")
    B, L, cond = 2, cfg.z_len, cfg.cond_len
    tr = TokenTransformer(cfg)
    model = tr.model
    params, trained, src = None, False, "random init"
    ckpt_dir = os.path.join(SAVE, "checkpoints", gpt_name)
    if os.path.isdir(ckpt_dir):
        try:
            from ccvs_tpu.utils.checkpoint import CheckpointManager

            params = CheckpointManager(ckpt_dir).load("transformer", "latest")["params"]
            trained, src = True, f"{ckpt_dir} (latest)"
        except Exception as e:
            print(f"checkpoint load failed ({e})", flush=True)
    if params is None and os.path.exists(npz):
        from ccvs_tpu.port.npz_params import load_params_npz

        try:
            params = load_params_npz(npz, "gpt")["gpt"]
            trained, src = True, npz
        except Exception as e:
            print(f"npz load failed ({e})", flush=True)
    if params is None:
        params = jax.jit(lambda k: tr.init(k, batch=1))(jax.random.PRNGKey(0))
    print(f"quality weights: {src}", flush=True)
    pb = cast_params_bf16(params)
    qp = quantize_gpt_int8(pb)

    sched = build_schedule(cfg, n_frames=L // cfg.z_chunk)
    kind = jnp.asarray(sched.kind[:L])
    s_idx = jnp.asarray(sched.s_idx[:L])
    t_idx = jnp.asarray(sched.t_idx[:L])
    tokens = jax.random.randint(jax.random.PRNGKey(42), (B, L), 0, cfg.z_num)

    def make_teacher(step_fn, extra):
        @jax.jit
        def teacher(pb, tokens, *e):
            emb = model.apply({"params": pb}, tokens, kind, s_idx, t_idx,
                              method=GPT.embed_one).astype(jnp.bfloat16)
            cache = cache_to_layers(model.apply({"params": pb}, B, L,
                                                method=GPT.init_cache))

            def step(c, j):
                e1 = jax.lax.dynamic_slice_in_dim(emb, j, 1, axis=1)
                l, c = step_fn(cfg, pb, *e, e1, j, c)
                return c, l.astype(jnp.float32)

            _, logits = jax.lax.scan(step, cache, jnp.arange(L - 1))
            return logits

        return lambda: teacher(pb, tokens, *extra)

    lb = make_teacher(decode_step_fn, ())()
    sync(lb)
    lq = make_teacher(decode_step_fn_int8, (qp,))()
    sync(lq)
    lb = np.asarray(lb)[cond - 1:, :, : cfg.z_num]
    lq = np.asarray(lq)[cond - 1:, :, : cfg.z_num]

    rel = np.linalg.norm(lq - lb, axis=-1) / np.maximum(
        np.linalg.norm(lb, axis=-1), 1e-9)
    out.update(
        trained_weights=trained,
        quality_weights=src,
        quality_config="r5 mid (64px chain GPT, 8x512, z_num "
                       f"{cfg.z_num})",
        logit_rel_err_mean=float(rel.mean()),
        logit_rel_err_p95=float(np.percentile(rel, 95)),
    )

    def topk_probs(l):
        k = cfg.top_k or 100
        thresh = np.sort(l, axis=-1)[..., -k][..., None]
        masked = np.where(l < thresh, -np.inf, l)
        e = np.exp(masked - masked.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    p_b = topk_probs(lb.reshape(-1, lb.shape[-1]))
    p_q = topk_probs(lq.reshape(-1, lq.shape[-1]))
    tv = 0.5 * np.abs(p_b - p_q).sum(-1)
    g = np.random.RandomState(0).gumbel(size=p_b.shape).astype(np.float32)
    pick_b = np.argmax(np.log(np.maximum(p_b, 1e-20)) + g, axis=-1)
    pick_q = np.argmax(np.log(np.maximum(p_q, 1e-20)) + g, axis=-1)
    out.update(
        topk_tv_mean=float(tv.mean()),
        topk_tv_p95=float(np.percentile(tv, 95)),
        token_agreement=float((pick_b == pick_q).mean()),
        n_tokens_scored=int(pick_b.size),
    )


def speed(out, iters):
    """Interleaved full-bench-pipeline A/B: exact vs int8 AR decode."""
    from ccvs_tpu.config import bairhd_config
    from ccvs_tpu.generate import VideoGenerator
    from ccvs_tpu.models import FrameAutoencoder, TokenTransformer

    BATCH, VID_LEN, N_CTX = 2, 16, 1  # bench.py constants
    cfg = bairhd_config()
    if ARGS.fused:
        cfg = cfg.replace(ae=dataclasses.replace(cfg.ae, serve_fused=True))
    key = jax.random.PRNGKey(0)
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.bfloat16)
    params = {"ae": jax.jit(ae.init)(key), "gpt": None}
    vid = jax.random.uniform(key, (BATCH, VID_LEN, 256, 256, 3),
                             jnp.float32, -1, 1)
    frames = BATCH * (VID_LEN - N_CTX)

    runners = {}
    for label, int8 in (("exact", False), ("int8", True)):
        c = cfg.replace(gpt=dataclasses.replace(cfg.gpt, serve_int8=int8))
        tr = TokenTransformer(c.gpt, dtype=jnp.bfloat16)
        if params["gpt"] is None:
            params["gpt"] = jax.jit(lambda k: tr.init(k, batch=BATCH))(key)
        gen = VideoGenerator(c, ae, tr)

        def run(rng, gen=gen):
            o = gen.generate(params, rng, vid, rec=False, n_ctx_frames=N_CTX)
            return np.asarray(o["fake"][:, -1, :2, :2, 0])

        t0 = time.perf_counter()
        run(jax.random.PRNGKey(1))
        print(f"{label}: compile+warmup {time.perf_counter() - t0:.0f}s",
              flush=True)
        run(jax.random.PRNGKey(2))
        runners[label] = run

    times = {"exact": [], "int8": []}
    for i in range(iters):
        for label in ("exact", "int8"):  # interleaved: slow windows hit both
            t0 = time.perf_counter()
            runners[label](jax.random.PRNGKey(10 + i))
            times[label].append(time.perf_counter() - t0)
        print(f"pair {i}: exact {times['exact'][-1]:.2f}s "
              f"int8 {times['int8'][-1]:.2f}s", flush=True)
    fps_e = frames / min(times["exact"])
    fps_i = frames / min(times["int8"])
    out.update(
        speed_config="full bench pipeline (bairhd 256px 16f rollout, random "
                     "init — weight values don't affect speed"
                     + (", serve_fused decode" if ARGS.fused else "") + ")",
        speed_protocol=f"interleaved within-run A/B, {iters} pairs, min-of-N",
        e2e_fps_exact=round(fps_e, 3),
        e2e_fps_int8=round(fps_i, 3),
        e2e_times_exact_s=[round(t, 3) for t in times["exact"]],
        e2e_times_int8_s=[round(t, 3) for t in times["int8"]],
        int8_e2e_speedup=round(fps_i / fps_e, 3),
    )


def main():
    out = {"backend": jax.default_backend()}
    if not ARGS.skip_quality:
        quality(out)
        print(json.dumps(out, indent=1), flush=True)
    if not ARGS.skip_speed:
        speed(out, ARGS.iters)
    print(json.dumps(out, indent=1))
    os.makedirs(os.path.dirname(ARGS.out) or ".", exist_ok=True)
    with open(ARGS.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
