"""Quality gate for the int8 serving decode (`--serve-int8`) at the BAIR config.

Teacher-forced comparison of `decode_step_fn` (exact bf16) vs
`decode_step_fn_int8` on identical token streams through the real 24x1024
GPT: per-token logit relative error, sampled-token agreement at the
reference's temperature 1 / top-k 100 (`transformer_model.py:395-409`), and
top-k distribution total variation. Plus end-to-end `TokenTransformer.
generate` runs (sampled + beam) with serve_int8 on, timed within-run against
bf16. Results recorded in PARITY.md.

Run on the chip:   python scripts/int8_gate_r3.py
Quality part only (backend-independent; valid on CPU when the chip tunnel
is down — the 1.54x speed side was measured on-chip by perf_probe11):
                   python scripts/int8_gate_r3.py --quality-only --cpu
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARGS = argparse.ArgumentParser()
ARGS.add_argument("--quality-only", action="store_true")
ARGS.add_argument("--cpu", action="store_true")
ARGS.add_argument("--ckpt-dir", default=os.path.join("runs_r3", "checkpoints", "r3_gpt_sustained"),
                  help="trained GPT checkpoint dir (round-4 reruns pass "
                       "runs_r4/checkpoints/r4_gpt_sustained)")
ARGS.add_argument("--out", default=os.path.join("runs_r3", "int8_gate.json"))
ARGS = ARGS.parse_args()
if ARGS.cpu:
    os.environ.pop("JAX_PLATFORMS", None)

import numpy as np

import jax

if ARGS.cpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def main():
    import dataclasses

    from ccvs_tpu.config import get_config
    from ccvs_tpu.models.transformer import TokenTransformer
    from ccvs_tpu.nn.gpt import GPT, build_schedule, cache_to_layers, decode_step_fn
    from ccvs_tpu.nn.quantized import decode_step_fn_int8, quantize_gpt_int8
    from ccvs_tpu.utils.casting import cast_params_bf16

    cfg = get_config("bairhd").gpt
    B, L = 2, cfg.z_len
    cond = cfg.cond_len
    tr = TokenTransformer(cfg)
    model = tr.model
    params = None
    trained = False
    ckpt_dir = ARGS.ckpt_dir
    if os.path.isdir(ckpt_dir):
        try:
            from ccvs_tpu.utils.checkpoint import CheckpointManager

            params = CheckpointManager(ckpt_dir).load("transformer", "latest")["params"]
            trained = True
            print("using trained sustained-run GPT weights", flush=True)
        except Exception as e:
            print(f"checkpoint load failed ({e}); random init", flush=True)
    if params is None:
        params = jax.jit(lambda k: tr.init(k, batch=1))(jax.random.PRNGKey(0))
    pb = cast_params_bf16(params)
    qp = quantize_gpt_int8(pb)

    sched = build_schedule(cfg, n_frames=L // cfg.z_chunk)
    kind = jnp.asarray(sched.kind[:L])
    s_idx = jnp.asarray(sched.s_idx[:L])
    t_idx = jnp.asarray(sched.t_idx[:L])
    rng = jax.random.PRNGKey(42)
    tokens = jax.random.randint(rng, (B, L), 0, cfg.z_num)

    # Two single-path scans (NOT one dual-cache program): the fused
    # bf16+int8 variant is ~2x a normal decode program and crashed the
    # remote-compile service on the chip tunnel (round 4); results are
    # identical since the paths share tokens but not caches. Params are
    # passed as jit ARGUMENTS (not closed over) — closure constants embed
    # the full GPT weights in the serialized program and exceed the remote
    # compile service's upload limit (HTTP 413).
    @jax.jit
    def teacher_bf16(pb, tokens):
        emb = model.apply({"params": pb}, tokens, kind, s_idx, t_idx,
                          method=GPT.embed_one).astype(jnp.bfloat16)
        cache = cache_to_layers(model.apply({"params": pb}, B, L,
                                            method=GPT.init_cache))

        def step(c, j):
            e1 = jax.lax.dynamic_slice_in_dim(emb, j, 1, axis=1)
            l, c = decode_step_fn(cfg, pb, e1, j, c)
            return c, l.astype(jnp.float32)

        _, lb = jax.lax.scan(step, cache, jnp.arange(L - 1))
        return lb  # (L-1, B, V)

    @jax.jit
    def teacher_int8(pb, qp, tokens):
        emb = model.apply({"params": pb}, tokens, kind, s_idx, t_idx,
                          method=GPT.embed_one).astype(jnp.bfloat16)
        cache = cache_to_layers(model.apply({"params": pb}, B, L,
                                            method=GPT.init_cache))

        def step(c, j):
            e1 = jax.lax.dynamic_slice_in_dim(emb, j, 1, axis=1)
            l, c = decode_step_fn_int8(cfg, pb, qp, e1, j, c)
            return c, l.astype(jnp.float32)

        _, lq = jax.lax.scan(step, cache, jnp.arange(L - 1))
        return lq  # (L-1, B, V)

    t0 = time.time()
    lb = teacher_bf16(pb, tokens)
    sync(lb)
    print(f"teacher-forced bf16 decode compiled+ran in {time.time() - t0:.1f}s",
          flush=True)
    t0 = time.time()
    lq = teacher_int8(pb, qp, tokens)
    sync(lq)
    print(f"teacher-forced int8 decode compiled+ran in {time.time() - t0:.1f}s",
          flush=True)
    # Score generated positions only: scan index j holds the prediction for
    # position j+1, so generated positions cond..L-1 sit at indices cond-1..L-2.
    lb = np.asarray(lb)[cond - 1 :, :, : cfg.z_num]
    lq = np.asarray(lq)[cond - 1 :, :, : cfg.z_num]

    # 1) per-token logit relative error
    rel = np.linalg.norm(lq - lb, axis=-1) / np.maximum(
        np.linalg.norm(lb, axis=-1), 1e-9)
    out = {
        "trained_weights": trained,
        "logit_rel_err_mean": float(rel.mean()),
        "logit_rel_err_p95": float(np.percentile(rel, 95)),
        "logit_rel_err_max": float(rel.max()),
    }

    # 2) sampled-token agreement + top-k TV distance at T=1 / top-k 100
    def topk_probs(l):
        k = cfg.top_k or 100
        thresh = np.sort(l, axis=-1)[..., -k][..., None]
        masked = np.where(l < thresh, -np.inf, l)
        e = np.exp(masked - masked.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    pb_probs = topk_probs(lb.reshape(-1, lb.shape[-1]))
    pq_probs = topk_probs(lq.reshape(-1, lq.shape[-1]))
    tv = 0.5 * np.abs(pb_probs - pq_probs).sum(-1)
    out["topk_tv_mean"] = float(tv.mean())
    out["topk_tv_p95"] = float(np.percentile(tv, 95))

    # same-key gumbel sampling from both distributions
    g = np.random.RandomState(0).gumbel(size=pb_probs.shape).astype(np.float32)
    pick_b = np.argmax(np.log(np.maximum(pb_probs, 1e-20)) + g, axis=-1)
    pick_q = np.argmax(np.log(np.maximum(pq_probs, 1e-20)) + g, axis=-1)
    out["token_agreement"] = float((pick_b == pick_q).mean())
    out["n_tokens_scored"] = int(pick_b.size)

    out["backend"] = jax.default_backend()

    # 3) end-to-end generate: bf16 vs int8 timing (within-run), + beam x int8
    if ARGS.quality_only:
        print(json.dumps(out, indent=1))
        with open(ARGS.out, "w") as f:
            json.dump(out, f, indent=1)
        return
    ctx = tokens[:, :cond]

    def run_gen(gcfg, label):
        t = TokenTransformer(gcfg)
        r = jax.random.PRNGKey(7)
        o = t.generate(params, r, ctx)  # compile
        sync(o["code"])
        t0 = time.time()
        o = t.generate(params, r, ctx)
        sync(o["code"])
        dt = time.time() - t0
        ntok = o["code"].shape[1] - cond
        print(f"{label}: {ntok} tokens in {dt:.2f}s = {dt / ntok * 1e3:.2f} ms/tok",
              flush=True)
        return o, dt / ntok * 1e3

    o_b, ms_b = run_gen(cfg, "bf16 sampled")
    o_q, ms_q = run_gen(dataclasses.replace(cfg, serve_int8=True), "int8 sampled")
    out["ms_per_token_bf16"] = round(ms_b, 3)
    out["ms_per_token_int8"] = round(ms_q, 3)
    out["int8_speedup"] = round(ms_b / ms_q, 3)

    o_beam, _ = run_gen(dataclasses.replace(cfg, serve_int8=True, beam_size=4),
                        "int8 beam=4")
    assert o_beam["code"].shape == o_q["code"].shape
    assert np.asarray((o_beam["code"] >= 0) & (o_beam["code"] < cfg.z_num)).all()
    out["beam_int8_ok"] = True

    print(json.dumps(out, indent=1))
    with open(ARGS.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    os.makedirs(os.path.dirname(ARGS.out) or ".", exist_ok=True)
    main()
