"""North-star benchmark: frames/sec/chip for a 16-frame 256x256 BAIR rollout.

Runs the full doubly-autoregressive synthesis pipeline (KV-cached AR token
generation for 15 frames + flow-warped image decode with context refresh) on
one chip and prints a JSON line after every measured iteration (best-so-far;
the driver parses the tail of stdout, so the LAST line is the result and a
mid-run timeout still leaves a parsed number):

    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

`vs_baseline` is measured against the reference implementation's estimated
A100 throughput for the same pipeline (~0.5 frames/sec: per-token full GPT
forwards without KV cache dominate, `transformer_model.py:331-392` +
per-frame decode/encode, `quantized_video_model.py:849-907`). The reference
repo publishes no throughput numbers (BASELINE.md), so this constant is our
recorded estimate of the PyTorch pipeline's speed; the driver-defined target
is >= 4x A100 frames/sec/chip.
"""

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.config import bairhd_config
from ccvs_tpu.generate import VideoGenerator
from ccvs_tpu.models import FrameAutoencoder, TokenTransformer

# Estimated reference (PyTorch, 1xA100) end-to-end throughput for
# scripts/bairhd/save_videos_state_off.sh-style 16-frame rollouts.
REFERENCE_A100_FPS = 0.5

BATCH = 2  # reference uses --batch_size_vid 2 (save_videos_state_off.sh:9)
VID_LEN = 16
N_CTX = 1


# GPT int8-serving gate (on-chip, trained weights; see
# scripts/int8_gate_r5.py). The bench turns on the int8 AR decode ONLY when
# the committed gate artifact passes the quality thresholds AND records a
# measured within-run END-TO-END speedup > 1 on the full bench pipeline —
# a serving mode that is slower AND approximate must never win (round-4's
# artifact measured int8 3.7x SLOWER e2e yet the bench served it because
# the gate was quality-only; VERDICT r4 item 3). CCVS_BENCH_SERVE=exact
# forces the exact-bf16 path. (Int8 decoder-conv and int8 warp-source
# serving variants were also built and gate-measured SLOWER than exact on
# v5e — runs_r3/dec_quant_gate.json — and were removed; scripts/PERF_NOTES.md.)
GPT_GATE = "runs_r5/int8_gate.json"
GPT_GATE_FALLBACKS = ()
GPT_AGREE_MIN = 0.97    # same-key sampled-token agreement at T=1/top-k 100
GPT_TV_MAX = 0.05       # mean total variation of the top-k distribution
GPT_E2E_SPEEDUP_MIN = 1.0   # full-pipeline frames/s, int8 vs exact, same run

# Fused-decode serving gate: run encode + the whole bucketed decode rollout
# as single jit programs (cfg.ae.serve_fused) — numerically identical, but
# eliminates the eager glue whose per-op remote dispatches dominate rollout
# wall time (23.8x at 64px, runs_r5/dispatch_ab_mid.json). Authorized ONLY
# by the 256px artifact (scripts/dispatch_ab_r5.py --full): the one open
# risk at 256px is the outer program vs the remote-compile service, so the
# mid artifact must not flip the flagship bench. CCVS_BENCH_FUSED=off
# forces the eager path.
FUSED_GATE = "runs_r5/dispatch_ab.json"
FUSED_SPEEDUP_MIN = 1.05

# Concurrent compile priming: the remote compile service overlaps DISTINCT
# programs (runs_r5/compile_probe.json aot_parallel_test: kb8+kb15 compiled
# in 62.7 s wall vs 106.5 s summed), and the bench's ~20 min compile nearly
# cost two of five rounds (VERDICT r4 item 5). When the probe artifact
# proves overlap, the big pipeline programs get their first (compiling)
# call in parallel threads before the warmup run, pulling compile wall
# toward max(program) instead of sum. Priming is by REAL first calls —
# AOT .lower().compile() does not populate the jit dispatch cache, and
# there is no persistent compile cache through the tunnel. Fail-soft: any
# prime thread error falls back to the sequential warmup compile for that
# program. CCVS_BENCH_PRECOMPILE=off disables.
PRECOMPILE_PROBE = "runs_r5/compile_probe.json"


def precompile_mode():
    if os.environ.get("CCVS_BENCH_PRECOMPILE", "auto") == "off":
        return False
    t = (_load(PRECOMPILE_PROBE) or {}).get("aot_parallel_test") or {}
    indiv = t.get("parallel_individual_s", {})
    return bool(indiv) and (
        t.get("parallel_wall_s", 1e9) <= 0.8 * sum(indiv.values()))


def _prime_parallel(cfg, ae, tr, params, vid, fused):
    """First-call the pipeline's big programs concurrently with the EXACT
    shapes/dtypes VideoGenerator.generate will use (a mismatched prime
    would add a useless compile). Returns per-thread error strings."""
    import threading

    size = cfg.ae.tokens_per_frame
    errs = {}

    def job(name, fn):
        def run():
            try:
                out = fn()
                np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
            except Exception as e:  # fall back to sequential warmup compile
                errs[name] = repr(e)[:200]
        return threading.Thread(target=run, name=f"prime-{name}")

    # GPT generate: ctx_code (B, N_CTX*size) int32, fill to VID_LEN*size
    # (generate.py:157-169)
    threads = [job("gpt", lambda: tr.generate(
        params["gpt"], jax.random.PRNGKey(0),
        jnp.zeros((BATCH, N_CTX * size), jnp.int32),
        total_len=VID_LEN * size)["code"])]
    if fused:
        # one program each for encode and the whole decode rollout
        # (generate.py:83-86: get_jit_encode / get_jit_decode_video)
        threads.append(job("encode_fused", lambda: ae.get_jit_encode()(
            params["ae"], vid)["code"]))
        threads.append(job("decode_fused", lambda: ae.get_jit_decode_video()(
            params["ae"],
            jnp.zeros((BATCH, VID_LEN, size), jnp.int32),
            ctx_frames=vid[:, :N_CTX], n_ctx=N_CTX)))
    else:
        # eager path: per-op encode compiles in one thread; each bucketed
        # scan program (distinct kb AND segment length — scan length is
        # static) in its own thread, replicating decode_video's grouping
        # (models/autoencoder.py:408-428)
        threads.append(job("encode_eager",
                           lambda: ae.encode(params["ae"], vid)["code"]))
        pb = params["ae"]
        if ae.dtype == jnp.bfloat16:  # mirror decode_video's entry cast
            from ccvs_tpu.utils.casting import cast_params_bf16

            pb = cast_params_bf16(pb)
        m = cfg.ae.skip_memory
        z_all = ae.embed_code(pb, jnp.zeros((BATCH, VID_LEN, size), jnp.int32))
        z_gen = jnp.moveaxis(z_all[:, N_CTX:], 1, 0)
        seq = [ae._bucket(min(N_CTX + i, m), m) for i in range(VID_LEN - N_CTX)]
        i = 0
        while i < len(seq):
            j = i + 1
            while j < len(seq) and seq[j] == seq[i]:
                j += 1
            kb, lo, hi, curr = seq[i], i, j, N_CTX + i
            threads.append(job(
                f"decode_kb{kb}", lambda kb=kb, lo=lo, hi=hi, curr=curr:
                ae._get_jit_seg()(pb, ae._zero_inters(BATCH, m),
                                  jnp.asarray(curr, jnp.int32),
                                  z_gen[lo:hi], None, kb=kb)[1]))
            i = j
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return errs


def fused_mode():
    """(serve_fused, info) from the 256px dispatch A/B artifact."""
    if os.environ.get("CCVS_BENCH_FUSED", "auto") == "off":
        return False, {"decode": "eager (forced)"}
    ab = _load(FUSED_GATE)
    v = (ab or {}).get("variants", {}).get("C_outer_jit", {})
    if "error" not in v and v.get("speedup_vs_A", 0) >= FUSED_SPEEDUP_MIN:
        return True, {"decode": "fused single-program (gated)",
                      "fused_speedup_vs_eager": v["speedup_vs_A"],
                      "fused_gate": FUSED_GATE}
    return False, {"decode": "eager bucketed"}


def _load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def serving_mode():
    """(gpt_int8, info) chosen from the gate artifact.

    The artifact must have been measured ON the TPU backend: the gate's
    purpose is assurance on the real served path, so a CPU-backed artifact
    (e.g. round-3's `runs_r3/int8_gate.json`, recorded while the chip tunnel
    was down) keeps the bench on the exact bf16 path with a stderr warning.
    """
    import sys

    info = {"serving": "exact-bf16"}
    if os.environ.get("CCVS_BENCH_SERVE", "auto") == "exact":
        return False, info
    for path in (GPT_GATE, *GPT_GATE_FALLBACKS):
        gpt = _load(path)
        if not (gpt and gpt.get("trained_weights")
                and gpt.get("token_agreement", 0) >= GPT_AGREE_MIN
                and gpt.get("topk_tv_mean", 1) <= GPT_TV_MAX):
            continue
        if gpt.get("backend") != "tpu":
            print(f"bench: int8 gate {path} passes quality but was measured "
                  f"on backend={gpt.get('backend')!r}, not the TPU serving "
                  "path; staying on exact bf16", file=sys.stderr)
            continue
        speedup = gpt.get("int8_e2e_speedup")
        if not (isinstance(speedup, (int, float))
                and speedup > GPT_E2E_SPEEDUP_MIN):
            print(f"bench: int8 gate {path} passes quality but its measured "
                  f"end-to-end speedup is {speedup!r} (need > "
                  f"{GPT_E2E_SPEEDUP_MIN}); an approximate mode that is not "
                  "faster must not serve — staying on exact bf16",
                  file=sys.stderr)
            continue
        info["serving"] = "int8 AR decode (quality+speed gated)"
        info["gpt_int8_agreement"] = gpt["token_agreement"]
        info["gpt_int8_topk_tv"] = gpt["topk_tv_mean"]
        info["gpt_int8_e2e_speedup"] = speedup
        info["gpt_int8_gate"] = path
        return True, info
    return False, info


def main():
    cfg = bairhd_config()
    gpt_int8, serve_info = serving_mode()
    if gpt_int8:
        cfg = cfg.replace(gpt=dataclasses.replace(cfg.gpt, serve_int8=True))
    fused, fused_info = fused_mode()
    serve_info.update(fused_info)
    if fused:
        cfg = cfg.replace(ae=dataclasses.replace(cfg.ae, serve_fused=True))
    ae = FrameAutoencoder(cfg.ae, dtype=jnp.bfloat16)
    tr = TokenTransformer(cfg.gpt, dtype=jnp.bfloat16)
    gen = VideoGenerator(cfg, ae, tr)

    key = jax.random.PRNGKey(0)
    params = {
        "ae": jax.jit(ae.init)(key),
        "gpt": jax.jit(lambda k: tr.init(k, batch=BATCH))(key),
    }
    vid = jax.random.uniform(key, (BATCH, VID_LEN, 256, 256, 3), jnp.float32, -1, 1)

    def run(rng):
        out = gen.generate(params, rng, vid, rec=False, n_ctx_frames=N_CTX)
        # Sync via device->host transfer of a tiny slice: on this backend
        # `block_until_ready` returns before remote execution finishes, so a
        # transfer is the only reliable completion barrier.
        return np.asarray(out["fake"][:, -1, :2, :2, 0])

    # compile + warmup (optionally priming the big programs concurrently;
    # the warmup run then compiles only the remaining glue)
    t0 = time.perf_counter()
    if precompile_mode():
        errs = _prime_parallel(cfg, ae, tr, params, vid, fused)
        serve_info["precompile"] = "parallel" + (
            f" (fallbacks: {sorted(errs)})" if errs else "")
        for name, e in errs.items():
            import sys

            print(f"bench: prime {name} failed ({e}); sequential warmup "
                  "will compile it", file=sys.stderr)
    run(jax.random.PRNGKey(1))
    compile_s = round(time.perf_counter() - t0, 1)
    run(jax.random.PRNGKey(2))

    # Deadline-aware measurement (round-3 lesson: 6 iters x 45 s gaps blew
    # the driver's timeout and the judged metric became rc=124/parsed=null).
    # The driver parses the LAST JSON line of stdout, so print the
    # best-so-far result after EVERY measured iteration: even a mid-run kill
    # leaves a parsed number on the board. The tunneled chip has sustained
    # slow windows (+10-30%); min-of-N with short gaps keeps some noise
    # rejection without stretching the run.
    # 6 iters x 8 s gaps adds ~80 s on top of the ~21 min compile (round-4
    # validated end-to-end: rc=0 at 22.5 min total) while doubling the
    # chances of catching a fast tunnel window for the min; every iteration
    # prints, so even a driver kill mid-run keeps the best-so-far number.
    iters = int(os.environ.get("CCVS_BENCH_ITERS", "6"))
    gap_s = float(os.environ.get("CCVS_BENCH_GAP_S", "8"))
    frames = BATCH * (VID_LEN - N_CTX)  # synthesized frames per run
    times = []
    for i in range(iters):
        if i:
            time.sleep(gap_s)
        t0 = time.perf_counter()
        run(jax.random.PRNGKey(3 + i))
        times.append(time.perf_counter() - t0)
        dt = min(times)  # min-of-N: the tunneled chip shows large timing noise
        print(
            json.dumps(
                {
                    "metric": "bair_16f_256px_rollout",
                    "value": round(frames / dt, 3),
                    "unit": "frames/sec/chip",
                    "vs_baseline": round(frames / dt / REFERENCE_A100_FPS, 2),
                    # methodology: value = min-of-N so far (tunnel noise);
                    # mean alongside; baseline 0.5 f/s is an ESTIMATE
                    # (the reference publishes no throughput numbers)
                    "value_mean": round(frames / (sum(times) / len(times)), 3),
                    "iters": len(times),
                    "iter_times_s": [round(t, 3) for t in times],
                    "baseline_is_estimate": True,
                    "compile_s": compile_s,
                    **serve_info,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
