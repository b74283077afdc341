"""Round-5 A/B: decode-rollout dispatch count vs per-program FLOPs (VERDICT
r4 item 4, carried from r3 item 6; supersedes scripts/dispatch_ab_r4.py).

The bucketed decode runs the 15 generated frames as N `lax.scan` programs
(one per static context-count bucket; ~29 ms tunnel dispatch overhead each).
Variants, timed interleaved within ONE process so tunnel drift cancels:

  A. configured buckets (minimal FLOPs, most dispatches)
  B. single full-M bucket (1 dispatch, more InterBlock FLOPs early)
  C. one outer jit around the whole bucketed rollout (1 dispatch AND
     minimal FLOPs; risk: a big program for the remote compiler)

ADVICE r4 fixes vs the r4 script: the EFFECTIVE bucket sequence (after the
`k <= b <= m` filter in `FrameAutoencoder._bucket`) is simulated and
recorded per variant — at the 64px mid config (skip_memory=4) variant A is
only 2 programs vs 4 at 256px, so the A->B delta is 1 dispatch, not 3; the
JSON now records dispatch counts, B's CCVS_DECODE_BUCKETS override, and a
per-dispatch saving estimate so the 256px extrapolation uses the right
multiplier instead of reading the mid result as-is.

    python scripts/dispatch_ab_r5.py          # 64px mid config (default)
    python scripts/dispatch_ab_r5.py --full   # 256px bench shapes
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


def effective_buckets(ae, n_ctx, t, env_override=None):
    """Simulate decode_video's kb_of sequence -> (bucket per frame,
    program/dispatch count). Mirrors models/autoencoder.py:387-405."""
    m = ae.cfg.skip_memory
    old = os.environ.get("CCVS_DECODE_BUCKETS")
    if env_override is not None:
        os.environ["CCVS_DECODE_BUCKETS"] = env_override
    try:
        seq = [ae._bucket(min(n_ctx + i, m), m) for i in range(t - n_ctx)]
    finally:
        if env_override is not None:
            if old is None:
                os.environ.pop("CCVS_DECODE_BUCKETS", None)
            else:
                os.environ["CCVS_DECODE_BUCKETS"] = old
    dispatches = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    return seq, dispatches


def main():
    full = "--full" in sys.argv[1:]
    from ccvs_tpu.config import bairhd_config
    from ccvs_tpu.models import FrameAutoencoder

    assert jax.default_backend() == "tpu"
    if full:
        cfg = bairhd_config()
    else:
        from fvd_mid_r5 import mid_cfg

        cfg = mid_cfg("bair")
    acfg = cfg.ae
    dim = acfg.max_dim
    ae = FrameAutoencoder(acfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(ae.init)(key)
    B, T, N_CTX = 2, 16, 1
    codes = jax.random.randint(key, (B, T, acfg.tokens_per_frame), 0, acfg.z_num)
    ctx = jax.random.uniform(key, (B, N_CTX, dim, dim, 3), jnp.float32, -1, 1)

    single = str(acfg.skip_memory)
    seq_a, disp_a = effective_buckets(ae, N_CTX, T)
    seq_b, disp_b = effective_buckets(ae, N_CTX, T, env_override=single)
    variants = {
        "A_buckets": {"effective_buckets": sorted(set(seq_a)),
                      "dispatches": disp_a},
        "B_single_bucket": {"env_override": f"CCVS_DECODE_BUCKETS={single}",
                            "effective_buckets": sorted(set(seq_b)),
                            "dispatches": disp_b},
        "C_outer_jit": {"effective_buckets": sorted(set(seq_a)),
                        "dispatches": 1},
    }

    def run_A():
        return ae.decode_video(params, codes, ctx_frames=ctx, n_ctx=N_CTX)

    def run_B():
        os.environ["CCVS_DECODE_BUCKETS"] = single
        try:
            return ae.decode_video(params, codes, ctx_frames=ctx, n_ctx=N_CTX)
        finally:
            os.environ.pop("CCVS_DECODE_BUCKETS", None)

    fused = jax.jit(lambda p, c, x: ae.decode_video(p, c, ctx_frames=x, n_ctx=N_CTX))

    def run_C():
        return fused(params, codes, ctx)

    out_path = ("runs_r5/dispatch_ab.json" if full
                else "runs_r5/dispatch_ab_mid.json")

    def dump():
        out = {"shapes": f"B={B} T={T} {dim}px skip_memory={acfg.skip_memory} "
                         f"configured-buckets={acfg.decode_buckets}",
               "bucket_seq_A": seq_a,
               "variants": variants}
        os.makedirs("runs_r5", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)

    order = []
    # compile-risk ordering: cheapest program first so a compile-service
    # death still leaves partial results on disk (dump() after every step)
    for name, fn in [("B_single_bucket", run_B), ("A_buckets", run_A),
                     ("C_outer_jit", run_C)]:
        t0 = time.time()
        try:
            sync(fn())
        except Exception as e:
            variants[name]["error"] = repr(e)[:300]
            print(f"{name}: FAILED {e!r}", flush=True)
            dump()
            continue
        variants[name].update(compile_s=round(time.time() - t0, 1), times=[])
        order.append((name, fn))
        print(f"{name}: compiled in {variants[name]['compile_s']}s", flush=True)
        dump()

    for r in range(4):
        for name, fn in order:
            t0 = time.perf_counter()
            sync(fn())
            variants[name]["times"].append(round(time.perf_counter() - t0, 4))
        dump()
        print(f"round {r}: " + " ".join(
            f"{n}={variants[n]['times'][-1]:.3f}s" for n, _ in order), flush=True)

    base = variants["A_buckets"]
    for name, v in variants.items():
        if v.get("times"):
            v["min_s"] = min(v["times"])
            v["mean_s"] = round(sum(v["times"]) / len(v["times"]), 4)
    for name, v in variants.items():
        if "min_s" in v and "min_s" in base:
            v["speedup_vs_A"] = round(base["min_s"] / v["min_s"], 4)
            d_disp = base["dispatches"] - v["dispatches"]
            if d_disp:
                # per-dispatch saving: the right multiplier for extrapolating
                # a mid-config result to the 256px bucket count (ADVICE r4)
                v["per_dispatch_saving_ms"] = round(
                    (base["min_s"] - v["min_s"]) / d_disp * 1e3, 2)
    dump()
    print(json.dumps({"variants": variants}, indent=1))


if __name__ == "__main__":
    main()
