"""Round-4 A/B: decode-rollout dispatch count vs per-program FLOPs (VERDICT
r3 item 6).

The 15-frame BAIR decode currently runs as 4 bucketed `lax.scan` programs
(kb = 2, 4, 8, M slots; ~29 ms tunnel dispatch overhead each, r3
PERF_NOTES). Three candidates, timed interleaved within ONE process so
tunnel drift cancels:

  A. default buckets (4 dispatches, minimal FLOPs)
  B. single full-M bucket (1 dispatch, ~1/3 more InterBlock FLOPs early)
  C. one outer jit around the whole bucketed rollout (1 dispatch AND
     minimal FLOPs; risk: a big program for the remote compiler)

    python scripts/dispatch_ab_r4.py          # 256px bench shapes
    python scripts/dispatch_ab_r4.py --mid    # 64px mid config

`--mid` exists because the 256px variant-A compile did not return after 23
minutes in a sustained slow-tunnel window (session 2): the 64px mid config
compiles in minutes and still answers the dispatch-count question — the
~29 ms per-program dispatch overhead is a fixed cost, so its share is LARGER
at 64px; a null result there bounds the 256px effect from above.
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
    return np.asarray(x.reshape(-1)[:1])


def main():
    mid = "--mid" in sys.argv[1:]
    from ccvs_tpu.config import bairhd_config
    from ccvs_tpu.models import FrameAutoencoder

    assert jax.default_backend() == "tpu"
    if mid:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from fvd_mid_r4 import mid_cfg
        cfg = mid_cfg()
    else:
        cfg = bairhd_config()
    # bench protocol shapes (bench.py): B=2, 16 frames, 1 ctx, kb=15
    acfg = cfg.ae
    dim = acfg.max_dim
    ae = FrameAutoencoder(acfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = jax.jit(ae.init)(key)
    B, T = 2, 16
    codes = jax.random.randint(key, (B, T, acfg.tokens_per_frame), 0, acfg.z_num)
    ctx = jax.random.uniform(key, (B, 1, dim, dim, 3), jnp.float32, -1, 1)

    variants = {}

    def run_A():
        return ae.decode_video(params, codes, ctx_frames=ctx, n_ctx=1)

    def run_B():
        os.environ["CCVS_DECODE_BUCKETS"] = str(acfg.skip_memory)
        try:
            return ae.decode_video(params, codes, ctx_frames=ctx, n_ctx=1)
        finally:
            os.environ.pop("CCVS_DECODE_BUCKETS", None)

    fused = jax.jit(lambda p, c, x: ae.decode_video(p, c, ctx_frames=x, n_ctx=1))

    def run_C():
        return fused(params, codes, ctx)

    out_path = "runs_r4/dispatch_ab_mid.json" if mid else "runs_r4/dispatch_ab.json"

    def dump():
        out = {"shapes": f"B={B} T={T} {dim}px kb-buckets={acfg.decode_buckets}",
               "variants": variants}
        os.makedirs("runs_r4", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)

    order = []
    for name, fn in [("A_buckets", run_A), ("B_single_bucket", run_B),
                     ("C_outer_jit", run_C)]:
        t0 = time.time()
        try:
            sync(fn())
        except Exception as e:
            variants[name] = {"error": repr(e)[:300]}
            print(f"{name}: FAILED {e!r}", flush=True)
            dump()
            continue
        variants[name] = {"compile_s": round(time.time() - t0, 1), "times": []}
        order.append((name, fn))
        print(f"{name}: compiled in {variants[name]['compile_s']}s", flush=True)
        dump()

    # interleaved timing: 4 rounds of A,B,C back-to-back
    for r in range(4):
        for name, fn in order:
            t0 = time.perf_counter()
            sync(fn())
            variants[name]["times"].append(round(time.perf_counter() - t0, 4))
        dump()
        print(f"round {r}: " + " ".join(
            f"{n}={variants[n]['times'][-1]:.3f}s" for n, _ in order), flush=True)

    base = None
    for name in variants:
        v = variants[name]
        if "times" in v and v["times"]:
            v["min_s"] = min(v["times"])
            v["mean_s"] = round(sum(v["times"]) / len(v["times"]), 4)
            if name == "A_buckets":
                base = v["min_s"]
    for name, v in variants.items():
        if base and "min_s" in v:
            v["speedup_vs_A"] = round(base / v["min_s"], 4)
    dump()
    print(json.dumps({"variants": variants}, indent=1))


if __name__ == "__main__":
    main()
