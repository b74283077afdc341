"""Round-5 probe: where do the bench's ~20 compile minutes go, and can the
programs compile CONCURRENTLY through the remote-compile tunnel? (VERDICT r4
item 5 — the 1207 s bench compile nearly cost two of four rounds.)

The bench pipeline's compiled units at the flagship 256px config:
  - GPT `TokenTransformer.generate` (one jitted program: KV prefill +
    lax.scan cached decode, models/transformer.py:253)
  - AE decode `_scan_segment_fn` per context-count bucket (kb = 2, 4, 8, 15
    -> 4 programs, models/autoencoder.py:311-316)
  - eager ops (encode, ctx decode, glue) — compiled per-op, cheap

This probe times each unit's first call (compile+run) and second call (run)
separately, then tests whether two bucket programs AOT-compile
(`jit(...).lower(...).compile()`) in parallel threads faster than the same
two sequentially — if the tunnel compile service parallelizes, bench.py can
pre-compile its program set concurrently and cut wall compile time toward
max(program) instead of sum(programs).

    python scripts/compile_probe_r5.py [--mid]   # --mid: 64px (fast check)
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def main():
    mid = "--mid" in sys.argv[1:]
    assert jax.default_backend() == "tpu"
    from ccvs_tpu.config import bairhd_config
    from ccvs_tpu.models import FrameAutoencoder, TokenTransformer
    from ccvs_tpu.utils.casting import cast_params_bf16

    if mid:
        from fvd_mid_r5 import mid_cfg

        cfg = mid_cfg("bair")
    else:
        cfg = bairhd_config()
    acfg, gcfg = cfg.ae, cfg.gpt
    dim = acfg.max_dim
    B, T, N_CTX = 2, 16, 1
    ae = FrameAutoencoder(acfg, dtype=jnp.bfloat16)
    tr = TokenTransformer(gcfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params = {"ae": jax.jit(ae.init)(key),
              "gpt": jax.jit(lambda k: tr.init(k, batch=B))(key)}
    vid = jax.random.uniform(key, (B, T, dim, dim, 3), jnp.float32, -1, 1)
    out = {"config": "mid 64px" if mid else "flagship 256px", "units": {}}
    path = os.path.join("runs_r5",
                        "compile_probe_mid.json" if mid else "compile_probe.json")

    def dump():
        os.makedirs("runs_r5", exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    def unit(name, fn):
        t0 = time.perf_counter()
        sync(fn())
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(fn())
        second = time.perf_counter() - t0
        out["units"][name] = {"first_s": round(first, 1),
                              "run_s": round(second, 2),
                              "compile_est_s": round(first - second, 1)}
        print(f"{name}: first={first:.1f}s run={second:.2f}s", flush=True)
        dump()

    # 1) eager encode (per-op compile)
    unit("encode_16f_eager", lambda: ae.encode(params["ae"], vid)["code"])

    # 2) GPT generate program
    enc = ae.encode(params["ae"], vid)
    code_all = enc["code"].reshape(B, -1)
    size = acfg.tokens_per_frame
    ctx_code = code_all[:, : N_CTX * size]

    unit("gpt_generate", lambda: tr.generate(
        params["gpt"], jax.random.PRNGKey(1), ctx_code,
        total_len=T * size)["code"])

    # 3) decode bucket programs, individually (direct jseg calls)
    pb = cast_params_bf16(params["ae"])
    m = acfg.skip_memory
    fifo = ae._zero_inters(B, m)
    jseg = ae._get_jit_seg()
    buckets = sorted({ae._bucket(min(N_CTX + i, m), m) for i in range(T - N_CTX)})
    z1 = ae.embed_code(pb, code_all[:, :size]).astype(jnp.bfloat16)
    z_seg = jnp.broadcast_to(z1[None], (2, *z1.shape)).reshape(2, B, *z1.shape[1:])
    for kb in buckets:
        unit(f"decode_bucket_kb{kb}", lambda kb=kb: jseg(
            pb, fifo, jnp.asarray(N_CTX, jnp.int32), z_seg, None, kb=kb)[1])

    # 4) parallel-compile test: AOT-lower two FRESH programs (batch B+2 so
    # nothing is cached), compile sequentially vs in 2 threads
    B2 = B + 2
    fifo2 = ae._zero_inters(B2, m)
    z2 = jnp.broadcast_to(z1[:1][None], (2, 1, *z1.shape[1:]))
    z2 = jnp.broadcast_to(z2, (2, B2, *z1.shape[1:]))

    def lower(kb):
        return jseg.lower(pb, fifo2, jnp.asarray(N_CTX, jnp.int32), z2,
                          None, kb=kb)

    if len(buckets) >= 2:
        k_seq, k_par = buckets[:2], buckets[-2:]
        t0 = time.perf_counter()
        for kb in k_seq:
            lower(kb).compile()
        seq_s = time.perf_counter() - t0
        print(f"sequential AOT compile kb={k_seq}: {seq_s:.1f}s", flush=True)

        times = {}

        def work(kb):
            t0 = time.perf_counter()
            lower(kb).compile()
            times[kb] = time.perf_counter() - t0

        t0 = time.perf_counter()
        threads = [threading.Thread(target=work, args=(kb,)) for kb in k_par]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        par_s = time.perf_counter() - t0
        print(f"parallel AOT compile kb={k_par}: wall {par_s:.1f}s "
              f"(individual: {[round(times[k], 1) for k in k_par]})", flush=True)
        out["aot_parallel_test"] = {
            "sequential_kbs": k_seq, "sequential_wall_s": round(seq_s, 1),
            "parallel_kbs": k_par, "parallel_wall_s": round(par_s, 1),
            "parallel_individual_s": {str(k): round(times[k], 1) for k in k_par},
            "note": "different kb = different programs; B+2 batch so nothing "
                    "was cached. parallel_wall ~= max(individual) means the "
                    "tunnel compile service parallelizes",
        }
        dump()

    total_first = sum(u["first_s"] for u in out["units"].values())
    out["sum_first_s"] = round(total_first, 1)
    dump()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
