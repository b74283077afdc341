"""Component-level perf probe: find the decode-step and token-step bottlenecks."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def sync(x):
    x = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(x.reshape(-1)[:1])


def timeit(name, fn, n=3):
    sync(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    log(f"{name}: min {min(ts)*1000:.1f} ms")
    return min(ts)


def main():
    from ccvs_tpu.ops import backwarp, local_correlation
    from ccvs_tpu.ops.vq_pallas import vq_lookup_pallas
    from ccvs_tpu.ops.vq import vq_lookup

    key = jax.random.PRNGKey(0)

    # backwarp at the InterBlock's hottest size (B*k=30, 256^2, 96ch)
    x = jax.random.normal(key, (30, 256, 256, 96), jnp.bfloat16)
    flow = jax.random.normal(key, (30, 256, 256, 2), jnp.bfloat16) * 4
    bw = jax.jit(backwarp)
    timeit("backwarp 30x256x256x96", lambda: bw(x, flow))

    # correlation at hottest sizes
    a24 = jax.random.normal(key, (30, 256, 256, 24), jnp.float32)
    corr = jax.jit(lambda a, b: local_correlation(a, b, stride=1))
    timeit("correlation 30x256x256x24 s1", lambda: corr(a24, a24))
    a48 = jax.random.normal(key, (30, 64, 64, 48), jnp.float32)
    corr2 = jax.jit(lambda a, b: local_correlation(a, b, stride=2))
    timeit("correlation 30x64x64x48 s2", lambda: corr2(a48, a48))

    # conv stack at 256^2 (Matching convs equivalent)
    from ccvs_tpu.ops import conv2d
    w1 = jax.random.normal(key, (128, 49, 3, 3), jnp.bfloat16) * 0.01
    c49 = jax.random.normal(key, (30, 256, 256, 49), jnp.bfloat16)
    conv = jax.jit(lambda x, w: conv2d(x, w, None, padding=1))
    timeit("conv 49->128 3x3 @256^2 x30", lambda: conv(c49, w1))

    # single GPT decode step (B=2, 24L, cache 1088)
    from ccvs_tpu.config import bairhd_config
    from ccvs_tpu.models import TokenTransformer
    from ccvs_tpu.nn.gpt import GPT

    cfg = bairhd_config().gpt
    tr = TokenTransformer(cfg, dtype=jnp.bfloat16)
    params = jax.jit(lambda k: tr.init(k, batch=2))(key)
    model = tr.model
    cache = model.apply({"params": params}, 2, 1088, method=GPT.init_cache)
    emb1 = jax.random.normal(key, (2, 1, cfg.n_embd), jnp.bfloat16)

    @jax.jit
    def one_step(params, emb1, cache):
        return model.apply({"params": params}, emb1, 500, cache, method=GPT.decode_step)

    timeit("gpt decode_step B2 L1088", lambda: one_step(params, emb1, cache)[0])

    @jax.jit
    def eight_steps(params, emb1, cache):
        def body(carry, _):
            logits, cache = model.apply({"params": params}, emb1, 500, carry, method=GPT.decode_step)
            return cache, logits
        cache, logits = jax.lax.scan(body, cache, None, length=8)
        return logits

    t = timeit("gpt 8 decode_steps in scan", lambda: eight_steps(params, emb1, cache))
    log(f"  -> {t/8*1000:.2f} ms/step in-scan")

    # full forward for comparison (recompute baseline)
    code = jax.random.randint(key, (2, 1023), 0, cfg.z_num)
    full = jax.jit(lambda p, c: tr.model.apply({"params": p}, c))
    timeit("gpt full fwd 1023 tok", lambda: full(params, code))

    # vq pallas vs jnp on TPU
    cb = jax.random.normal(key, (16384, 512), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(7), (2048, 512), jnp.float32)
    vq_j = jax.jit(vq_lookup)
    vq_p = jax.jit(lambda z, cb: vq_lookup_pallas(z, cb))
    timeit("vq jnp 2048x16384", lambda: vq_j(z, cb)[1])
    timeit("vq pallas 2048x16384", lambda: vq_p(z, cb)[1])
    same = bool(np.array_equal(np.asarray(vq_j(z, cb)[1]), np.asarray(vq_p(z, cb)[1])))
    log("pallas == jnp:", same)

    log("DONE")


if __name__ == "__main__":
    main()
