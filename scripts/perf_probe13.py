"""Probe 13: is w4a8 (int4 weights, int8 activations) faster than int8?

The AR decode loop is weight-streaming bound (PERF_NOTES probe 10/11:
bf16 -> int8 weights gave 1.54x end-to-end). If v5e streams int4 weights
at ~2x int8 bandwidth, a w4a8 GPT decode could approach another ~1.5x on
the matmul-bound fraction. This times the decode-shape weight sweep
(B=2 rows through all 24 blocks' Dense kernels at n_embd=1024, mirroring
`nn/quantized.py`'s per-token work) within one run, interleaved A/B/C:

    bf16   : x(2,1024)bf16 @ w(1024,O)bf16
    w8a8   : x int8 @ w int8 -> int32
    w4a8   : x int8 @ w int4 -> int32

Also checks numerics: max rel error of w4a8 vs fp32 on Gaussian weights.

Run on the chip:   python scripts/perf_probe13.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

B = 2
D = 1024
N_BLOCKS = 24
# per block: qkv+proj (4x DxD) + fc1 (Dx4D) + fc2 (4Dx1D)
SHAPES = [(D, D)] * 4 + [(D, 4 * D), (4 * D, D)]
ITERS = 30


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


def make_weights(key):
    ws = []
    for i in range(N_BLOCKS):
        for j, (i_dim, o_dim) in enumerate(SHAPES):
            key, sub = jax.random.split(key)
            ws.append(jax.random.normal(sub, (i_dim, o_dim), jnp.float32) * 0.02)
    return ws


def quant_w(w, bits):
    qmax = 2 ** (bits - 1) - 1
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / qmax
    dt = jnp.int8 if bits == 8 else jnp.int4
    wq = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(dt)
    return wq, scale[0].astype(jnp.float32)


def sweep_bf16(ws, x):
    for w in ws:
        pad = jnp.zeros((B, w.shape[0] - x.shape[1]), x.dtype) if w.shape[0] != x.shape[1] else None
        xin = x if pad is None else jnp.concatenate([x, pad], axis=1)
        y = xin @ w
        x = jnp.tanh(y[:, :D]).astype(jnp.bfloat16)
    return x


def sweep_q(qws, x):
    for wq, s in qws:
        i_dim = wq.shape[0]
        xf = x if x.shape[1] == i_dim else jnp.concatenate(
            [x, jnp.zeros((B, i_dim - x.shape[1]), x.dtype)], axis=1)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.maximum(amax, 1e-8) / 127.0
        x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(x8, wq, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32) * (sx * s[None])
        x = jnp.tanh(yf[:, :D]).astype(jnp.float32)
    return x


def main():
    key = jax.random.PRNGKey(0)
    ws = make_weights(key)
    total_mb = sum(w.size for w in ws)
    print(f"weight sweep: {total_mb * 2 / 2**20:.0f} MB bf16 / "
          f"{total_mb / 2**20:.0f} MB int8 / {total_mb / 2 / 2**20:.0f} MB int4")

    wsb = [w.astype(jnp.bfloat16) for w in ws]
    q8 = [quant_w(w, 8) for w in ws]
    try:
        q4 = [quant_w(w, 4) for w in ws]
        _ = sync(jax.jit(sweep_q)(q4[:1], jnp.ones((B, D), jnp.float32)))
        have_int4 = True
    except Exception as e:
        print(f"int4 unsupported on this backend: {type(e).__name__}: {str(e)[:200]}")
        have_int4 = False

    fb = jax.jit(sweep_bf16)
    fq = jax.jit(sweep_q)
    x0b = jnp.ones((B, D), jnp.bfloat16)
    x0f = jnp.ones((B, D), jnp.float32)
    sync(fb(wsb, x0b)); sync(fq(q8, x0f))
    if have_int4:
        sync(fq(q4, x0f))

    t = {"bf16": [], "w8a8": [], "w4a8": []}
    for _ in range(ITERS):
        for name, fn, args in (("bf16", fb, (wsb, x0b)), ("w8a8", fq, (q8, x0f)),
                               ("w4a8", fq, (q4, x0f)) if have_int4 else (None, None, None)):
            if name is None:
                continue
            t0 = time.perf_counter()
            sync(fn(*args))
            t[name].append(time.perf_counter() - t0)

    OVERHEAD = 0.029  # fixed dispatch+transfer cost on this tunnel (CLAUDE.md)
    for name, v in t.items():
        if v:
            print(f"{name}: min {min(v)*1e3:.2f} ms  (minus overhead "
                  f"{(min(v)-OVERHEAD)*1e3:.2f} ms) over {len(v)}")

    if have_int4:
        # numerics: w4a8 vs fp32 reference on one block's worth
        x = jax.random.normal(jax.random.PRNGKey(7), (B, D), jnp.float32)
        w = ws[0]
        ref = x @ w
        wq, s = quant_w(w, 4)
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        sx = amax / 127.0
        x8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        got = jax.lax.dot_general(x8, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32
                                  ).astype(jnp.float32) * (sx * s[None])
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        print(f"w4a8 single-matmul rel error vs fp32: {rel:.4f}")


if __name__ == "__main__":
    main()
