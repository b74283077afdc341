"""Probe: int8 vs bf16 matmul throughput at GPT decode shapes (weight-bound).

If int8 dot_general reaches ~2x the effective bandwidth, a weight-quantized
serving mode can roughly halve the 2.1 ms/token AR decode cost.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_probe10.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


def t(f, *a, iters=8):
    f(*a)
    f(*a)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)
    d = 1024
    # one decode step's worth of matmuls: emulate 24 layers x (qkv+proj+fc1+fc2)
    # as a scan over stacked weights — the realistic weight-streaming pattern
    L = 24
    x = jax.random.normal(key, (2, d), jnp.bfloat16)

    wb = jax.random.normal(key, (L, d, 12 * d), jnp.bfloat16) * 0.02
    wi = (np.asarray(jax.random.normal(key, (L, d, 12 * d))) * 20).astype(np.int8)
    wi = jnp.asarray(wi)
    scale = jnp.full((L, 12 * d), 1e-3, jnp.float32)

    @jax.jit
    def run_bf16(x, wb):
        def body(c, w):
            y = jnp.dot(c, w, preferred_element_type=jnp.float32)
            return jnp.tanh(y[:, :d]).astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(body, x, wb)
        return out

    @jax.jit
    def run_int8(x, wi, scale):
        def body(c, ws):
            w, s = ws
            xq = jnp.clip(jnp.round(c.astype(jnp.float32) * 127.0), -127, 127
                          ).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = y.astype(jnp.float32) * (s[None] / 127.0)
            return jnp.tanh(y[:, :d]).astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(body, x, (wi, scale))
        return out

    tb = t(run_bf16, x, wb)
    print(f"bf16 24x(2x1024 @ 1024x12288): {tb*1e3:.2f} ms "
          f"({L*d*12*d*2/ tb / 1e9:.0f} GB/s eff)", flush=True)
    try:
        ti = t(run_int8, x, wi, scale)
        print(f"int8 same: {ti*1e3:.2f} ms ({L*d*12*d/ ti / 1e9:.0f} GB/s eff, "
              f"{tb/ti:.2f}x)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"int8 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
