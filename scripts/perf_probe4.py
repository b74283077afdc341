"""Probe: can Mosaic lower a vectorized VMEM gather, and how fast is it?

The warp gather is the decode bottleneck (~50 GB/s XLA-gather ceiling,
README perf notes). If Pallas can index a VMEM-resident table with a
dynamic per-element index vector, a warp kernel gathers at VMEM bandwidth
instead. This probes three candidate lowerings on the real chip:

  a) jnp.take_along_axis inside a Pallas kernel (flat table)
  b) one-hot matmul row-select inside a Pallas kernel (MXU fallback)
  c) the current XLA packed-gather grid_sample as the baseline

Usage: python scripts/perf_probe4.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


def timeit(f, *args, iters=10):
    f(*args)
    f(*args)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# ---------------- a) take_along_axis in Pallas ----------------

def _gather_kernel(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]          # (N, C) VMEM
    idx = idx_ref[:]          # (M, 1) int32
    out_ref[:] = jnp.take_along_axis(tab, jnp.broadcast_to(idx, (idx.shape[0], tab.shape[1])), axis=0)


def pallas_gather(tab, idx):
    m = idx.shape[0]
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((m, tab.shape[1]), tab.dtype),
    )(tab, idx[:, None])


# ---------------- b) dynamic_slice row loop in Pallas ----------------

def _rowloop_kernel(tab_ref, idx_ref, out_ref):
    def body(i, _):
        r = idx_ref[i, 0]
        out_ref[i, :] = tab_ref[r, :]
        return 0

    jax.lax.fori_loop(0, out_ref.shape[0], body, 0)


def pallas_rowloop(tab, idx):
    m = idx.shape[0]
    return pl.pallas_call(
        _rowloop_kernel,
        out_shape=jax.ShapeDtypeStruct((m, tab.shape[1]), tab.dtype),
    )(tab, idx[:, None])


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    # warp-like sizes: level-4 table (H+1)(W+1)=66k rows x 4C=384 ch bf16
    n, c, m = 66049, 384, 65536
    tab = jax.random.normal(key, (n, c), jnp.bfloat16)
    idx = jax.random.randint(key, (m,), 0, n, jnp.int32)

    # XLA baseline
    @jax.jit
    def xla_gather(tab, idx):
        return jnp.take(tab, idx, axis=0)

    t = timeit(xla_gather, tab, idx)
    gb = m * c * 2 / 1e9
    print(f"xla take: {t*1e3:.2f} ms  {gb/t:.1f} GB/s")

    for name, fn in (("pallas take_along_axis", pallas_gather),
                     ("pallas row loop", pallas_rowloop)):
        try:
            jf = jax.jit(fn)
            out = jf(tab, idx)
            ref = xla_gather(tab, idx)
            ok = np.allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32))
            t = timeit(jf, tab, idx)
            print(f"{name}: {t*1e3:.2f} ms  {gb/t:.1f} GB/s  exact={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
