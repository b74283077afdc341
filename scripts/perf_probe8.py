"""Micro-times for the decode step's constituent ops at real BAIR sizes.

Within-run measurements (one process, interleaved) to sidestep the tunnel's
slow windows:
  - local_correlation at each level's post-proj size
  - grid_sample at each level's warp size
  - Matching/Subpixel conv stacks equivalent FLOPs (jnp conv)

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_probe8.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ccvs_tpu.ops import local_correlation
from ccvs_tpu.ops.warp import grid_sample, make_backwarp_grid

OVERHEAD_NOTE = "subtract ~29 ms fixed dispatch overhead from each number"


def sync(x):
    return np.asarray(x.reshape(-1)[:1])


def t(f, *a, iters=6):
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
    print(OVERHEAD_NOTE, flush=True)

    # correlation at post-proj, post-sampling sizes (N=B*k=30)
    for (n, h, w, c) in [(30, 128, 128, 24), (30, 64, 64, 24), (30, 64, 64, 48),
                         (30, 32, 32, 48)]:
        a = jax.random.normal(key, (n, h, w, c), jnp.float32)
        b = jax.random.normal(jax.random.PRNGKey(1), (n, h, w, c), jnp.float32)
        f = jax.jit(lambda a, b: local_correlation(a, b, stride=1))
        dt = t(f, a, b)
        print(f"corr ({n},{h},{w},{c}): {dt*1e3:.1f} ms", flush=True)

    # warps at full-res InterBlock sizes
    for (n, h, w, c) in [(30, 256, 256, 96), (30, 128, 128, 96), (30, 64, 64, 192)]:
        x = jax.random.normal(key, (n, h, w, c), jnp.bfloat16)
        grid = jnp.tile(make_backwarp_grid(h, w)[None], (n, 1, 1, 1))
        f = jax.jit(grid_sample)
        dt = t(f, x, grid)
        print(f"warp ({n},{h},{w},{c}): {dt*1e3:.1f} ms", flush=True)

    # conv stack equivalent (Matching convs0-2 at level 6 full res)
    x = jax.random.normal(key, (30, 256, 256, 49), jnp.bfloat16)
    w1 = jax.random.normal(key, (3, 3, 49, 128), jnp.bfloat16) * 0.05
    w2 = jax.random.normal(key, (3, 3, 128, 64), jnp.bfloat16) * 0.05
    w3 = jax.random.normal(key, (3, 3, 64, 32), jnp.bfloat16) * 0.05

    @jax.jit
    def convs(x):
        d = lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return d(d(d(x, w1), w2), w3)

    dt = t(convs, x)
    print(f"matching convs (30,256,256,49->128->64->32): {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
