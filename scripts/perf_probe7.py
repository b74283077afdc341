"""Probe: packed-channel gather (current grid_sample) vs 2x2-slice lax.gather.

The packed path materializes a (H+1,W+1,4C) copy (4x write) then row-gathers
from it; a lax.gather with slice_sizes (2,2,C) reads the 2x2 neighborhood
straight from the 1-padded image. Same semantics, half the HBM traffic.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_probe7.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ccvs_tpu.ops.warp import grid_sample, make_backwarp_grid


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


def grid_sample_slice(x, grid):
    """Bilinear zero-pad sampling via one 2x2-slice gather per batch row."""
    b, hin, win, c = x.shape
    _, hout, wout, _ = grid.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    ix = ((gx + 1.0) * win - 1.0) * 0.5
    iy = ((gy + 1.0) * hin - 1.0) * 0.5
    y0f = jnp.floor(iy)
    x0f = jnp.floor(ix)
    wy = (iy - y0f).astype(x.dtype)[..., None]
    wx = (ix - x0f).astype(x.dtype)[..., None]

    p = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    y0 = jnp.clip(y0f, -1, hin - 1).astype(jnp.int32) + 1
    x0 = jnp.clip(x0f, -1, win - 1).astype(jnp.int32) + 1
    idx = jnp.stack([y0, x0], axis=-1).reshape(b, hout * wout, 2)

    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def g1(img, ind):
        return lax.gather(img, ind, dn, slice_sizes=(2, 2, c),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    patches = jax.vmap(g1)(p, idx).reshape(b, hout, wout, 2, 2, c)
    v00 = patches[..., 0, 0, :]
    v01 = patches[..., 0, 1, :]
    v10 = patches[..., 1, 0, :]
    v11 = patches[..., 1, 1, :]
    one = jnp.asarray(1.0, x.dtype)
    out = (v00 * (one - wx) + v01 * wx) * (one - wy) + (v10 * (one - wx) + v11 * wx) * wy
    inbound = (ix > -1.0) & (ix < win) & (iy > -1.0) & (iy < hin)
    return out * inbound[..., None].astype(x.dtype)


def main():
    key = jax.random.PRNGKey(0)
    for (bk, h, w, c) in [(30, 256, 256, 96), (30, 128, 128, 96), (30, 64, 64, 192)]:
        x = jax.random.normal(key, (bk, h, w, c), jnp.bfloat16)
        flow = jax.random.normal(jax.random.PRNGKey(1), (bk, h, w, 2), jnp.float32) * 4
        grid = make_backwarp_grid(h, w)[None] + jnp.stack(
            [flow[..., 0] / ((w - 1) / 2), flow[..., 1] / ((h - 1) / 2)], axis=-1
        )
        f_old = jax.jit(grid_sample)
        f_new = jax.jit(grid_sample_slice)
        a = f_old(x, grid)
        bb = f_new(x, grid)
        ok = np.allclose(np.asarray(a, np.float32), np.asarray(bb, np.float32), atol=1e-2)
        ta = t(f_old, x, grid)
        tb = t(f_new, x, grid)
        print(f"({bk},{h},{w},{c}): packed {ta*1e3:.1f} ms | slice {tb*1e3:.1f} ms | exact={ok}",
              flush=True)


if __name__ == "__main__":
    main()
