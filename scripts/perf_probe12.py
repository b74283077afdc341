"""Warp gather formulations at the finest decode level (within-run A/B).

The decode's bottleneck is the bilinear warp gather at 256^2
(inter features (B*k=30, 259, 259, 96) bf16; warps ~57% of a decode step,
`scripts/PERF_NOTES.md`). Variants, all exact unless noted:

  v0 current    3D-operand gather, slice (2, 2, C), per-batch vmap
  v1 rows2d     batch collapsed into a 2D operand (rows, cols*C); one gather
                with 2 index dims, slice (2, 2C)
  v2 int8       v0 gather on int8-quantized features + dequant (serving-lossy)
  v3 halfC      v0 with C=48: if time ~halves, the gather is byte-bound ->
                int8 should give ~2x; if ~flat, it's slice-rate bound
  v4 fp32       v0 with fp32 features (2x bytes): byte-scaling control

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/perf_probe12.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

B, H, W, C = 30, 256, 256, 96


def sync(x):
    np.asarray(x.reshape(-1)[:1])


def unnorm(grid, hin, win):
    gx = grid[..., 0]
    gy = grid[..., 1]
    ix = ((gx + 1.0) * win - 1.0) * 0.5
    iy = ((gy + 1.0) * hin - 1.0) * 0.5
    y0f = jnp.floor(iy)
    x0f = jnp.floor(ix)
    return ix, iy, y0f, x0f


def v0_gather(x, grid):
    from ccvs_tpu.ops.warp import grid_sample

    return grid_sample(x, grid)


def v1_rows2d(x, grid):
    b, hin, win, c = x.shape
    _, hout, wout, _ = grid.shape
    ix, iy, y0f, x0f = unnorm(grid, hin, win)
    wy = (iy - y0f).astype(x.dtype)[..., None]
    wx = (ix - x0f).astype(x.dtype)[..., None]
    inbound = (ix > -1.0) & (ix < win) & (iy > -1.0) & (iy < hin)

    p = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    rows = p.reshape(b * (hin + 3), (win + 3) * c)
    y0 = jnp.clip(y0f, -1, hin - 1).astype(jnp.int32) + 1
    x0 = jnp.clip(x0f, -1, win - 1).astype(jnp.int32) + 1
    row_idx = (jnp.arange(b, dtype=jnp.int32)[:, None, None] * (hin + 3) + y0)
    col_idx = x0 * c
    idx = jnp.stack([row_idx, col_idx], axis=-1).reshape(-1, 2)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))
    patches = lax.gather(rows, idx, dn, slice_sizes=(2, 2 * c),
                         mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    patches = patches.reshape(b, hout, wout, 2, 2, c)
    v00 = patches[..., 0, 0, :]
    v01 = patches[..., 0, 1, :]
    v10 = patches[..., 1, 0, :]
    v11 = patches[..., 1, 1, :]
    one = jnp.asarray(1.0, x.dtype)
    top = v00 * (one - wx) + v01 * wx
    bot = v10 * (one - wx) + v11 * wx
    out = top * (one - wy) + bot * wy
    return out * inbound[..., None].astype(x.dtype)


def v5_flat2(x, grid):
    """Two gathers of slice (2, C) from a row-major-flattened pixel dim with
    SINGLE-component indices: avoids both the (2,2,C)-minor patch tensor and
    the (N, 2)-minor s32 index tensor (each tile-pads badly)."""
    b, hin, win, c = x.shape
    _, hout, wout, _ = grid.shape
    ix, iy, y0f, x0f = unnorm(grid, hin, win)
    wy = (iy - y0f).astype(x.dtype)[..., None]
    wx = (ix - x0f).astype(x.dtype)[..., None]
    inbound = (ix > -1.0) & (ix < win) & (iy > -1.0) & (iy < hin)

    p = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    flat = p.reshape(b, (hin + 3) * (win + 3), c)
    y0 = jnp.clip(y0f, -1, hin - 1).astype(jnp.int32) + 1
    x0 = jnp.clip(x0f, -1, win - 1).astype(jnp.int32) + 1
    base = (y0 * (win + 3) + x0).reshape(b, hout * wout)

    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))

    def g1(img, ind):
        return lax.gather(img, ind[:, None], dn, slice_sizes=(2, c),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    top2 = jax.vmap(g1)(flat, base).reshape(b, hout, wout, 2, c)
    bot2 = jax.vmap(g1)(flat, base + (win + 3)).reshape(b, hout, wout, 2, c)
    one = jnp.asarray(1.0, x.dtype)
    top = top2[..., 0, :] * (one - wx) + top2[..., 1, :] * wx
    bot = bot2[..., 0, :] * (one - wx) + bot2[..., 1, :] * wx
    out = top * (one - wy) + bot * wy
    return out * inbound[..., None].astype(x.dtype)


def v6_rowpair(pk, grid, hin, win, c, dtype):
    """Row-pair packed gather: operand rows hold concat(row_y, row_y+1) along
    channels, so one (1, 2, 2C) slice reads all 4 bilinear corners from a
    SINGLE H-plane as one contiguous 2x2C-lane span (vs v0's two H-plane
    tiles). Tile math says same 8 KB/pixel; this measures whether v0 is
    instead gather-ISSUE bound, where halving slices-per-row helps. Packing
    (concat) is excluded — in the decoder the packed operand is reused by the
    Matching/Subpixel/fusion warps of one level."""
    b = pk.shape[0]
    hout, wout = grid.shape[1:3]
    ix, iy, y0f, x0f = unnorm(grid, hin, win)
    wy = (iy - y0f).astype(dtype)[..., None]
    wx = (ix - x0f).astype(dtype)[..., None]
    inbound = (ix > -1.0) & (ix < win) & (iy > -1.0) & (iy < hin)
    y0 = jnp.clip(y0f, -1, hin - 1).astype(jnp.int32) + 1
    x0 = jnp.clip(x0f, -1, win - 1).astype(jnp.int32) + 1
    idx = jnp.stack([y0, x0], axis=-1).reshape(b, hout * wout, 2)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1))

    def g1(img, ind):
        return lax.gather(img, ind, dn, slice_sizes=(1, 2, 2 * c),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    patches = jax.vmap(g1)(pk, idx).reshape(b, hout, wout, 2, 2 * c)
    # dim -2 is the W offset (x0, x0+1); channels pack [row_y, row_y+1]
    v00 = patches[..., 0, :c]
    v10 = patches[..., 0, c:]
    v01 = patches[..., 1, :c]
    v11 = patches[..., 1, c:]
    one = jnp.asarray(1.0, dtype)
    top = v00 * (one - wx) + v01 * wx
    bot = v10 * (one - wx) + v11 * wx
    out = top * (one - wy) + bot * wy
    return out * inbound[..., None].astype(dtype)


def pack_rowpair(x):
    p = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    return jnp.concatenate([p[:, :-1], p[:, 1:]], axis=-1)  # (B, H+2, W+3, 2C)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    flow = jax.random.normal(key, (B, H, W, 2), jnp.float32) * 4.0
    from ccvs_tpu.ops.warp import make_backwarp_grid

    grid = make_backwarp_grid(H, W)[None] + jnp.stack(
        [flow[..., 0] / ((W - 1) / 2), flow[..., 1] / ((H - 1) / 2)], axis=-1)

    # int8 quantized features (per-channel scale)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2), keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)

    def v2_int8(x8, grid):
        out8 = v0_gather(x8, grid)  # gather+lerp on int8? lerp needs float
        return out8

    # int8 gather must lerp in float; do gather in int8 via patches then cast.
    def v2_impl(x8, grid):
        b, hin, win, c = x8.shape
        _, hout, wout, _ = grid.shape
        ix, iy, y0f, x0f = unnorm(grid, hin, win)
        wy = (iy - y0f).astype(jnp.bfloat16)[..., None]
        wx = (ix - x0f).astype(jnp.bfloat16)[..., None]
        inbound = (ix > -1.0) & (ix < win) & (iy > -1.0) & (iy < hin)
        p = jnp.pad(x8, ((0, 0), (1, 2), (1, 2), (0, 0)))
        y0 = jnp.clip(y0f, -1, hin - 1).astype(jnp.int32) + 1
        x0 = jnp.clip(x0f, -1, win - 1).astype(jnp.int32) + 1
        idx = jnp.stack([y0, x0], axis=-1).reshape(b, hout * wout, 2)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1))

        def g1(img, ind):
            return lax.gather(img, ind, dn, slice_sizes=(2, 2, c),
                              mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

        patches = jax.vmap(g1)(p, idx).reshape(b, hout, wout, 2, 2, c)
        pf = patches.astype(jnp.bfloat16)
        one = jnp.asarray(1.0, jnp.bfloat16)
        top = pf[..., 0, 0, :] * (one - wx) + pf[..., 0, 1, :] * wx
        bot = pf[..., 1, 0, :] * (one - wx) + pf[..., 1, 1, :] * wx
        out = top * (one - wy) + bot * wy
        out = out * scale.astype(jnp.bfloat16)
        return out * inbound[..., None].astype(jnp.bfloat16)

    variants = {
        "v0_current_bf16": (jax.jit(v0_gather), (x, grid)),
        "v1_rows2d_bf16": (jax.jit(v1_rows2d), (x, grid)),
        "v2_int8": (jax.jit(v2_impl), (x8, grid)),
        "v3_halfC_bf16": (jax.jit(v0_gather), (x[..., :48], grid)),
        "v4_fp32": (jax.jit(v0_gather), (x.astype(jnp.float32), grid)),
        "v5_flat2_bf16": (jax.jit(v5_flat2), (x, grid)),
        "v6_rowpair_bf16": (
            jax.jit(partial(v6_rowpair, hin=H, win=W, c=C, dtype=jnp.bfloat16)),
            (pack_rowpair(x), grid)),
    }

    # correctness vs v0
    ref = np.asarray(variants["v0_current_bf16"][0](x, grid), np.float32)
    got1 = np.asarray(variants["v1_rows2d_bf16"][0](x, grid), np.float32)
    print("v1 max err:", np.abs(got1 - ref).max(), flush=True)
    got5 = np.asarray(variants["v5_flat2_bf16"][0](x, grid), np.float32)
    print("v5 max err:", np.abs(got5 - ref).max(), flush=True)
    got6 = np.asarray(variants["v6_rowpair_bf16"][0](pack_rowpair(x), grid), np.float32)
    print("v6 max err:", np.abs(got6 - ref).max(), flush=True)
    got2 = np.asarray(variants["v2_int8"][0](x8, grid), np.float32)
    print("v2 int8 mean rel err:",
          float(np.abs(got2 - ref).mean() / (np.abs(ref).mean() + 1e-9)), flush=True)

    # warmup all
    for name, (fn, args) in variants.items():
        sync(fn(*args))
    # interleaved timing, 5 rounds
    times = {k: [] for k in variants}
    for r in range(5):
        for name, (fn, args) in variants.items():
            t0 = time.perf_counter()
            sync(fn(*args))
            times[name].append(time.perf_counter() - t0)
    base = None
    for name in variants:
        ts = sorted(times[name])
        med = ts[len(ts) // 2] * 1e3
        if base is None:
            base = med
        print(f"{name}: med {med:.2f} ms  ({base / med:.2f}x vs v0)", flush=True)


if __name__ == "__main__":
    main()
