"""Bilinear backwarp (grid-sample) in pure JAX gathers.

TPU-native equivalent of `torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=False)` as used by the reference flow
module (`models/skip_vid_generator/models/skip_autoencoder.py:120-128`).
Implemented as four batched gathers + a fused lerp; everything static-shaped
so XLA keeps it on-chip.
"""

import jax
import jax.numpy as jnp


def make_backwarp_grid(height, width, dtype=jnp.float32):
    """Normalized sampling grid, pixel-center aligned.

    Matches reference `skip_autoencoder.py:120-123`: x coords are
    ``linspace(-1 + 1/W, 1 - 1/W, W)`` and likewise for y.

    Returns:
      ``(H, W, 2)`` with ``[..., 0] = x`` and ``[..., 1] = y``.
    """
    xs = jnp.linspace(-1.0 + 1.0 / width, 1.0 - 1.0 / width, width, dtype=dtype)
    ys = jnp.linspace(-1.0 + 1.0 / height, 1.0 - 1.0 / height, height, dtype=dtype)
    gx = jnp.broadcast_to(xs[None, :], (height, width))
    gy = jnp.broadcast_to(ys[:, None], (height, width))
    return jnp.stack([gx, gy], axis=-1)


def _compute_dtype(x):
    """Lerp dtype: int8 sources (quantized context FIFO) blend in bf16."""
    return jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype


def _unnormalize(x, grid):
    """align_corners=False unnormalization + bilinear weights/base indices."""
    b, hin, win, c = x.shape
    cdt = _compute_dtype(x)
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    ix = ((gx + 1.0) * win - 1.0) * 0.5
    iy = ((gy + 1.0) * hin - 1.0) * 0.5
    y0f = jnp.floor(iy)
    x0f = jnp.floor(ix)
    wy = (iy - y0f).astype(cdt)[..., None]
    wx = (ix - x0f).astype(cdt)[..., None]
    inbound = (ix > -1.0) & (ix < win) & (iy > -1.0) & (iy < hin)
    return ix, iy, y0f, x0f, wx, wy, inbound


def _grid_sample_planes(x, grid):
    """Bilinear sampling for SMALL channel counts (RGB & co).

    The slice-gather path's patch tensor ``(N, 2, 2, C)`` tile-pads its tiny
    minor dims to the TPU (8, 128) tile — a measured 64x HBM expansion at
    C=3 (12.6 GB for 201 MB of patches inside the ADA warp). Here channels
    ride the batch dim instead: four scalar flat `take`s per corner over
    ``(B*C, (H+2)*(W+2))`` planes, so every live tensor keeps a large minor
    dimension. Numerics identical to :func:`grid_sample`.
    """
    b, hin, win, c = x.shape
    _, hout, wout, _ = grid.shape
    ix, iy, y0f, x0f, wx, wy, inbound = _unnormalize(x, grid)

    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    planes = p.transpose(0, 3, 1, 2).reshape(b * c, (hin + 2) * (win + 2))
    y0 = jnp.clip(y0f, -1, hin - 1).astype(jnp.int32) + 1
    x0 = jnp.clip(x0f, -1, win - 1).astype(jnp.int32) + 1
    base = (y0 * (win + 2) + x0).reshape(b, hout * wout)
    base_bc = jnp.repeat(base, c, axis=0)  # (B*C, N) — plane order is b-major

    def take(off):
        return jax.vmap(lambda pl, i: jnp.take(pl, i, axis=0))(planes, base_bc + off)

    v00 = take(0)
    v01 = take(1)
    v10 = take(win + 2)
    v11 = take(win + 3)

    n = hout * wout
    wxf = jnp.repeat(wx.reshape(b, n), c, axis=0).astype(x.dtype)
    wyf = jnp.repeat(wy.reshape(b, n), c, axis=0).astype(x.dtype)
    one = jnp.asarray(1.0, x.dtype)
    top = v00 * (one - wxf) + v01 * wxf
    bot = v10 * (one - wxf) + v11 * wxf
    out = top * (one - wyf) + bot * wyf
    mask = jnp.repeat(inbound.reshape(b, n), c, axis=0).astype(x.dtype)
    out = out * mask
    return out.reshape(b, c, hout, wout).transpose(0, 2, 3, 1)


def grid_sample(x, grid):
    """Bilinear sampling with zero padding, ``align_corners=False``.

    TPU-tuned: ONE `lax.gather` with ``slice_sizes=(2, 2, C)`` fetches each
    output pixel's 2x2 neighborhood straight from a 1-padded copy of the
    input. Measured 20-30%% faster than the previous packed-4C variant
    (which materialized a (H+1, W+1, 4C) concat — a 4x HBM write — before a
    row-gather); numerically identical to torch `grid_sample(
    mode='bilinear', padding_mode='zeros', align_corners=False)`.
    Small channel counts (C < 8) dispatch to :func:`_grid_sample_planes`,
    whose live tensors avoid the (2, 2, C)-minor tile-padding blowup.

    Args:
      x: ``(B, Hin, Win, C)``.
      grid: ``(B, Hout, Wout, 2)`` normalized coords (x, y) in [-1, 1].

    Returns:
      ``(B, Hout, Wout, C)``.
    """
    from jax import lax

    b, hin, win, c = x.shape
    if c < 8:
        if x.dtype == jnp.int8:
            x = x.astype(jnp.bfloat16)
        return _grid_sample_planes(x, grid)
    _, hout, wout, _ = grid.shape
    ix, iy, y0f, x0f, wx, wy, inbound = _unnormalize(x, grid)

    # 1-padded low / 2-padded high so the (2, 2) slice at the clipped base
    # index (y0+1, x0+1) in [0, Hin] x [0, Win] always stays in bounds, and
    # out-of-image neighbors read zeros.
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

    cdt = _compute_dtype(x)
    patches = jax.vmap(g1)(p, idx).reshape(b, hout, wout, 2, 2, c)
    # int8 sources: the GATHER moves int8 (half the HBM tile reads of bf16);
    # only the in-register patches are widened for the lerp.
    patches = patches.astype(cdt)
    v00 = patches[..., 0, 0, :]
    v01 = patches[..., 0, 1, :]
    v10 = patches[..., 1, 0, :]
    v11 = patches[..., 1, 1, :]

    one = jnp.asarray(1.0, cdt)
    top = v00 * (one - wx) + v01 * wx
    bot = v10 * (one - wx) + v11 * wx
    out = top * (one - wy) + bot * wy

    # whole-pixel mask: when clipping engaged, every true neighbor was out of
    # image (or had zero weight), so the correct value is 0.
    return out * inbound[..., None].astype(cdt)


def backwarp_sampled(x, flow, stride):
    """``backwarp(x, flow)[:, ::stride, ::stride]`` computed directly.

    Gathers only the stride-sampled output positions (1/stride^2 of the
    pixels) from the full-resolution source — exact, since bilinear sampling
    at position p depends only on p's own flow. Used by the cost-volume
    Matching module, whose correlation reads the warped features at exactly
    these positions (`modules/correlation.py:32-100` samples
    ``first[y*stride, x*stride]``).
    """
    b, h, w, _ = x.shape
    grid = make_backwarp_grid(h, w)[::stride, ::stride]
    fs = flow[:, ::stride, ::stride]
    fx = fs[..., 0] / ((w - 1) / 2.0)
    fy = fs[..., 1] / ((h - 1) / 2.0)
    sample = grid[None] + jnp.stack([fx, fy], axis=-1).astype(jnp.float32)
    return grid_sample(x, sample)


def backwarp(x, flow, grid=None):
    """Warp ``x`` backwards along ``flow`` (pixels), reference semantics.

    Matches `skip_autoencoder.py:126-128`: flow-x is normalized by
    ``(W - 1)/2`` and flow-y by ``(H - 1)/2`` before being added to the
    pixel-center grid.

    Args:
      x: ``(B, H, W, C)``.
      flow: ``(B, H, W, 2)`` displacement in pixels, ``[..., 0] = x``.
      grid: optional precomputed :func:`make_backwarp_grid` output.
    """
    b, h, w, _ = x.shape
    if grid is None:
        grid = make_backwarp_grid(h, w, dtype=jnp.float32)
    fx = flow[..., 0] / ((x.shape[2] - 1.0) / 2.0)
    fy = flow[..., 1] / ((x.shape[1] - 1.0) / 2.0)
    sample = grid[None] + jnp.stack([fx, fy], axis=-1).astype(jnp.float32)
    return grid_sample(x, sample)
