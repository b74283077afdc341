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


def grid_sample(x, grid):
    """Bilinear sampling with zero padding, ``align_corners=False``.

    TPU-tuned: gathers on TPU are per-row latency-bound, so the four
    neighbor fetches are packed into ONE row-gather over a channel-
    concatenated, 1-padded copy of the input (the zero padding also encodes
    the out-of-image-neighbor zeros, so no per-neighbor masks are needed —
    only one whole-pixel in-bounds mask). ~4x faster than four separate
    gathers at the flow module's hot sizes; numerically identical to torch
    `grid_sample(mode='bilinear', padding_mode='zeros', align_corners=False)`.

    Args:
      x: ``(B, Hin, Win, C)``.
      grid: ``(B, Hout, Wout, 2)`` normalized coords (x, y) in [-1, 1].

    Returns:
      ``(B, Hout, Wout, C)``.
    """
    b, hin, win, c = x.shape
    _, hout, wout, _ = grid.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    # align_corners=False unnormalization (torch semantics).
    ix = ((gx + 1.0) * win - 1.0) * 0.5
    iy = ((gy + 1.0) * hin - 1.0) * 0.5

    y0f = jnp.floor(iy)
    x0f = jnp.floor(ix)
    wy = (iy - y0f).astype(x.dtype)[..., None]
    wx = (ix - x0f).astype(x.dtype)[..., None]

    # 1-padded image; the 4 neighbor views share the (H+1, W+1) index space
    # of (y0+1, x0+1) with y0, x0 in [-1, H-1] x [-1, W-1].
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    s00 = p[:, : hin + 1, : win + 1]
    s01 = p[:, : hin + 1, 1:]
    s10 = p[:, 1:, : win + 1]
    s11 = p[:, 1:, 1:]
    packed = jnp.concatenate([s00, s01, s10, s11], axis=-1)  # (B, H+1, W+1, 4C)

    y0 = jnp.clip(y0f, -1, hin - 1).astype(jnp.int32) + 1
    x0 = jnp.clip(x0f, -1, win - 1).astype(jnp.int32) + 1
    idx = (y0 * (win + 1) + x0).reshape(b, hout * wout, 1)
    g = jnp.take_along_axis(
        packed.reshape(b, (hin + 1) * (win + 1), 4 * c), idx, axis=1
    ).reshape(b, hout, wout, 4 * c)
    v00, v01, v10, v11 = jnp.split(g, 4, axis=-1)

    one = jnp.asarray(1.0, x.dtype)
    top = v00 * (one - wx) + v01 * wx
    bot = v10 * (one - wx) + v11 * wx
    out = top * (one - wy) + bot * wy

    # whole-pixel mask: when clipping engaged, every true neighbor was out of
    # image (or had zero weight), so the correct value is 0.
    inbound = (ix > -1.0) & (ix < win) & (iy > -1.0) & (iy < hin)
    return out * inbound[..., None].astype(x.dtype)


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
