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

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0).astype(x.dtype)[..., None]
    wy = (iy - y0).astype(x.dtype)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    flat = x.reshape(b, hin * win, c)

    def gather(yy, xx):
        valid = ((yy >= 0) & (yy < hin) & (xx >= 0) & (xx < win))
        yc = jnp.clip(yy, 0, hin - 1)
        xc = jnp.clip(xx, 0, win - 1)
        idx = (yc * win + xc).reshape(b, hout * wout, 1)
        v = jnp.take_along_axis(flat, idx, axis=1).reshape(b, hout, wout, c)
        return v * valid[..., None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    one = jnp.asarray(1.0, x.dtype)
    top = v00 * (one - wx) + v01 * wx
    bot = v10 * (one - wx) + v11 * wx
    return top * (one - wy) + bot * wy


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
