"""Gather-based deformable convolution (flow-offset 3x3).

TPU-native replacement for `torchvision.ops.DeformConv2d` as used by the
reference flow module when ``use_deformed_conv`` is on
(`skip_autoencoder.py:158-159,183-185`): every kernel tap shares the same
per-pixel offset (the estimated flow), so the op is nine bilinear warps —
each shifted by its tap position — combined by the conv weights. Built on the
packed-gather `grid_sample`, fully differentiable.
"""

import jax
import jax.numpy as jnp

from ccvs_tpu.ops import backwarp
from ccvs_tpu.ops.convops import conv2d


def deform_conv3x3(x, flow, weight, bias=None):
    """3x3 deformable conv with a shared per-pixel flow offset.

    Args:
      x: (B, H, W, C).
      flow: (B, H, W, 2) pixel offsets ([..., 0] = x).
      weight: (O, C, 3, 3) torch-layout conv weight.
      bias: optional (O,).

    Returns:
      (B, H, W, O): sum over taps k of W_k . sample(x, p + k + flow(p)).
    """
    b, h, w, _ = x.shape
    # `backwarp` keeps the reference's mixed normalization (a unit of flow
    # displaces H/(H-1) pixels); deformable conv needs true pixel offsets,
    # so convert: pixel -> backwarp-flow units.
    unit = jnp.asarray([(w - 1) / w, (h - 1) / h], flow.dtype)
    out = None
    for ky in (-1, 0, 1):
        for kx in (-1, 0, 1):
            off = jnp.asarray([kx, ky], flow.dtype)
            sampled = backwarp(x, (flow + off) * unit)
            w_tap = weight[:, :, ky + 1, kx + 1][:, :, None, None]  # (O, C, 1, 1)
            term = conv2d(sampled, w_tap, None, stride=1, padding=0)
            out = term if out is None else out + term
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
