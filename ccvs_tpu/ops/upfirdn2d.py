"""Fused upsample-FIR-downsample resampling (StyleGAN2 ``upfirdn2d``).

TPU-native equivalent of the reference's CUDA kernel
(`models/skip_vid_generator/modules/upfirdn2d_kernel.cu`,
`upfirdn2d.py:145-203`). Instead of a hand-tiled CUDA kernel, the whole
pipeline (zero-stuffing upsample -> pad -> FIR -> stride downsample) is a
single ``lax.conv_general_dilated`` call with ``lhs_dilation`` for the
upsample, per-side (possibly negative) padding, window strides for the
downsample, and ``feature_group_count=C`` to make the FIR depthwise. XLA
lowers this as one fused TPU convolution — no intermediate HBM traffic.

Activations are NHWC. The separable blur kernels used throughout StyleGAN2
([1,3,3,1] outer products) are built by :func:`make_resample_kernel`.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_resample_kernel(k, gain=1.0):
    """Builds the normalized 2D FIR kernel (reference `skip_autoencoder.py:19-24`)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    return jnp.asarray(k * gain)


@partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """Upsample (zero-stuffing), FIR filter, downsample — in one fused conv.

    Args:
      x: ``(B, H, W, C)``.
      kernel: ``(kh, kw)`` FIR filter.
      up / down: int or (y, x) int pair.
      pad: ``(pad0, pad1)`` applied to both axes (matching the reference
        Python API, `upfirdn2d.py:145`) or ``(x0, x1, y0, y1)``.

    Returns:
      ``(B, (H*up_y + pad_y0 + pad_y1 - kh)//down_y + 1, ..., C)``.
    """
    up_y, up_x = (up, up) if isinstance(up, int) else (up[1], up[0])
    down_y, down_x = (down, down) if isinstance(down, int) else (down[1], down[0])
    if len(pad) == 2:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad[0], pad[1], pad[0], pad[1]
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = pad

    c = x.shape[-1]
    kh, kw = kernel.shape
    # The reference flips the kernel then cross-correlates (true convolution);
    # lax.conv cross-correlates, so flip here too.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # depthwise HWIO

    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(down_y, down_x),
        # lhs_dilation yields length (H-1)*up + 1; the reference zero-stuffing
        # keeps the trailing (up - 1) zeros, so fold them into the end pad.
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=x.dtype,
    )


def blur(x, kernel, pad):
    """FIR blur, no resampling (reference `skip_autoencoder.py:27-37`)."""
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad)


def upsample2x(x, kernel):
    """2x upsample with FIR smoothing (reference `skip_autoencoder.py:268-285`)."""
    factor = 2
    k = kernel * (factor**2)
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=factor, down=1, pad=(pad0, pad1))


def downsample2x(x, kernel):
    """2x downsample with FIR anti-aliasing."""
    factor = 2
    p = kernel.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))
