"""Convolution primitives in NHWC layout with torch-layout weights.

Weights are kept in the PyTorch layout so that checkpoints ported from the
reference implementation load without reshuffling and so that unit tests can
compare directly against torch CPU outputs:

- ``conv2d``:           weight ``(O, I/groups, kh, kw)``
- ``conv_transpose2d``: weight ``(I, O/groups, kh, kw)``
- ``conv3d``:           weight ``(O, I/groups, kt, kh, kw)``

Activations are NHWC (2d) / NTHWC (3d) — the TPU-preferred layout; XLA maps
these onto the MXU with channel-major tiling.

Reference semantics: `models/skip_vid_generator/models/skip_autoencoder.py:40-63`
(EqualConv2d fwd/transpose) and `models/skip_vid_generator/models/gan.py`
(EqualConv3d).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _triple(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


def conv2d(x, w, b=None, stride=1, padding=0, groups=1, dilation=1):
    """2D cross-correlation, torch ``F.conv2d`` semantics, NHWC activations.

    Args:
      x: ``(B, H, W, I)``.
      w: ``(O, I/groups, kh, kw)`` (torch layout).
      b: optional ``(O,)``.
    Returns:
      ``(B, H', W', O)``.
    """
    stride, padding, dilation = _pair(stride), _pair(padding), _pair(dilation)
    # (O, I/g, kh, kw) -> (kh, kw, I/g, O)
    w = jnp.transpose(w, (2, 3, 1, 0))
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose2d(x, w, b=None, stride=1, padding=0, groups=1):
    """2D transposed convolution, torch ``F.conv_transpose2d`` semantics.

    Implemented as an input-dilated convolution with a spatially-flipped,
    in/out-swapped kernel — the formulation XLA pipelines best on TPU.

    Args:
      x: ``(B, H, W, I)``.
      w: ``(I, O/groups, kh, kw)`` (torch transposed-conv layout).
      b: optional ``(O,)``.
    Returns:
      ``(B, (H-1)*s - 2p + kh, (W-1)*s - 2p + kw, O)``.
    """
    stride, padding = _pair(stride), _pair(padding)
    kh, kw = w.shape[2], w.shape[3]
    # (I, O/g, kh, kw): flip spatial, then arrange as HWIO where the
    # contraction axis is the *input* channel. After flipping, transposed
    # convolution equals a regular convolution whose kernel input-axis is the
    # original input channels. With groups, input channels are blocked
    # (I = g * I/g) and HWIO expects (kh, kw, I/g, O) with O blocked by group.
    w = jnp.flip(w, axis=(2, 3))  # (I, O/g, kh, kw)
    i, og = w.shape[0], w.shape[1]
    ig = i // groups
    # -> (g, I/g, O/g, kh, kw) -> (kh, kw, I/g, g*O/g)
    w = w.reshape(groups, ig, og, kh, kw)
    w = jnp.transpose(w, (3, 4, 1, 0, 2)).reshape(kh, kw, ig, groups * og)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[
            (kh - 1 - padding[0], kh - 1 - padding[0]),
            (kw - 1 - padding[1], kw - 1 - padding[1]),
        ],
        lhs_dilation=stride,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv3d(x, w, b=None, stride=1, padding=0, groups=1):
    """3D cross-correlation, torch ``F.conv3d`` semantics, NTHWC activations.

    Args:
      x: ``(B, T, H, W, I)``.
      w: ``(O, I/groups, kt, kh, kw)`` (torch layout).
    """
    stride = _triple(stride)
    padding = _triple(padding) if not isinstance(padding, (list, tuple)) or len(padding) != 3 else tuple(padding)
    # (O, I/g, kt, kh, kw) -> (kt, kh, kw, I/g, O)
    w = jnp.transpose(w, (2, 3, 4, 1, 0))
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
