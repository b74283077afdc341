"""Fused bias + leaky-ReLU + scale.

TPU-native equivalent of the reference's CUDA ``fused_bias_act``
(`models/skip_vid_generator/modules/fused_bias_act_kernel.cu`,
`fused_act.py:105-120`). On TPU this is a pure VPU elementwise chain that XLA
fuses into the producing matmul/conv epilogue — a hand-written kernel would
only add dispatch overhead, so the "native" implementation *is* the XLA
fusion. Layout is NHWC: bias broadcasts over the trailing channel axis.
"""

import jax
import jax.numpy as jnp

SQRT2 = 2.0**0.5


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=SQRT2):
    """``leaky_relu(x + bias) * scale`` with channel-last bias broadcast.

    Matches reference `fused_act.py:105-120` (NCHW there, NHWC here).
    """
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return leaky_relu(x, negative_slope) * jnp.asarray(scale, x.dtype)
